"""Assemble the reference result matrix from results_full_workload/*.json.

Prints markdown tables (karman SOL/NON/PRE/PRE-SR/source x held-out Re at 499
and 100 steps; burgers SOL-04/NON/PRE/source x held-out seeds; init ablation)
ready for BENCH.md. Run any time; missing files show as "—" so partial queue
progress is visible.
"""

from __future__ import annotations

import json
import os
import sys

RES = os.path.join(os.path.dirname(__file__), "..", "results_full_workload")

K_RES = [240000, 480000, 960000, 1920000, 3840000]
K_VARIANTS = ["sol32", "sol08", "non", "pre", "presr", "src"]
B_SEEDS = [100, 101, 102, 103, 104]
B_VARIANTS = ["sol04", "non", "pre", "prejm", "src"]


def load(name):
    path = os.path.join(RES, name)
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def cell(d, key="mae_mean"):
    return f"{d[key]:.4f}" if d else "—"


def karman_table(prefix: str, steps_label: str) -> str:
    head = "| test Re | " + " | ".join(
        f"{v} mean | {v} final" for v in K_VARIANTS) + " |"
    sep = "|" + "---|" * (1 + 2 * len(K_VARIANTS))
    rows = [head, sep]
    for re in K_RES:
        cells = []
        for v in K_VARIANTS:
            d = load(f"{prefix}_{v}_re{re}.json")
            cells += [cell(d, "mae_mean"), cell(d, "mae_final")]
        rows.append(f"| {re/1000:.0f}k | " + " | ".join(cells) + " |")
    return f"**karman-2d velocity MAE, {steps_label} recurrent steps:**\n\n" + "\n".join(rows)


def burgers_table() -> str:
    head = "| seed | " + " | ".join(
        f"{v} mean | {v} final" for v in B_VARIANTS) + " |"
    sep = "|" + "---|" * (1 + 2 * len(B_VARIANTS))
    rows = [head, sep]
    for s in B_SEEDS:
        cells = []
        for v in B_VARIANTS:
            d = load(f"eval_burgers_{v}_seed{s}.json")
            cells += [cell(d, "mae_mean"), cell(d, "mae_final")]
        rows.append(f"| {s} | " + " | ".join(cells) + " |")
    return "**burgers velocity MAE, 199 recurrent steps:**\n\n" + "\n".join(rows)


def multiseed_table() -> str:
    """burgers SOL-04 vs NON across TRAINING seeds (queue a3_b_*_s{1,2};
    seed 0 = the headline a3 run). Measures the 'seed noise' claim from the
    round-4 SOL-vs-NON mean-MAE inversion instead of asserting it."""
    import numpy as np

    tags = {0: "", 1: "_s1", 2: "_s2"}
    rows = ["| variant | train seed | MAE mean over eval seeds | MAE final |",
            "|---|---|---|---|"]
    summary = []
    for v in ("sol04", "non"):
        per_seed_means, per_seed_finals = [], []
        for ts, suff in tags.items():
            ds = [load(f"eval_burgers_{v}{suff}_seed{s}.json") for s in B_SEEDS]
            ds = [d for d in ds if d]
            if not ds:
                rows.append(f"| {v} | {ts} | — | — |")
                continue
            m = float(np.mean([d["mae_mean"] for d in ds]))
            fin = float(np.mean([d["mae_final"] for d in ds]))
            per_seed_means.append(m)
            per_seed_finals.append(fin)
            rows.append(f"| {v} | {ts} | {m:.4f} | {fin:.4f} |")
        if per_seed_means:
            summary.append(
                f"| {v} | mean±std over {len(per_seed_means)} seeds | "
                f"{np.mean(per_seed_means):.4f}±{np.std(per_seed_means):.4f} | "
                f"{np.mean(per_seed_finals):.4f}±{np.std(per_seed_finals):.4f} |")
    return ("**burgers SOL-vs-NON across training seeds "
            "(199-step rollouts, 5 eval seeds each):**\n\n"
            + "\n".join(rows + summary))


def ablation_table() -> str:
    rows = ["| init | 499-step MAE mean | final |", "|---|---|---|"]
    for tag, label in [("abl_zero", "zero output conv (ours, 20 ep)"),
                       ("abl_ref", "reference glorot + clip-grad (20 ep)")]:
        d = load(f"eval_{tag}_re480000.json")
        rows.append(f"| {label} | {cell(d, 'mae_mean')} | {cell(d, 'mae_final')} |")
    return "**init ablation (held-out Re=480k):**\n\n" + "\n".join(rows)


def main() -> None:
    print(karman_table("eval", "499"))
    print()
    print(karman_table("eval100", "100"))
    print()
    print(burgers_table())
    print()
    print(multiseed_table())
    print()
    print(ablation_table())


if __name__ == "__main__":
    main()
