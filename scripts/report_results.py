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
    print(ablation_table())


if __name__ == "__main__":
    main()
