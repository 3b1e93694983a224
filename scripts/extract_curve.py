"""Extract a compact per-epoch training curve from a run's metrics.jsonl.

Usage: python scripts/extract_curve.py <tf_dir_or_metrics.jsonl> <out.json>
       [--iters-per-epoch N]

Writes {"epoch_mean_loss": [...], "iters": N, "lr": [...]} — the committable
summary of a 100-epoch run whose raw metrics.jsonl is ~15 MB.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--iters-per-epoch", type=int, default=936)
    args = ap.parse_args()

    path = args.src
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    losses, lrs = {}, {}
    with open(path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "loss" in d:
                losses[d["step"]] = d["loss"]
            elif "lr" in d:
                lrs[d["step"]] = d["lr"]
    steps = sorted(losses)
    n = args.iters_per_epoch
    epochs = []
    for e in range(0, (len(steps) + n - 1) // n):
        chunk = [losses[s] for s in steps[e * n:(e + 1) * n]]
        if chunk:
            epochs.append(float(np.mean(chunk)))
    out = {
        "iters_per_epoch": n,
        "total_iters": len(steps),
        "epoch_mean_loss": [round(x, 6) for x in epochs],
        "final_loss": losses[steps[-1]] if steps else None,
        "lr_first_last": [lrs[min(lrs)], lrs[max(lrs)]] if lrs else None,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{args.out}: {len(epochs)} epochs, mean loss "
          f"{epochs[0]:.3f} -> {epochs[-1]:.3f}" if epochs else "no data")


if __name__ == "__main__":
    main()
