"""Pressure-tolerance vs rollout-MAE sensitivity study (VERDICT r2 next #5c).

Runs CPU-forced (safe while the TPU queue runs): 500-step karman rollouts of
the trained SOL-32 model on held-out Re=480k at ptol in {1e-3, 1e-4, 1e-5},
evaluating each against the hi-res testset. Writes
results_full_workload/tol_study.json.

Usage: python scripts/tol_study.py [--model karman-fdt-sol32/tf/model.msgpack]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# ^ running `python scripts/x.py` puts scripts/ (not the repo root) on
# sys.path — this exact miss produced round 2's broken eval artifact

import argparse
import json
import os
import shutil
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")  # before package import (CLAUDE.md)

from solver_in_the_loop_tpu.__main__ import main as cli  # noqa: E402


def run(model: str, stats: str, out_path: str) -> None:
    results = {}
    for tol in ("1e-3", "1e-4", "1e-5"):
        T = tempfile.mkdtemp(prefix=f"tol{tol}_")
        cli(["karman-apply", "-o", f"{T}/run", "--stats", stats, "--model", model,
             "--initdH", "karman-fdt-hires-testset/sim_000001/dens_001000.npz",
             "--initvH", "karman-fdt-hires-testset/sim_000001/velo_001000.npz",
             "-d", "4", "-r", "32", "-l", "100", "--re", "480000", "-t", "500",
             "--ptol", tol])
        from solver_in_the_loop_tpu.apps import evaluate as eval_app

        ev = eval_app.main(["--run", f"{T}/run/sim_000000",
                            "--ref", "karman-fdt-hires-testset/sim_000001",
                            "--ref-offset", "1000", "--scale", "4", "--steps", "499"])
        results[tol] = {"mae_mean": ev["mae_mean"], "mae_final": ev["mae_final"]}
        shutil.rmtree(T, ignore_errors=True)
        print(f"ptol={tol}: mae_mean={ev['mae_mean']:.5f} final={ev['mae_final']:.5f}",
              flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="karman-fdt-sol32/tf/model.msgpack")
    ap.add_argument("--stats", default="karman-fdt-sol32/tf/dataStats.json")
    ap.add_argument("--out", default="results_full_workload/tol_study.json")
    args = ap.parse_args()
    if not os.path.isfile(args.model):
        sys.exit(f"model not found: {args.model}")
    run(args.model, args.stats, args.out)
