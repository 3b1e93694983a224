"""Run a full 5-rollout run_test stage in ONE process.

The queue's run_test stages invoke the apply CLI once per held-out Re/seed:
five fresh python processes, each paying the axon tunnel's fresh-process
startup stall (1-3 min, CLAUDE.md) before any device work. Replaying the
exact same CLI invocations in-process (like scripts/cpu_eval_batch.py does
for evals) removes ~8-10 min of dead tunnel time per stage — about an hour
across the a3 campaign's seven run_test stages.

    python scripts/apply_batch.py k_run_test   OUTDIR MODEL STATS [EXTRA...]
    python scripts/apply_batch.py pre_run_test OUTDIR TFDIR
    python scripts/apply_batch.py b_run_test   OUTDIR MODEL STATS [EXTRA...]
    python scripts/apply_batch.py b_pre_run_test OUTDIR TFDIR [--arch ...]

Argument vectors match scripts/round2_queue_lib.sh's shell functions 1:1 and
dispatch to the same apps.*.main entry points, so outputs are identical.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_TESTSET = "karman-fdt-hires-testset"
B_TESTSET = "burgers-fdt-hires-testset"


def _test_re(i: int) -> int:
    return 10000 * 2 ** (i + 3) * 3


def k_run_test(outdir: str, model: str, stats: str, *extra: str) -> None:
    from solver_in_the_loop_tpu.apps import karman_apply

    shutil.rmtree(outdir, ignore_errors=True)
    for i in range(5):
        karman_apply.main([
            "-o", outdir, "--stats", stats, "--model", model, *extra,
            "--initdH", f"{K_TESTSET}/sim_{i:06d}/dens_001000.npz",
            "--initvH", f"{K_TESTSET}/sim_{i:06d}/velo_001000.npz",
            "-d", "4", "-r", "32", "-l", "100", "--re", str(_test_re(i)),
            "-t", "500"])


def pre_run_test(outdir: str, tfdir: str) -> None:
    from solver_in_the_loop_tpu.apps import karman_pre_apply

    shutil.rmtree(outdir, ignore_errors=True)
    for i in range(5):
        karman_pre_apply.main([
            "-o", outdir, "--stats", f"{tfdir}/stats.json",
            "--model", f"{tfdir}/model.msgpack",
            "--initdH", f"{K_TESTSET}/sim_{i:06d}/dens_001000.npz",
            "--initvH", f"{K_TESTSET}/sim_{i:06d}/velo_001000.npz",
            "-d", "4", "-r", "32", "-l", "100", "--re", str(_test_re(i)),
            "-t", "500"])


def b_run_test(outdir: str, model: str, stats: str, *extra: str) -> None:
    from solver_in_the_loop_tpu.apps import burgers_apply

    shutil.rmtree(outdir, ignore_errors=True)
    for i in range(5):
        burgers_apply.main([
            "-o", outdir, "--stats", stats, "--model", model, *extra,
            "--initvH", f"{B_TESTSET}/sim_{i:06d}/velo_000000.npz",
            "--loadfH", f"{B_TESTSET}/sim_{i:06d}/forc_0*.npz",
            "-d", "4", "-r", "32", "-l", "32", "--dt", "0.1", "-t", "200"])


def b_pre_run_test(outdir: str, tfdir: str, *extra: str) -> None:
    from solver_in_the_loop_tpu.apps import burgers_pre_apply

    shutil.rmtree(outdir, ignore_errors=True)
    for i in range(5):
        burgers_pre_apply.main([
            "-o", outdir, "--stats", f"{tfdir}/stats.json",
            "--model", f"{tfdir}/model.msgpack", *extra,
            "--initvH", f"{B_TESTSET}/sim_{i:06d}/velo_000000.npz",
            "--loadfH", f"{B_TESTSET}/sim_{i:06d}/forc_0*.npz",
            "-d", "4", "-r", "32", "-l", "32", "--dt", "0.1", "-t", "200"])


def main() -> None:
    mode = sys.argv[1]
    fn = {"k_run_test": k_run_test, "pre_run_test": pre_run_test,
          "b_run_test": b_run_test, "b_pre_run_test": b_pre_run_test}[mode]
    fn(*sys.argv[2:])


if __name__ == "__main__":
    main()
