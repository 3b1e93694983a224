"""Run a queue eval stage on CPU, off the TPU, in ONE process.

The queue's eval stages (`k_eval` / `b_eval` in scripts/round2_queue_lib.sh)
only compare stored rollout npz frames against stored reference frames — no
TPU needed — yet on the queue they serialize behind TPU stages and pay a
fresh-process tunnel startup per evaluate call (~2-3 min each, ~30 min per
stage).  This driver replays the exact same evaluate CLI invocations
in-process on the CPU backend so they can run concurrently with TPU stages:

    python scripts/cpu_eval_batch.py k_eval TAG RUNDIR   # 5 Re x {499,100}
    python scripts/cpu_eval_batch.py b_eval TAG RUNDIR   # 5 seeds x 199

Writes the same results_full_workload/ files as the queue stage; the caller
then marks the stage done (touch runs/done/<stage>) so the queue skips it.

CPU forcing follows tests/conftest.py: the environment's sitecustomize
pre-imports jax, so JAX_PLATFORMS in the environment is ignored —
jax.config.update after import is authoritative (CLAUDE.md).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(REPO, "results_full_workload")

K_TEST_RE = [240000, 480000, 960000, 1920000, 3840000]


def run_one(argv, out_path) -> None:
    from solver_in_the_loop_tpu.apps import evaluate

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        evaluate.main(argv)
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path}: {buf.getvalue().strip()[:90]}", flush=True)


def k_eval(tag: str, rundir: str) -> None:
    for i, re in enumerate(K_TEST_RE):
        for steps, prefix in ((499, "eval"), (100, "eval100")):
            run_one(
                ["--run", f"{rundir}/sim_{i:06d}",
                 "--ref", f"karman-fdt-hires-testset/sim_{i:06d}",
                 "--ref-offset", "1000", "--scale", "4", "--steps", str(steps)],
                os.path.join(RES, f"{prefix}_{tag}_re{re}.json"))


def b_eval(tag: str, rundir: str) -> None:
    for i in range(5):
        seed = 100 + i
        run_one(
            ["--run", f"{rundir}/sim_{i:06d}",
             "--ref", f"burgers-fdt-hires-testset/sim_{i:06d}",
             "--ref-offset", "0", "--scale", "4", "--steps", "199",
             "--field", "velTf"],
            os.path.join(RES, f"eval_burgers_{tag}_seed{seed}.json"))


def main() -> None:
    os.chdir(REPO)
    mode, tag, rundir = sys.argv[1], sys.argv[2], sys.argv[3]
    assert jax.default_backend() == "cpu", jax.default_backend()
    {"k_eval": k_eval, "b_eval": b_eval}[mode](tag, rundir)


if __name__ == "__main__":
    main()
