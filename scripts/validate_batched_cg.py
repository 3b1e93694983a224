"""Real-TPU validation + A/B timing for the batched fused Pallas CG kernel.

Run ONLY when the TPU is free (one process at a time — CLAUDE.md):

    python scripts/validate_batched_cg.py

Checks Mosaic compiles the 2-D batch-folded single-instance kernel
(ops/pallas/cg_kernel._cg_kernel_folded) at the karman training shapes,
compares its solution against the per-element grid kernel and the XLA CG,
and times both variants. On PASS it drops the artifacts/perf/batched_cg_ok
marker, which ops/pallas/cg.py reads at dispatch time to enable the batched
kernel in production (override either way with SILT_PALLAS_BATCHED=0/1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# ^ running `python scripts/x.py` puts scripts/ (not the repo root) on
# sys.path — this exact miss produced round 2's broken eval artifact

import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from solver_in_the_loop_tpu.ops.pallas.cg_kernel import fused_cg_solve
    from solver_in_the_loop_tpu.ops.poisson import cg_solve, masks_from_fluid_cells
    from solver_in_the_loop_tpu.ops.stencils import masked_laplacian
    from solver_in_the_loop_tpu.physics.geometry import sphere_fluid_mask
    from solver_in_the_loop_tpu.physics.karman import karman_domain

    assert jax.default_backend() == "tpu", jax.default_backend()
    dom = karman_domain(32)  # 64x32 training grid
    fluid = sphere_fluid_mask(dom, (50.0, 50.0), 10.0)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(0)
    rhs = jnp.where(fluid > 0, jnp.asarray(rng.randn(3, 64, 32).astype(np.float32)), 0.0)

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v)
        return jnp.where(fluid > 0, -lp, p)

    x_ref = cg_solve(matvec, rhs, tol=1e-6, max_iter=1000)

    results = {}
    for batched in (False, True):
        fn = jax.jit(lambda b, bt=batched: fused_cg_solve(
            b, masks.fluid, masks.face_u, masks.face_v,
            tol=1e-6, max_iter=1000, batched=bt))
        x = fn(rhs)  # compile (Mosaic check for batched=True)
        jax.block_until_ready(x)
        err = float(jnp.max(jnp.abs(x - x_ref)))
        t0 = time.perf_counter()
        for _ in range(50):
            x = fn(rhs)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / 50
        results[batched] = (err, dt)
        print(f"batched={batched}: max|err vs XLA|={err:.2e}  {dt*1e3:.3f} ms/solve")

    assert results[True][0] < 1e-3, results
    speedup = results[False][1] / results[True][1]
    print(f"batched kernel speedup at batch 3: {speedup:.2f}x")
    if speedup < 1.05:
        print("NO-GO — numerically correct but not faster than the grid "
              "kernel; leaving batched dispatch disabled")
        return
    marker = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "artifacts", "perf", "batched_cg_ok")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        f.write(f"err={results[True][0]:.3e} ms={results[True][1]*1e3:.3f} "
                f"speedup={speedup:.2f}x\n")
    print(f"PASS — wrote {marker}; batched dispatch now enabled "
          "(ops/pallas/cg.py _batched_enabled)")


if __name__ == "__main__":
    main()
