"""Real-TPU validation + A/B timing for FD-preconditioned fused Pallas CG.

Run ONLY when the TPU is free (one process at a time — CLAUDE.md):

    python scripts/validate_fd_pcg.py

Checks Mosaic compiles the preconditioned kernels (MXU matmuls inside the CG
while_loop: ops/pallas/cg_kernel._pcg_kernel_folded/_pcg_kernel) at the
karman training shapes, compares solutions against the XLA CG, and times
plain vs preconditioned variants cold and with the quadratic-extrapolation
warm start the production step uses. On PASS it drops the
artifacts/perf/fd_pcg_ok marker, which ops/pallas/cg.py reads at dispatch
time (override either way with SILT_PALLAS_FDPCG=0/1).

CPU-measured iteration counts (scripts/proto_fd_pcg.py, real karman step
sequence): cold 110 -> 23, extrapolated-warm 28 -> 8. The cold gain is what
the ADJOINT solves in training see — they have no warm start.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    # the production warm start is a quadratic extrapolation of previous
    # pressures; emulate its quality with a small perturbation of the solution
    x0_warm = x_ref + 0.03 * jnp.asarray(rng.randn(3, 64, 32).astype(np.float32))
    x0_warm = jnp.where(fluid > 0, x0_warm, 0.0)

    results = {}
    for precon in (False, True):
        for tag, x0 in (("cold", None), ("warm", x0_warm)):
            fn = jax.jit(lambda b, w, pc=precon, use_w=(x0 is not None): fused_cg_solve(
                b, masks.fluid, masks.face_u, masks.face_v,
                tol=1e-6, max_iter=1000, batched=True, precon=pc,
                x0=w if use_w else None))
            x = fn(rhs, x0_warm)  # compile (Mosaic check for precon=True)
            jax.block_until_ready(x)
            err = float(jnp.max(jnp.abs(x - x_ref)))
            t0 = time.perf_counter()
            for _ in range(50):
                x = fn(rhs, x0_warm)
            jax.block_until_ready(x)
            dt = (time.perf_counter() - t0) / 50
            results[(precon, tag)] = (err, dt)
            print(f"precon={precon} {tag}: max|err vs XLA|={err:.2e}  {dt*1e3:.3f} ms/solve")

    # batch-1 grid-path PCG kernel must also compile on hardware
    x1 = jax.jit(lambda b: fused_cg_solve(
        b[:1], masks.fluid, masks.face_u, masks.face_v,
        tol=1e-6, max_iter=1000, batched=True, precon=True))(rhs)
    jax.block_until_ready(x1)
    err1 = float(jnp.max(jnp.abs(x1 - x_ref[:1])))
    print(f"precon batch-1 grid path: max|err|={err1:.2e}")

    assert results[(True, "cold")][0] < 1e-3, results
    assert results[(True, "warm")][0] < 1e-3, results
    assert err1 < 1e-3
    speed_cold = results[(False, "cold")][1] / results[(True, "cold")][1]
    speed_warm = results[(False, "warm")][1] / results[(True, "warm")][1]
    print(f"FD-PCG speedup: cold {speed_cold:.2f}x, warm {speed_warm:.2f}x")
    if min(speed_cold, speed_warm) < 1.05:
        print("NO-GO — numerically correct but not faster; leaving FD-PCG "
              "dispatch disabled")
        return
    marker = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "artifacts", "perf", "fd_pcg_ok")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        f.write(f"err_cold={results[(True, 'cold')][0]:.3e} "
                f"ms_cold={results[(True, 'cold')][1]*1e3:.3f} "
                f"speedup_cold={speed_cold:.2f}x speedup_warm={speed_warm:.2f}x\n")
    print(f"PASS — wrote {marker}; FD-PCG dispatch now enabled "
          "(ops/pallas/cg.py _fdpcg_enabled)")


if __name__ == "__main__":
    main()
