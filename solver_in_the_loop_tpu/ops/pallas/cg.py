"""Fused Pallas TPU conjugate-gradient kernel for the masked Poisson solve.

The native-component replacement for PhiFlow's CUDA pressure solver
(/root/reference/karman-2d/karman_train.py:51): the entire CG iteration loop
runs inside one Pallas kernel with every vector resident in VMEM, eliminating
per-iteration dispatch overhead of the op-by-op while_loop path.

Enabled automatically by ops.poisson.solve_pressure for problem sizes that fit
VMEM; falls back to the pure-XLA CG otherwise.
"""

from __future__ import annotations

import os

import jax

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # of the ~16MB scoped-vmem limit
# Live (H, B*W) field buffers at the loop's peak: 8 kernel operands
# (b, x0, fluid, me/mw/mn/ms, diag) + output x + loop state (r, pv) + the
# body's temporaries (ap, the 4 neighbour rolls, and the preconditioner's
# z / matmul intermediates). 16 matched hardware: the (6, 256, 128) hi-res
# karman-gen batch compiled to a 17.73M scoped allocation (round-5 queue,
# runs/logs/k_gen_train.log) where this model predicts 20.2M — the old
# 8-buffer model predicted 6.3M and let the compile crash the stage.
_NUM_CG_BUFFERS = 16


def _vmem_estimate(shape, batched: bool, precon: bool) -> int:
    """Bytes of VMEM the selected fused_cg_solve variant keeps live (f32)."""
    b, h, w = shape
    field = h * w * 4
    if batched and b > 1:
        bw = b * w
        total = _NUM_CG_BUFFERS * b * field
        total += bw * bw * 4  # block-diagonal segment-sum ones matrix
        if precon:
            total += 2 * bw * bw * 4  # bx, bx.T = kron(I_B, Vx)
            total += 2 * h * h * 4    # vy, vy.T
            total += b * field        # invd tiled across the batch
        return total
    # per-element grid: one batch block resident at a time
    total = _NUM_CG_BUFFERS * field
    if precon:
        total += 2 * h * h * 4 + 2 * w * w * 4 + field
    return total


def pallas_cg_available(shape, periodic: bool) -> bool:
    """Whether the fused kernel supports this problem on the current backend.

    Sizes the variant that pallas_cg_solve would actually dispatch
    (batched/preconditioned per the hardware-validation markers), so e.g.
    hi-res data generation (batch 6 at 256x128) falls back to the multigrid
    path instead of failing the Mosaic compile on scoped-vmem OOM."""
    if jax.default_backend() != "tpu":
        return False
    if periodic:
        return False  # open-boundary karman is the only projection user today
    est = _vmem_estimate(shape, _batched_enabled(), _fdpcg_enabled())
    return est < _VMEM_BUDGET_BYTES


# The batched single-instance kernel cuts the sequential CG chain ~Bx on the
# single-TensorCore chip (see cg_kernel.fused_cg_solve). It is interpret-mode
# verified; production dispatch is gated on a real-hardware Mosaic compile
# check (scripts/validate_batched_cg.py, run when the TPU is free) because a
# mid-queue compile failure would sink the round's workload runs.
def _batched_enabled() -> bool:
    """Read at call time so drivers that import early can still toggle it
    (ADVICE r3 item 2); also honors the hardware-validation marker dropped by
    scripts/validate_batched_cg.py."""
    v = os.environ.get("SILT_PALLAS_BATCHED")
    if v is not None:
        return v == "1"
    return os.path.exists(
        os.path.join(os.path.dirname(__file__), "..", "..", "..",
                     "artifacts", "perf", "batched_cg_ok"))


def _fdpcg_enabled() -> bool:
    """Fast-diagonalization preconditioning inside the fused kernel (MXU
    matmuls in the CG loop). Same gating discipline as the batched kernel:
    env override, else a hardware-validation marker dropped by
    scripts/validate_fd_pcg.py after a real-TPU compile+correctness check."""
    v = os.environ.get("SILT_PALLAS_FDPCG")
    if v is not None:
        return v == "1"
    return os.path.exists(
        os.path.join(os.path.dirname(__file__), "..", "..", "..",
                     "artifacts", "perf", "fd_pcg_ok"))


def pallas_cg_solve(b, masks, tol: float, max_iter: int, x0=None):
    """Solve the masked Poisson system with the fused kernel. See cg_kernel.py."""
    from solver_in_the_loop_tpu.ops.pallas.cg_kernel import fused_cg_solve

    return fused_cg_solve(b, masks.fluid, masks.face_u, masks.face_v,
                          tol=tol, max_iter=max_iter, x0=x0,
                          batched=_batched_enabled(),
                          precon=_fdpcg_enabled())
