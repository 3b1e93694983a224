"""Fused Pallas CG kernel vs the XLA while_loop CG (interpret mode on CPU).

CG is deterministic: truncated at the same iteration count from the same
start, the fused kernel and the XLA loop must produce the same iterate — so a
small max_iter keeps interpret mode fast while still checking every part of
the kernel (masked operator, dots, alpha/beta updates, convergence test).
"""

import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import Boundary, Domain
from solver_in_the_loop_tpu.ops.pallas.cg_kernel import fused_cg_solve
from solver_in_the_loop_tpu.ops.poisson import cg_solve, masks_from_fluid_cells
from solver_in_the_loop_tpu.ops.stencils import masked_laplacian
from solver_in_the_loop_tpu.physics.geometry import sphere_fluid_mask


def test_fused_cg_matches_xla_cg_truncated():
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (4.0, 4.0), 1.5)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(0)
    div = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    rhs = jnp.where(fluid > 0, -div, 0.0)

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v)
        return jnp.where(fluid > 0, -lp, p)

    for iters in (5, 40):
        p_ref = cg_solve(matvec, rhs, tol=1e-12, max_iter=iters)
        p_pal = fused_cg_solve(
            rhs, masks.fluid, masks.face_u, masks.face_v,
            tol=1e-12, max_iter=iters, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref), rtol=2e-4, atol=2e-4)


def test_fused_cg_converges():
    """40 iters on an 8x8 open box: residual should be tiny."""
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    fluid = jnp.ones((1, 8, 8), jnp.float32)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(1)
    rhs = jnp.asarray(rng.randn(1, 8, 8).astype(np.float32))
    x = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                       tol=1e-8, max_iter=80, interpret=True)
    lp = masked_laplacian(x, masks.face_u, masks.face_v)
    residual = rhs - (-lp)
    assert float(jnp.max(jnp.abs(residual))) < 1e-3


def test_fused_cg_batched_matches_grid_variant():
    """The single-instance batched kernel and the per-element grid kernel are
    the same CG (identical iterates when truncated at the same count)."""
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (4.0, 4.0), 1.5)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(7)
    rhs = jnp.where(fluid > 0, jnp.asarray(rng.randn(3, 8, 8).astype(np.float32)), 0.0)
    a = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                       tol=1e-10, max_iter=60, interpret=True, batched=True)
    b = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                       tol=1e-10, max_iter=60, interpret=True, batched=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_fused_cg_warm_start():
    """x0 = the converged solution => the kernel returns it (near) unchanged;
    a perturbed x0 still converges to the cold solution."""
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    fluid = jnp.ones((1, 8, 8), jnp.float32)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(9)
    rhs = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    cold = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                          tol=1e-8, max_iter=120, interpret=True)
    warm = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                          tol=1e-8, max_iter=120, interpret=True,
                          x0=cold + 0.01 * jnp.asarray(rng.randn(2, 8, 8).astype(np.float32)))
    np.testing.assert_allclose(np.asarray(warm), np.asarray(cold), atol=1e-3)


def test_fused_cg_folded_batch5_nonsquare():
    """Lane-folded batched kernel at batch 5 on a non-square grid (B*W spills
    past one 128-lane tile on real hardware; interpret mode checks the
    block-mask/segment-sum algebra at that shape)."""
    dom = Domain((16, 8), (16.0, 8.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (8.0, 4.0), 2.0)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(1)
    rhs = jnp.where(fluid > 0, jnp.asarray(rng.randn(5, 16, 8).astype(np.float32)), 0.0)

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v)
        return jnp.where(fluid > 0, -lp, p)

    p_ref = cg_solve(matvec, rhs, tol=1e-10, max_iter=300)
    p_fold = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                            tol=1e-10, max_iter=300, interpret=True, batched=True)
    np.testing.assert_allclose(np.asarray(p_fold), np.asarray(p_ref), atol=2e-4)


def test_fused_cg_batched_b1_uses_grid_path():
    """At batch 1 folding is pure overhead; batched=True must fall through to
    the per-element grid kernel and still solve correctly."""
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (4.0, 4.0), 1.5)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(2)
    rhs = jnp.where(fluid > 0, jnp.asarray(rng.randn(1, 8, 8).astype(np.float32)), 0.0)

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v)
        return jnp.where(fluid > 0, -lp, p)

    p_ref = cg_solve(matvec, rhs, tol=1e-10, max_iter=200)
    p_b = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                         tol=1e-10, max_iter=200, interpret=True, batched=True)
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_ref), atol=2e-4)


def test_fused_pcg_folded_matches_plain():
    """FD-preconditioned folded kernel converges to the same solution as the
    plain folded kernel (both solve to a tight tolerance)."""
    dom = Domain((16, 8), (16.0, 8.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (8.0, 4.0), 2.0)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(3)
    rhs = jnp.where(fluid > 0, jnp.asarray(rng.randn(3, 16, 8).astype(np.float32)), 0.0)
    plain = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                           tol=1e-9, max_iter=400, interpret=True, batched=True)
    pcg = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                         tol=1e-9, max_iter=400, interpret=True, batched=True,
                         precon=True)
    np.testing.assert_allclose(np.asarray(pcg), np.asarray(plain), atol=2e-4)


def test_fused_pcg_grid_variant_and_warm_start():
    """Per-element PCG kernel (batch-1 fallthrough) solves correctly, cold and
    with a perturbed warm start."""
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (4.0, 4.0), 1.5)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(5)
    rhs = jnp.where(fluid > 0, jnp.asarray(rng.randn(1, 8, 8).astype(np.float32)), 0.0)

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v)
        return jnp.where(fluid > 0, -lp, p)

    p_ref = cg_solve(matvec, rhs, tol=1e-10, max_iter=200)
    cold = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                          tol=1e-9, max_iter=200, interpret=True, batched=True,
                          precon=True)
    np.testing.assert_allclose(np.asarray(cold), np.asarray(p_ref), atol=2e-4)
    warm = fused_cg_solve(rhs, masks.fluid, masks.face_u, masks.face_v,
                          tol=1e-9, max_iter=200, interpret=True, batched=True,
                          precon=True,
                          x0=cold + 0.01 * jnp.asarray(rng.randn(1, 8, 8).astype(np.float32)))
    np.testing.assert_allclose(np.asarray(warm), np.asarray(cold), atol=1e-3)


def test_vmem_gate_rejects_hires_batched_pcg(monkeypatch):
    """Round-5 regression: the (6, 256, 128) hi-res karman-gen batch passed
    the old 8-buffer VMEM model (6.3MB) but the batched+FD-PCG variant
    actually compiled to a 17.73M scoped allocation and crashed Mosaic
    (runs/logs/k_gen_train.log). The gate must size the variant that
    pallas_cg_solve would dispatch and reject it; training shapes stay in."""
    from solver_in_the_loop_tpu.ops.pallas import cg as cgmod

    monkeypatch.setattr(cgmod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("SILT_PALLAS_BATCHED", "1")
    monkeypatch.setenv("SILT_PALLAS_FDPCG", "1")
    assert not cgmod.pallas_cg_available((6, 256, 128), periodic=False)
    assert cgmod.pallas_cg_available((3, 64, 32), periodic=False)
    assert cgmod.pallas_cg_available((8, 64, 32), periodic=False)
    # estimate model stays conservative vs the one hardware-measured point
    assert cgmod._vmem_estimate((6, 256, 128), True, True) >= int(17.73 * 2**20)
