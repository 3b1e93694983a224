"""Multigrid-preconditioned CG vs plain CG on the masked Poisson system."""

import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import Boundary, Domain
from solver_in_the_loop_tpu.ops.multigrid import build_mg_hierarchy, mg_pcg_solve, v_cycle
from solver_in_the_loop_tpu.ops.poisson import (
    masks_from_fluid_cells,
    solve_pressure,
)
from solver_in_the_loop_tpu.physics.geometry import sphere_fluid_mask


def _setup(n=64):
    dom = Domain((n, n // 2), (float(n), float(n // 2)), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (n / 2.0, n / 4.0), n / 8.0)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(0)
    div = jnp.asarray(rng.randn(2, n, n // 2).astype(np.float32))
    return dom, masks, div


def test_mg_matches_plain_cg():
    dom, masks, div = _setup(64)
    p_cg = solve_pressure(div, masks, tol=1e-8, max_iter=8000, backend="xla")
    p_mg = solve_pressure(div, masks, tol=1e-8, max_iter=300, backend="mg")
    np.testing.assert_allclose(np.asarray(p_mg), np.asarray(p_cg), atol=2e-3)


def test_mg_converges_fast():
    """The V-cycle must cut the iteration count: 30 PCG iterations should hit
    a residual plain CG needs hundreds for."""
    dom, masks, div = _setup(64)
    h = build_mg_hierarchy(masks, dom)
    rhs = jnp.where(masks.fluid > 0, -div, 0.0)
    x = mg_pcg_solve(h, rhs, tol=1e-7, max_iter=30)
    from solver_in_the_loop_tpu.ops.stencils import masked_laplacian

    ax = jnp.where(masks.fluid > 0, -masked_laplacian(x, masks.face_u, masks.face_v), x)
    rel = float(jnp.linalg.norm(rhs - ax) / jnp.linalg.norm(rhs))
    assert rel < 1e-4, rel


def test_vcycle_reduces_residual():
    dom, masks, div = _setup(32)
    h = build_mg_hierarchy(masks, dom)
    rhs = jnp.where(masks.fluid > 0, -div, 0.0)
    x = v_cycle(h, rhs)
    from solver_in_the_loop_tpu.ops.stencils import masked_laplacian

    ax = jnp.where(masks.fluid > 0, -masked_laplacian(x, masks.face_u, masks.face_v), x)
    r1 = float(jnp.linalg.norm(rhs - ax))
    assert r1 < float(jnp.linalg.norm(rhs))


def test_hierarchy_depth():
    dom, masks, _ = _setup(64)
    h = build_mg_hierarchy(masks, dom)
    assert len(h.levels) >= 3
    assert h.levels[-1].masks.fluid.shape[1] >= 8
