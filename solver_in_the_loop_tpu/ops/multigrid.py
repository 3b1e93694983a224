"""Geometric multigrid preconditioner for the masked Poisson solve.

Plain CG iteration counts on the 256x128 hi-res karman grid run into the
hundreds per projection (condition number grows with N^2); a V-cycle
preconditioner restores near-resolution-independent convergence. This is the
hi-res counterpart of the fused Pallas CG used at training resolution (the
data-generation pipeline, karman.py:149-165, spends most of its device time in
the projection).

Design: damped-Jacobi smoothing on the masked operator at every level, 2x
full-weighting restriction of fluid masks and residuals, bilinear-ish
prolongation; all levels' masks precomputed once per geometry. The V-cycle is
symmetric (equal pre/post smoothing), so it is a valid PCG preconditioner.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
from jax import lax

from solver_in_the_loop_tpu.ops.poisson import ProjectionMasks, masks_from_fluid_cells
from solver_in_the_loop_tpu.ops.stencils import masked_laplacian
from solver_in_the_loop_tpu.core.grids import Domain, Boundary


@dataclasses.dataclass(frozen=True, eq=False)
class MgLevel:
    masks: ProjectionMasks
    diag: jnp.ndarray  # A's diagonal: sum of face masks per cell (1 on solids)


@dataclasses.dataclass(frozen=True, eq=False)
class MgHierarchy:
    levels: List[MgLevel]
    smooth_iters: int
    omega: float


# note: hierarchies are built and consumed inside a single trace (plain Python
# containers of traced arrays) — they are not pytree-registered on purpose


def _level_diag(masks: ProjectionMasks) -> jnp.ndarray:
    d = (
        masks.face_u[:, :, 1:] + masks.face_u[:, :, :-1]
        + masks.face_v[:, 1:, :] + masks.face_v[:, :-1, :]
    )
    return jnp.where(masks.fluid > 0, jnp.maximum(d, 1e-6), 1.0)


def build_mg_hierarchy(
    masks: ProjectionMasks,
    domain: Domain,
    min_size: int = 8,
    smooth_iters: int = 2,
    omega: float = 0.8,
) -> MgHierarchy:
    assert not domain.periodic, "MG preconditioner supports OPEN domains"
    levels = [MgLevel(masks, _level_diag(masks))]
    fluid = masks.fluid
    ny, nx = fluid.shape[1:]
    while ny % 2 == 0 and nx % 2 == 0 and min(ny, nx) > min_size:
        # coarse cell is fluid if ANY child is (keeps narrow channels open)
        f = fluid.reshape(1, ny // 2, 2, nx // 2, 2).max(axis=(2, 4))
        coarse_dom = Domain((ny // 2, nx // 2), domain.size, Boundary.OPEN)
        m = masks_from_fluid_cells(f, coarse_dom)
        levels.append(MgLevel(m, _level_diag(m)))
        fluid = f
        ny, nx = ny // 2, nx // 2
    return MgHierarchy(levels, smooth_iters, omega)


def _apply_a(level: MgLevel, p: jnp.ndarray) -> jnp.ndarray:
    lp = masked_laplacian(p, level.masks.face_u, level.masks.face_v)
    return jnp.where(level.masks.fluid > 0, -lp, p)


def _smooth(level: MgLevel, x: jnp.ndarray, b: jnp.ndarray, iters: int, omega: float):
    def body(_, x):
        r = b - _apply_a(level, x)
        return x + omega * r / level.diag

    return lax.fori_loop(0, iters, body, x)


def _restrict(r: jnp.ndarray) -> jnp.ndarray:
    b, ny, nx = r.shape
    return r.reshape(b, ny // 2, 2, nx // 2, 2).sum(axis=(2, 4))


def _prolong(e: jnp.ndarray) -> jnp.ndarray:
    b, ny, nx = e.shape
    return jnp.repeat(jnp.repeat(e, 2, axis=1), 2, axis=2)


def v_cycle(h: MgHierarchy, b: jnp.ndarray, level: int = 0) -> jnp.ndarray:
    lvl = h.levels[level]
    x = jnp.zeros_like(b)
    x = _smooth(lvl, x, b, h.smooth_iters, h.omega)
    if level + 1 < len(h.levels):
        r = b - _apply_a(lvl, x)
        rc = _restrict(r) * jnp.where(h.levels[level + 1].masks.fluid > 0, 1.0, 0.0)
        ec = v_cycle(h, rc, level + 1)
        x = x + _prolong(ec) * jnp.where(lvl.masks.fluid > 0, 1.0, 0.0)
        x = _smooth(lvl, x, b, h.smooth_iters, h.omega)
    else:
        x = _smooth(lvl, x, b, 8, h.omega)  # extra smoothing as coarse solve
    return x


def mg_pcg_solve(
    h: MgHierarchy,
    b: jnp.ndarray,
    tol: float = 1e-5,
    max_iter: int = 200,
    x0=None,
) -> jnp.ndarray:
    """Preconditioned CG with the V-cycle as M^-1 (per-batch convergence).

    x0 warm-starts the iteration; the tol threshold stays relative to ||b||
    (see ops/poisson.py cg_solve_info)."""
    def dot(a, c):
        return jnp.sum(a * c, axis=(1, 2), keepdims=True)

    bb = dot(b, b)
    thresh = (tol * tol) * jnp.maximum(bb, 1e-30)
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        r0 = b - _apply_a(h.levels[0], x0)
    z0 = v_cycle(h, r0)
    rz0 = dot(r0, z0)

    def cond(state):
        i, _x, r, _z, _p, _rz = state
        return jnp.logical_and(i < max_iter, jnp.any(dot(r, r) > thresh))

    def body(state):
        i, x, r, z, p, rz = state
        ap = _apply_a(h.levels[0], p)
        pap = dot(p, ap)
        alpha = jnp.where(pap == 0, 0.0, rz / jnp.where(pap == 0, 1.0, pap))
        x = x + alpha * p
        r = r - alpha * ap
        z = v_cycle(h, r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (i + 1, x, r, z, p, rz_new)

    _, x, _, _, _, _ = lax.while_loop(cond, body, (jnp.int32(0), x0, r0, z0, z0, rz0))
    return x
