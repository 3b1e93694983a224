"""Masked Poisson solve and pressure projection (make_incompressible).

This is the TPU-native replacement for PhiFlow's pressure solver *and* its
optional native CUDA solver (`phi.tf.tf_cuda_pressuresolver.CUDASolver`,
enabled via --cuda at /root/reference/karman-2d/karman_train.py:23,51).
Call-site semantics: `fluid.make_incompressible(velocity, obstacles)`
(/root/reference/karman-2d-phi2/karman.py:103-104) and standalone
`divergence_free(velocity, domain, obstacles, ...)`
(/root/reference/karman-2d/karman_pre.py:375).

Design: matrix-free conjugate gradient on the masked 5-point Poisson operator
(`ops.stencils.masked_laplacian`), run under `lax.custom_linear_solve` so the
backward pass is an *adjoint solve with the same operator* (symmetric PD),
never a backprop through CG iterations. A fused Pallas kernel backend
(`ops.pallas.cg`) runs the whole CG loop in VMEM on TPU.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from solver_in_the_loop_tpu.core.grids import Domain, StaggeredGrid
from solver_in_the_loop_tpu.ops.stencils import divergence, masked_laplacian, pressure_gradient


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ProjectionMasks:
    """Precomputed accessibility masks for a domain with obstacles.

    fluid  (1, Y, X):   1 where the cell is fluid (outside all obstacles)
    face_u (1, Y, X+1): 1 where flow may cross the u-face (both neighbour cells
                        fluid; domain-edge faces are 1 for OPEN boundaries)
    face_v (1, Y+1, X): likewise for v-faces
    """

    fluid: jnp.ndarray
    face_u: jnp.ndarray
    face_v: jnp.ndarray

    def tree_flatten(self):
        return (self.fluid, self.face_u, self.face_v), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


def masks_from_fluid_cells(fluid: jnp.ndarray, domain: Domain) -> ProjectionMasks:
    """Build face masks from a (1, Y, X) fluid-cell indicator.

    OPEN boundaries treat the outside as accessible fluid with Dirichlet p=0
    ghosts; PERIODIC wraps neighbours.
    """
    mode = "wrap" if domain.periodic else "constant"
    fx = jnp.pad(fluid, ((0, 0), (0, 0), (1, 1)), mode=mode, **(
        {"constant_values": 1.0} if mode == "constant" else {}))
    fy = jnp.pad(fluid, ((0, 0), (1, 1), (0, 0)), mode=mode, **(
        {"constant_values": 1.0} if mode == "constant" else {}))
    face_u = fx[:, :, 1:] * fx[:, :, :-1]
    face_v = fy[:, 1:, :] * fy[:, :-1, :]
    return ProjectionMasks(fluid=fluid, face_u=face_u, face_v=face_v)


def open_domain_masks(domain: Domain, fluid: Optional[jnp.ndarray] = None) -> ProjectionMasks:
    if fluid is None:
        fluid = jnp.ones((1,) + tuple(domain.resolution), jnp.float32)
    return masks_from_fluid_cells(fluid, domain)


def _mg_applicable(shape) -> bool:
    """MG pays off once the grid is big enough to need O(100+) CG iterations
    and can coarsen at least twice."""
    _, ny, nx = shape
    return min(ny, nx) >= 64 and ny % 4 == 0 and nx % 4 == 0


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-batch inner product over spatial axes: (B, Y, X) x 2 -> (B, 1, 1)."""
    return jnp.sum(a * b, axis=(1, 2), keepdims=True)


def cg_solve_info(
    matvec, b: jnp.ndarray, tol: float, max_iter: int,
    x0: Optional[jnp.ndarray] = None,
):
    """Batched matrix-free CG: solves matvec(x) = b per batch element.

    Returns (x, iterations). Stops when every batch element's residual norm
    falls below tol * ||b||, or at max_iter. `x0` warm-starts the iteration
    (consecutive solver steps have nearly identical pressure fields — the
    convergence threshold stays relative to ||b||, so a good x0 directly
    cuts the iteration count). Runs as a lax.while_loop with all state on
    device; tiny karman-scale systems are instead dispatched to the fused
    Pallas kernel by `solve_pressure` (ops/pallas/cg.py).
    """
    b_norm_sq = _dot(b, b)
    thresh = (tol * tol) * jnp.maximum(b_norm_sq, 1e-30)

    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b
        rs0 = b_norm_sq
    else:
        r0 = b - matvec(x0)
        rs0 = _dot(r0, r0)

    def cond(state):
        i, _x, _r, _p, rs = state
        return jnp.logical_and(i < max_iter, jnp.any(rs > thresh))

    def body(state):
        i, x, r, p, rs = state
        ap = matvec(p)
        p_ap = _dot(p, ap)
        alpha = rs / jnp.where(p_ap == 0, 1.0, p_ap)
        alpha = jnp.where(p_ap == 0, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = _dot(r, r)
        beta = rs_new / jnp.where(rs == 0, 1.0, rs)
        p = r + beta * p
        return (i + 1, x, r, p, rs_new)

    iters, x, _, _, _ = lax.while_loop(cond, body, (jnp.int32(0), x0, r0, r0, rs0))
    return x, iters


def cg_solve(
    matvec, b: jnp.ndarray, tol: float, max_iter: int,
    x0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    return cg_solve_info(matvec, b, tol, max_iter, x0)[0]


# ---------------------------------------------------------------------------
# Fast-diagonalization preconditioner (open boundaries).
#
# The obstacle-free part of the masked operator -div(grad p) with Dirichlet-0
# ghosts is separable: A0 = Ay (x) I + I (x) Ax, with Ay/Ax the 1-D Dirichlet
# Laplacians tridiag(-1, 2, -1). Eigendecomposing both (once per shape, at
# trace time) gives an EXACT inverse of A0 applied as four small dense
# matmuls — MXU work on TPU:
#     M^-1 r = Vy [ (Vy^T r Vx) / (ly + lx) ] Vx^T.
# Used as the SPD preconditioner in PCG for the full masked operator (the
# sphere obstacle touches ~5% of cells); measured on the real karman step
# sequence it cuts CG iterations 110 -> 23 cold and 28 -> 8 with the
# quadratic-extrapolation warm start (BENCH.md round 4). The cold win is what
# matters for the ADJOINT solves in training, which have no warm start.


@functools.lru_cache(maxsize=8)
def _fd_precon_np(ny: int, nx: int):
    def lap1d(n):
        a = 2.0 * np.eye(n)
        idx = np.arange(n - 1)
        a[idx, idx + 1] = a[idx + 1, idx] = -1.0
        return a

    ly, vy = np.linalg.eigh(lap1d(ny))
    lx, vx = np.linalg.eigh(lap1d(nx))
    inv_denom = 1.0 / (ly[:, None] + lx[None, :])
    return (vy.astype(np.float32), vx.astype(np.float32),
            inv_denom.astype(np.float32))


def fd_minv(ny: int, nx: int):
    """Return the fast-diagonalization preconditioner apply: (B, ny, nx) field
    -> (B, ny, nx), the exact obstacle-free -laplacian inverse."""
    vy, vx, inv_denom = (jnp.asarray(a) for a in _fd_precon_np(ny, nx))

    def minv(r):
        t = jnp.einsum("jy,bjx->byx", vy, r)
        t = jnp.einsum("byj,jx->byx", t, vx)
        t = t * inv_denom
        t = jnp.einsum("yj,bjx->byx", vy, t)
        return jnp.einsum("byj,xj->byx", t, vx)

    return minv


def pcg_solve_info(
    matvec, minv, b: jnp.ndarray, tol: float, max_iter: int,
    x0: Optional[jnp.ndarray] = None,
):
    """Preconditioned CG; same stopping rule as cg_solve_info (true residual
    norm vs tol * ||b||), so solutions are interchangeable with plain CG."""
    b_norm_sq = _dot(b, b)
    thresh = (tol * tol) * jnp.maximum(b_norm_sq, 1e-30)
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b
        rs0 = b_norm_sq
    else:
        r0 = b - matvec(x0)
        rs0 = _dot(r0, r0)
    z0 = minv(r0)
    rz0 = _dot(r0, z0)

    def cond(state):
        i, _x, _r, _p, _rz, rs = state
        return jnp.logical_and(i < max_iter, jnp.any(rs > thresh))

    def body(state):
        i, x, r, p, rz, _rs = state
        ap = matvec(p)
        p_ap = _dot(p, ap)
        alpha = jnp.where(p_ap == 0, 0.0, rz / jnp.where(p_ap == 0, 1.0, p_ap))
        x = x + alpha * p
        r = r - alpha * ap
        z = minv(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (i + 1, x, r, p, rz_new, _dot(r, r))

    iters, x, *_ = lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, z0, rz0, rs0))
    return x, iters


@partial(jax.jit, static_argnames=("periodic", "tol", "max_iter", "backend"))
def solve_pressure(
    div: jnp.ndarray,
    masks: ProjectionMasks,
    periodic: bool = False,
    tol: float = 1e-5,
    max_iter: int = 1000,
    backend: str = "auto",
    x0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Solve div(mask*grad(p)) = div on fluid cells (p = 0 in obstacles).

    Differentiable via lax.custom_linear_solve: the VJP solves the same SPD
    system (implicit-function adjoint), independent of the iteration count.

    x0 warm-starts the FORWARD solve only (consecutive solver steps in a
    rollout/unroll have nearly identical pressures, cutting the iteration
    count several-fold); it is stop_gradient'ed — the solution and its
    gradients are x0-independent (solved to the same tol-vs-||b|| threshold)
    — and the adjoint solve cold-starts, since its RHS is a cotangent with
    no relation to x0.
    """
    fluid = masks.fluid

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v, periodic=periodic)
        return jnp.where(fluid > 0, -lp, p)

    rhs = jnp.where(fluid > 0, -div, 0.0)
    if x0 is not None:
        # zero on solids so the warm residual respects A's identity block
        x0 = lax.stop_gradient(jnp.where(fluid > 0, x0, 0.0))

    use_pallas = False
    use_mg = backend == "mg"
    if backend == "pallas":
        use_pallas = True
    elif backend == "auto":
        from solver_in_the_loop_tpu.ops.pallas.cg import pallas_cg_available

        use_pallas = pallas_cg_available(rhs.shape, periodic)
        # large open-boundary grids: multigrid-preconditioned CG (near
        # resolution-independent iteration counts; see ops/multigrid.py)
        if not use_pallas and not periodic and _mg_applicable(rhs.shape):
            use_mg = True

    if use_pallas:
        from solver_in_the_loop_tpu.ops.pallas.cg import pallas_cg_solve

        def solve_fn(_mv, b, x0=None):
            return pallas_cg_solve(b, masks, tol=tol, max_iter=max_iter, x0=x0)
    elif use_mg:
        from solver_in_the_loop_tpu.core.grids import Boundary, Domain
        from solver_in_the_loop_tpu.ops.multigrid import build_mg_hierarchy, mg_pcg_solve

        _, ny, nx = rhs.shape
        dom = Domain((ny, nx), (float(ny), float(nx)), Boundary.OPEN)
        hierarchy = build_mg_hierarchy(masks, dom)

        def solve_fn(_mv, b, x0=None):
            return mg_pcg_solve(hierarchy, b, tol=tol, max_iter=max_iter, x0=x0)
    elif not periodic:
        # XLA path with the fast-diagonalization preconditioner: 110 -> 23
        # cold iterations on the karman operator (exact inverse of the
        # obstacle-free separable part; four small matmuls per iteration)
        minv = fd_minv(rhs.shape[1], rhs.shape[2])

        def solve_fn(mv, b, x0=None):
            return pcg_solve_info(mv, minv, b, tol=tol, max_iter=max_iter, x0=x0)[0]
    else:
        def solve_fn(mv, b, x0=None):
            return cg_solve(mv, b, tol=tol, max_iter=max_iter, x0=x0)

    if x0 is None:
        p = lax.custom_linear_solve(matvec, rhs, solve_fn, symmetric=True)
    else:
        p = lax.custom_linear_solve(
            matvec, rhs, partial(solve_fn, x0=x0),
            transpose_solve=solve_fn, symmetric=True,
        )
    # tag for remat policies: saving 'pressure' lets jax.checkpoint rematerialize
    # the cheap stencil work while never re-running the CG solve in backward
    return checkpoint_name(p, "pressure")


def pressure_solve_iterations(
    div: jnp.ndarray,
    masks: ProjectionMasks,
    periodic: bool = False,
    tol: float = 1e-5,
    max_iter: int = 1000,
    x0: Optional[jnp.ndarray] = None,
    precon: bool = False,
) -> jnp.ndarray:
    """Diagnostic (non-differentiable): the XLA CG/PCG iteration count this
    solve takes. Used by bench.py to report p50/p95 iterations cold vs warm
    (precon=True measures the FD-preconditioned path production uses for
    open boundaries)."""
    fluid = masks.fluid

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v, periodic=periodic)
        return jnp.where(fluid > 0, -lp, p)

    rhs = jnp.where(fluid > 0, -div, 0.0)
    if x0 is not None:
        x0 = jnp.where(fluid > 0, x0, 0.0)
    if precon and not periodic:
        minv = fd_minv(rhs.shape[1], rhs.shape[2])
        return pcg_solve_info(matvec, minv, rhs, tol=tol, max_iter=max_iter, x0=x0)[1]
    return cg_solve_info(matvec, rhs, tol=tol, max_iter=max_iter, x0=x0)[1]


def make_incompressible(
    velocity: StaggeredGrid,
    masks: ProjectionMasks,
    tol: float = 1e-5,
    max_iter: int = 1000,
    backend: str = "auto",
    p0: Optional[jnp.ndarray] = None,
):
    """Project a MAC velocity to a divergence-free field (PhiFlow parity).

    1. zero velocity on inaccessible faces (hard obstacle BCs)
    2. solve the masked Poisson system for pressure (warm-started from p0,
       typically the previous step's pressure)
    3. subtract the masked pressure gradient

    Returns (velocity, pressure).
    """
    dom = velocity.domain
    periodic = dom.periodic
    u = velocity.u * masks.face_u
    v = velocity.v * masks.face_v
    div = divergence(u, v)
    p = solve_pressure(div, masks, periodic=periodic, tol=tol, max_iter=max_iter,
                       backend=backend, x0=p0)
    gu, gv = pressure_gradient(p, periodic=periodic)
    u = u - gu * masks.face_u
    v = v - gv * masks.face_v
    return StaggeredGrid(u, v, dom), p
