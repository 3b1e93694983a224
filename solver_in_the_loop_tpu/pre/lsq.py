"""PRE correction solver: (constrained) least-squares fit of a lo-res
correction field to a hi-res velocity difference.

Reference math (/root/reference/karman-2d/karman_pre.py:232-332 and
/root/reference/burgers/burgers_pre.py:234-332), with W the hi-from-lo
bilinear face-interpolation matrix, G the masked cell->face difference
(gradient) matrix, M = W^T W + 2*beta*I, b = W^T v_hi + 2*beta*v_prev:

* burgers (unconstrained, burgers_pre.py:311-318):    solve M v = b
* karman (gradient-constrained, karman_pre.py:309-318):
      solve (G^T M^-1 G) X = G^T M^-1 b;   v = M^-1 (b - G X)
  which enforces G^T v = 0 (a discrete divergence-free constraint via
  Lagrange multipliers X on the fluid cells).

TPU-first re-design: the reference assembles scipy.sparse triplets in Python
loops under multiprocessing and inverts M explicitly. Here W is a *function*
(masked, weight-renormalized bilinear sampling at hi face positions), its
adjoint comes from jax.linear_transpose, and every solve is matrix-free
conjugate gradients on pytrees under jit — no sparse matrices, no host loops.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import Domain
from solver_in_the_loop_tpu.ops.interp import bilinear_sample

Vec = Dict[str, jnp.ndarray]  # {"u": (1, Y, X+1), "v": (1, Y+1, X)}


# --------------------------------------------------------------------------
# geometry masks (index conventions of fluidCellIndexes/fluidFaceIndexes,
# karman_pre.py:93-124: cells valid inside a boundary margin; a face is valid
# if either adjacent cell is, within the unit iteration margin)
# --------------------------------------------------------------------------

def _cell_mask(ny: int, nx: int, bnd: int) -> np.ndarray:
    m = np.zeros((1, ny, nx), np.float32)
    m[:, bnd : ny - bnd, bnd : nx - bnd] = 1.0
    return m


def _face_masks(cells: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """u faces (1, Y, X+1), v faces (1, Y+1, X) from a cell mask.

    Face (j, i) is valid if cell (j, i) or its west/south neighbour is valid,
    restricted to the reference's 1-cell iteration margin; the far edge
    column/row (no reference counterpart) stays invalid.
    """
    _, ny, nx = cells.shape
    fu = np.zeros((1, ny, nx + 1), np.float32)
    fv = np.zeros((1, ny + 1, nx), np.float32)
    c = cells[0]
    for j in range(1, ny - 1):
        for i in range(1, nx - 1):
            if c[j, i] > 0 or c[j, i - 1] > 0:
                fu[0, j, i] = 1.0
            if c[j, i] > 0 or c[j - 1, i] > 0:
                fv[0, j, i] = 1.0
    return fu, fv


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: ndarray fields
class PreGeometry:
    """Static masks + scale for one (lo, hi) domain pair."""

    lo: Domain
    hi: Domain
    scale: int
    lo_cells: np.ndarray
    lo_fu: np.ndarray
    lo_fv: np.ndarray
    hi_fu: np.ndarray
    hi_fv: np.ndarray


def build_pre_geometry(lo: Domain, hi: Domain, scale: int, bnd: int = 2) -> PreGeometry:
    lo_cells = _cell_mask(lo.ny, lo.nx, bnd)
    lo_fu, lo_fv = _face_masks(lo_cells)
    hi_cells = _cell_mask(hi.ny, hi.nx, bnd * scale)
    hi_fu, hi_fv = _face_masks(hi_cells)
    return PreGeometry(lo, hi, scale, lo_cells, lo_fu, lo_fv, hi_fu, hi_fv)


jax.tree_util.register_static(PreGeometry)


# --------------------------------------------------------------------------
# W: lo faces -> hi faces (masked, renormalized bilinear; fillMatW semantics,
# karman_pre.py:126-229)
# --------------------------------------------------------------------------

def _masked_interp(vals, mask, rows, cols):
    num = bilinear_sample(vals * mask, rows, cols)
    den = bilinear_sample(mask, rows, cols)
    return jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), 0.0)


def make_apply_w(geom: PreGeometry) -> Callable[[Vec], Vec]:
    s = float(geom.scale)
    hy, hx = geom.hi.ny, geom.hi.nx
    # u component: hi u-face (jj, ii) samples lo u at col ii/s, row (jj+.5)/s-.5
    jj_u = ((np.arange(hy) + 0.5) / s - 0.5)[None, :, None]
    ii_u = (np.arange(hx + 1) / s)[None, None, :]
    rows_u = jnp.asarray(np.broadcast_to(jj_u, (1, hy, hx + 1)), jnp.float32)
    cols_u = jnp.asarray(np.broadcast_to(ii_u, (1, hy, hx + 1)), jnp.float32)
    # v component: hi v-face (jj, ii) samples lo v at col (ii+.5)/s-.5, row jj/s
    jj_v = (np.arange(hy + 1) / s)[None, :, None]
    ii_v = ((np.arange(hx) + 0.5) / s - 0.5)[None, None, :]
    rows_v = jnp.asarray(np.broadcast_to(jj_v, (1, hy + 1, hx)), jnp.float32)
    cols_v = jnp.asarray(np.broadcast_to(ii_v, (1, hy + 1, hx)), jnp.float32)

    lo_fu = jnp.asarray(geom.lo_fu)
    lo_fv = jnp.asarray(geom.lo_fv)
    hi_fu = jnp.asarray(geom.hi_fu)
    hi_fv = jnp.asarray(geom.hi_fv)

    def apply_w(vec: Vec) -> Vec:
        u_hi = _masked_interp(vec["u"], lo_fu, rows_u, cols_u) * hi_fu
        v_hi = _masked_interp(vec["v"], lo_fv, rows_v, cols_v) * hi_fv
        return {"u": u_hi, "v": v_hi}

    return apply_w


def make_apply_g(geom: PreGeometry) -> Callable[[jnp.ndarray], Vec]:
    """G: cell scalars (1, Y, X) -> face vectors; row f(j,i) = +X[j,i] - X[west/south]
    over valid cells (karman_pre.py:276-307)."""
    cm = jnp.asarray(geom.lo_cells)
    fu = jnp.asarray(geom.lo_fu)
    fv = jnp.asarray(geom.lo_fv)

    def apply_g(x: jnp.ndarray) -> Vec:
        xm = x * cm
        own_u = jnp.pad(xm, ((0, 0), (0, 0), (0, 1)))   # cell (j, i) at u-face i
        west = jnp.pad(xm, ((0, 0), (0, 0), (1, 0)))    # cell (j, i-1)
        own_v = jnp.pad(xm, ((0, 0), (0, 1), (0, 0)))   # cell (j, i) at v-face j
        south = jnp.pad(xm, ((0, 0), (1, 0), (0, 0)))   # cell (j-1, i)
        return {"u": (own_u - west) * fu, "v": (own_v - south) * fv}

    return apply_g


# --------------------------------------------------------------------------
# pytree conjugate gradients
# --------------------------------------------------------------------------

def _tdot(a, b):
    leaves = jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(leaves)


def tree_cg(matvec, b, tol: float = 1e-6, max_iter: int = 2000, x0=None):
    """Matrix-free CG on arbitrary pytrees (SPD matvec). x0 warm-starts the
    iteration; the stopping threshold stays relative to ||b|| (so a good x0
    directly cuts iterations, ops/poisson.py cg_solve_info)."""
    bb = _tdot(b, b)
    thresh = (tol * tol) * jnp.maximum(bb, 1e-30)
    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
        r0 = b
        rs0 = bb
    else:
        r0 = jax.tree_util.tree_map(lambda bb_, aa: bb_ - aa, b, matvec(x0))
        rs0 = _tdot(r0, r0)

    def cond(state):
        i, _x, _r, _p, rs = state
        return jnp.logical_and(i < max_iter, rs > thresh)

    def body(state):
        i, x, r, p, rs = state
        ap = matvec(p)
        pap = _tdot(p, ap)
        safe = jnp.where(pap == 0, 1.0, pap)
        alpha = jnp.where(pap == 0, 0.0, rs / safe)
        x = jax.tree_util.tree_map(lambda xx, pp: xx + alpha * pp, x, p)
        r = jax.tree_util.tree_map(lambda rr, aa: rr - alpha * aa, r, ap)
        rs_new = _tdot(r, r)
        beta = rs_new / jnp.where(rs == 0, 1.0, rs)
        p = jax.tree_util.tree_map(lambda rr, pp: rr + beta * pp, r, p)
        return (i + 1, x, r, p, rs_new)

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, r0, r0, rs0))
    return x


def _ppcg(apply_m, project, b, tol: float, max_iter: int, x0=None):
    """Projected preconditioned CG (Gould/Hribar/Nocedal) for
    min 1/2 x^T M x - b^T x  s.t. G^T x = 0: the projection acts as the
    preconditioner (z = P r), search directions live in the constraint null
    space, and iterates stay feasible by construction — numerically robust
    where naive CG on P M P drifts off the subspace.

    x0 warm-starts the iteration; it is projected onto the feasible space
    first (PPCG preserves the start's constraint violation, so an unprojected
    x0 would leak it into the solution). The threshold stays pinned to the
    COLD initial energy <b, P b> so warm starts cut iterations rather than
    tightening the effective tolerance."""
    z_b = project(b)
    thresh = (tol * tol) * jnp.maximum(_tdot(b, z_b), 1e-30)
    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
        r0 = b
        z0 = z_b
    else:
        x0 = project(x0)
        r0 = jax.tree_util.tree_map(lambda bb_, aa: bb_ - aa, b, apply_m(x0))
        z0 = project(r0)
    rz0 = _tdot(r0, z0)

    def cond(state):
        i, _x, _r, _z, _p, rz = state
        # rz = r.z is the PPCG energy norm; it drops below 0 exactly when the
        # iteration reaches the f32 noise floor — iterating further corrupts
        # feasibility with noise-amplified directions, so the SIGNED test is
        # the convergence criterion
        return jnp.logical_and(i < max_iter, rz > thresh)

    def body(state):
        i, x, r, z, p, rz = state
        mp = apply_m(p)
        pmp_ = _tdot(p, mp)
        alpha = jnp.where(pmp_ == 0, 0.0, rz / jnp.where(pmp_ == 0, 1.0, pmp_))
        x = jax.tree_util.tree_map(lambda a, c: a + alpha * c, x, p)
        r = jax.tree_util.tree_map(lambda a, c: a - alpha * c, r, mp)
        z = project(r)
        rz_new = _tdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = jax.tree_util.tree_map(lambda zz, pp: zz + beta * pp, z, p)
        return (i + 1, x, r, z, p, rz_new)

    _, x, _, _, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, r0, z0, z0, rz0))
    return x


# --------------------------------------------------------------------------
# solvers
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("geom", "beta", "constrained", "tol", "max_iter"))
def solve_correction(
    geom: PreGeometry,
    vdiff_hi_u: jnp.ndarray,
    vdiff_hi_v: jnp.ndarray,
    prev_u: jnp.ndarray,
    prev_v: jnp.ndarray,
    beta: float,
    constrained: bool = True,
    tol: float = 1e-4,
    max_iter: int = 600,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # defaults: tol^2-relative stopping must stay above the f32 noise floor
    # (tol 1e-4 -> 1e-8 relative residual, comparable to the reference's scipy
    # CG defaults); tighter tolerances silently run every solve to max_iter.
    """Returns (corr_u, corr_v) on the lo grid (zero outside valid faces)."""
    apply_w = make_apply_w(geom)
    lo_fu = jnp.asarray(geom.lo_fu)
    lo_fv = jnp.asarray(geom.lo_fv)
    hi_fu = jnp.asarray(geom.hi_fu)
    hi_fv = jnp.asarray(geom.hi_fv)

    example_lo = {"u": jnp.zeros_like(prev_u), "v": jnp.zeros_like(prev_v)}
    wt = jax.linear_transpose(apply_w, example_lo)

    vh = {"u": vdiff_hi_u * hi_fu, "v": vdiff_hi_v * hi_fv}
    prev = {"u": prev_u * lo_fu, "v": prev_v * lo_fv}

    two_beta = 2.0 * beta
    ridge = two_beta if beta > 0 else 1e-6  # tiny ridge keeps beta=0 (PRE-SR) SPD

    def apply_m(x: Vec) -> Vec:
        x = {"u": x["u"] * lo_fu, "v": x["v"] * lo_fv}
        (wtw,) = wt(apply_w(x))
        return jax.tree_util.tree_map(
            lambda a, b_, m: (a + ridge * b_) * m, wtw, x, {"u": lo_fu, "v": lo_fv}
        )

    (wt_vh,) = wt(vh)
    b = jax.tree_util.tree_map(
        lambda a, p, m: (a + two_beta * p) * m, wt_vh, prev, {"u": lo_fu, "v": lo_fv}
    )

    if not constrained:
        # warm-start from the previous frame's correction (it is also the
        # temporal-regularizer target, so it is close to the new solution)
        vl = tree_cg(apply_m, b, tol=tol, max_iter=max_iter, x0=prev)
    else:
        # Projected CG: solve P M P x = P b on the G^T x = 0 subspace, where
        # P v = v - G (G^T G)^-1 G^T v. Equivalent to the reference's Lagrange
        # construction (karman_pre.py:309-318: M v + G lambda = b, G^T v = 0)
        # but ~20x cheaper: M is well-conditioned (W^T W + ridge), so the
        # outer CG needs tens of iterations, and each projection is one small
        # masked-Poisson solve (G^T G is a masked 5-point laplacian on cells)
        # instead of an M^-1 solve inside an ill-conditioned G^T M^-1 G system.
        apply_g = make_apply_g(geom)
        cm = jnp.asarray(geom.lo_cells)
        gt = jax.linear_transpose(apply_g, jnp.zeros_like(cm))

        def gtg(x: jnp.ndarray) -> jnp.ndarray:
            (out,) = gt(apply_g(x * cm))
            return jnp.where(cm > 0, out, x)

        def project(v: Vec) -> Vec:
            (gtv,) = gt(v)
            # inner Poisson solve: CG converges in O(grid diameter) iterations
            p = tree_cg(gtg, gtv * cm, tol=tol, max_iter=min(max_iter, 300))
            gp = apply_g(p)
            return jax.tree_util.tree_map(lambda a, g_: a - g_, v, gp)

        # prev is the previous frame's projected-CG output, so it satisfies
        # the constraint to solve tolerance — a valid PPCG warm start
        vl = _ppcg(apply_m, project, b, tol=tol, max_iter=max_iter, x0=prev)

    return vl["u"] * lo_fu, vl["v"] * lo_fv
