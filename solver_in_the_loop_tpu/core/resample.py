"""Grid resampling: SMAC-aware down/upsampling and generic bilinear regridding.

Reference semantics pinned by call sites:
* centered 4x downsample = 2x2 mean applied twice
  (`math.downsample2x`, /root/reference/karman-2d/karman.py:66-67)
* staggered (SMAC) downsample2x: per component, take every 2nd face along the
  normal axis and average the 2 faces along the tangential axis
  (`StaggeredGrid(t).downsample2x()`, karman.py:69-70)
* staggered 4x upsample: linear interpolation at the fine face positions
  (scipy interp2d in the reference, /root/reference/karman-2d/karman_pre.py:69-85)
* centered upsample2x: linear interpolation (`math.upsample2x`, karman_pre.py:63-64)
"""

from __future__ import annotations

import jax.numpy as jnp

from solver_in_the_loop_tpu.core.grids import CenteredGrid, Domain, StaggeredGrid
from solver_in_the_loop_tpu.ops.interp import bilinear_sample


# --- centered ---------------------------------------------------------------

def downsample2x_centered(values: jnp.ndarray) -> jnp.ndarray:
    """(B, Y, X) -> (B, Y/2, X/2) by 2x2 mean."""
    b, y, x = values.shape
    return values.reshape(b, y // 2, 2, x // 2, 2).mean(axis=(2, 4))


def downsample_centered(values: jnp.ndarray, factor: int) -> jnp.ndarray:
    while factor > 1:
        values = downsample2x_centered(values)
        factor //= 2
    return values


def upsample2x_centered(values: jnp.ndarray) -> jnp.ndarray:
    """(B, Y, X) -> (B, 2Y, 2X), linear (0.75/0.25 weights, replicate edges)."""
    def up_axis(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        p = jnp.pad(
            a,
            [(1, 1) if ax == axis else (0, 0) for ax in range(a.ndim)],
            mode="edge",
        )
        lo = jnp.take(p, jnp.arange(a.shape[axis]), axis=axis)
        mid = jnp.take(p, jnp.arange(1, a.shape[axis] + 1), axis=axis)
        hi = jnp.take(p, jnp.arange(2, a.shape[axis] + 2), axis=axis)
        even = 0.25 * lo + 0.75 * mid
        odd = 0.75 * mid + 0.25 * hi
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(a.shape)
        new_shape[axis] *= 2
        return stacked.reshape(new_shape)

    return up_axis(up_axis(values, 1), 2)


def upsample_centered(values: jnp.ndarray, factor: int) -> jnp.ndarray:
    while factor > 1:
        values = upsample2x_centered(values)
        factor //= 2
    return values


# --- staggered (SMAC) -------------------------------------------------------

def downsample2x_staggered(u: jnp.ndarray, v: jnp.ndarray):
    """u (B, Y, X+1), v (B, Y+1, X) -> halved-resolution components.

    u_lo[j, i] = mean(u_hi[2j:2j+2, 2i]);  v_lo[j, i] = mean(v_hi[2j, 2i:2i+2]).
    """
    u_lo = 0.5 * (u[:, 0::2, ::2] + u[:, 1::2, ::2])
    v_lo = 0.5 * (v[:, ::2, 0::2] + v[:, ::2, 1::2])
    return u_lo, v_lo


def downsample_staggered(u: jnp.ndarray, v: jnp.ndarray, factor: int):
    while factor > 1:
        u, v = downsample2x_staggered(u, v)
        factor //= 2
    return u, v


def downsample_staggered_grid(grid: StaggeredGrid, factor: int, domain: Domain) -> StaggeredGrid:
    u, v = downsample_staggered(grid.u, grid.v, factor)
    return StaggeredGrid(u, v, domain)


def upsample2x_staggered(u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear upsampling of MAC components at the fine face positions.

    Matches the reference's interp2d construction (karman_pre.py:69-85): fine
    u-face (jh, ih) samples the coarse u field at index (y=jh/2 - 0.25 in
    coarse u rows, x=ih/2) — i.e. physical-position interpolation with
    replicate edges.
    """
    b, yu, xu1 = u.shape  # (B, Y, X+1)
    _, yv1, xv = v.shape  # (B, Y+1, X)
    y_hi, x_hi = 2 * yu, 2 * (xu1 - 1)

    # u on fine grid: rows are cell-centred (offset .5), cols face-aligned.
    jj = (jnp.arange(y_hi, dtype=u.dtype) + 0.5)[None, :, None] / 2.0 - 0.5
    ii = jnp.arange(x_hi + 1, dtype=u.dtype)[None, None, :] / 2.0
    u_hi = bilinear_sample(u, jnp.broadcast_to(jj, (b, y_hi, x_hi + 1)),
                           jnp.broadcast_to(ii, (b, y_hi, x_hi + 1)))

    jjv = jnp.arange(y_hi + 1, dtype=v.dtype)[None, :, None] / 2.0
    iiv = (jnp.arange(x_hi, dtype=v.dtype) + 0.5)[None, None, :] / 2.0 - 0.5
    v_hi = bilinear_sample(v, jnp.broadcast_to(jjv, (b, y_hi + 1, x_hi)),
                           jnp.broadcast_to(iiv, (b, y_hi + 1, x_hi)))
    return u_hi, v_hi


def upsample_staggered(u: jnp.ndarray, v: jnp.ndarray, factor: int):
    while factor > 1:
        u, v = upsample2x_staggered(u, v)
        factor //= 2
    return u, v


def resample_centered_grid(grid: CenteredGrid, dst: Domain) -> CenteredGrid:
    """Generic bilinear regrid of a centered field onto dst cell centers."""
    src = grid.domain
    b = grid.values.shape[0]
    dy_s, dx_s = src.dx
    yy, xx = dst.cell_center_coords()
    yi = yy / dy_s - 0.5
    xi = xx / dx_s - 0.5
    out = bilinear_sample(
        grid.values,
        jnp.broadcast_to(yi[None], (b,) + yi.shape),
        jnp.broadcast_to(xi[None], (b,) + xi.shape),
        periodic=src.periodic,
    )
    return CenteredGrid(out, dst)
