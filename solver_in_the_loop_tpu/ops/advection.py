"""Semi-Lagrangian advection on centered and staggered (MAC) grids.

Reference semantics (`advect.semi_lagrangian(density+inflow, velocity, dt)` and
self-advection `advect.semi_lagrangian(velocity, velocity, dt)`,
/root/reference/karman-2d-phi2/karman.py:97-98; implicit inside
`IncompressibleFlow.step` for the TF1 variants, karman-2d/karman.py:92):

Each sample point (cell center or face center) is backtraced by the *local
full velocity interpolated at that point*, then the advected quantity is
bilinearly sampled at the backtraced position. OPEN domains clamp samples to
the edge (replicate extrapolation); PERIODIC wraps.

Two backends:
* "gather"  — arbitrary CFL, gather-based bilinear sampling.
* "shift"   — gather-free shifted-stencil formulation (ops.interp) for
  bounded CFL; the TPU-fast path used in training where |v|·dt/dx is small.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from solver_in_the_loop_tpu.core.grids import CenteredGrid, StaggeredGrid
from solver_in_the_loop_tpu.ops.interp import bilinear_sample, shifted_stencil_sample


def _pad_x(a: jnp.ndarray, periodic: bool) -> jnp.ndarray:
    return jnp.pad(a, ((0, 0), (0, 0), (1, 1)), mode="wrap" if periodic else "edge")


def _pad_y(a: jnp.ndarray, periodic: bool) -> jnp.ndarray:
    return jnp.pad(a, ((0, 0), (1, 1), (0, 0)), mode="wrap" if periodic else "edge")


def velocity_at_u_faces(vel: StaggeredGrid):
    """(u, v) sampled at u-face centers; both (B, Y, X+1)."""
    vp = _pad_x(vel.v, vel.domain.periodic)  # (B, Y+1, X+2)
    v_at_u = 0.25 * (vp[:, :-1, :-1] + vp[:, :-1, 1:] + vp[:, 1:, :-1] + vp[:, 1:, 1:])
    return vel.u, v_at_u


def velocity_at_v_faces(vel: StaggeredGrid):
    """(u, v) sampled at v-face centers; both (B, Y+1, X)."""
    up = _pad_y(vel.u, vel.domain.periodic)  # (B, Y+2, X+1)
    u_at_v = 0.25 * (up[:, :-1, :-1] + up[:, :-1, 1:] + up[:, 1:, :-1] + up[:, 1:, 1:])
    return u_at_v, vel.v


def velocity_at_centers(vel: StaggeredGrid):
    """(u, v) sampled at cell centers; both (B, Y, X)."""
    u_c = 0.5 * (vel.u[:, :, :-1] + vel.u[:, :, 1:])
    v_c = 0.5 * (vel.v[:, :-1, :] + vel.v[:, 1:, :])
    return u_c, v_c


def _backtrace_sample(
    values: jnp.ndarray,
    u_here: jnp.ndarray,
    v_here: jnp.ndarray,
    dt: float,
    dx,
    periodic: bool,
    method: str,
    max_shift: int,
) -> jnp.ndarray:
    """Sample `values` (same layout as the points of u_here/v_here) backtraced by dt."""
    dy_sp, dx_sp = dx
    off_y = -dt * v_here / dy_sp
    off_x = -dt * u_here / dx_sp
    if method == "shift":
        return shifted_stencil_sample(values, off_y, off_x, max_shift, periodic)
    h, w = values.shape[-2:]
    jj = jnp.arange(h, dtype=values.dtype)[None, :, None]
    ii = jnp.arange(w, dtype=values.dtype)[None, None, :]
    return bilinear_sample(values, jj + off_y, ii + off_x, periodic)


def semi_lagrangian(
    field: Union[CenteredGrid, StaggeredGrid],
    velocity: StaggeredGrid,
    dt: float,
    method: str = "gather",
    max_shift: int = 2,
):
    """Advect `field` through `velocity` for time dt (both on the same domain)."""
    dom = velocity.domain
    periodic = dom.periodic
    # outputs are checkpoint-named so a remat policy can opt to save them
    # (trainer._remat "pressure+advect") instead of recomputing the gathers
    # in the backward pass
    if isinstance(field, CenteredGrid):
        u_c, v_c = velocity_at_centers(velocity)
        out = _backtrace_sample(field.values, u_c, v_c, dt, dom.dx, periodic, method, max_shift)
        return CenteredGrid(checkpoint_name(out, "advect"), dom)

    u_u, v_u = velocity_at_u_faces(velocity)
    u_v, v_v = velocity_at_v_faces(velocity)
    new_u = _backtrace_sample(field.u, u_u, v_u, dt, dom.dx, periodic, method, max_shift)
    new_v = _backtrace_sample(field.v, u_v, v_v, dt, dom.dx, periodic, method, max_shift)
    return StaggeredGrid(checkpoint_name(new_u, "advect"), checkpoint_name(new_v, "advect"), dom)
