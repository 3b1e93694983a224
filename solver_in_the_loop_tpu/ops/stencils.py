"""Finite-difference stencils on batched grids: laplacian, divergence, gradient.

These are the building blocks of explicit diffusion and the pressure
projection (reference call sites: `diffuse(CenteredGrid(...), alpha)` at
/root/reference/karman-2d/karman_train.py:175-178 and the projection inside
`IncompressibleFlow.step` / `fluid.make_incompressible`,
/root/reference/karman-2d-phi2/karman.py:103-104).

All functions operate on raw batched arrays (B, H, W) in *index space*
(unit spacing); physical scaling is applied by the callers.
"""

from __future__ import annotations

import jax.numpy as jnp


def _pad_replicate(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(p, ((0, 0), (1, 1), (1, 1)), mode="edge")


def _pad_wrap(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(p, ((0, 0), (1, 1), (1, 1)), mode="wrap")


def laplacian(values: jnp.ndarray, periodic: bool = False) -> jnp.ndarray:
    """5-point laplacian with unit spacing; replicate (OPEN) or wrap (PERIODIC) edges.

    Matches PhiFlow's index-space `field.laplace()` used by explicit diffusion —
    the reference scales the diffusion amount by res^2 precisely because the
    stencil is index-space (alpha = dt*res^2/Re, karman_train.py:175).
    """
    p = _pad_wrap(values) if periodic else _pad_replicate(values)
    return (
        p[:, 1:-1, :-2] + p[:, 1:-1, 2:] + p[:, :-2, 1:-1] + p[:, 2:, 1:-1]
        - 4.0 * values
    )


def divergence(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Divergence of a MAC field in index space: (B,Y,X+1),(B,Y+1,X) -> (B,Y,X)."""
    return (u[:, :, 1:] - u[:, :, :-1]) + (v[:, 1:, :] - v[:, :-1, :])


def pressure_gradient(p: jnp.ndarray, periodic: bool = False):
    """Gradient of a centered field onto MAC faces (index space).

    Returns (gu, gv) with gu (B, Y, X+1), gv (B, Y+1, X). For OPEN domains the
    ghost pressure outside the domain is 0 (Dirichlet), so boundary faces see
    (p_inside - 0); for PERIODIC the neighbours wrap.
    """
    if periodic:
        pe = jnp.pad(p, ((0, 0), (0, 0), (1, 1)), mode="wrap")
        pn = jnp.pad(p, ((0, 0), (1, 1), (0, 0)), mode="wrap")
    else:
        pe = jnp.pad(p, ((0, 0), (0, 0), (1, 1)))
        pn = jnp.pad(p, ((0, 0), (1, 1), (0, 0)))
    gu = pe[:, :, 1:] - pe[:, :, :-1]  # (B, Y, X+1)
    gv = pn[:, 1:, :] - pn[:, :-1, :]  # (B, Y+1, X)
    return gu, gv


def masked_laplacian(
    p: jnp.ndarray,
    mask_u: jnp.ndarray,
    mask_v: jnp.ndarray,
    periodic: bool = False,
) -> jnp.ndarray:
    """Masked Poisson operator: div(mask * grad(p)) with Dirichlet-0 ghosts (OPEN).

    mask_u (Y, X+1) / (B, Y, X+1) and mask_v (Y+1, X) are face accessibility
    masks: 1 where flow crosses the face, 0 on obstacle faces. Cells whose four
    faces are all masked out (inside obstacles) yield 0; callers pin those
    degrees of freedom separately. Symmetric (negative semi-definite) by
    construction — each interior face contributes symmetrically, boundary faces
    only to the diagonal.
    """
    gu, gv = pressure_gradient(p, periodic=periodic)
    gu = gu * mask_u
    gv = gv * mask_v
    return divergence(gu, gv)
