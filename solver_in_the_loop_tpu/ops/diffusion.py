"""Explicit diffusion (viscosity) with substeps.

Reference semantics: `diffuse(CenteredGrid(component), alpha)` applies
`c += alpha * laplace(c)` per substep in index space
(/root/reference/karman-2d/karman_train.py:175-178, alpha = dt*res^2/Re;
/root/reference/karman-2d-phi2/karman.py:84 `diffuse.explicit`;
Burgers viscosity 0.1 with `diffusion_substeps`,
/root/reference/burgers/burgers_train.py:179-180).
"""

from __future__ import annotations

import jax.numpy as jnp

from solver_in_the_loop_tpu.core.grids import StaggeredGrid
from solver_in_the_loop_tpu.ops.stencils import laplacian


def diffuse_explicit(
    values: jnp.ndarray,
    amount,
    substeps: int = 1,
    periodic: bool = False,
) -> jnp.ndarray:
    """values (B, H, W); amount: scalar or (B, 1, 1) index-space diffusion amount.

    Explicit Euler: values += (amount / substeps) * laplace(values), repeated.
    2-D stability requires amount/substeps <= 0.25 (asserted by physics configs
    at setup, cf. SURVEY.md §7 'numerical parity knobs').
    """
    step = amount / substeps
    for _ in range(substeps):
        values = values + step * laplacian(values, periodic=periodic)
    return values


def diffuse_explicit_grid(
    velocity: StaggeredGrid,
    diffusivity,
    dt: float,
    substeps: int = 1,
) -> StaggeredGrid:
    """Diffuse a staggered velocity with *physical* diffusivity (per-batch ok).

    amount_index = diffusivity * dt / dx^2 per axis-uniform spacing. diffusivity
    may be a scalar or (B, 1, 1) array (per-batch Reynolds numbers,
    karman_train.py:175).
    """
    dom = velocity.domain
    dy, dx = dom.dx
    assert abs(dy - dx) < 1e-9, "diffuse_explicit_grid assumes square cells"
    amount = diffusivity * dt / (dx * dx)
    periodic = dom.periodic
    return StaggeredGrid(
        diffuse_explicit(velocity.u, amount, substeps, periodic),
        diffuse_explicit(velocity.v, amount, substeps, periodic),
        dom,
    )
