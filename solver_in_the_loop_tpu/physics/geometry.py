"""Geometry masks: sphere obstacles, box inflows (center-inside sampling).

Reference call sites: `Obstacle(Sphere([50, 50], 10))` and
`Inflow(box[5:10, 25:75])` (/root/reference/karman-2d/karman_train.py:170-171).
Masks are precomputed once per domain — static arrays reused every step.
"""

from __future__ import annotations

import jax.numpy as jnp

from solver_in_the_loop_tpu.core.grids import Domain


def sphere_fluid_mask(domain: Domain, center_yx, radius: float) -> jnp.ndarray:
    """(1, Y, X) mask: 1 where the cell center lies OUTSIDE the sphere."""
    yy, xx = domain.cell_center_coords()
    inside = (yy - center_yx[0]) ** 2 + (xx - center_yx[1]) ** 2 < radius**2
    return jnp.where(inside, 0.0, 1.0)[None].astype(jnp.float32)


def box_mask(domain: Domain, y_range, x_range) -> jnp.ndarray:
    """(1, Y, X) mask: 1 where the cell center lies inside [y0,y1) x [x0,x1)."""
    yy, xx = domain.cell_center_coords()
    inside = (
        (yy >= y_range[0]) & (yy < y_range[1]) & (xx >= x_range[0]) & (xx < x_range[1])
    )
    return inside.astype(jnp.float32)[None]
