"""Grid pytrees: Domain, CenteredGrid, StaggeredGrid (MAC layout).

TPU-first re-design of the grid types whose *call sites* in the reference pin
the required semantics (see SURVEY.md §2.2; e.g. staggered component shapes at
/root/reference/karman-2d-phi2/karman.py:155-156, feature-edge cropping at
/root/reference/karman-2d/karman_train.py:77-90).

Conventions (internal; the legacy PhiFlow on-disk layout is quarantined in
solver_in_the_loop_tpu.io.scene):

* All field arrays carry an explicit leading batch dimension.
* Centered fields:   values.shape == (B, Y, X)
* Staggered (MAC) velocity:
    u (x-component) lives at x-faces: u.shape == (B, Y, X + 1)
    v (y-component) lives at y-faces: v.shape == (B, Y + 1, X)
* Index (j, i) maps to physical position:
    cell center (j, i): ((j + .5) * dy, (i + .5) * dx)
    u-face (j, i):      ((j + .5) * dy,  i       * dx)
    v-face (j, i):      ( j      * dy, (i + .5) * dx)
* The "collocated" feature layout used by the correction networks is
  channel-last (B, Y, X, C) with channel order [v, u, ...extras], matching the
  reference's feature contract (lower-left face samples per cell,
  karman_train.py:77-90).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

import jax
import jax.numpy as jnp


class Boundary(enum.Enum):
    """Domain boundary behaviour (reference: OPEN for karman, PERIODIC for burgers)."""

    OPEN = "open"
    PERIODIC = "periodic"


@dataclasses.dataclass(frozen=True)
class Domain:
    """Static description of a rectangular 2-D simulation domain.

    resolution: (Y, X) cell counts; size: physical extent (ly, lx).
    The karman scenario uses resolution=(2r, r), size=(200, 100), OPEN
    (/root/reference/karman-2d/karman.py:98); burgers uses (r, r), (32, 32),
    PERIODIC (/root/reference/burgers/burgers.py:120).
    """

    resolution: Tuple[int, int]
    size: Tuple[float, float]
    boundary: Boundary = Boundary.OPEN

    @property
    def ny(self) -> int:
        return self.resolution[0]

    @property
    def nx(self) -> int:
        return self.resolution[1]

    @property
    def dx(self) -> Tuple[float, float]:
        """Cell spacing (dy, dx)."""
        return (self.size[0] / self.resolution[0], self.size[1] / self.resolution[1])

    @property
    def periodic(self) -> bool:
        return self.boundary == Boundary.PERIODIC

    # --- shapes -----------------------------------------------------------
    def centered_shape(self, batch: int = 1) -> Tuple[int, int, int]:
        return (batch, self.ny, self.nx)

    def u_shape(self, batch: int = 1) -> Tuple[int, int, int]:
        return (batch, self.ny, self.nx + 1)

    def v_shape(self, batch: int = 1) -> Tuple[int, int, int]:
        return (batch, self.ny + 1, self.nx)

    # --- constructors -----------------------------------------------------
    def centered_grid(self, values=0.0, batch: int = 1, dtype=jnp.float32) -> "CenteredGrid":
        if jnp.ndim(values) == 0:
            values = jnp.full(self.centered_shape(batch), values, dtype)
        return CenteredGrid(jnp.asarray(values, dtype), self)

    def staggered_grid(self, u=0.0, v=0.0, batch: int = 1, dtype=jnp.float32) -> "StaggeredGrid":
        if jnp.ndim(u) == 0:
            u = jnp.full(self.u_shape(batch), u, dtype)
        if jnp.ndim(v) == 0:
            v = jnp.full(self.v_shape(batch), v, dtype)
        return StaggeredGrid(jnp.asarray(u, dtype), jnp.asarray(v, dtype), self)

    # --- coordinates ------------------------------------------------------
    def cell_center_coords(self):
        """(yy, xx) physical coordinates of cell centers, each (Y, X)."""
        dy, dxx = self.dx
        y = (jnp.arange(self.ny) + 0.5) * dy
        x = (jnp.arange(self.nx) + 0.5) * dxx
        return jnp.meshgrid(y, x, indexing="ij")

    def u_face_coords(self):
        """(yy, xx) physical coordinates of u-faces, each (Y, X+1)."""
        dy, dxx = self.dx
        y = (jnp.arange(self.ny) + 0.5) * dy
        x = jnp.arange(self.nx + 1) * dxx
        return jnp.meshgrid(y, x, indexing="ij")

    def v_face_coords(self):
        """(yy, xx) physical coordinates of v-faces, each (Y+1, X)."""
        dy, dxx = self.dx
        y = jnp.arange(self.ny + 1) * dy
        x = (jnp.arange(self.nx) + 0.5) * dxx
        return jnp.meshgrid(y, x, indexing="ij")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CenteredGrid:
    """Scalar field sampled at cell centers; values shape (B, Y, X)."""

    values: jax.Array
    domain: Domain

    def tree_flatten(self):
        return (self.values,), self.domain

    @classmethod
    def tree_unflatten(cls, domain, children):
        return cls(children[0], domain)

    @property
    def batch(self) -> int:
        return self.values.shape[0]

    def __add__(self, other):
        other_values = other.values if isinstance(other, CenteredGrid) else other
        return CenteredGrid(self.values + other_values, self.domain)

    __radd__ = __add__

    def __sub__(self, other):
        other_values = other.values if isinstance(other, CenteredGrid) else other
        return CenteredGrid(self.values - other_values, self.domain)

    def __mul__(self, s):
        s_values = s.values if isinstance(s, CenteredGrid) else s
        return CenteredGrid(self.values * s_values, self.domain)

    __rmul__ = __mul__


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StaggeredGrid:
    """MAC velocity field: u at x-faces (B, Y, X+1), v at y-faces (B, Y+1, X)."""

    u: jax.Array
    v: jax.Array
    domain: Domain

    def tree_flatten(self):
        return (self.u, self.v), self.domain

    @classmethod
    def tree_unflatten(cls, domain, children):
        return cls(children[0], children[1], domain)

    @property
    def batch(self) -> int:
        return self.u.shape[0]

    def __add__(self, other):
        return StaggeredGrid(self.u + other.u, self.v + other.v, self.domain)

    def __sub__(self, other):
        return StaggeredGrid(self.u - other.u, self.v - other.v, self.domain)

    def __mul__(self, s):
        return StaggeredGrid(self.u * s, self.v * s, self.domain)

    __rmul__ = __mul__

    # --- sampling between grid locations ---------------------------------
    def at_centers(self) -> jax.Array:
        """Velocity averaged to cell centers: (B, Y, X, 2) with [...,0]=v, [...,1]=u."""
        uc = 0.5 * (self.u[:, :, :-1] + self.u[:, :, 1:])
        vc = 0.5 * (self.v[:, :-1, :] + self.v[:, 1:, :])
        return jnp.stack([vc, uc], axis=-1)

    def to_collocated(self) -> jax.Array:
        """Lower-face samples per cell, channel-last (B, Y, X, 2) = [v, u].

        Equivalent to the reference's `staggered_tensor()[:, :-1, :-1, 0:2]`
        feature crop (karman_train.py:77-86): per cell (j, i) take v at the
        bottom face (j, i) and u at the left face (j, i).
        """
        return jnp.stack([self.v[:, :-1, :], self.u[:, :, :-1]], axis=-1)

    @classmethod
    def from_collocated(cls, vu: jax.Array, domain: Domain) -> "StaggeredGrid":
        """Inverse of to_collocated with zero far edges.

        Equivalent to the reference's `to_staggered` zero-padding
        (karman_train.py:88-90): channel 0 -> v (top row zero), channel 1 -> u
        (rightmost column zero).
        """
        v = jnp.pad(vu[..., 0], ((0, 0), (0, 1), (0, 0)))
        u = jnp.pad(vu[..., 1], ((0, 0), (0, 0), (0, 1)))
        return cls(u, v, domain)
