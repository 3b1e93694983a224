"""Karman vortex street: incompressible wake flow behind a sphere obstacle.

TPU-native re-design of the reference scenario physics
(`KarmanFlow(IncompressibleFlow).step`,
/root/reference/karman-2d/karman_train.py:166-185 and the explicit phi2
pipeline /root/reference/karman-2d-phi2/karman.py:79-111):

    1. explicit viscosity on each MAC component, alpha = dt * res^2 / Re
       (per-batch Re supported)
    2. freestream velocity BC blend on v: v = v*(1-mask) + bc
    3. semi-Lagrangian advection of density (+ inflow) and velocity
    4. pressure projection with sphere-obstacle masks (OPEN boundaries)

Everything is a pure function of (density, velocity, re); the KarmanFlow
object only holds precomputed static masks, so `step` jits and scans cleanly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from solver_in_the_loop_tpu.core.grids import Boundary, CenteredGrid, Domain, StaggeredGrid
from solver_in_the_loop_tpu.ops.advection import semi_lagrangian
from solver_in_the_loop_tpu.ops.diffusion import diffuse_explicit
from solver_in_the_loop_tpu.ops.poisson import ProjectionMasks, make_incompressible, masks_from_fluid_cells
from solver_in_the_loop_tpu.physics.geometry import box_mask, sphere_fluid_mask

OBSTACLE_CENTER = (50.0, 50.0)
OBSTACLE_RADIUS = 10.0
INFLOW_Y = (5.0, 10.0)
INFLOW_X = (25.0, 75.0)


def karman_domain(res: int, length: float = 100.0) -> Domain:
    """Domain([2*res, res], box [0:2L, 0:L], OPEN) — karman.py:98."""
    return Domain(resolution=(2 * res, res), size=(2 * length, length), boundary=Boundary.OPEN)


def freestream_bc(domain: Domain):
    """(bc_values, bc_mask), both (1, Y+1, X) on v-faces.

    v = 1 on the two inlet rows (j=0,1) and on the left/right columns
    (karman_train.py:366-372).
    """
    y1, x = domain.ny + 1, domain.nx
    m = jnp.zeros((1, y1, x), jnp.float32)
    m = m.at[:, 0:2, :].set(1.0)
    m = m.at[:, :, 0].set(1.0)
    m = m.at[:, :, -1].set(1.0)
    return m, m  # pre-multiplied values == mask (all-ones BC)


@dataclasses.dataclass(frozen=True)
class KarmanFlow:
    """Static per-domain setup; `step` is the pure differentiable solver step."""

    domain: Domain
    advection: str = "gather"  # "gather" | "shift"
    max_shift: int = 2
    pressure_tol: float = 1e-5
    pressure_max_iter: int = 1000
    pressure_backend: str = "auto"

    def __post_init__(self):
        dom = self.domain
        fluid = sphere_fluid_mask(dom, OBSTACLE_CENTER, OBSTACLE_RADIUS)
        object.__setattr__(self, "_masks", masks_from_fluid_cells(fluid, dom))
        object.__setattr__(self, "_inflow", box_mask(dom, INFLOW_Y, INFLOW_X))
        bc_vals, bc_mask = freestream_bc(dom)
        object.__setattr__(self, "_bc_vals", bc_vals)
        object.__setattr__(self, "_bc_mask", bc_mask)
        # explicit-diffusion stability limit: alpha = dt*res^2/re <= 0.25 must
        # hold at the smallest Re used; asserted by callers who know Re.

    @property
    def masks(self) -> ProjectionMasks:
        return self._masks

    @property
    def inflow(self) -> jnp.ndarray:
        return self._inflow

    def step(
        self,
        density: CenteredGrid,
        velocity: StaggeredGrid,
        re,
        dt: float = 1.0,
        p0=None,
    ):
        """One solver step. re: scalar or (B,) per-batch Reynolds numbers.

        p0 warm-starts the pressure CG (pass the previous step's pressure in
        rollouts/unrolls; see ops/poisson.py solve_pressure).
        Returns (density, velocity, pressure).
        """
        density, velocity = self.pre_projection(density, velocity, re, dt)

        # 4) projection with obstacle masks
        velocity, pressure = make_incompressible(
            velocity,
            self._masks,
            tol=self.pressure_tol,
            max_iter=self.pressure_max_iter,
            backend=self.pressure_backend,
            p0=p0,
        )
        return density, velocity, pressure

    def pre_projection(
        self,
        density: CenteredGrid,
        velocity: StaggeredGrid,
        re,
        dt: float = 1.0,
    ):
        """Steps 1-3 of `step` (diffuse -> BC blend -> advect), i.e. everything
        before the pressure projection. Exposed so diagnostics (bench.py CG
        iteration stats) can reproduce the projection's true RHS."""
        dom = self.domain
        res = dom.nx  # "reference resolution is size in x direction" (karman_train.py:406)
        re_arr = jnp.asarray(re, jnp.float32).reshape(-1, 1, 1)
        alpha = dt * float(res) * float(res) / re_arr  # index-space diffusion amount

        # 1) viscosity on each component (replicate edges; karman_train.py:175-178)
        u = diffuse_explicit(velocity.u, alpha, periodic=False)
        v = diffuse_explicit(velocity.v, alpha, periodic=False)

        # 2) freestream BC on v (karman_train.py:180-183)
        v = v * (1.0 - self._bc_mask) + self._bc_vals
        velocity = StaggeredGrid(u, v, dom)

        # 3) advection (density effect = inflow, applied post-advection as in
        #    phiflow-1 IncompressibleFlow.step; karman.py:92)
        density = semi_lagrangian(density, velocity, dt, self.advection, self.max_shift)
        density = CenteredGrid(density.values + self._inflow * dt, dom)
        velocity = semi_lagrangian(velocity, velocity, dt, self.advection, self.max_shift)
        return density, velocity


def initial_state(domain: Domain, batch: int = 1):
    """Warm-start init: v=1 everywhere, u 'poke' block to trigger instability.

    Mirrors karman.py:106-110: u = 1 on rows [Y/2+10, Y/2+20) x cols
    [X/2-2, X/2+2) of the u component (the staggered tensor indexing there is
    row-major over the padded (Y+1, X+1) tensor; the poke block indexes below
    stay inside the valid u region).
    """
    d0 = domain.centered_grid(0.0, batch)
    u = jnp.zeros(domain.u_shape(batch), jnp.float32)
    y_mid, x_mid = (domain.ny + 1) // 2, (domain.nx + 1) // 2
    u = u.at[:, y_mid + 10 : y_mid + 20, x_mid - 2 : x_mid + 2].set(1.0)
    v = jnp.ones(domain.v_shape(batch), jnp.float32)
    return d0, StaggeredGrid(u, v, domain)


jax.tree_util.register_static(KarmanFlow)
