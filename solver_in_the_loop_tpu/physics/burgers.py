"""2-D forced viscous Burgers on a periodic MAC grid.

Reference semantics (/root/reference/burgers/burgers.py):
* `BurgersTest.step`: semi-Lagrangian self-advection then explicit diffusion
  with physical viscosity (default 0.1) and optional substeps (:78-87).
* `step_with_f`: solver step then `velocity += dt * force` (:85-87).
* Forces: sums of `SinPotential` analytic fields — per-component
  amplitude_c * sin(k . x + phase), sampled at that component's face
  positions (:100-114, :122); phase evolves as phase += dt*omega
  (`ForcingPhysics`, :89-97).
* Initial velocity: band-limited random field `math.randfreq(s) * 2` (:121).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import Boundary, Domain, StaggeredGrid
from solver_in_the_loop_tpu.ops.advection import semi_lagrangian
from solver_in_the_loop_tpu.ops.diffusion import diffuse_explicit


def burgers_domain(res: int, length: float = 32.0) -> Domain:
    """Domain([res, res], box [0:len]^2, PERIODIC) — burgers.py:120."""
    return Domain(resolution=(res, res), size=(length, length), boundary=Boundary.PERIODIC)


@dataclasses.dataclass(frozen=True)
class BurgersFlow:
    """Pure-function Burgers solver step on a staggered periodic grid."""

    domain: Domain
    viscosity: float = 0.1  # physical units (burgers_train.py:179)
    diffusion_substeps: int = 1
    advection: str = "gather"  # "gather" | "shift"
    max_shift: int = 2

    def step(self, velocity: StaggeredGrid, dt: float = 1.0) -> StaggeredGrid:
        dom = self.domain
        dy, dx = dom.dx
        assert abs(dy - dx) < 1e-9
        velocity = semi_lagrangian(velocity, velocity, dt, self.advection, self.max_shift)
        amount = self.viscosity * dt / (dx * dx)
        u = diffuse_explicit(velocity.u, amount, self.diffusion_substeps, periodic=True)
        v = diffuse_explicit(velocity.v, amount, self.diffusion_substeps, periodic=True)
        return StaggeredGrid(u, v, dom)

    def step_with_f(self, velocity: StaggeredGrid, force: StaggeredGrid, dt: float = 1.0):
        out = self.step(velocity, dt)
        return StaggeredGrid(out.u + dt * force.u, out.v + dt * force.v, self.domain)


jax.tree_util.register_static(BurgersFlow)


# --- analytic sine-potential forces ----------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SinPotentialForce:
    """F_c(x) = amplitude[c] * sin(k . x + phase), c in {v, u}.

    k:         (B, 2) wave vector, [ky, kx]
    amplitude: (B, 2) per-component amplitude, [amp_v, amp_u]
    phase:     (B,) phase offset (evolved by omega)
    omega:     (B,) phase velocity
    """

    k: jnp.ndarray
    amplitude: jnp.ndarray
    phase: jnp.ndarray
    omega: jnp.ndarray

    def tree_flatten(self):
        return (self.k, self.amplitude, self.phase, self.omega), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    def advance(self, dt: float) -> "SinPotentialForce":
        """ForcingPhysics.step: phase += dt * omega (burgers.py:94-97)."""
        return SinPotentialForce(self.k, self.amplitude, self.phase + dt * self.omega, self.omega)

    def sample(self, domain: Domain, batch: int = 1) -> StaggeredGrid:
        ky = self.k[:, 0][:, None, None]
        kx = self.k[:, 1][:, None, None]
        ph = self.phase[:, None, None]

        uy, ux = domain.u_face_coords()
        u = self.amplitude[:, 1][:, None, None] * jnp.sin(ky * uy[None] + kx * ux[None] + ph)
        vy, vx = domain.v_face_coords()
        v = self.amplitude[:, 0][:, None, None] * jnp.sin(ky * vy[None] + kx * vx[None] + ph)
        u = jnp.broadcast_to(u, domain.u_shape(batch))
        v = jnp.broadcast_to(v, domain.v_shape(batch))
        return StaggeredGrid(u, v, domain)


def sample_force_sum(forces: Sequence[SinPotentialForce], domain: Domain, batch: int = 1) -> StaggeredGrid:
    """Sum of all force fields sampled on the staggered grid (burgers.py:122)."""
    total = domain.staggered_grid(0.0, 0.0, batch)
    for f in forces:
        total = total + f.sample(domain, batch)
    return total


def random_forces(
    rng: np.random.RandomState,
    num_forces: int = 20,
    batch: int = 1,
) -> list:
    """Draw the reference's force distribution, preserving its np.random call
    order for seed-compatible datasets (burgers.py:100-114):

      angle ~ U[0,1)*pi; dir = [sin, cos]; k = (U+1)*0.8*dir
      amplitude ~ (U[.,2]-0.5)*0.3; phase ~ U*2pi; omega ~ U*0.8-0.4
    """
    forces = []
    for _ in range(num_forces):
        angle = rng.random_sample((batch, 1, 1, 1)) * np.pi
        unit = np.concatenate([np.sin(angle), np.cos(angle)], axis=-1)  # [y, x]
        k = (rng.random_sample((batch, 1, 1, 1)) + 1.0) * 0.8 * unit
        amplitude = (rng.random_sample((batch, 1, 1, 2)) - 0.5) * 0.3
        phase = rng.random_sample((batch,)) * 2.0 * np.pi
        omega = rng.random_sample((batch,)) * 0.8 - 0.4
        forces.append(
            SinPotentialForce(
                k=jnp.asarray(k[:, 0, 0, :], jnp.float32),
                amplitude=jnp.asarray(amplitude[:, 0, 0, :], jnp.float32),
                phase=jnp.asarray(phase, jnp.float32),
                omega=jnp.asarray(omega, jnp.float32),
            )
        )
    return forces
