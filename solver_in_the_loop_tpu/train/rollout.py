"""Jitted recurrent rollouts (test-time application + data generation).

Reference behaviour: 500-step karman rollout with per-step model correction
(/root/reference/karman-2d/karman_apply.py:139-158 — there the solver runs on
the NumPy backend and only the net on GPU, one device crossing per step) and
the hi-res data-generation loops (karman.py:149-165, burgers.py:170-181 — one
sess.run per frame). Here the WHOLE rollout is one jitted lax.scan; frames
are stacked on device and fetched once.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from solver_in_the_loop_tpu.core.grids import CenteredGrid, StaggeredGrid
from solver_in_the_loop_tpu.models.features import (
    Normalization,
    burgers_features,
    correction_to_staggered,
    karman_features,
)
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow, SinPotentialForce
from solver_in_the_loop_tpu.physics.karman import KarmanFlow


def karman_rollout(
    flow: KarmanFlow,
    steps: int,
    model_apply: Optional[Callable] = None,
    norm: Optional[Normalization] = None,
    dt: float = 1.0,
    collect_from: int = 0,
):
    """Build a jitted rollout fn: (params, d0, v0, re) -> stacked frames.

    With model_apply=None this is the pure solver rollout (data generation /
    source sims). Returns dict of (T, B, ...) arrays for steps >= collect_from
    (frame indices collect_from+1 .. steps).
    """
    dom = flow.domain
    n_collect = steps - collect_from

    @jax.jit
    def rollout(params, d0: CenteredGrid, v0: StaggeredGrid, re):
        def step_fn(carry, _):
            d, v, p1, p2, p3, k = carry
            # quadratic extrapolated warm start 3p1-3p2+p3: CG iterations p50
            # 110 cold -> 82 warm -> ~28 extrapolated (BENCH.md); early steps
            # fall back to linear / previous-pressure / cold
            x0 = jnp.where(k >= 3, 3.0 * p1 - 3.0 * p2 + p3,
                           jnp.where(k >= 2, 2.0 * p1 - p2, p1))
            d, v, p = flow.step(d, v, re, dt=dt, p0=x0)
            cu = jnp.zeros_like(v.u)
            cv = jnp.zeros_like(v.v)
            if model_apply is not None:
                feat = karman_features(v, re, norm)
                corr = correction_to_staggered(model_apply(params, feat), norm, dom)
                v = v + corr
                cu, cv = corr.u, corr.v
            return (d, v, p, p1, p2, k + 1), (d.values, v.u, v.v, cu, cv)

        def warm(carry, _):
            new_carry, _out = step_fn(carry, None)
            return new_carry, None

        p0_init = jnp.zeros_like(d0.values)
        carry = (d0, v0, p0_init, p0_init, p0_init, jnp.int32(0))
        if collect_from > 0:
            carry, _ = lax.scan(warm, carry, None, length=collect_from)
        _, frames = lax.scan(step_fn, carry, None, length=n_collect)
        dens, u, v, cu, cv = frames
        return {"dens": dens, "u": u, "v": v, "corr_u": cu, "corr_v": cv}

    return rollout


def burgers_rollout(
    flow: BurgersFlow,
    steps: int,
    model_apply: Optional[Callable] = None,
    norm: Optional[Normalization] = None,
    dt: float = 0.1,
    collect_from: int = 0,
    use_force_features: bool = True,
):
    """(params, v0, forces | force_frames) -> stacked frames.

    Forces are either a SinPotentialForce pytree (analytic, phase advanced in
    closed form per step — data generation) or precomputed per-step force
    component arrays (fu (T, B, Y, X+1), fv (T, B, Y+1, X)) replayed from disk
    (test rollouts, /root/reference/burgers/burgers_apply.py:129-151).
    """
    dom = flow.domain

    @jax.jit
    def rollout_analytic(params, v0: StaggeredGrid, forces: SinPotentialForce):
        """forces: stacked pytree with leading axis = num_forces."""

        def sample_sum(step_idx):
            def one(f: SinPotentialForce):
                ph = f.phase + dt * f.omega * step_idx
                return SinPotentialForce(f.k, f.amplitude, ph, f.omega).sample(dom, v0.batch)

            sampled = jax.vmap(one)(forces)  # leading axis num_forces
            return StaggeredGrid(jnp.sum(sampled.u, 0), jnp.sum(sampled.v, 0), dom)

        def step_fn(carry, t):
            v = carry
            force = sample_sum(t)
            v = flow.step_with_f(v, force, dt=dt)
            if model_apply is not None:
                feat = burgers_features(v, force if use_force_features else None, norm)
                corr = correction_to_staggered(model_apply(params, feat), norm, dom)
                v = v + corr
            nxt_force = sample_sum(t + 1)
            return v, (v.u, v.v, nxt_force.u, nxt_force.v)

        _, frames = lax.scan(step_fn, v0, jnp.arange(steps))
        u, v, fu, fv = frames
        return {"u": u, "v": v, "fu": fu, "fv": fv}

    @jax.jit
    def rollout_replay(params, v0: StaggeredGrid, fu, fv):
        def step_fn(carry, force_uv):
            v = carry
            force = StaggeredGrid(force_uv[0], force_uv[1], dom)
            v = flow.step_with_f(v, force, dt=dt)
            if model_apply is not None:
                feat = burgers_features(v, force if use_force_features else None, norm)
                corr = correction_to_staggered(model_apply(params, feat), norm, dom)
                v = v + corr
            return v, (v.u, v.v)

        _, frames = lax.scan(step_fn, v0, (fu, fv))
        u, v = frames
        return {"u": u, "v": v}

    return rollout_analytic, rollout_replay
