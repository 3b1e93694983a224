"""Jitted rollout machinery on tiny grids (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.models.features import Normalization
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow, burgers_domain, random_forces
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, initial_state, karman_domain
from solver_in_the_loop_tpu.train.rollout import burgers_rollout, karman_rollout


def test_karman_rollout_pure_solver_collect_from():
    dom = karman_domain(8)
    flow = KarmanFlow(dom, pressure_max_iter=100)
    d0, v0 = initial_state(dom, 2)
    re = jnp.asarray([1.6e5, 3.2e5])
    rollout = karman_rollout(flow, steps=5, collect_from=2)
    frames = rollout(None, d0, v0, re)
    assert frames["dens"].shape == (3, 2, 16, 8)
    assert frames["u"].shape == (3, 2, 16, 9)
    assert np.isfinite(np.asarray(frames["v"])).all()
    np.testing.assert_allclose(np.asarray(frames["corr_u"]), 0.0)


def test_karman_rollout_with_model_matches_manual_loop():
    dom = karman_domain(8)
    flow = KarmanFlow(dom, pressure_max_iter=100, pressure_tol=1e-6)
    d0, v0 = initial_state(dom, 1)
    re = jnp.asarray([1.6e5])
    norm = Normalization.karman(1.0, 1.0, 1e6)
    model = build_model("mercury")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 8, 3)))

    rollout = karman_rollout(flow, steps=3, model_apply=model.apply, norm=norm)
    frames = rollout(params, d0, v0, re)

    # manual recurrence
    from solver_in_the_loop_tpu.models.features import correction_to_staggered, karman_features

    d, v = d0, v0
    for t in range(3):
        d, v, _ = flow.step(d, v, re)
        corr = correction_to_staggered(model.apply(params, karman_features(v, re, norm)), norm, dom)
        v = v + corr
        np.testing.assert_allclose(np.asarray(frames["u"][t]), np.asarray(v.u), atol=1e-5)


def test_burgers_analytic_vs_replay_consistency():
    """Replaying the forces sampled by the analytic rollout reproduces it."""
    dom = burgers_domain(8)
    flow = BurgersFlow(dom)
    rng = np.random.RandomState(0)
    forces = random_forces(rng, num_forces=3)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *forces)
    v0 = dom.staggered_grid(0.1, -0.2)

    ra, rr = burgers_rollout(flow, steps=4, dt=0.1)
    analytic = ra(None, v0, stacked)

    # forces used during step t have phase(t); frame t stores phase(t+1), so
    # the replay sequence is [sample(t=0), frames 0..T-2]
    from solver_in_the_loop_tpu.physics.burgers import sample_force_sum

    f0 = sample_force_sum(forces, dom)
    fu = jnp.concatenate([f0.u[None], analytic["fu"][:-1]])
    fv = jnp.concatenate([f0.v[None], analytic["fv"][:-1]])
    replay = rr(None, v0, fu, fv)
    np.testing.assert_allclose(np.asarray(replay["u"]), np.asarray(analytic["u"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(replay["v"]), np.asarray(analytic["v"]), atol=1e-5)
