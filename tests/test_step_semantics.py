"""Lock down step-ordering and variant semantics cloned from the reference."""

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import CenteredGrid, StaggeredGrid
from solver_in_the_loop_tpu.models.features import Normalization
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.ops.advection import semi_lagrangian
from solver_in_the_loop_tpu.ops.diffusion import diffuse_explicit
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow, burgers_domain
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, freestream_bc, karman_domain
from solver_in_the_loop_tpu.train.dataset import EpochSchedule
from solver_in_the_loop_tpu.train.trainer import (
    SolTrainConfig,
    make_burgers_train_step,
    make_optimizer,
)


def test_burgers_step_is_advect_then_diffuse():
    """Burgers.step: semi-Lagrangian self-advection THEN explicit diffusion
    (phiflow Burgers physics; burgers_train.py:182-183)."""
    dom = burgers_domain(16)
    flow = BurgersFlow(dom, viscosity=0.1)
    rng = np.random.RandomState(0)
    vel = StaggeredGrid(
        jnp.asarray(rng.randn(1, 16, 17).astype(np.float32)),
        jnp.asarray(rng.randn(1, 17, 16).astype(np.float32)),
        dom,
    )
    out = flow.step(vel, dt=0.1)
    adv = semi_lagrangian(vel, vel, 0.1, "gather")
    amount = 0.1 * 0.1 / (dom.dx[1] ** 2)
    expect_u = diffuse_explicit(adv.u, amount, periodic=True)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(expect_u), atol=1e-6)


def test_karman_bc_blend_applied_after_diffusion():
    """v = v*(1-mask) + bc after viscosity, before advection
    (karman_train.py:180-183): inlet rows of the output's *pre-advection*
    field are exactly 1."""
    dom = karman_domain(16)
    flow = KarmanFlow(dom, pressure_max_iter=200)
    bc_vals, bc_mask = freestream_bc(dom)
    assert float(bc_vals[0, 0, 5]) == 1.0
    assert float(bc_vals[0, 2, 5]) == 0.0  # only rows 0-1 inside
    assert float(bc_vals[0, 5, 0]) == 1.0  # side columns
    # inflow mask: one band of cells at y in [5,10) for 32x16 (dx=6.25: center
    # 3.125, 9.375 -> row 1), x in [25,75)
    infl = np.asarray(flow.inflow)
    assert infl.sum() > 0
    rows = np.nonzero(infl[0].sum(axis=1))[0]
    assert set(rows) == {1}


def test_noforce_burgers_training_runs():
    """--noforce variant: 2-channel features, no force application
    (burgers_train.py:85-92, 385-396)."""
    dom = burgers_domain(8)
    flow = BurgersFlow(dom)
    model = build_model("mercury")
    cfg = SolTrainConfig(msteps=2, lr=1e-3, batch_size=2, remat=False, dt=0.1)
    norm = Normalization(
        jnp.asarray([1.0, 1.0], jnp.float32), jnp.asarray([1.0, 1.0], jnp.float32)
    )
    rng = np.random.RandomState(0)
    data = {
        "u": jnp.asarray(rng.randn(2, 5, 8, 9).astype(np.float32)),
        "v": jnp.asarray(rng.randn(2, 5, 9, 8).astype(np.float32)),
        "fu": jnp.zeros((2, 5, 8, 9)),
        "fv": jnp.zeros((2, 5, 9, 8)),
    }
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 2)))
    opt = make_optimizer(cfg)
    state = opt.init(params)
    step = make_burgers_train_step(flow, model.apply, opt, cfg, use_force=False)
    idx = jnp.asarray([[0, 0], [1, 1]], jnp.int32)
    params, state, loss, _ = step(params, state, data, norm, idx)
    assert np.isfinite(float(loss))


def test_epoch_iters_match_reference_counts():
    """SOL-32 reference: 6 sims, batch 3, 500 frames -> 2 batches x 468 steps
    = 936 iterations/epoch (BASELINE.md)."""
    sched = EpochSchedule(6, 500, 3, seed=0)
    assert sched.steps_per_epoch(32) == 936
    idx = sched.epoch_indices(32)
    assert idx.shape == (936, 3, 2)
    # burgers SOL-04: 10 sims, batch 5, 200 frames -> 2 x 196 = 392
    sched_b = EpochSchedule(10, 200, 5, seed=0)
    assert sched_b.steps_per_epoch(4) == 392
