"""Fused advection kernel under the REAL train step (scan + remat + grad +
optimizer), interpret mode: loss must be bit-close to the XLA shift path.
De-risks the hardware e2e gate in scripts/validate_pallas_advect.py.
(~2 min: one interpret-mode train-step compile per arm — see
tests/test_pallas_cg.py for the precedent.)"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import solver_in_the_loop_tpu.ops.pallas.advect_kernel as ak


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(ak, "_INTERPRET", True)


def test_train_step_parity(monkeypatch):
    from solver_in_the_loop_tpu.models.features import Normalization
    from solver_in_the_loop_tpu.models.networks import build_model
    from solver_in_the_loop_tpu.physics.karman import KarmanFlow, karman_domain
    from solver_in_the_loop_tpu.train.trainer import (
        SolTrainConfig, make_karman_train_step, make_optimizer)

    dom = karman_domain(8)
    flow = KarmanFlow(dom, advection="shift", max_shift=2, pressure_max_iter=40)
    norm = Normalization.karman(1.0, 1.0, 1e6)
    rng = np.random.RandomState(0)
    data = {
        "dens": jnp.asarray(rng.rand(2, 8, dom.ny, dom.nx), jnp.float32),
        "u": jnp.asarray(0.1 * rng.randn(2, 8, dom.ny, dom.nx + 1), jnp.float32),
        "v": jnp.asarray(1 + 0.1 * rng.randn(2, 8, dom.ny + 1, dom.nx), jnp.float32),
        "re": jnp.asarray([1.6e5, 3.2e5], jnp.float32),
    }
    idx = jnp.asarray([[0, 0], [1, 1]], jnp.int32)
    losses = {}
    for arm in ("0", "1"):
        monkeypatch.setenv("SILT_PALLAS_ADVECT", arm)
        model = build_model("mars_moon")
        cfg = SolTrainConfig(msteps=2, lr=1e-4, batch_size=2, remat=True)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, dom.ny, dom.nx, 3)))
        opt = make_optimizer(cfg)
        ostate = opt.init(params)
        step = make_karman_train_step(flow, model.apply, opt, cfg)
        _, _, loss, _ = step(params, ostate, data, norm, idx)
        losses[arm] = float(loss)
    assert abs(losses["1"] - losses["0"]) <= 1e-4 * max(1.0, abs(losses["0"])), losses
