"""End-to-end training smoke tests on tiny synthetic data (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver_in_the_loop_tpu.core.grids import StaggeredGrid
from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.models.features import Normalization
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow, burgers_domain
from solver_in_the_loop_tpu.train.dataset import (
    EpochSchedule,
    load_burgers_dataset,
    load_karman_dataset,
)
from solver_in_the_loop_tpu.train.trainer import (
    SolTrainConfig,
    clip_by_leaf_norm,
    lr_schedule_step,
    make_burgers_train_step,
    make_optimizer,
    set_learning_rate,
)


@pytest.fixture(scope="module")
def burgers_scene_dir(tmp_path_factory):
    """Synthetic hi-res burgers scenes (2 sims, 8 frames, 32^2 hi-res)."""
    parent = str(tmp_path_factory.mktemp("bdata") / "hires")
    rng = np.random.RandomState(0)
    for s in range(2):
        sc = Scene.create(parent)
        sc.write_params({"re": 0.0, "seed": s, "dt": 0.1})
        for f in range(8):
            u = rng.randn(1, 32, 33).astype(np.float32)
            v = rng.randn(1, 33, 32).astype(np.float32)
            fu = rng.randn(1, 32, 33).astype(np.float32) * 0.1
            fv = rng.randn(1, 33, 32).astype(np.float32) * 0.1
            sc.write_staggered("velo", f, u, v)
            sc.write_staggered("forc", f, fu, fv)
    return parent


def test_load_burgers_dataset(burgers_scene_dir):
    data = load_burgers_dataset(burgers_scene_dir, num_frames=8, num_sims=2, scale=4)
    assert data.u.shape == (2, 8, 8, 9)
    assert data.v.shape == (2, 8, 9, 8)
    assert data.resolution == (8, 8)
    assert data.stats["std.u"] > 0
    # cache hit path
    data2 = load_burgers_dataset(burgers_scene_dir, num_frames=8, num_sims=2, scale=4,
                                 skip_preprocessing=True)
    np.testing.assert_allclose(data.u, data2.u)


def test_epoch_schedule_coverage():
    sched = EpochSchedule(num_sims=4, num_frames=10, batch_size=2, seed=0)
    msteps = 3
    idx = sched.epoch_indices(msteps)
    assert idx.shape == (2 * 7, 2, 2)  # num_batches * (F - msteps), B, (sim, frame)
    # every (sim, frame<F-msteps) pair appears exactly once
    pairs = {tuple(p) for p in idx.reshape(-1, 2)}
    assert len(pairs) == 4 * 7
    assert all(f < 7 for _s, f in pairs)
    # different epochs shuffle differently
    idx2 = sched.epoch_indices(msteps)
    assert not np.array_equal(idx, idx2)


def test_burgers_sol_training_reduces_loss(burgers_scene_dir):
    data_np = load_burgers_dataset(burgers_scene_dir, num_frames=8, num_sims=2, scale=4,
                                   skip_preprocessing=True)
    dom = burgers_domain(8)
    flow = BurgersFlow(dom)
    model = build_model("mars_moon")
    cfg = SolTrainConfig(msteps=2, lr=1e-3, epochs=1, batch_size=2, remat=True, dt=0.1)

    norm = Normalization.burgers(
        data_np.stats["std.v"], data_np.stats["std.u"],
        data_np.stats["std.fv"], data_np.stats["std.fu"],
    )
    data = {
        "u": jnp.asarray(data_np.u),
        "v": jnp.asarray(data_np.v),
        "fu": jnp.asarray(data_np.fu),
        "fv": jnp.asarray(data_np.fv),
    }
    feat_shape = (cfg.batch_size, 8, 8, 4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros(feat_shape))
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    train_step = make_burgers_train_step(flow, model.apply, opt, cfg)

    sched = EpochSchedule(2, 8, 2, seed=0)
    idx = sched.epoch_indices(cfg.msteps)
    losses = []
    for it in range(idx.shape[0]):
        params, opt_state, loss, step_losses = train_step(
            params, opt_state, data, norm, jnp.asarray(idx[it])
        )
        losses.append(float(loss))
        assert step_losses.shape == (cfg.msteps,)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # random-net corrections should improve fast


def test_lr_schedule_steps():
    lr = 1e-3
    seq = []
    for e in range(25):
        lr = lr_schedule_step(e, lr)
        seq.append(lr)
    assert seq[10] == 1e-3
    np.testing.assert_allclose(seq[11], 1e-4)
    np.testing.assert_allclose(seq[16], 1e-5)
    np.testing.assert_allclose(seq[21], 1e-6)
    np.testing.assert_allclose(seq[23], 5e-7)


def test_clip_by_leaf_norm():
    clip = clip_by_leaf_norm(0.001)
    g = {"w": jnp.ones((10,)) * 10.0, "b": jnp.full((2,), 1e-6)}
    out, _ = clip.update(g, clip.init(None))
    np.testing.assert_allclose(float(jnp.linalg.norm(out["w"])), 0.001, rtol=1e-5)
    np.testing.assert_allclose(out["b"], g["b"])  # small grads untouched


def test_set_learning_rate():
    cfg = SolTrainConfig(lr=1e-3)
    opt = make_optimizer(cfg)
    state = opt.init({"w": jnp.zeros(3)})
    state = set_learning_rate(state, 5e-4)
    found = []

    def walk(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            found.append(float(s.hyperparams["learning_rate"]))
        if isinstance(s, tuple):
            for x in s:
                walk(x)

    walk(state)
    np.testing.assert_allclose(found, [5e-4], rtol=1e-6)


def test_karman_dataset_roundtrip(tmp_path):
    """Karman loader: downsample cache, Re metadata, stats."""
    parent = str(tmp_path / "khires")
    rng = np.random.RandomState(0)
    for s in range(2):
        sc = Scene.create(parent)
        sc.write_params({"re": 160000.0 * (s + 1)})
        for f in range(4):
            sc.write_centered("dens", f, rng.rand(1, 32, 16).astype(np.float32))
            sc.write_staggered(
                "velo", f,
                rng.randn(1, 32, 17).astype(np.float32),
                rng.randn(1, 33, 16).astype(np.float32),
            )
    data = load_karman_dataset(parent, num_frames=4, num_sims=2, scale=4)
    assert data.dens.shape == (2, 4, 8, 4)
    assert data.u.shape == (2, 4, 8, 5)
    assert data.v.shape == (2, 4, 9, 4)
    np.testing.assert_allclose(data.re, [160000.0, 320000.0])
    assert data.stats["ext.std"] > 0


def test_nonfinite_guard_skips_update():
    """A NaN gradient must not poison params or the Adam moments; the next
    finite gradient must apply normally (BENCH.md round-5 alpha=0.3 NaN
    post-mortem: one overflowed iteration used to end a 100-epoch run)."""
    from solver_in_the_loop_tpu.train.trainer import notfinite_count

    cfg = SolTrainConfig(lr=1e-3, guard_nonfinite=True)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)

    bad = {"w": jnp.array([1.0, jnp.nan, 0.0])}
    upd, state = opt.update(bad, state, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.0)  # skipped
    assert notfinite_count(state) == 1

    good = {"w": jnp.ones(3)}
    upd, state = opt.update(good, state, params)
    assert np.isfinite(np.asarray(upd["w"])).all()
    assert float(jnp.abs(upd["w"]).max()) > 0.0
    assert notfinite_count(state) == 1


def test_warmup_epoch_scales_lr(monkeypatch):
    """fit() must inject lr*warmup_scale for epochs < warmup_epochs and the
    plain lr afterwards (the karman CLI defaults warmup to 1 epoch)."""
    from solver_in_the_loop_tpu.train import trainer as trainer_mod

    injected = []
    real_set = trainer_mod.set_learning_rate

    def spy(state, lr):
        injected.append(lr)
        return real_set(state, lr)

    monkeypatch.setattr(trainer_mod, "set_learning_rate", spy)

    cfg = SolTrainConfig(lr=1e-4, epochs=3, warmup_epochs=1, warmup_scale=0.1,
                         msteps=1, batch_size=1, log_every=1000)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones(2)}
    opt_state = opt.init(params)

    def fake_step(params, opt_state, data, norm, idx, wgt=None):
        return params, opt_state, jnp.float32(1.0), jnp.ones((cfg.msteps,))

    sched = EpochSchedule(2, 4, cfg.batch_size, seed=0)
    trainer_mod.run_training(fake_step, params, opt_state, {}, None, sched, cfg)
    np.testing.assert_allclose(injected, [1e-5, 1e-4, 1e-4], rtol=1e-6)
