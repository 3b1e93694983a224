"""Checkpoint/resume semantics (msgpack params+opt_state, stats, schedules)."""

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.train import checkpoint as ckpt
from solver_in_the_loop_tpu.train.dataset import EpochSchedule
from solver_in_the_loop_tpu.train.trainer import SolTrainConfig, make_optimizer


def test_checkpoint_roundtrip(tmp_path):
    model = build_model("mercury")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    opt = make_optimizer(SolTrainConfig(lr=1e-3))
    opt_state = opt.init(params)

    path = ckpt.save_checkpoint(str(tmp_path), params, opt_state, epoch=10)
    assert path.endswith("model_epoch0010.msgpack")

    # perturb templates, restore, compare
    p2 = jax.tree_util.tree_map(lambda x: x * 0 + 7.0, params)
    s2 = opt.init(p2)
    restored_p, restored_s = ckpt.load_epoch_checkpoint(str(tmp_path), 10, p2, s2)
    for a, b in zip(jax.tree_util.tree_leaves(restored_p), jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored_s), jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_final_checkpoint_path(tmp_path):
    model = build_model("mercury")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    path = ckpt.save_checkpoint(str(tmp_path), params)
    assert path.endswith("model.msgpack")
    restored, _ = ckpt.load_checkpoint(path, params)
    assert ckpt.param_count(restored) == ckpt.param_count(params)


def test_stats_roundtrip(tmp_path):
    stats = {"std.v": 0.3, "std.u": 0.17, "ext.std": 1.2e6}
    ckpt.save_stats(str(tmp_path), stats)
    assert ckpt.load_stats(str(tmp_path)) == stats


def test_resume_schedule_reproducibility():
    """Resuming must skip epochs while consuming the shuffle schedule, so the
    resumed run sees the same data order as an uninterrupted run
    (karman_train.py:472-490 semantics)."""
    full = EpochSchedule(4, 10, 2, seed=7)
    epochs_full = [full.epoch_indices(2) for _ in range(5)]

    resumed = EpochSchedule(4, 10, 2, seed=7)
    for _ in range(3):  # simulate skipping 3 epochs (consumes the RNG)
        resumed.epoch_indices(2)
    e3 = resumed.epoch_indices(2)
    np.testing.assert_array_equal(e3, epochs_full[3])
