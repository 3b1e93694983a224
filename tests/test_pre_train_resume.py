"""PRE trainer: per-epoch checkpointing + --resume replay determinism.

A resumed run must be bit-identical to an uninterrupted one: the resume path
replays the skipped epochs' numpy RNG draws and lr schedule (the same
guarantee karman-train --resume gives, karman_train.py:358-359; reference PRE
saves every epoch via ModelCheckpoint, karman_train_pre.py:390).
"""

import numpy as np
import jax

from solver_in_the_loop_tpu.apps import pre_train
from solver_in_the_loop_tpu.io.scene import Scene


def _make_burgers_pre_scene(path, n_frames=12, seed=0):
    rng = np.random.RandomState(seed)
    sc = Scene(str(path / "sim_000000"))
    for t in range(1, n_frames + 1):
        for name in ("velo", "corr", "forc"):
            u = rng.randn(1, 8, 9).astype(np.float32)
            v = rng.randn(1, 9, 8).astype(np.float32)
            sc.write_staggered(name, t, u, v)
    return str(path / "sim_000000")


def _run(opath, scene_dir, epochs, resume=-1):
    argv = ["-o", str(opath), "--epochs", str(epochs), "--bsize", "4",
            "--seed", "0", "--val", "0.25", "--augment", "--nostats",
            "--lr", "1e-3", scene_dir]
    if resume > 0:
        argv += ["--resume", str(resume)]
    args = pre_train.build_parser().parse_args(argv)
    params, _ = pre_train.run(args, scenario="burgers")
    return params


def test_pre_resume_bit_identical(tmp_path):
    scene = _make_burgers_pre_scene(tmp_path)

    full = _run(tmp_path / "full", scene, epochs=4)

    interrupted = tmp_path / "interrupted"
    _run(interrupted, scene, epochs=2)
    resumed = _run(interrupted, scene, epochs=4, resume=2)

    for a, b in zip(jax.tree_util.tree_leaves(full),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pre_resume_restores_leaky_alpha(tmp_path):
    """A resume without re-passing --leaky-alpha must rebuild the net at the
    slope the run was started with, not the CLI default (ADVICE r4)."""
    import json

    scene = _make_burgers_pre_scene(tmp_path)
    out = tmp_path / "out"
    argv = ["-o", str(out), "--epochs", "2", "--bsize", "4", "--seed", "0",
            "--val", "0.25", "--nostats", "--leaky-alpha", "0.01", scene]
    pre_train.run(pre_train.build_parser().parse_args(argv), scenario="burgers")
    assert json.load(open(out / "stats.json"))["leaky_alpha"] == 0.01

    argv = ["-o", str(out), "--epochs", "3", "--bsize", "4", "--seed", "0",
            "--val", "0.25", "--nostats", "--resume", "2", scene]
    pre_train.run(pre_train.build_parser().parse_args(argv), scenario="burgers")
    # stats.json is rewritten on resume; it must keep the original slope
    assert json.load(open(out / "stats.json"))["leaky_alpha"] == 0.01


def test_pre_per_epoch_checkpoints_pruned(tmp_path):
    scene = _make_burgers_pre_scene(tmp_path)
    out = tmp_path / "out"
    _run(out, scene, epochs=3)
    # only the latest per-epoch snapshot survives (50-multiples are durable,
    # none here), plus the final model.msgpack
    assert (out / "model_epoch0003.msgpack").exists()
    assert not (out / "model_epoch0001.msgpack").exists()
    assert not (out / "model_epoch0002.msgpack").exists()
    assert (out / "model.msgpack").exists()
