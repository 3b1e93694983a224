"""Round-trip test for scripts/convert_reference_ckpt.py: build the reference
Keras architectures (karman_train.py:92-138, burgers_train_pre.py:343-369) in
real TF/Keras, save h5, convert to msgpack, and check our flax nets produce
the same outputs on random inputs. Skips when TensorFlow is unavailable."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.convert_reference_ckpt import (  # noqa: E402
    convert_datastats,
    convert_model,
    convert_pre_stats,
)


def _keras_mercury(in_ch):
    keras = tf.keras
    return keras.Sequential([
        keras.layers.Input(shape=(None, None, in_ch)),
        keras.layers.Conv2D(32, 5, padding="same", activation="relu"),
        keras.layers.Conv2D(64, 5, padding="same", activation="relu"),
        keras.layers.Conv2D(2, 5, padding="same"),
    ])


def _keras_mars_moon(in_ch):
    keras = tf.keras
    inp = keras.layers.Input(shape=(None, None, in_ch))
    x = keras.layers.Conv2D(32, 5, padding="same")(inp)
    x = keras.layers.LeakyReLU()(x)
    for _ in range(5):
        y = keras.layers.Conv2D(32, 5, padding="same")(x)
        y = keras.layers.LeakyReLU()(y)
        y = keras.layers.Conv2D(32, 5, padding="same")(y)
        x = keras.layers.LeakyReLU()(keras.layers.add([x, y]))
    out = keras.layers.Conv2D(2, 5, padding="same")(x)
    return keras.models.Model(inputs=inp, outputs=out)


def _keras_jupiter_moon(in_ch):
    keras = tf.keras
    inp = keras.layers.Input(shape=(None, None, in_ch))
    block = keras.layers.Conv2D(32, 5, padding="same", activation="relu")(inp)
    for feats in (32, 32, 64, 64, 32, 32):
        y = keras.layers.Conv2D(feats, 5, padding="same", activation="relu")(block)
        y = keras.layers.Conv2D(feats, 3, padding="same")(y)
        if block.shape[-1] != feats:  # 1x1 projection created AFTER the pair
            block = keras.layers.Conv2D(feats, 1)(block)
        block = keras.layers.LeakyReLU()(keras.layers.add([block, y]))
    out = keras.layers.Conv2D(2, 5, padding="same")(block)
    return keras.models.Model(inputs=inp, outputs=out)


_BUILDERS = {
    "mercury": _keras_mercury,
    "mars_moon": _keras_mars_moon,
    "jupiter_moon": _keras_jupiter_moon,
}


@pytest.mark.parametrize("arch,in_ch", [
    ("mercury", 3), ("mars_moon", 3), ("jupiter_moon", 4)])
def test_h5_round_trip(arch, in_ch, tmp_path):
    import jax
    import jax.numpy as jnp

    from solver_in_the_loop_tpu.models.networks import build_model

    rng = np.random.RandomState(0)
    km = _BUILDERS[arch](in_ch)
    # randomize so the test can't pass on zeros
    for w in km.weights:
        w.assign(rng.randn(*w.shape).astype(np.float32) * 0.2)
    h5 = str(tmp_path / "model.h5")
    km.save(h5, save_format="h5")

    out_path = str(tmp_path / "model.msgpack")
    params = convert_model(h5, arch, in_ch, out_path)
    assert os.path.exists(out_path)

    # converted weights are bit-exact (the converter round-trips float32
    # verbatim); outputs differ only by conv accumulation order between
    # TF/oneDNN and XLA, so compare relative to the output magnitude.
    # NB: compare against the EAGER keras call — model.predict's graph-mode
    # oneDNN rewrites drift up to ~7% from the model's own eager math on
    # this resnet (verified against a by-hand numpy evaluation).
    x = rng.randn(2, 16, 12, in_ch).astype(np.float32)
    want = np.asarray(km(tf.constant(x)))
    model = build_model(arch)  # leaky_slope default 0.3 == Keras LeakyReLU()
    got = np.asarray(jax.jit(model.apply)(
        jax.tree_util.tree_map(jnp.asarray, params), x))
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=1e-5 * max(scale, 1.0))


def test_datastats_pickle_conversion(tmp_path):
    import pickle

    pkl = str(tmp_path / "dataStats.pickle")
    with open(pkl, "wb") as f:
        pickle.dump({"std": (np.float32(0.5), (np.float32(0.7), np.float32(0.1))),
                     "ext.std": [np.float32(1.6e6)]}, f)
    out = str(tmp_path / "dataStats.json")
    convert_datastats(pkl, out, "karman")
    import json
    st = json.load(open(out))
    assert st["std.dens"] == pytest.approx(0.5)
    assert st["std.v"] == pytest.approx(0.7)
    assert st["std.u"] == pytest.approx(0.1)
    assert st["ext.std"] == pytest.approx(1.6e6)
    assert st["leaky_alpha"] == 0.3

    pkl2 = str(tmp_path / "stats.pickle")
    with open(pkl2, "wb") as f:
        pickle.dump({"in.std": np.asarray([0.7, 0.1, 1.6e6], np.float32),
                     "out.std": np.asarray([0.02, 0.01], np.float32)}, f)
    out2 = str(tmp_path / "stats.json")
    convert_pre_stats(pkl2, out2, "karman")
    st2 = json.load(open(out2))
    assert st2["in.std"] == pytest.approx([0.7, 0.1, 1.6e6])
    assert st2["ext.std"] == pytest.approx(1.6e6)
