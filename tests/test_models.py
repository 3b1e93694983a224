import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import Domain, StaggeredGrid
from solver_in_the_loop_tpu.models.features import (
    Normalization,
    burgers_features,
    correction_to_staggered,
    karman_features,
)
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.train.checkpoint import param_count


def test_mars_moon_param_count_and_shapes():
    """Exact architecture parity: stem 3->32 (2,432) + 5 res blocks of two
    5x5x32x32 convs (5 x 51,264) + 32->2 head (1,602) = 260,354 params.
    (SURVEY.md §2.3 quotes ~570k; the layer-by-layer count of the reference
    model at karman_train.py:101-138 is 260,354.)"""
    model = build_model("mars_moon")
    x = jnp.zeros((2, 64, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    n = param_count(params)
    assert n == 260_354, n
    out = model.apply(params, x)
    assert out.shape == (2, 64, 32, 2)
    # fully convolutional: different input resolution reuses the same params
    out2 = model.apply(params, jnp.zeros((1, 32, 16, 3)))
    assert out2.shape == (1, 32, 16, 2)


def test_mercury_shapes():
    model = build_model("mercury")
    x = jnp.zeros((1, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 16, 16, 2)


def test_jupiter_moon_shapes_and_param_count():
    """Reference-exact jupiter_moon (burgers_train_pre.py:343-369): stem
    conv5x5(4->32)+ReLU (3,232) + blocks of [conv5x5(F) ReLU, conv3x3(F)
    linear, 1x1-projected skip add, LeakyReLU]: 2@32 (2 x 34,880), 2@64
    (90,304 + 139,392), 2@32 (62,560 + 34,880) + conv5x5 32->2 head (1,602)
    = 401,730 params."""
    model = build_model("jupiter_moon")
    x = jnp.zeros((1, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    n = param_count(params)
    assert n == 401_730, n
    # the blocks' second conv is 3x3 (NOT the mars_moon 5x5)
    shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any(a.shape[:2] == (3, 3) for _, a in flat if a.ndim == 4), shapes
    assert model.apply(params, x).shape == (1, 16, 16, 2)


def test_leaky_slope_default_is_keras_alpha():
    """Keras LeakyReLU() alpha = 0.3 (karman_train.py:105) is the default;
    0.01 reproduces pre-fix (rounds 1-4a) checkpoints."""
    assert build_model("mars_moon").leaky_slope == 0.3
    assert build_model("jupiter_moon").leaky_slope == 0.3
    assert build_model("mars_moon", leaky_slope=0.01).leaky_slope == 0.01
    # the slope is live: identical params, different outputs
    m3 = build_model("mars_moon", init="reference")
    m1 = build_model("mars_moon", init="reference", leaky_slope=0.01)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3), jnp.float32)
    p = m3.init(jax.random.PRNGKey(0), x)
    assert float(jnp.max(jnp.abs(m3.apply(p, x) - m1.apply(p, x)))) > 1e-4


def test_unknown_model_raises():
    import pytest

    with pytest.raises(KeyError):
        build_model("nonexistent")


def test_karman_features_normalization():
    dom = Domain((8, 4), (8.0, 4.0))
    rng = np.random.RandomState(0)
    vel = StaggeredGrid(
        jnp.asarray(rng.randn(2, 8, 5).astype(np.float32)),
        jnp.asarray(rng.randn(2, 9, 4).astype(np.float32)),
        dom,
    )
    norm = Normalization.karman(2.0, 4.0, 1e5)
    re = jnp.asarray([1e5, 2e5])
    feat = karman_features(vel, re, norm)
    assert feat.shape == (2, 8, 4, 3)
    np.testing.assert_allclose(np.asarray(feat[..., 0]), np.asarray(vel.v[:, :-1, :]) / 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(feat[..., 1]), np.asarray(vel.u[:, :, :-1]) / 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(feat[0, :, :, 2]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(feat[1, :, :, 2]), 2.0, rtol=1e-6)


def test_correction_scaling_roundtrip():
    dom = Domain((8, 4), (8.0, 4.0))
    norm = Normalization.karman(2.0, 4.0, 1.0)
    out = jnp.ones((1, 8, 4, 2))
    corr = correction_to_staggered(out, norm, dom)
    np.testing.assert_allclose(np.asarray(corr.v[:, :-1, :]), 2.0)
    np.testing.assert_allclose(np.asarray(corr.u[:, :, :-1]), 4.0)
    np.testing.assert_allclose(np.asarray(corr.v[:, -1, :]), 0.0)
    np.testing.assert_allclose(np.asarray(corr.u[:, :, -1]), 0.0)


def test_burgers_features():
    dom = Domain((8, 8), (8.0, 8.0))
    vel = dom.staggered_grid(1.0, 2.0)
    force = dom.staggered_grid(3.0, 4.0)
    norm = Normalization.burgers(1.0, 1.0, 1.0, 1.0)
    feat = burgers_features(vel, force, norm)
    assert feat.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(feat[..., 0]), 2.0)  # v
    np.testing.assert_allclose(np.asarray(feat[..., 1]), 1.0)  # u
    np.testing.assert_allclose(np.asarray(feat[..., 2]), 4.0)  # fv
    np.testing.assert_allclose(np.asarray(feat[..., 3]), 3.0)  # fu


def test_nozerocen_normalization_means():
    """--nozerocen contract: features subtract channel means before scaling,
    corrections add them back after scaling (tf_data.py:29-38)."""
    import jax.numpy as jnp
    from solver_in_the_loop_tpu.core.grids import Domain, StaggeredGrid
    from solver_in_the_loop_tpu.models.features import (
        Normalization,
        correction_to_staggered,
        karman_features,
    )

    dom = Domain((4, 8), (100.0, 200.0))
    u = jnp.ones((1, 4, 9)) * 3.0
    v = jnp.ones((1, 5, 8)) * 5.0
    vel = StaggeredGrid(u, v, dom)
    norm = Normalization(
        jnp.asarray([2.0, 2.0, 10.0]), jnp.asarray([2.0, 4.0]),
        in_means=jnp.asarray([5.0, 3.0, 0.0]),
        out_means=jnp.asarray([1.0, -1.0]),
    )
    feat = karman_features(vel, jnp.asarray([10.0]), norm)
    # lower-face collocated samples are exactly the constant values
    np.testing.assert_allclose(np.asarray(feat[0, :, :, 0]), 0.0, atol=1e-6)  # (5-5)/2
    np.testing.assert_allclose(np.asarray(feat[0, :, :, 1]), 0.0, atol=1e-6)  # (3-3)/2
    np.testing.assert_allclose(np.asarray(feat[0, :, :, 2]), 1.0, atol=1e-6)  # 10/10

    out = jnp.zeros((1, 4, 8, 2))
    corr = correction_to_staggered(out, norm, dom)
    # zero net output deStandardizes to the means [v=1, u=-1] on interior faces
    np.testing.assert_allclose(np.asarray(corr.v[0, :-1, :]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(corr.u[0, :, :-1]), -1.0, atol=1e-6)


def test_nonzero_channel_mean():
    from solver_in_the_loop_tpu.apps.pre_train import nonzero_channel_mean

    data = np.zeros((2, 3, 3, 2), np.float32)
    data[0, 0, 0, 0] = 2.0
    data[1, 1, 1, 0] = 4.0
    m = nonzero_channel_mean(data)
    np.testing.assert_allclose(m, [3.0, 0.0])


def test_conv_dispatch_pallas_xla_checkpoint_interchangeable(monkeypatch):
    """models.networks.Conv dispatches to the Pallas kernels without changing
    the param tree or the output: a checkpoint produced on the XLA path must
    load and evaluate identically on the Pallas path (and vice versa)."""
    import numpy as np
    from solver_in_the_loop_tpu.ops.pallas import conv_kernel as ck

    model = build_model("mars_moon")
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8, 8, 3), jnp.float32)
    monkeypatch.setattr(ck, "_INTERPRET", False)  # conv_available False on CPU
    params = model.init(jax.random.PRNGKey(0), x)
    y_xla = model.apply(params, x)
    monkeypatch.setattr(ck, "_INTERPRET", True)   # force the Pallas path
    for variant in ("patch", "taps"):
        monkeypatch.setenv("SILT_PALLAS_CONV_VARIANT", variant)
        y_pal = model.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                                   rtol=1e-5, atol=1e-5, err_msg=variant)
