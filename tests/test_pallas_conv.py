"""Fused Pallas im2col conv (fwd + custom_vjp bwd) vs XLA conv, interpret mode.

The kernel is exact (same contraction order per tap, f32 accumulation), so
forward outputs match XLA's conv_general_dilated tightly and the hand-written
dgrad/wgrad/bias grads must match jax.grad through the XLA reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver_in_the_loop_tpu.ops.pallas import conv_kernel as ck


@pytest.fixture(autouse=True, params=["patch", "taps"])
def _interpret(monkeypatch, request):
    monkeypatch.setattr(ck, "_INTERPRET", True)
    monkeypatch.setenv("SILT_PALLAS_CONV_VARIANT", request.param)


def _mk(B, H, W, Cin, Cout, K=5, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(0.1 * rng.randn(K, K, Cin, Cout), jnp.float32)
    b = jnp.asarray(0.01 * rng.randn(Cout), jnp.float32)
    return x, w, b


@pytest.mark.parametrize("shape", [
    (3, 8, 8, 3, 32),    # input layer: single row tile
    (3, 8, 8, 32, 2),    # output layer
    (3, 16, 16, 32, 32), # M=768 > TM=512: two tiles, padded rows in play
    (2, 8, 8, 8, 8, 3),  # 3x3 kernel
])
def test_forward_matches_xla(shape):
    K = shape[5] if len(shape) > 5 else 5
    x, w, b = _mk(*shape[:5], K=K)
    y_ref = ck.conv_reference(x, w, b)
    y_pal = ck.conv_same(x, w, b)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [
    (3, 8, 8, 3, 8),
    (3, 16, 16, 8, 8),   # two row tiles: exercises wgrad accumulation
])
def test_grads_match_xla(shape):
    x, w, b = _mk(*shape)
    cot = jnp.asarray(np.random.RandomState(9).randn(
        *x.shape[:3], w.shape[-1]), jnp.float32)

    def loss_pal(x, w, b):
        return jnp.sum(ck.conv_same(x, w, b) * cot)

    def loss_ref(x, w, b):
        return jnp.sum(ck.conv_reference(x, w, b) * cot)

    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, e, name in zip(gp, gr, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_conv_available_gating():
    # interpret mode bypasses the backend/marker gates; shape gates remain
    assert ck.conv_available((3, 8, 8, 3), (5, 5), 3, 32)
    assert not ck.conv_available((3, 8, 8, 3), (1, 1), 3, 32)   # 1x1: XLA
    assert not ck.conv_available((3, 8, 8, 3), (4, 4), 3, 32)   # even K
    assert not ck.conv_available((3, 8, 8, 3), (5, 3), 3, 32)   # non-square
    # working set past the VMEM budget
    assert not ck.conv_available((64, 128, 128, 64), (5, 5), 64, 64)


def test_conv_under_scan_remat(monkeypatch):
    """The production structure: conv inside a jax.checkpoint'd scan body with
    the save_only_these_names("conv") policy (trainer remat_policy
    "pressure+conv") — grads must match the XLA path."""
    from jax.ad_checkpoint import checkpoint_name

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32)
    w = jnp.asarray(0.1 * rng.randn(5, 5, 8, 8), jnp.float32)
    b = jnp.asarray(0.01 * rng.randn(8), jnp.float32)

    def loss(w, b, conv):
        def step(x, _):
            y = checkpoint_name(conv(x, w, b), "conv")
            return jnp.tanh(y) + 0.1 * x, jnp.sum(x ** 2)

        pol = jax.checkpoint_policies.save_only_these_names("conv")
        xf, ls = jax.lax.scan(jax.checkpoint(step, policy=pol), x0, jnp.arange(4))
        return jnp.sum(ls) + jnp.sum(xf ** 2)

    gp = jax.grad(loss, argnums=(0, 1))(w, b, ck.conv_same)
    gr = jax.grad(loss, argnums=(0, 1))(w, b, ck.conv_reference)
    for a, e, name in zip(gp, gr, ("dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


@pytest.mark.parametrize("act,with_skip", [
    ("relu", False), ("leaky_relu", False), ("leaky_relu", True), ("none", True),
])
def test_fused_epilogue_matches_xla(act, with_skip):
    """conv_fused (+skip, +activation in-kernel) vs the XLA composition,
    values and grads (incl. d/dskip)."""
    x, w, b = _mk(3, 8, 8, 8, 8, seed=4)
    skip = jnp.asarray(np.random.RandomState(5).randn(3, 8, 8, 8),
                       jnp.float32) if with_skip else None
    cot = jnp.asarray(np.random.RandomState(6).randn(3, 8, 8, 8), jnp.float32)
    slope = 0.3

    def ref(x, w, b, s):
        y = ck.conv_reference(x, w, b)
        if s is not None:
            y = y + s
        if act == "relu":
            y = jax.nn.relu(y)
        elif act == "leaky_relu":
            y = jax.nn.leaky_relu(y, slope)
        return y

    def pal(x, w, b, s):
        return ck.conv_fused(x, w, b, s, act=act, slope=slope)

    args = (x, w, b, skip)
    np.testing.assert_allclose(np.asarray(pal(*args)), np.asarray(ref(*args)),
                               rtol=1e-5, atol=1e-5)
    nums = (0, 1, 2, 3) if with_skip else (0, 1, 2)
    gp = jax.grad(lambda *a: jnp.sum(pal(*a, *(() if with_skip else (None,))) * cot),
                  argnums=nums)(*(args[:4] if with_skip else args[:3]))
    gr = jax.grad(lambda *a: jnp.sum(ref(*a, *(() if with_skip else (None,))) * cot),
                  argnums=nums)(*(args[:4] if with_skip else args[:3]))
    for a, e, name in zip(gp, gr, ("dx", "dw", "db", "dskip")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
