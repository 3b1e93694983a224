"""Interpret-mode tests for the fused advection tap-sum kernel
(ops/pallas/advect_kernel.py) against the XLA shifted-stencil path and the
gather-based bilinear oracle, forward and gradients, OPEN and PERIODIC."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver_in_the_loop_tpu.ops import interp
from solver_in_the_loop_tpu.ops.pallas import advect_kernel as ak


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(ak, "_INTERPRET", True)


def _case(b, h, w, max_shift, seed=0, scale=1.5):
    rng = np.random.RandomState(seed)
    values = jnp.asarray(rng.randn(b, h, w), jnp.float32)
    dy = jnp.asarray(scale * rng.randn(b, h, w), jnp.float32)
    dx = jnp.asarray(scale * rng.randn(b, h, w), jnp.float32)
    return values, dy, dx


def _xla_tap_sum(values, dy, dx, max_shift, periodic):
    """The reference tap loop with kernel-identical pre-clamped offsets:
    call the public XLA path (clamps inside) — the kernel path is exercised
    through the same public function with dispatch forced on."""
    return interp.shifted_stencil_sample(values, dy, dx, max_shift, periodic)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("b,h,w,m", [(3, 16, 8, 2), (1, 8, 32, 1), (5, 12, 12, 2)])
def test_forward_matches_xla(monkeypatch, periodic, b, h, w, m):
    values, dy, dx = _case(b, h, w, m)
    want = _xla_tap_sum(values, dy, dx, m, periodic)
    monkeypatch.setenv("SILT_PALLAS_ADVECT", "1")
    assert ak.tap_sum_available(values.shape, m, periodic)
    # exercise THROUGH the public dispatch
    got = interp.shifted_stencil_sample(values, dy, dx, m, periodic)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("periodic", [False, True])
def test_forward_matches_gather_oracle(monkeypatch, periodic):
    """Small offsets (< max_shift, away from clamping): the shifted-stencil
    result must equal true bilinear gather sampling (tests/test_ops.py
    oracle, reference advect.semi_lagrangian karman-2d-phi2/karman.py:97)."""
    b, h, w, m = 2, 16, 12, 2
    rng = np.random.RandomState(3)
    values = jnp.asarray(rng.randn(b, h, w), jnp.float32)
    dy = jnp.asarray(0.9 * rng.randn(b, h, w).clip(-1, 1), jnp.float32)
    dx = jnp.asarray(0.9 * rng.randn(b, h, w).clip(-1, 1), jnp.float32)
    jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    want = interp.bilinear_sample(values, jj + dy, ii + dx, periodic)
    monkeypatch.setenv("SILT_PALLAS_ADVECT", "1")
    got = interp.shifted_stencil_sample(values, dy, dx, m, periodic)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("seed", [0, 7])
def test_gradients_match_xla(monkeypatch, periodic, seed):
    b, h, w, m = 2, 12, 8, 2
    values, dy, dx = _case(b, h, w, m, seed=seed)
    cot = jnp.asarray(np.random.RandomState(seed + 1).randn(b, h, w), jnp.float32)

    def loss_via(path_on):
        def f(v, y, x):
            if path_on:
                monkeypatch.setenv("SILT_PALLAS_ADVECT", "1")
            else:
                monkeypatch.setenv("SILT_PALLAS_ADVECT", "0")
            out = interp.shifted_stencil_sample(v, y, x, m, periodic)
            return jnp.sum(out * cot)
        return jax.grad(f, argnums=(0, 1, 2))(values, dy, dx)

    g_xla = loss_via(False)
    g_pl = loss_via(True)
    for a, b_ in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("periodic", [False, True])
def test_gradients_match_xla_at_exact_integer_offsets(monkeypatch, periodic):
    """Subgradient-convention regression (hardware validation, round 5):
    exact-integer offsets make ty = dy - sy hit 0 and +-1 exactly, where
    lax.abs' subgradient is +1 (not 0) and lax.max averages the tie branches
    (-0.5*sign). Not measure-zero in practice: the open-boundary clamp's
    clip(j+dy)-j can round dy to an exact integer in f32 (seen at (3,64,32):
    dy=-1.9999985 at j=52 snapped to -2.0 and failed the chip validation by
    2.2e-2 before the kernel matched these conventions)."""
    b, h, w, m = 2, 12, 8, 2
    rng = np.random.RandomState(11)
    values = jnp.asarray(rng.randn(b, h, w), jnp.float32)
    # every offset an exact integer in [-m-1, m+1]
    dy = jnp.asarray(rng.randint(-m - 1, m + 2, (b, h, w)), jnp.float32)
    dx = jnp.asarray(rng.randint(-m - 1, m + 2, (b, h, w)), jnp.float32)
    cot = jnp.asarray(rng.randn(b, h, w), jnp.float32)

    def grads(arm):
        monkeypatch.setenv("SILT_PALLAS_ADVECT", arm)
        f = lambda v, y, x: jnp.sum(
            interp.shifted_stencil_sample(v, y, x, m, periodic) * cot)
        return jax.grad(f, argnums=(0, 1, 2))(values, dy, dx)

    for a, e in zip(grads("1"), grads("0")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-5)


def test_dispatch_requires_marker_or_env(monkeypatch, tmp_path):
    monkeypatch.setattr(ak, "_INTERPRET", False)
    monkeypatch.setenv("SILT_PALLAS_ADVECT", "1")
    # CPU backend: never available off-TPU even when enabled
    assert not ak.tap_sum_available((3, 64, 32), 2, False)


def test_integration_karman_step(monkeypatch):
    """Full karman solver step with the fused advection dispatched (interpret)
    equals the XLA-shift step."""
    from solver_in_the_loop_tpu.physics.karman import KarmanFlow, initial_state, karman_domain

    dom = karman_domain(16)
    flow = KarmanFlow(dom, advection="shift", max_shift=2, pressure_max_iter=60)
    d0, v0 = initial_state(dom, 2)
    re = jnp.asarray([1.6e5, 3.2e5], jnp.float32)
    monkeypatch.setenv("SILT_PALLAS_ADVECT", "0")
    d_x, v_x, _ = flow.step(d0, v0, re)
    monkeypatch.setenv("SILT_PALLAS_ADVECT", "1")
    d_p, v_p, _ = flow.step(d0, v0, re)
    np.testing.assert_allclose(np.asarray(d_p.values), np.asarray(d_x.values),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_p.u), np.asarray(v_x.u),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_p.v), np.asarray(v_x.v),
                               rtol=1e-5, atol=2e-5)
