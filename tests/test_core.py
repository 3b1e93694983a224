import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import Boundary, Domain, StaggeredGrid
from solver_in_the_loop_tpu.core.resample import (
    downsample2x_centered,
    downsample2x_staggered,
    downsample_staggered,
    upsample2x_centered,
    upsample2x_staggered,
)


def test_domain_shapes():
    d = Domain((64, 32), (200.0, 100.0), Boundary.OPEN)
    assert d.centered_shape(3) == (3, 64, 32)
    assert d.u_shape(3) == (3, 64, 33)
    assert d.v_shape(3) == (3, 65, 32)
    assert d.dx == (200.0 / 64, 100.0 / 32)


def test_collocated_roundtrip():
    d = Domain((8, 4), (8.0, 4.0))
    rng = np.random.RandomState(0)
    u = rng.randn(2, 8, 5).astype(np.float32)
    v = rng.randn(2, 9, 4).astype(np.float32)
    g = StaggeredGrid(jnp.asarray(u), jnp.asarray(v), d)
    f = g.to_collocated()
    assert f.shape == (2, 8, 4, 2)
    # channel 0 = v bottom faces, channel 1 = u left faces
    np.testing.assert_allclose(f[..., 0], v[:, :-1, :])
    np.testing.assert_allclose(f[..., 1], u[:, :, :-1])
    back = StaggeredGrid.from_collocated(f, d)
    np.testing.assert_allclose(back.v[:, :-1, :], v[:, :-1, :])
    np.testing.assert_allclose(back.v[:, -1, :], 0.0)
    np.testing.assert_allclose(back.u[:, :, -1], 0.0)


def test_downsample_centered_mean():
    x = jnp.arange(16.0).reshape(1, 4, 4)
    lo = downsample2x_centered(x)
    np.testing.assert_allclose(lo[0, 0, 0], (0 + 1 + 4 + 5) / 4.0)
    assert lo.shape == (1, 2, 2)


def test_downsample_staggered_shapes_and_values():
    rng = np.random.RandomState(1)
    u = rng.randn(1, 8, 9).astype(np.float32)
    v = rng.randn(1, 9, 8).astype(np.float32)
    u_lo, v_lo = downsample2x_staggered(jnp.asarray(u), jnp.asarray(v))
    assert u_lo.shape == (1, 4, 5)
    assert v_lo.shape == (1, 5, 4)
    np.testing.assert_allclose(u_lo[0, 0, 0], 0.5 * (u[0, 0, 0] + u[0, 1, 0]), rtol=1e-6)
    np.testing.assert_allclose(v_lo[0, 0, 0], 0.5 * (v[0, 0, 0] + v[0, 0, 1]), rtol=1e-6)
    # 4x: apply twice
    u4, v4 = downsample_staggered(jnp.asarray(u), jnp.asarray(v), 4)
    assert u4.shape == (1, 2, 3) and v4.shape == (1, 3, 2)


def test_downsample_staggered_preserves_uniform_flow():
    u = jnp.ones((1, 8, 9))
    v = jnp.full((1, 9, 8), 2.0)
    u_lo, v_lo = downsample2x_staggered(u, v)
    np.testing.assert_allclose(u_lo, 1.0)
    np.testing.assert_allclose(v_lo, 2.0)


def test_upsample_centered_preserves_constant_and_linear():
    c = jnp.full((1, 4, 4), 3.0)
    np.testing.assert_allclose(upsample2x_centered(c), 3.0)
    # linear ramp stays linear in the interior
    x = jnp.broadcast_to(jnp.arange(8.0)[None, None, :], (1, 4, 8))
    up = upsample2x_centered(x)
    interior = np.diff(np.asarray(up[0, 2, 2:-2]))
    np.testing.assert_allclose(interior, 0.5, atol=1e-5)


def test_upsample_staggered_constant():
    u = jnp.full((1, 4, 5), 1.5)
    v = jnp.full((1, 5, 4), -0.5)
    u_hi, v_hi = upsample2x_staggered(u, v)
    assert u_hi.shape == (1, 8, 9)
    assert v_hi.shape == (1, 9, 8)
    np.testing.assert_allclose(u_hi, 1.5, atol=1e-6)
    np.testing.assert_allclose(v_hi, -0.5, atol=1e-6)


def test_up_down_staggered_roundtrip_smooth():
    d = Domain((8, 8), (8.0, 8.0))
    yy, xx = np.meshgrid(np.arange(8) + 0.5, np.arange(9), indexing="ij")
    u = np.sin(2 * np.pi * xx / 9 / 4)[None].astype(np.float32)
    yy2, xx2 = np.meshgrid(np.arange(9), np.arange(8) + 0.5, indexing="ij")
    v = np.cos(2 * np.pi * yy2 / 9 / 4)[None].astype(np.float32)
    u_hi, v_hi = upsample2x_staggered(jnp.asarray(u), jnp.asarray(v))
    u_rt, v_rt = downsample2x_staggered(u_hi, v_hi)
    np.testing.assert_allclose(u_rt, u, atol=0.05)
    np.testing.assert_allclose(v_rt, v, atol=0.05)
