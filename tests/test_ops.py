import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import Boundary, CenteredGrid, Domain, StaggeredGrid
from solver_in_the_loop_tpu.ops.advection import semi_lagrangian
from solver_in_the_loop_tpu.ops.diffusion import diffuse_explicit
from solver_in_the_loop_tpu.ops.interp import bilinear_sample, shifted_stencil_sample
from solver_in_the_loop_tpu.ops.poisson import (
    make_incompressible,
    masks_from_fluid_cells,
    open_domain_masks,
    solve_pressure,
)
from solver_in_the_loop_tpu.ops.stencils import divergence, laplacian, masked_laplacian, pressure_gradient
from solver_in_the_loop_tpu.physics.geometry import sphere_fluid_mask


# --- interp -----------------------------------------------------------------

def test_bilinear_identity_at_integer_coords():
    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.randn(2, 5, 7).astype(np.float32))
    jj = jnp.broadcast_to(jnp.arange(5.0)[None, :, None], (2, 5, 7))
    ii = jnp.broadcast_to(jnp.arange(7.0)[None, None, :], (2, 5, 7))
    out = bilinear_sample(vals, jj, ii)
    np.testing.assert_allclose(out, vals, rtol=1e-6)


def test_bilinear_midpoint():
    vals = jnp.asarray([[[0.0, 2.0], [4.0, 6.0]]])
    out = bilinear_sample(vals, jnp.asarray([[[0.5]]]), jnp.asarray([[[0.5]]]))
    np.testing.assert_allclose(out, 3.0)


def test_bilinear_clamps_open():
    vals = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
    out = bilinear_sample(vals, jnp.asarray([[[-3.0]]]), jnp.asarray([[[5.0]]]))
    np.testing.assert_allclose(out, 2.0)


def test_bilinear_periodic_wrap():
    vals = jnp.asarray(np.arange(8.0).reshape(1, 2, 4).astype(np.float32))
    out = bilinear_sample(vals, jnp.asarray([[[0.0]]]), jnp.asarray([[[4.0]]]), periodic=True)
    np.testing.assert_allclose(out, vals[0, 0, 0])


def test_shifted_stencil_matches_gather():
    rng = np.random.RandomState(3)
    vals = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-1.5, 1.5, (2, 8, 8)).astype(np.float32))
    dx = jnp.asarray(rng.uniform(-1.5, 1.5, (2, 8, 8)).astype(np.float32))
    jj = jnp.broadcast_to(jnp.arange(8.0)[None, :, None], (2, 8, 8))
    ii = jnp.broadcast_to(jnp.arange(8.0)[None, None, :], (2, 8, 8))
    for periodic in (False, True):
        a = shifted_stencil_sample(vals, dy, dx, max_shift=2, periodic=periodic)
        b = bilinear_sample(vals, jj + dy, ii + dx, periodic=periodic)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


# --- stencils ---------------------------------------------------------------

def test_laplacian_of_linear_field_interior_zero():
    yy, xx = np.meshgrid(np.arange(6.0), np.arange(8.0), indexing="ij")
    f = jnp.asarray((2 * yy + 3 * xx)[None].astype(np.float32))
    lap = laplacian(f)
    np.testing.assert_allclose(lap[:, 1:-1, 1:-1], 0.0, atol=1e-5)


def test_laplacian_periodic_constant():
    f = jnp.full((1, 4, 4), 7.0)
    np.testing.assert_allclose(laplacian(f, periodic=True), 0.0, atol=1e-6)


def test_divergence_uniform_flow_zero():
    u = jnp.ones((1, 4, 5))
    v = jnp.ones((1, 5, 4))
    np.testing.assert_allclose(divergence(u, v), 0.0)


def test_masked_laplacian_symmetric():
    rng = np.random.RandomState(5)
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (4.0, 4.0), 2.0)
    masks = masks_from_fluid_cells(fluid, dom)
    x = jnp.asarray(rng.randn(1, 8, 8).astype(np.float32)) * fluid
    y = jnp.asarray(rng.randn(1, 8, 8).astype(np.float32)) * fluid
    ax = masked_laplacian(x, masks.face_u, masks.face_v)
    ay = masked_laplacian(y, masks.face_u, masks.face_v)
    np.testing.assert_allclose(
        float(jnp.sum(y * ax)), float(jnp.sum(x * ay)), rtol=1e-4, atol=1e-4
    )


# --- diffusion --------------------------------------------------------------

def test_diffusion_preserves_constant():
    f = jnp.full((2, 6, 6), 2.5)
    np.testing.assert_allclose(diffuse_explicit(f, 0.2), 2.5, atol=1e-6)


def test_diffusion_conserves_sum_periodic():
    rng = np.random.RandomState(7)
    f = jnp.asarray(rng.randn(1, 8, 8).astype(np.float32))
    out = diffuse_explicit(f, 0.2, substeps=2, periodic=True)
    np.testing.assert_allclose(float(jnp.sum(out)), float(jnp.sum(f)), rtol=1e-5, atol=1e-5)


def test_diffusion_decays_sine_mode():
    n = 32
    x = np.arange(n)
    f = jnp.asarray(np.sin(2 * np.pi * x / n)[None, None, :].repeat(n, axis=1).astype(np.float32))
    alpha = 0.1
    out = diffuse_explicit(f, alpha, periodic=True)
    # eigenvalue of the 1-D mode: 1 + alpha*(2cos(2pi/n) - 2)
    lam = 1 + alpha * (2 * np.cos(2 * np.pi / n) - 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f) * lam, atol=1e-5)


def test_per_batch_diffusion_amounts():
    f = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8).astype(np.float32))
    amt = jnp.asarray([0.0, 0.2]).reshape(2, 1, 1)
    out = diffuse_explicit(f, amt)
    np.testing.assert_allclose(out[0], f[0], atol=1e-6)
    assert not np.allclose(out[1], f[1])


# --- advection --------------------------------------------------------------

def test_advection_integer_translation_periodic():
    dom = Domain((8, 8), (8.0, 8.0), Boundary.PERIODIC)
    rng = np.random.RandomState(11)
    rho = rng.randn(1, 8, 8).astype(np.float32)
    vel = dom.staggered_grid(u=1.0, v=0.0)  # uniform +x flow, dx=1, dt=1
    out = semi_lagrangian(CenteredGrid(jnp.asarray(rho), dom), vel, dt=1.0)
    np.testing.assert_allclose(np.asarray(out.values), np.roll(rho, 1, axis=2), atol=1e-5)


def test_advection_shift_matches_gather():
    dom = Domain((16, 16), (16.0, 16.0), Boundary.PERIODIC)
    rng = np.random.RandomState(13)
    u = jnp.asarray(rng.randn(2, 16, 17).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 17, 16).astype(np.float32))
    vel = StaggeredGrid(u, v, dom)
    a = semi_lagrangian(vel, vel, dt=0.3, method="gather")
    b = semi_lagrangian(vel, vel, dt=0.3, method="shift", max_shift=2)
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v), atol=1e-5)


def test_advection_open_clamps():
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    rho = jnp.ones((1, 8, 8))
    vel = dom.staggered_grid(u=5.0, v=0.0)
    out = semi_lagrangian(CenteredGrid(rho, dom), vel, dt=1.0)
    np.testing.assert_allclose(out.values, 1.0, atol=1e-6)  # constant field invariant


# --- poisson / projection ---------------------------------------------------

def test_projection_removes_divergence_open():
    dom = Domain((16, 16), (16.0, 16.0), Boundary.OPEN)
    rng = np.random.RandomState(17)
    u = jnp.asarray(rng.randn(2, 16, 17).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 17, 16).astype(np.float32))
    vel = StaggeredGrid(u, v, dom)
    masks = open_domain_masks(dom)
    out, _p = make_incompressible(vel, masks, tol=1e-7, max_iter=2000)
    div = divergence(out.u, out.v)
    assert float(jnp.max(jnp.abs(div))) < 1e-4


def test_projection_with_obstacle():
    dom = Domain((16, 16), (16.0, 16.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (8.0, 8.0), 3.0)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(19)
    u = jnp.asarray(rng.randn(1, 16, 17).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 17, 16).astype(np.float32))
    out, _p = make_incompressible(StaggeredGrid(u, v, dom), masks, tol=1e-7, max_iter=2000)
    div = divergence(out.u, out.v) * fluid
    assert float(jnp.max(jnp.abs(div))) < 1e-4
    # no flow through obstacle faces
    np.testing.assert_allclose(np.asarray(out.u * (1 - masks.face_u)), 0.0, atol=1e-6)


def test_projection_idempotent():
    dom = Domain((16, 16), (16.0, 16.0), Boundary.OPEN)
    masks = open_domain_masks(dom)
    rng = np.random.RandomState(23)
    vel = StaggeredGrid(
        jnp.asarray(rng.randn(1, 16, 17).astype(np.float32)),
        jnp.asarray(rng.randn(1, 17, 16).astype(np.float32)),
        dom,
    )
    once, _ = make_incompressible(vel, masks, tol=1e-7, max_iter=2000)
    twice, _ = make_incompressible(once, masks, tol=1e-7, max_iter=2000)
    np.testing.assert_allclose(np.asarray(once.u), np.asarray(twice.u), atol=1e-3)


def test_pressure_solve_gradient_flows():
    """custom_linear_solve VJP: gradients through the projection are finite and
    match finite differences on a small problem."""
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    masks = open_domain_masks(dom)

    def loss(u_flat):
        u = u_flat.reshape(1, 8, 9)
        v = jnp.zeros((1, 9, 8))
        vel, _ = make_incompressible(StaggeredGrid(u, v, dom), masks, tol=1e-9, max_iter=4000)
        return jnp.sum(vel.u**2)

    rng = np.random.RandomState(29)
    u0 = jnp.asarray(rng.randn(72).astype(np.float32))
    g = jax.grad(loss)(u0)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-3
    d = jnp.asarray(rng.randn(72).astype(np.float32))
    fd = (loss(u0 + eps * d) - loss(u0 - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.dot(g, d)), float(fd), rtol=2e-2, atol=2e-2)


def test_solve_pressure_matches_dense_solution():
    """CG result equals a dense numpy solve of the same masked system."""
    dom = Domain((6, 6), (6.0, 6.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (3.0, 3.0), 1.2)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(31)
    div = jnp.asarray(rng.randn(1, 6, 6).astype(np.float32))
    p = solve_pressure(div, masks, tol=1e-10, max_iter=5000)

    # dense operator
    n = 36
    a = np.zeros((n, n), np.float32)
    eye = np.eye(n, dtype=np.float32)
    from solver_in_the_loop_tpu.ops.stencils import masked_laplacian as ml

    for i in range(n):
        col = jnp.asarray(eye[i].reshape(1, 6, 6))
        av = -np.asarray(ml(col, masks.face_u, masks.face_v)).reshape(-1)
        fl = np.asarray(fluid).reshape(-1)
        a[:, i] = np.where(fl > 0, av, eye[i])
    rhs = np.where(np.asarray(fluid).reshape(-1) > 0, -np.asarray(div).reshape(-1), 0)
    p_dense = np.linalg.solve(a, rhs)
    np.testing.assert_allclose(np.asarray(p).reshape(-1), p_dense, atol=1e-3)


# --- pressure warm start -----------------------------------------------------

def test_warm_start_matches_cold_solution():
    """solve_pressure(x0=...) converges to the same pressure as the cold solve
    (the solution is x0-independent; only the iteration count changes)."""
    dom = Domain((16, 16), (16.0, 16.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (8.0, 8.0), 3.0)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(41)
    div = jnp.asarray(rng.randn(1, 16, 16).astype(np.float32))
    p_cold = solve_pressure(div, masks, tol=1e-8, max_iter=4000)
    # warm from a perturbed copy of the solution AND from garbage
    for x0 in (p_cold + 0.01 * jnp.asarray(rng.randn(1, 16, 16).astype(np.float32)),
               jnp.asarray(100.0 * rng.randn(1, 16, 16).astype(np.float32))):
        p_warm = solve_pressure(div, masks, tol=1e-8, max_iter=4000, x0=x0)
        np.testing.assert_allclose(np.asarray(p_warm), np.asarray(p_cold), atol=1e-4)


def test_warm_start_cuts_iterations():
    from solver_in_the_loop_tpu.ops.poisson import pressure_solve_iterations

    dom = Domain((32, 32), (32.0, 32.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (16.0, 16.0), 5.0)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(43)
    div = jnp.asarray(rng.randn(1, 32, 32).astype(np.float32))
    p = solve_pressure(div, masks, tol=1e-5, max_iter=4000)
    it_cold = int(pressure_solve_iterations(div, masks, tol=1e-5, max_iter=4000))
    # a nearby rhs (consecutive-step analogue) warm-started from p
    div2 = div + 0.01 * jnp.asarray(rng.randn(1, 32, 32).astype(np.float32))
    it_warm = int(pressure_solve_iterations(div2, masks, tol=1e-5, max_iter=4000, x0=p))
    it_cold2 = int(pressure_solve_iterations(div2, masks, tol=1e-5, max_iter=4000))
    # 1% rhs perturbation => ~2 of 5 residual decades already converged; the
    # saving grows as consecutive steps get closer (see BENCH.md measured
    # karman-step numbers)
    assert it_warm < it_cold2 * 0.85, (it_warm, it_cold2, it_cold)
    # warm start from the exact solution of the SAME rhs: ~instant
    it_exact = int(pressure_solve_iterations(div, masks, tol=1e-5, max_iter=4000, x0=p))
    assert it_exact <= 2, it_exact


def test_warm_start_gradients_match_cold():
    """x0 is stop_gradient'ed: gradients through a warm-started projection
    equal the cold-start gradients (implicit-function adjoint both ways)."""
    dom = Domain((8, 8), (8.0, 8.0), Boundary.OPEN)
    masks = open_domain_masks(dom)
    rng = np.random.RandomState(47)
    x0 = jnp.asarray(rng.randn(1, 8, 8).astype(np.float32))

    def loss(u_flat, warm):
        u = u_flat.reshape(1, 8, 9)
        v = jnp.zeros((1, 9, 8))
        vel, _ = make_incompressible(
            StaggeredGrid(u, v, dom), masks, tol=1e-10, max_iter=4000,
            p0=x0 if warm else None)
        return jnp.sum(vel.u**2)

    u0 = jnp.asarray(rng.randn(72).astype(np.float32))
    g_cold = jax.grad(loss)(u0, False)
    g_warm = jax.grad(loss)(u0, True)
    np.testing.assert_allclose(np.asarray(g_warm), np.asarray(g_cold), atol=1e-4)


def test_fd_pcg_matches_plain_cg_and_cuts_iterations():
    """Fast-diagonalization PCG (production XLA path for open boundaries)
    reaches the same solution as plain CG under the same stopping rule, in
    strictly fewer iterations on an obstacle geometry."""
    from solver_in_the_loop_tpu.ops.poisson import (
        cg_solve_info, fd_minv, masks_from_fluid_cells, pcg_solve_info)
    from solver_in_the_loop_tpu.physics.geometry import sphere_fluid_mask

    dom = Domain((32, 16), (32.0, 16.0), Boundary.OPEN)
    fluid = sphere_fluid_mask(dom, (12.0, 8.0), 3.0)
    masks = masks_from_fluid_cells(fluid, dom)
    rng = np.random.RandomState(11)
    rhs = jnp.where(fluid > 0, jnp.asarray(rng.randn(2, 32, 16).astype(np.float32)), 0.0)

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v)
        return jnp.where(fluid > 0, -lp, p)

    x_cg, it_cg = cg_solve_info(matvec, rhs, tol=1e-6, max_iter=500)
    x_pcg, it_pcg = pcg_solve_info(matvec, fd_minv(32, 16), rhs,
                                   tol=1e-6, max_iter=500)
    np.testing.assert_allclose(np.asarray(x_pcg), np.asarray(x_cg),
                               rtol=1e-3, atol=1e-4)
    assert int(it_pcg) < int(it_cg), (int(it_pcg), int(it_cg))
