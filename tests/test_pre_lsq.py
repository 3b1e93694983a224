"""PRE least-squares solver vs a dense numpy oracle of the reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solver_in_the_loop_tpu.core.grids import Boundary, Domain
from solver_in_the_loop_tpu.pre.lsq import (
    build_pre_geometry,
    make_apply_g,
    make_apply_w,
    solve_correction,
    tree_cg,
)


@pytest.fixture(scope="module")
def geom():
    lo = Domain((8, 8), (32.0, 32.0), Boundary.OPEN)
    hi = Domain((32, 32), (32.0, 32.0), Boundary.OPEN)
    return build_pre_geometry(lo, hi, scale=4, bnd=2)


def _vec_to_flat(vec):
    return np.concatenate([np.asarray(vec["u"]).ravel(), np.asarray(vec["v"]).ravel()])


def _dense_w(geom):
    apply_w = make_apply_w(geom)
    nu = geom.lo_fu.size
    nv = geom.lo_fv.size
    cols = []
    for k in range(nu + nv):
        e = np.zeros(nu + nv, np.float32)
        e[k] = 1.0
        vec = {
            "u": jnp.asarray(e[:nu].reshape(geom.lo_fu.shape)),
            "v": jnp.asarray(e[nu:].reshape(geom.lo_fv.shape)),
        }
        cols.append(_vec_to_flat(apply_w(vec)))
    return np.stack(cols, axis=1)  # (Nhi, Nlo)


def test_w_interpolates_constants(geom):
    """A constant field on valid lo faces interpolates to a constant on valid
    hi faces (weight renormalization)."""
    apply_w = make_apply_w(geom)
    vec = {"u": jnp.asarray(geom.lo_fu) * 2.0, "v": jnp.asarray(geom.lo_fv) * -1.0}
    out = apply_w(vec)
    hi_fu, hi_fv = geom.hi_fu, geom.hi_fv
    u = np.asarray(out["u"])[hi_fu > 0]
    v = np.asarray(out["v"])[hi_fv > 0]
    np.testing.assert_allclose(u, 2.0, atol=1e-5)
    np.testing.assert_allclose(v, -1.0, atol=1e-5)


def test_tree_cg_solves_spd_system():
    rng = np.random.RandomState(0)
    m = rng.randn(6, 6).astype(np.float32)
    a = m @ m.T + 0.5 * np.eye(6, dtype=np.float32)
    b = rng.randn(6).astype(np.float32)

    def matvec(x):
        return {"x": jnp.asarray(a) @ x["x"]}

    sol = tree_cg(matvec, {"x": jnp.asarray(b)}, tol=1e-10, max_iter=200)
    np.testing.assert_allclose(np.asarray(sol["x"]), np.linalg.solve(a, b), atol=1e-4)


def test_unconstrained_solution_matches_dense_oracle(geom):
    """burgers PRE: (W^T W + 2bI) v = W^T vh + 2b v_prev (burgers_pre.py:311-318)."""
    rng = np.random.RandomState(1)
    vh_u = rng.randn(*geom.hi_fu.shape).astype(np.float32)
    vh_v = rng.randn(*geom.hi_fv.shape).astype(np.float32)
    prev_u = rng.randn(*geom.lo_fu.shape).astype(np.float32)
    prev_v = rng.randn(*geom.lo_fv.shape).astype(np.float32)
    beta = 0.7

    cu, cv = solve_correction(
        geom, jnp.asarray(vh_u), jnp.asarray(vh_v), jnp.asarray(prev_u),
        jnp.asarray(prev_v), beta=beta, constrained=False, tol=1e-8, max_iter=4000,
    )

    w = _dense_w(geom)
    fu_flat = np.concatenate([geom.lo_fu.ravel(), geom.lo_fv.ravel()])
    hi_mask = np.concatenate([geom.hi_fu.ravel(), geom.hi_fv.ravel()])
    vh = np.concatenate([vh_u.ravel(), vh_v.ravel()]) * hi_mask
    prev = np.concatenate([prev_u.ravel(), prev_v.ravel()]) * fu_flat
    valid = fu_flat > 0
    wv = w[:, valid]
    a = wv.T @ wv + 2 * beta * np.eye(valid.sum(), dtype=np.float32)
    b = wv.T @ vh + 2 * beta * prev[valid]
    sol = np.linalg.solve(a, b)
    mine = np.concatenate([np.asarray(cu).ravel(), np.asarray(cv).ravel()])[valid]
    np.testing.assert_allclose(mine, sol, atol=2e-3)


def test_constrained_matches_dense_kkt_oracle(geom):
    """Projected CG must reproduce the exact KKT solution
    [M G; G^T 0][v; l] = [b; 0] (the reference's Lagrange construction)."""
    rng = np.random.RandomState(5)
    vh_u = rng.randn(*geom.hi_fu.shape).astype(np.float32)
    vh_v = rng.randn(*geom.hi_fv.shape).astype(np.float32)
    prev_u = rng.randn(*geom.lo_fu.shape).astype(np.float32)
    prev_v = rng.randn(*geom.lo_fv.shape).astype(np.float32)
    beta = 0.9

    cu, cv = solve_correction(
        geom, jnp.asarray(vh_u), jnp.asarray(vh_v), jnp.asarray(prev_u),
        jnp.asarray(prev_v), beta=beta, constrained=True, tol=1e-9, max_iter=6000,
    )

    w = _dense_w(geom)
    face_mask = np.concatenate([geom.lo_fu.ravel(), geom.lo_fv.ravel()])
    hi_mask = np.concatenate([geom.hi_fu.ravel(), geom.hi_fv.ravel()])
    valid = face_mask > 0
    wv = w[:, valid]
    nf = int(valid.sum())
    m = wv.T @ wv + 2 * beta * np.eye(nf, dtype=np.float32)
    vh = np.concatenate([vh_u.ravel(), vh_v.ravel()]) * hi_mask
    prev = np.concatenate([prev_u.ravel(), prev_v.ravel()]) * face_mask
    b = wv.T @ vh + 2 * beta * prev[valid]

    # dense G on valid cells
    apply_g = make_apply_g(geom)
    cm = geom.lo_cells
    cvalid = cm.ravel() > 0
    nc = int(cvalid.sum())
    g_cols = []
    for k in np.nonzero(cvalid)[0]:
        e = np.zeros(cm.size, np.float32)
        e[k] = 1.0
        gv = apply_g(jnp.asarray(e.reshape(cm.shape)))
        g_cols.append(_vec_to_flat(gv)[valid])
    g = np.stack(g_cols, axis=1)  # (nf, nc)

    kkt = np.zeros((nf + nc, nf + nc), np.float64)
    kkt[:nf, :nf] = m
    kkt[:nf, nf:] = g
    kkt[nf:, :nf] = g.T
    rhs = np.concatenate([b, np.zeros(nc)])
    sol = np.linalg.lstsq(kkt, rhs, rcond=None)[0][:nf]

    mine = np.concatenate([np.asarray(cu).ravel(), np.asarray(cv).ravel()])[valid]
    np.testing.assert_allclose(mine, sol, atol=5e-3)


def test_constrained_solution_is_divergence_free(geom):
    """karman PRE: the Lagrange construction must give G^T v = 0
    (karman_pre.py:309-318)."""
    rng = np.random.RandomState(2)
    vh_u = rng.randn(*geom.hi_fu.shape).astype(np.float32)
    vh_v = rng.randn(*geom.hi_fv.shape).astype(np.float32)
    zeros_u = np.zeros(geom.lo_fu.shape, np.float32)
    zeros_v = np.zeros(geom.lo_fv.shape, np.float32)

    cu, cv = solve_correction(
        geom, jnp.asarray(vh_u), jnp.asarray(vh_v), jnp.asarray(zeros_u),
        jnp.asarray(zeros_v), beta=1.0, constrained=True, tol=1e-8, max_iter=4000,
    )

    apply_g = make_apply_g(geom)
    gt = jax.linear_transpose(apply_g, jnp.zeros((1, 8, 8), jnp.float32))
    (div,) = gt({"u": jnp.asarray(cu), "v": jnp.asarray(cv)})
    # the constraint rows exist only for valid cells (npgC>-1, karman_pre.py:288)
    div = div * jnp.asarray(geom.lo_cells)
    scale = float(jnp.max(jnp.abs(cu))) + 1e-9
    assert float(jnp.max(jnp.abs(div))) / scale < 5e-3
    assert scale > 1e-4  # nontrivial correction
