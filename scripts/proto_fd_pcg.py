"""Prototype: fast-diagonalization-preconditioned CG for the masked Poisson
solve, measured on the real karman step sequence (CPU).

The obstacle-free part of the masked operator -div(grad p) with Dirichlet-0
ghosts is separable: A0 = Ay (x) I + I (x) Ax with Ay/Ax the 1-D Dirichlet
Laplacians. M^-1 = (Vy (x) Vx) diag(1/(ly+lx)) (Vy (x) Vx)^T is an exact
inverse of A0 and an SPD preconditioner for the masked operator (sphere
obstacle ~5% of cells). Applying it is 4 small matmuls — MXU food on TPU.

Compares iteration counts: plain CG vs FD-PCG, cold / warm / quadratic
extrapolated x0, on 40 consecutive real solves.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import lax

from solver_in_the_loop_tpu.ops.stencils import divergence, masked_laplacian
from solver_in_the_loop_tpu.ops.poisson import _dot, cg_solve_info
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, karman_domain, initial_state


def dirichlet_lap_1d(n: int) -> np.ndarray:
    a = 2.0 * np.eye(n)
    for i in range(n - 1):
        a[i, i + 1] = a[i + 1, i] = -1.0
    return a


def build_fd_precon(ny: int, nx: int):
    ly, vy = np.linalg.eigh(dirichlet_lap_1d(ny))
    lx, vx = np.linalg.eigh(dirichlet_lap_1d(nx))
    denom = ly[:, None] + lx[None, :]
    return (jnp.asarray(vy, jnp.float32), jnp.asarray(vx, jnp.float32),
            jnp.asarray(1.0 / denom, jnp.float32))


def make_minv(vy, vx, inv_denom):
    def minv(r):  # (B, Y, X)
        t = jnp.einsum("jy,bjx->byx", vy, r)       # Vy^T r
        t = jnp.einsum("byj,jx->byx", t, vx)       # ... Vx
        t = t * inv_denom
        t = jnp.einsum("yj,bjx->byx", vy, t)       # Vy ...
        t = jnp.einsum("byj,xj->byx", t, vx)       # ... Vx^T
        return t
    return minv


def pcg_solve_info(matvec, minv, b, tol, max_iter, x0=None):
    b_norm_sq = _dot(b, b)
    thresh = (tol * tol) * jnp.maximum(b_norm_sq, 1e-30)
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        r0 = b - matvec(x0)
    z0 = minv(r0)
    rz0 = _dot(r0, z0)
    rs0 = _dot(r0, r0)

    def cond(state):
        i, _x, _r, _p, _rz, rs = state
        return jnp.logical_and(i < max_iter, jnp.any(rs > thresh))

    def body(state):
        i, x, r, p, rz, rs = state
        ap = matvec(p)
        p_ap = _dot(p, ap)
        alpha = jnp.where(p_ap == 0, 0.0, rz / jnp.where(p_ap == 0, 1.0, p_ap))
        x = x + alpha * p
        r = r - alpha * ap
        z = minv(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (i + 1, x, r, p, rz_new, _dot(r, r))

    iters, x, *_ = lax.while_loop(cond, body, (jnp.int32(0), x0, r0, z0, rz0, rs0))
    return x, iters


def main():
    res, batch = 32, 3
    dom = karman_domain(res)
    flow = KarmanFlow(dom, advection="shift", max_shift=2,
                      pressure_tol=1e-5, pressure_max_iter=500)
    ny, nx = dom.ny, dom.nx
    vy, vx, inv_denom = build_fd_precon(ny, nx)
    minv = make_minv(vy, vx, inv_denom)
    masks = flow.masks
    fluid = masks.fluid

    def matvec(p):
        lp = masked_laplacian(p, masks.face_u, masks.face_v)
        return jnp.where(fluid > 0, -lp, p)

    d, v = initial_state(dom, batch)
    re = jnp.asarray([1.6e5, 6.4e5, 2.56e6], jnp.float32)
    pre = jax.jit(flow.pre_projection)
    step = jax.jit(lambda d, v, p0: flow.step(d, v, re, dt=1.0, p0=p0))

    p1 = p2 = p3 = jnp.zeros((batch, ny, nx), jnp.float32)
    rows = []
    for i in range(60):
        if i >= 20:
            _, vel_adv = pre(d, v, re, 1.0)
            div = divergence(vel_adv.u * masks.face_u, vel_adv.v * masks.face_v)
            rhs = jnp.where(fluid > 0, -div, 0.0)
            x0w = jnp.where(fluid > 0, p1, 0.0)
            x0e = jnp.where(fluid > 0, 3 * p1 - 3 * p2 + p3, 0.0)
            it_cg_cold = int(cg_solve_info(matvec, rhs, 1e-5, 500)[1])
            it_cg_ext = int(cg_solve_info(matvec, rhs, 1e-5, 500, x0e)[1])
            it_p_cold = int(pcg_solve_info(matvec, minv, rhs, 1e-5, 500)[1])
            it_p_warm = int(pcg_solve_info(matvec, minv, rhs, 1e-5, 500, x0w)[1])
            it_p_ext = int(pcg_solve_info(matvec, minv, rhs, 1e-5, 500, x0e)[1])
            # correctness: residual of the PCG cold solution
            x, _ = pcg_solve_info(matvec, minv, rhs, 1e-5, 500)
            rel = float(jnp.linalg.norm(matvec(x) - rhs) / jnp.linalg.norm(rhs))
            rows.append((it_cg_cold, it_cg_ext, it_p_cold, it_p_warm, it_p_ext, rel))
        d, v, p_new = step(d, v, p1)
        p3, p2, p1 = p2, p1, p_new

    arr = np.array([r[:5] for r in rows])
    rels = [r[5] for r in rows]
    names = ["cg_cold", "cg_extrap", "pcg_cold", "pcg_warm", "pcg_extrap"]
    print("        " + "".join(f"{n:>11}" for n in names))
    print("p50:    " + "".join(f"{np.percentile(arr[:, j], 50):11.0f}" for j in range(5)))
    print("p95:    " + "".join(f"{np.percentile(arr[:, j], 95):11.0f}" for j in range(5)))
    print(f"max PCG-cold relative residual: {max(rels):.2e}")


if __name__ == "__main__":
    main()
