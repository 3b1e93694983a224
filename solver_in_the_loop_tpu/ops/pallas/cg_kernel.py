"""Fused conjugate-gradient Pallas TPU kernel for the masked Poisson system.

Solves, per batch element,  A x = b  with
    A(p) = fluid * -[ me*(E p) + mw*(W p) + mn*(N p) + ms*(S p) - diag*p ]
           + (1-fluid) * p
where E/W/N/S are neighbour shifts with Dirichlet-0 ghosts (OPEN boundaries)
and me/mw/mn/ms are per-cell face accessibility masks (obstacles).

The whole CG loop runs inside one kernel with every vector in VMEM: zero
per-iteration dispatch cost, per-batch-element early exit on convergence.
This is the TPU-native replacement for the reference's optional native CUDA
pressure solver (/root/reference/karman-2d/karman_train.py:51).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _neighbor_shifts(p: jnp.ndarray):
    """(E, W, N, S) neighbour values with zero ghosts; p is (H, W)."""
    h, w = p.shape
    col = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    # pltpu.roll requires non-negative shifts: roll(+k)[i] == p[i-k] (wraps)
    p_e = pltpu.roll(p, shift=w - 1, axis=1) * (col < w - 1)
    p_w = pltpu.roll(p, shift=1, axis=1) * (col > 0)
    p_n = pltpu.roll(p, shift=h - 1, axis=0) * (row < h - 1)
    p_s = pltpu.roll(p, shift=1, axis=0) * (row > 0)
    return p_e, p_w, p_n, p_s


def _cg_kernel_folded(b_ref, x0_ref, fluid_ref, me_ref, mw_ref, mn_ref, ms_ref,
                      diag_ref, m_ref, x_ref, *, tol: float, max_iter: int):
    """Whole-batch CG in ONE kernel instance, 2-D batch-folded formulation.

    The batch is folded into the LANE axis: every array is (H, B*W), batch
    block j occupying lanes [j*W, (j+1)*W). At the karman training shapes
    (64, 3*32=96) the whole batch still fits one 128-lane vector tile, so a
    per-iteration vector op costs the SAME as for a single batch element —
    the per-element grid kernel at batch B pays B sequential CG chains, each
    wasting (128-W) lanes of every op. (The first redesign folded the batch
    into the SUBLANE axis; measured on v5e that triples the per-op tile count
    and is 0.88x — lane folding is the one that wins.)

    The ghost-cell zero masks are pre-multiplied into the me/mw/mn/ms face
    masks by the caller, so E/W roll wraparound across lane-block boundaries
    is annihilated without any in-kernel iota; N/S rolls act on rows and
    cannot cross blocks. Per-batch reductions: sublane-sum to (1, B*W), then
    one (B*W, B*W) block-diagonal ones matmul both segment-sums each block
    AND broadcasts the result back to its lanes. Only ops the
    hardware-validated per-element kernel already uses appear — the 3-D
    formulation tripped a Mosaic layout check (layout.h:320, round 3).

    On a single-TensorCore chip a grid over the batch runs SEQUENTIALLY,
    multiplying the dependent-iteration chain by B; folding keeps the chain at
    the slowest element's iteration count."""
    b = b_ref[...]
    x0 = x0_ref[...]
    fluid = fluid_ref[...]
    me, mw, mn, ms = me_ref[...], mw_ref[...], mn_ref[...], ms_ref[...]
    diag = diag_ref[...]
    m = m_ref[...]
    solid = 1.0 - fluid
    h, _bw = b.shape

    def apply_a(p):
        # masks already include the Dirichlet-0 ghost zeros at block edges
        p_e = pltpu.roll(p, shift=_bw - 1, axis=1)
        p_w = pltpu.roll(p, shift=1, axis=1)
        p_n = pltpu.roll(p, shift=h - 1, axis=0)
        p_s = pltpu.roll(p, shift=1, axis=0)
        lap = me * p_e + mw * p_w + mn * p_n + ms * p_s - diag * p
        return fluid * (-lap) + solid * p

    def dot(a, c):  # (H, B*W) -> (1, B*W): per-block sums, broadcast to lanes
        cols = jnp.sum(a * c, axis=0, keepdims=True)
        return jnp.dot(cols, m, preferred_element_type=jnp.float32)

    bb = dot(b, b)
    thresh = (tol * tol) * jnp.maximum(bb, 1e-30)

    def cond(state):
        i, _x, _r, _p, rs = state
        return jnp.logical_and(i < max_iter, jnp.any(rs > thresh))

    def body(state):
        i, x, r, pv, rs = state
        ap = apply_a(pv)
        p_ap = dot(pv, ap)
        safe = jnp.where(p_ap == 0.0, 1.0, p_ap)
        alpha = jnp.where(p_ap == 0.0, 0.0, rs / safe)
        x = x + alpha * pv
        r = r - alpha * ap
        rs_new = dot(r, r)
        beta = rs_new / jnp.where(rs == 0.0, 1.0, rs)
        pv = r + beta * pv
        return (i + 1, x, r, pv, rs_new)

    r0 = b - apply_a(x0)
    rs0 = dot(r0, r0)
    _, x, _, _, _ = lax.while_loop(cond, body, (jnp.int32(0), x0, r0, r0, rs0))
    x_ref[...] = x


def _pcg_kernel_folded(b_ref, x0_ref, fluid_ref, me_ref, mw_ref, mn_ref, ms_ref,
                       diag_ref, m_ref, vy_ref, vyt_ref, bx_ref, bxt_ref,
                       invd_ref, x_ref, *, tol: float, max_iter: int):
    """Lane-folded whole-batch PCG with the fast-diagonalization
    preconditioner: z = Vy ((Vy^T r Vx) * invd) Vx^T applied per batch block
    via block-diagonal Bx = kron(I_B, Vx). Four MXU matmuls per iteration on
    top of the VPU stencil; iteration counts drop 110 -> 23 cold / 28 -> 8
    extrapolated-warm on the karman operator (BENCH.md round 4). Same
    true-residual stopping rule as the plain kernel."""
    b = b_ref[...]
    x0 = x0_ref[...]
    fluid = fluid_ref[...]
    me, mw, mn, ms = me_ref[...], mw_ref[...], mn_ref[...], ms_ref[...]
    diag = diag_ref[...]
    m = m_ref[...]
    vy, vyt = vy_ref[...], vyt_ref[...]
    bx, bxt = bx_ref[...], bxt_ref[...]
    invd = invd_ref[...]
    solid = 1.0 - fluid
    h, _bw = b.shape

    def apply_a(p):
        p_e = pltpu.roll(p, shift=_bw - 1, axis=1)
        p_w = pltpu.roll(p, shift=1, axis=1)
        p_n = pltpu.roll(p, shift=h - 1, axis=0)
        p_s = pltpu.roll(p, shift=1, axis=0)
        lap = me * p_e + mw * p_w + mn * p_n + ms * p_s - diag * p
        return fluid * (-lap) + solid * p

    def minv(r):
        t = jnp.dot(vyt, r, preferred_element_type=jnp.float32)
        t = jnp.dot(t, bx, preferred_element_type=jnp.float32)
        t = t * invd
        t = jnp.dot(vy, t, preferred_element_type=jnp.float32)
        return jnp.dot(t, bxt, preferred_element_type=jnp.float32)

    def dot(a, c):  # (H, B*W) -> (1, B*W): per-block sums, broadcast to lanes
        cols = jnp.sum(a * c, axis=0, keepdims=True)
        return jnp.dot(cols, m, preferred_element_type=jnp.float32)

    bb = dot(b, b)
    thresh = (tol * tol) * jnp.maximum(bb, 1e-30)

    def cond(state):
        i, _x, _r, _p, _rz, rs = state
        return jnp.logical_and(i < max_iter, jnp.any(rs > thresh))

    def body(state):
        i, x, r, pv, rz, _rs = state
        ap = apply_a(pv)
        p_ap = dot(pv, ap)
        safe = jnp.where(p_ap == 0.0, 1.0, p_ap)
        alpha = jnp.where(p_ap == 0.0, 0.0, rz / safe)
        x = x + alpha * pv
        r = r - alpha * ap
        z = minv(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0.0, 1.0, rz)
        pv = z + beta * pv
        return (i + 1, x, r, pv, rz_new, dot(r, r))

    r0 = b - apply_a(x0)
    z0 = minv(r0)
    _, x, *_ = lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, z0, dot(r0, z0), dot(r0, r0)))
    x_ref[...] = x


def _pcg_kernel(b_ref, x0_ref, fluid_ref, me_ref, mw_ref, mn_ref, ms_ref,
                diag_ref, vy_ref, vyt_ref, vx_ref, vxt_ref, invd_ref,
                x_ref, *, tol: float, max_iter: int):
    """Per-element-grid PCG variant (batch-1 fallthrough path)."""
    b = b_ref[0]
    x0 = x0_ref[0]
    fluid = fluid_ref[0]
    me, mw, mn, ms = me_ref[0], mw_ref[0], mn_ref[0], ms_ref[0]
    diag = diag_ref[0]
    vy, vyt = vy_ref[...], vyt_ref[...]
    vx, vxt = vx_ref[...], vxt_ref[...]
    invd = invd_ref[...]
    solid = 1.0 - fluid

    def apply_a(p):
        p_e, p_w, p_n, p_s = _neighbor_shifts(p)
        lap = me * p_e + mw * p_w + mn * p_n + ms * p_s - diag * p
        return fluid * (-lap) + solid * p

    def minv(r):
        t = jnp.dot(vyt, r, preferred_element_type=jnp.float32)
        t = jnp.dot(t, vx, preferred_element_type=jnp.float32)
        t = t * invd
        t = jnp.dot(vy, t, preferred_element_type=jnp.float32)
        return jnp.dot(t, vxt, preferred_element_type=jnp.float32)

    bb = jnp.sum(b * b)
    thresh = (tol * tol) * jnp.maximum(bb, 1e-30)

    def cond(state):
        i, _x, _r, _p, _rz, rs = state
        return jnp.logical_and(i < max_iter, rs > thresh)

    def body(state):
        i, x, r, pv, rz, _rs = state
        ap = apply_a(pv)
        p_ap = jnp.sum(pv * ap)
        safe = jnp.where(p_ap == 0.0, 1.0, p_ap)
        alpha = jnp.where(p_ap == 0.0, 0.0, rz / safe)
        x = x + alpha * pv
        r = r - alpha * ap
        z = minv(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz == 0.0, 1.0, rz)
        pv = z + beta * pv
        return (i + 1, x, r, pv, rz_new, jnp.sum(r * r))

    r0 = b - apply_a(x0)
    z0 = minv(r0)
    _, x, *_ = lax.while_loop(
        cond, body,
        (jnp.int32(0), x0, r0, z0, jnp.sum(r0 * z0), jnp.sum(r0 * r0)))
    x_ref[0] = x


def _cg_kernel(b_ref, x0_ref, fluid_ref, me_ref, mw_ref, mn_ref, ms_ref, diag_ref,
               x_ref, *, tol: float, max_iter: int):
    b = b_ref[0]
    x0 = x0_ref[0]
    fluid = fluid_ref[0]
    me, mw, mn, ms = me_ref[0], mw_ref[0], mn_ref[0], ms_ref[0]
    diag = diag_ref[0]
    solid = 1.0 - fluid

    def apply_a(p):
        p_e, p_w, p_n, p_s = _neighbor_shifts(p)
        lap = me * p_e + mw * p_w + mn * p_n + ms * p_s - diag * p
        return fluid * (-lap) + solid * p

    bb = jnp.sum(b * b)
    thresh = (tol * tol) * jnp.maximum(bb, 1e-30)

    def cond(state):
        i, _x, _r, _p, rs = state
        return jnp.logical_and(i < max_iter, rs > thresh)

    def body(state):
        i, x, r, pv, rs = state
        ap = apply_a(pv)
        p_ap = jnp.sum(pv * ap)
        safe = jnp.where(p_ap == 0.0, 1.0, p_ap)
        alpha = jnp.where(p_ap == 0.0, 0.0, rs / safe)
        x = x + alpha * pv
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.where(rs == 0.0, 1.0, rs)
        pv = r + beta * pv
        return (i + 1, x, r, pv, rs_new)

    # warm start: r0 = b - A x0 (x0 == 0 gives exactly r0 = b, the cold path);
    # the tol threshold stays relative to ||b||, so a good x0 cuts iterations
    r0 = b - apply_a(x0)
    rs0 = jnp.sum(r0 * r0)
    _, x, _, _, _ = lax.while_loop(cond, body, (jnp.int32(0), x0, r0, r0, rs0))
    x_ref[0] = x


@functools.partial(jax.jit, static_argnames=("tol", "max_iter", "interpret", "batched", "precon"))
def fused_cg_solve(b, fluid, face_u, face_v, tol: float = 1e-5, max_iter: int = 1000,
                   interpret: bool = False, x0=None, batched: bool = True,
                   precon: bool = False):
    """b (B, H, W); fluid (1, H, W); face_u (1, H, W+1); face_v (1, H+1, W).

    x0 (B, H, W) warm-starts CG (r0 = b - A x0); None means cold start.

    batched=True (default) runs the whole batch in ONE kernel instance —
    a grid over the batch would execute its CG loops sequentially on the
    single TensorCore, multiplying the dependent-iteration chain by B.
    batched=False keeps the per-element grid (per-element early exit).

    precon=True applies the fast-diagonalization preconditioner (exact
    inverse of the obstacle-free separable operator, ops.poisson.fd_minv)
    inside the kernel via MXU matmuls — valid for OPEN boundaries only."""
    bsz, h, w = b.shape
    if x0 is None:
        x0 = jnp.zeros_like(b)
    me = face_u[:, :, 1:]
    mw = face_u[:, :, :-1]
    mn = face_v[:, 1:, :]
    ms = face_v[:, :-1, :]
    diag = me + mw + mn + ms

    if precon:
        from solver_in_the_loop_tpu.ops.poisson import _fd_precon_np

        vy_np, vx_np, invd_np = _fd_precon_np(h, w)
        vy = jnp.asarray(vy_np)
        vx = jnp.asarray(vx_np)
        invd = jnp.asarray(invd_np)

    if batched and bsz > 1:
        # 2-D lane-folded single-instance kernel: (B, H, W) -> (H, B*W) with
        # the roll ghost masks pre-multiplied into the face masks, and a
        # constant block-diagonal ones matrix for per-batch reductions.
        col = jnp.arange(bsz * w)
        row = jnp.arange(h)
        e_mask = ((col % w) < w - 1).astype(b.dtype)[None, :]    # kill E cross-block
        w_mask = ((col % w) > 0).astype(b.dtype)[None, :]        # kill W cross-block
        n_mask = (row < h - 1).astype(b.dtype)[:, None]          # kill N wrap
        s_mask = (row > 0).astype(b.dtype)[:, None]              # kill S wrap
        tile = lambda a: jnp.tile(a[0], (1, bsz))
        fold = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(h, bsz * w)
        me_f = tile(me) * e_mask
        mw_f = tile(mw) * w_mask
        mn_f = tile(mn) * n_mask
        ms_f = tile(ms) * s_mask
        seg = jnp.kron(jnp.eye(bsz, dtype=b.dtype), jnp.ones((w, w), b.dtype))
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        if precon:
            bx = jnp.kron(jnp.eye(bsz, dtype=b.dtype), vx)
            x = pl.pallas_call(
                functools.partial(_pcg_kernel_folded, tol=tol, max_iter=max_iter),
                out_shape=jax.ShapeDtypeStruct((h, bsz * w), b.dtype),
                in_specs=[full] * 14,
                out_specs=full,
                interpret=interpret,
            )(fold(b), fold(x0), tile(fluid), me_f, mw_f, mn_f, ms_f, tile(diag),
              seg, vy, vy.T, bx, bx.T, jnp.tile(invd, (1, bsz)))
        else:
            x = pl.pallas_call(
                functools.partial(_cg_kernel_folded, tol=tol, max_iter=max_iter),
                out_shape=jax.ShapeDtypeStruct((h, bsz * w), b.dtype),
                in_specs=[full] * 9,
                out_specs=full,
                interpret=interpret,
            )(fold(b), fold(x0), tile(fluid), me_f, mw_f, mn_f, ms_f, tile(diag), seg)
        return jnp.transpose(x.reshape(h, bsz, w), (1, 0, 2))

    block = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shared = pl.BlockSpec((1, h, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    if precon:
        mat = lambda n, m: pl.BlockSpec((n, m), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_pcg_kernel, tol=tol, max_iter=max_iter),
            grid=(bsz,),
            out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
            in_specs=[block, block, shared, shared, shared, shared, shared,
                      shared, mat(h, h), mat(h, h), mat(w, w), mat(w, w),
                      mat(h, w)],
            out_specs=block,
            interpret=interpret,
        )(b, x0, fluid, me, mw, mn, ms, diag, vy, vy.T, vx, vx.T, invd)

    return pl.pallas_call(
        functools.partial(_cg_kernel, tol=tol, max_iter=max_iter),
        grid=(bsz,),
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[block, block, shared, shared, shared, shared, shared, shared],
        out_specs=block,
        interpret=interpret,
    )(b, x0, fluid, me, mw, mn, ms, diag)
