"""Fused semi-Lagrangian tap-sum as Pallas TPU kernels (fwd + bwd).

Motivation (VERDICT r4 next-step #6, runs/profile_r5 op-count study): the
gather-free "shift" advection (ops/interp.shifted_stencil_sample) expands to
~(2m+2)^2 = 36 statically shifted copies with hat weights — ~1,900 HLO
primitives per solver step forward and ~6,600 in its gradient, which XLA
compiles into dozens of ~3 us latency-bound fusions per unrolled step. At the
training shapes the whole state is a few tens of KB, so the entire tap loop
fits in VMEM: this module runs it as ONE kernel forward and ONE backward.

Formulation: out[j,i] = sum_{sy,sx in [-m, m+1]} wy(sy)*wx(sx)*V[j+sy, i+sx]
with wy(sy) = max(0, 1-|dy-sy|) (and wx alike) — bit-identical weights to
shifted_stencil_sample; only the accumulation order differs.

Layout: the batch is folded into the LANE axis — every array is (H, B*W),
batch block k occupying lanes [k*W, (k+1)*W) — following the lane-folded CG
kernel (ops/pallas/cg_kernel.py): a 3-D formulation trips Mosaic layouts and
sublane folding measured 0.88x in round 3.

Boundary handling needs NO masks for OPEN domains: the caller clamps the
offsets so the absolute sample position stays inside [0, N-1] (exactly what
shifted_stencil_sample does), hence every tap with nonzero hat weight reads
in-bounds — rolled wraparound garbage (including across lane blocks) is
always multiplied by an exact 0.0 weight. PERIODIC rows wrap for free
(pltpu.roll on the un-folded row axis IS the per-batch wrap); PERIODIC lanes
select between the global roll and a roll corrected by +-W at the block edges.

The backward kernel computes all three cotangents in one pass:
  dV   = sum taps roll_{+sy,+sx}(g * wy * wx)          (transposed shifts)
  ddy  = sum taps g * V[j+sy,i+sx] * wy'(sy) * wx(sx)
  ddx  = sum taps g * V[j+sy,i+sx] * wy(sy) * wx'(sx)
with w'(s) = -sign(d - s) where the hat is active, matching jax's autodiff
of max(0, 1-|d-s|) (sign(0) = 0) INCLUDING lax.max's tie convention: at
|d-s| == 1 exactly the max(0, .) arguments tie and jax averages the branch
gradients, giving -0.5*sign(d-s). Exact ties are not measure-zero here: the
caller's open-boundary clamp computes clip(j+dy, ...) - j, and the add can
round j+dy to an integer in f32, snapping dy to an exact integer (seen on
hardware validation at (3,64,32): dy=-1.9999985 at j=52 snaps to -2.0).

Dispatch gating follows ops/pallas/conv_kernel.py: real single-device TPU,
VMEM-sized problem, and a hardware-validation marker
(artifacts/perf/advect_ok, dropped by scripts/validate_pallas_advect.py) or
an explicit SILT_PALLAS_ADVECT=1 override.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Toggled by tests to run kernels in interpret mode on CPU.
_INTERPRET = False

_VMEM_BUDGET_BYTES = 6 * 1024 * 1024

_MARKER = os.path.join(os.path.dirname(__file__), "..", "..", "..",
                       "artifacts", "perf", "advect_ok")


def _enabled() -> bool:
    v = os.environ.get("SILT_PALLAS_ADVECT")
    if v is not None:
        return v == "1"
    return os.path.exists(_MARKER)


def tap_sum_available(shape, max_shift: int, periodic: bool) -> bool:
    """Whether the fused tap-sum kernel supports this problem here."""
    if not _INTERPRET:
        if jax.default_backend() != "tpu":
            return False
        if jax.device_count() > 1:
            return False  # GSPMD would all-gather around the custom call
    if not _enabled():
        # honored in interpret mode too, so tests can force SILT_PALLAS_ADVECT
        # =0/1 to get a REAL XLA-vs-Pallas comparison through the public
        # dispatch (code-review r5 #1: an always-on interpret gate made both
        # arms dispatch the kernel)
        return False
    if len(shape) != 3:
        return False
    b, h, w = shape
    if h <= max_shift + 1 or w <= max_shift + 1:
        return False  # shift logic assumes taps stay within one period/block
    # ~10 live (H, B*W) f32 arrays in the bwd kernel
    if 10 * h * b * w * 4 >= _VMEM_BUDGET_BYTES:
        return False
    return True


def _row_shift(p: jnp.ndarray, sy: int) -> jnp.ndarray:
    """p[j+sy, :] with row wraparound (per-batch periodic: rows aren't folded)."""
    if sy == 0:
        return p
    h = p.shape[0]
    return pltpu.roll(p, shift=(h - sy) % h, axis=0)


def _lane_shift(p: jnp.ndarray, sx: int, w: int, col, periodic: bool) -> jnp.ndarray:
    """p[:, i+sx] within each W-wide lane block.

    OPEN: plain global roll — cross-block garbage is zero-weighted by the
    caller's clamped offsets. PERIODIC: fix the block edges by selecting the
    roll shifted by -+W where i+sx leaves [0, W)."""
    bw = p.shape[1]
    if sx == 0:
        return p
    a = pltpu.roll(p, shift=(bw - sx) % bw, axis=1)
    if not periodic:
        return a
    wrap = sx - w if sx > 0 else sx + w
    b = pltpu.roll(p, shift=(bw - wrap) % bw, axis=1)
    ok = jnp.logical_and(col + sx >= 0, col + sx < w)
    return jnp.where(ok, a, b)


def _local_col(shape, w: int):
    col = lax.broadcasted_iota(jnp.int32, shape, 1)
    return col - (col // w) * w


def _fwd_kernel(v_ref, dy_ref, dx_ref, out_ref, *, m: int, w: int, periodic: bool):
    v = v_ref[...]
    dy = dy_ref[...]
    dx = dx_ref[...]
    col = _local_col(v.shape, w) if periodic else None
    acc = jnp.zeros_like(v)
    for sy in range(-m, m + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
        vrow = _row_shift(v, sy)
        for sx in range(-m, m + 2):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx))
            acc = acc + _lane_shift(vrow, sx, w, col, periodic) * (wy * wx)
    out_ref[...] = acc


def _bwd_kernel(v_ref, dy_ref, dx_ref, g_ref, dv_ref, ddy_ref, ddx_ref,
                *, m: int, w: int, periodic: bool):
    v = v_ref[...]
    dy = dy_ref[...]
    dx = dx_ref[...]
    g = g_ref[...]
    h = v.shape[0]
    col = _local_col(v.shape, w)
    row = lax.broadcasted_iota(jnp.int32, v.shape, 0)
    dv = jnp.zeros_like(v)
    ddy = jnp.zeros_like(v)
    ddx = jnp.zeros_like(v)
    for sy in range(-m, m + 2):
        ty = dy - sy
        aty = jnp.abs(ty)
        wy = jnp.maximum(0.0, 1.0 - aty)
        # lax.abs' subgradient is +1 at 0 (not 0); lax.max averages at ties
        sgy = jnp.where(ty >= 0.0, 1.0, -1.0)
        dwy = -sgy * jnp.where(aty < 1.0, 1.0, jnp.where(aty == 1.0, 0.5, 0.0))
        vrow = _row_shift(v, sy)
        if not periodic and sy > 0:
            # OPEN tie taps (|t|==1: weight exactly 0 but weight-derivative
            # -+0.5) still contribute g*V to ddy/ddx, and XLA's replicate
            # shift reads the EDGE value there, not roll wraparound. The
            # caller clamps j+dy into [0, h-1], so any tap that matters is
            # out of range by at most one row/lane: one clamped re-roll
            # restores replicate parity (rows further out keep roll garbage
            # under an exact 0 in both weight and weight-derivative).
            vrow = jnp.where(row + sy <= h - 1, vrow, _row_shift(v, sy - 1))
        elif not periodic and sy < 0:
            vrow = jnp.where(row + sy >= 0, vrow, _row_shift(v, sy + 1))
        for sx in range(-m, m + 2):
            tx = dx - sx
            atx = jnp.abs(tx)
            wx = jnp.maximum(0.0, 1.0 - atx)
            sgx = jnp.where(tx >= 0.0, 1.0, -1.0)
            dwx = -sgx * jnp.where(atx < 1.0, 1.0, jnp.where(atx == 1.0, 0.5, 0.0))
            vs = _lane_shift(vrow, sx, w, col, periodic)
            if not periodic and sx > 0:
                vs = jnp.where(col + sx <= w - 1, vs,
                               _lane_shift(vrow, sx - 1, w, col, periodic))
            elif not periodic and sx < 0:
                vs = jnp.where(col + sx >= 0, vs,
                               _lane_shift(vrow, sx + 1, w, col, periodic))
            gv = g * vs
            ddy = ddy + gv * (dwy * wx)
            ddx = ddx + gv * (wy * dwx)
            # transposed shifts scatter g*w back to the source cells; any
            # contribution that crossed a block/edge carries an exact 0 weight
            contrib = g * (wy * wx)
            dv = dv + _row_shift(_lane_shift(contrib, -sx, w, col, periodic), -sy)
    dv_ref[...] = dv
    ddy_ref[...] = ddy
    ddx_ref[...] = ddx


def _fold(a: jnp.ndarray) -> jnp.ndarray:
    b, h, w = a.shape
    return jnp.transpose(a, (1, 0, 2)).reshape(h, b * w)


def _unfold(a: jnp.ndarray, b: int, w: int) -> jnp.ndarray:
    h = a.shape[0]
    return jnp.transpose(a.reshape(h, b, w), (1, 0, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tap_sum(values: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray,
            max_shift: int, periodic: bool) -> jnp.ndarray:
    """Fused (2m+2)^2-tap weighted shift sum; drop-in for the tap loop of
    ops/interp.shifted_stencil_sample AFTER its offset clamping (the caller
    keeps the clamps in XLA so their VJPs compose automatically)."""
    return _tap_sum_fwd_impl(values, dy, dx, max_shift, periodic)


def _tap_sum_fwd_impl(values, dy, dx, max_shift, periodic):
    b, h, w = values.shape
    kern = functools.partial(_fwd_kernel, m=max_shift, w=w, periodic=periodic)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, b * w), values.dtype),
        interpret=_INTERPRET,
    )(_fold(values), _fold(dy), _fold(dx))
    return _unfold(out, b, w)


def _tap_sum_fwd(values, dy, dx, max_shift, periodic):
    return _tap_sum_fwd_impl(values, dy, dx, max_shift, periodic), (values, dy, dx)


def _tap_sum_bwd(max_shift, periodic, res, g):
    values, dy, dx = res
    b, h, w = values.shape
    kern = functools.partial(_bwd_kernel, m=max_shift, w=w, periodic=periodic)
    shp = jax.ShapeDtypeStruct((h, b * w), values.dtype)
    dv, ddy, ddx = pl.pallas_call(
        kern,
        out_shape=(shp, shp, shp),
        interpret=_INTERPRET,
    )(_fold(values), _fold(dy), _fold(dx), _fold(g))
    return _unfold(dv, b, w), _unfold(ddy, b, w), _unfold(ddx, b, w)


tap_sum.defvjp(_tap_sum_fwd, _tap_sum_bwd)
