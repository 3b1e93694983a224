"""Fused im2col KxK SAME convolution as Pallas TPU kernels (fwd + dgrad + wgrad).

Motivation (BENCH.md round-4 step profile): the 12 MarsMoon convolutions are
~31 of the 36.3 ms/iter SOL-32 train-step device time, and XLA's
space-to-batch convolution at these shapes (B=3, 64x32 grid, 32 channels) runs
at <10% MXU utilization. This module reformulates the convolution as one MXU
matmul per row tile:

  rows r = ((b*H + y)*W + x) flatten batch+space. For each of the K*K taps,
  the (TM, C) block of rows r + dy*W + dx is copied into a (TM, K*K*C) VMEM
  patch matrix P, masked to zero where x+dx / y+dy leave the image (the y mask
  also kills cross-batch reads). Then Y_tile = P @ Wmat with
  Wmat = w.reshape(K*K*Cin, Cout).

The backward pass is two more instances of the same structure:

* dX = SAME-conv of dY with the spatially-flipped, channel-transposed kernel
  (the standard conv transpose identity) -> the forward kernel reused.
* dW = P^T @ dY accumulated over row tiles -> one transposed-matmul kernel
  revisiting a (K*K*Cin, Cout) output block across the grid.
* db = sum_rows dY (left to XLA).

This replaces the network-side half of what the reference delegates to
cuDNN/TF (/root/reference/karman-2d/karman_train.py:92-138 builds the nets
with Keras Conv2D; the hot path there is cuDNN's implicit-GEMM conv). Here the
im2col GEMM formulation is hand-scheduled for the MXU because XLA's
space-to-batch path is latency-bound at these tiny spatial extents.

Dispatch gating follows ops/pallas/cg.py: only on real TPU, only for shapes
whose working set fits VMEM, and only after a hardware validation marker
(artifacts/perf/conv_ok, dropped by scripts/validate_pallas_conv.py) or an
explicit SILT_PALLAS_CONV=1 override.

Multi-device note: under --dp GSPMD treats the tpu_custom_call as replicated,
so a batch-sharded input would be all-gathered around it. Correct but not
the intended layout — conv_available therefore returns False whenever more
than one device is visible; sharded multi-chip training keeps the XLA conv.
The single-chip headline path (the benched workload) is unaffected.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# Toggled by tests to run kernels in interpret mode on CPU.
_INTERPRET = False

_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _tile(M: int) -> tuple[int, int]:
    """(TM, M_pad): row-tile height and padded row count (M_pad % TM == 0)."""
    TM = min(512, _round_up(M, 8))
    return TM, _round_up(M, TM)


_MARKER = os.path.join(os.path.dirname(__file__), "..", "..", "..",
                       "artifacts", "perf", "conv_ok")


def _enabled() -> bool:
    v = os.environ.get("SILT_PALLAS_CONV")
    if v is not None:
        return v == "1"
    return os.path.exists(_MARKER)


def conv_available(xshape, kernel_size, cin: int, cout: int) -> bool:
    """Whether the fused conv kernels support this problem on this backend."""
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    if not _INTERPRET and jax.device_count() > 1:
        return False  # GSPMD would all-gather around the custom call (see above)
    if not _enabled() and not _INTERPRET:
        return False
    if len(xshape) != 4 or len(kernel_size) != 2:
        return False
    K = kernel_size[0]
    if kernel_size[1] != K or K % 2 == 0 or K > 7:
        return False  # odd square kernels only (5x5 in all the nets)
    if K == 1:
        return False  # 1x1 projections are plain matmuls; XLA fuses them well
    B, H, W = xshape[:3]
    M = B * H * W
    TM, M_pad = _tile(M)
    halo = (K // 2) * W + K // 2
    # the 'taps' variant pads channels to a multiple of 8 (_pad_cin); estimate
    # with the padded count so the gate matches what the kernel actually
    # allocates (ADVICE r4: raw cin=3 understates the input term ~2.7x)
    cmax = _round_up(max(cin, cout), 8)
    vmem = ((M_pad + 2 * halo) * cmax * 4       # padded input rows
            + TM * K * K * cmax * 4             # patch scratch
            + K * K * cmax * cmax * 4           # weight matrix
            + TM * cmax * 4)                    # output tile
    return vmem < _VMEM_BUDGET_BYTES


def _epilogue(acc, b_ref, skip_ref, y_ref, *, act, slope):
    """Shared kernel tail: + bias [+ skip] -> activation -> store.
    The activation folds into the matmul kernel what XLA would otherwise run
    as separate elementwise fusions per conv (the reference's Keras layers
    fuse activation into Conv2D the same way, burgers_train_pre.py:346)."""
    acc = acc + b_ref[0, :][None, :].astype(jnp.float32)
    if skip_ref is not None:
        acc = acc + skip_ref[:, :].astype(jnp.float32)
    if act == "relu":
        acc = jnp.maximum(acc, 0)
    elif act == "leaky_relu":
        acc = jnp.where(acc >= 0, acc, jnp.float32(slope) * acc)
    y_ref[:, :] = acc.astype(y_ref.dtype)


def _fwd_kernel(xp_ref, w_ref, b_ref, *args, TM, W, H, C, halo, K,
                act="none", slope=0.3, with_skip=False):
    skip_ref, (y_ref, p_ref) = (args[0], args[1:]) if with_skip else (None, args)
    i = pl.program_id(0)
    row0 = i * TM
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    x = gr % W
    y = (gr // W) % H
    r = K // 2
    for tap in range(K * K):
        dy, dx = tap // K - r, tap % K - r
        blk = xp_ref[pl.ds(halo + row0 + dy * W + dx, TM), :]
        valid = (x + dx >= 0) & (x + dx < W) & (y + dy >= 0) & (y + dy < H)
        p_ref[:, tap * C:(tap + 1) * C] = jnp.where(valid, blk, 0)
    acc = jnp.dot(p_ref[:, :], w_ref[:, :], preferred_element_type=jnp.float32)
    _epilogue(acc, b_ref, skip_ref, y_ref, act=act, slope=slope)


def _fwd_kernel_taps(xp_ref, w_ref, b_ref, *args, TM, W, H, C, halo, K,
                     act="none", slope=0.3, with_skip=False):
    """Per-tap matmul accumulation: acc += masked_block @ w[tap]. Avoids the
    (TM, K*K*C) patch matrix and its lane-offset writes; instead reads
    sublane-aligned row slices of the (K*K*C, Cout) weight matrix (requires
    C % 8 == 0 — callers pad channels)."""
    skip_ref, (y_ref,) = (args[0], args[1:]) if with_skip else (None, args)
    i = pl.program_id(0)
    row0 = i * TM
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    x = gr % W
    y = (gr // W) % H
    r = K // 2
    acc = jnp.zeros((TM, y_ref.shape[-1]), jnp.float32)
    for tap in range(K * K):
        dy, dx = tap // K - r, tap % K - r
        blk = xp_ref[pl.ds(halo + row0 + dy * W + dx, TM), :]
        valid = (x + dx >= 0) & (x + dx < W) & (y + dy >= 0) & (y + dy < H)
        acc += jnp.dot(jnp.where(valid, blk, 0), w_ref[pl.ds(tap * C, C), :],
                       preferred_element_type=jnp.float32)
    _epilogue(acc, b_ref, skip_ref, y_ref, act=act, slope=slope)


def _wgrad_kernel_taps(xp_ref, dy_ref, dw_ref, *, TM, W, H, C, halo, K):
    """Per-tap wgrad: dw[tap] += block^T @ dY, sublane-aligned row-slice
    accumulation into the (K*K*C, Cout) output (requires C % 8 == 0)."""
    i = pl.program_id(0)
    row0 = i * TM
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    x = gr % W
    y = (gr // W) % H
    r = K // 2
    dy_blk = dy_ref[:, :]
    for tap in range(K * K):
        dy_, dx_ = tap // K - r, tap % K - r
        blk = xp_ref[pl.ds(halo + row0 + dy_ * W + dx_, TM), :]
        valid = (x + dx_ >= 0) & (x + dx_ < W) & (y + dy_ >= 0) & (y + dy_ < H)
        part = jax.lax.dot_general(jnp.where(valid, blk, 0), dy_blk,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _init():
            dw_ref[pl.ds(tap * C, C), :] = part

        @pl.when(i > 0)
        def _accum():
            dw_ref[pl.ds(tap * C, C), :] += part


def _wgrad_kernel(xp_ref, dy_ref, dw_ref, p_ref, *, TM, W, H, C, halo, K):
    i = pl.program_id(0)
    row0 = i * TM
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    x = gr % W
    y = (gr // W) % H
    r = K // 2
    for tap in range(K * K):
        dy_, dx_ = tap // K - r, tap % K - r
        blk = xp_ref[pl.ds(halo + row0 + dy_ * W + dx_, TM), :]
        valid = (x + dx_ >= 0) & (x + dx_ < W) & (y + dy_ >= 0) & (y + dy_ < H)
        p_ref[:, tap * C:(tap + 1) * C] = jnp.where(valid, blk, 0)
    # (K*K*C, Cout) partial: P^T @ dY, contracting the TM rows. Rows past the
    # true M are garbage in P but dY is zero-padded there, so they vanish.
    acc = jax.lax.dot_general(p_ref[:, :], dy_ref[:, :],
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dw_ref[:, :] = acc

    @pl.when(i > 0)
    def _accum():
        dw_ref[:, :] += acc


@functools.lru_cache(maxsize=1)
def _marker_variant() -> str:
    try:
        with open(_MARKER) as f:
            first = f.readline().strip()
        if first.startswith("variant="):
            return first.split("=", 1)[1]
    except OSError:
        pass
    return "patch"


def _variant() -> str:
    """Kernel formulation: "patch" (im2col matrix then one matmul) or "taps"
    (per-tap matmul accumulation; no patch matrix, sublane-aligned weight
    slices). A/B'd on hardware by scripts/validate_pallas_conv.py, which
    records the winner on the marker's first line; env overrides for A/Bs."""
    v = os.environ.get("SILT_PALLAS_CONV_VARIANT")
    return v if v in ("patch", "taps") else _marker_variant()


def _pad_cin(x_rows, w, Cin: int):
    """Zero-pad the channel axis to a multiple of 8 for the "taps" variant
    (sublane-aligned per-tap slices of the weight matrix)."""
    Cp = _round_up(Cin, 8)
    if Cp != Cin:
        x_rows = jnp.pad(x_rows, ((0, 0), (0, Cp - Cin)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - Cin), (0, 0)))
    return x_rows, w, Cp


def _conv_rows(x4, w, bias, skip=None, act="none", slope=0.3):
    """Forward via the Pallas kernel. x4 (B,H,W,Cin) -> (B,H,W,Cout), with
    the optional epilogue (+skip, activation) fused into the kernel."""
    import jax.experimental.pallas.tpu as pltpu

    B, H, W, Cin = x4.shape
    K = w.shape[0]
    Cout = w.shape[-1]
    M = B * H * W
    TM, M_pad = _tile(M)
    halo = (K // 2) * W + K // 2
    rows = x4.reshape(M, Cin)
    taps = _variant() == "taps"
    C = Cin
    if taps:
        rows, w, C = _pad_cin(rows, w, Cin)
    xp = jnp.pad(rows, ((halo, halo + (M_pad - M)), (0, 0)))
    wmat = w.reshape(K * K * C, Cout)
    kfn = _fwd_kernel_taps if taps else _fwd_kernel
    kern = functools.partial(kfn, TM=TM, W=W, H=H, C=C, halo=halo, K=K,
                             act=act, slope=slope, with_skip=skip is not None)
    in_specs = [
        pl.BlockSpec((M_pad + 2 * halo, C), lambda i: (0, 0)),
        pl.BlockSpec((K * K * C, Cout), lambda i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda i: (0, 0)),
    ]
    operands = [xp, wmat, bias.reshape(1, Cout)]
    if skip is not None:
        in_specs.append(pl.BlockSpec((TM, Cout), lambda i: (i, 0)))
        operands.append(jnp.pad(skip.reshape(M, Cout), ((0, M_pad - M), (0, 0))))
    out = pl.pallas_call(
        kern,
        grid=(M_pad // TM,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TM, Cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M_pad, Cout), x4.dtype),
        scratch_shapes=[] if taps else [pltpu.VMEM((TM, K * K * C), x4.dtype)],
        interpret=_INTERPRET,
    )(*operands)
    return out[:M].reshape(B, H, W, Cout)


def _conv_wgrad(x4, dy4, K):
    """dW (K,K,Cin,Cout) via tile-accumulated P^T @ dY."""
    import jax.experimental.pallas.tpu as pltpu

    B, H, W, Cin = x4.shape
    Cout = dy4.shape[-1]
    M = B * H * W
    TM, M_pad = _tile(M)
    halo = (K // 2) * W + K // 2
    rows = x4.reshape(M, Cin)
    taps = _variant() == "taps"
    C = Cin
    if taps:
        Cp = _round_up(Cin, 8)
        if Cp != Cin:
            rows = jnp.pad(rows, ((0, 0), (0, Cp - Cin)))
        C = Cp
    xp = jnp.pad(rows, ((halo, halo + (M_pad - M)), (0, 0)))
    dyp = jnp.pad(dy4.reshape(M, Cout), ((0, M_pad - M), (0, 0)))
    kfn = _wgrad_kernel_taps if taps else _wgrad_kernel
    kern = functools.partial(kfn, TM=TM, W=W, H=H, C=C, halo=halo, K=K)
    dw = pl.pallas_call(
        kern,
        grid=(M_pad // TM,),
        in_specs=[
            pl.BlockSpec((M_pad + 2 * halo, C), lambda i: (0, 0)),
            pl.BlockSpec((TM, Cout), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((K * K * C, Cout), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K * K * C, Cout), jnp.float32),
        scratch_shapes=[] if taps else [pltpu.VMEM((TM, K * K * C), x4.dtype)],
        interpret=_INTERPRET,
    )(xp, dyp)
    return dw.reshape(K, K, C, Cout)[:, :, :Cin, :]


@jax.custom_vjp
def conv_same(x, w, bias):
    """KxK SAME stride-1 NHWC convolution, fully Pallas (fwd and bwd).

    Caller must have checked conv_available() — no fallback inside.
    """
    return _conv_rows(x, w, bias)


def _conv_same_fwd(x, w, bias):
    return _conv_rows(x, w, bias), (x, w)


def _conv_same_bwd(res, dy):
    x, w = res
    # dX = SAME-conv of dY with the flipped, channel-transposed kernel.
    wd = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    zb = jnp.zeros((w.shape[2],), dy.dtype)
    dx = _conv_rows(dy, wd, zb).astype(x.dtype)
    dw = _conv_wgrad(x, dy, w.shape[0]).astype(w.dtype)
    db = dy.sum((0, 1, 2)).astype(w.dtype)
    return dx, dw, db


conv_same.defvjp(_conv_same_fwd, _conv_same_bwd)


def _act_grad(act: str, slope: float, y, dy):
    """d(activation)/dz from the POST-activation value y: both relu and
    leaky_relu are sign-preserving, so sign(y) recovers sign(z). Matches
    jax.nn conventions at z==0 (relu' = 0, leaky_relu' = 1)."""
    if act == "relu":
        return jnp.where(y > 0, dy, 0)
    if act == "leaky_relu":
        return jnp.where(y >= 0, dy, jnp.asarray(slope, dy.dtype) * dy)
    return dy


@functools.lru_cache(maxsize=None)
def _fused(act: str, slope: float, with_skip: bool):
    """custom_vjp'd fused conv(+skip)(+activation). One cached instance per
    static (act, slope, with_skip) so retracing reuses the same primitive.
    Residuals are (x, w, y): under the trainer's "pressure+conv" remat policy
    x and y are the named-saved conv outputs, so backward recomputes nothing.
    """
    if with_skip:
        @jax.custom_vjp
        def f(x, w, b, s):
            return _conv_rows(x, w, b, skip=s, act=act, slope=slope)

        def fwd(x, w, b, s):
            y = _conv_rows(x, w, b, skip=s, act=act, slope=slope)
            return y, (x, w, y)
    else:
        @jax.custom_vjp
        def f(x, w, b):
            return _conv_rows(x, w, b, act=act, slope=slope)

        def fwd(x, w, b):
            y = _conv_rows(x, w, b, act=act, slope=slope)
            return y, (x, w, y)

    def bwd(res, dy):
        x, w, y = res
        dz = _act_grad(act, slope, y, dy)
        wd = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
        dx = _conv_rows(dz, wd, jnp.zeros((w.shape[2],), dz.dtype)).astype(x.dtype)
        dw = _conv_wgrad(x, dz, w.shape[0]).astype(w.dtype)
        db = dz.sum((0, 1, 2)).astype(w.dtype)
        return (dx, dw, db, dz) if with_skip else (dx, dw, db)

    f.defvjp(fwd, bwd)
    return f


def conv_fused(x, w, bias, skip=None, act="none", slope=0.3):
    """KxK SAME stride-1 NHWC convolution with the epilogue (+skip, act)
    fused, fully Pallas fwd+bwd. Caller must have checked conv_available()."""
    fn = _fused(act, float(slope), skip is not None)
    return fn(x, w, bias, skip) if skip is not None else fn(x, w, bias)


def conv_reference(x, w, bias):
    """XLA reference with identical math (for validation and fallback)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias[None, None, None, :]
