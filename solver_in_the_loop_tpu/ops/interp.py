"""Bilinear interpolation on batched 2-D arrays.

The single sampling primitive behind semi-Lagrangian advection and
face-position-aware resampling (the TPU-native replacement for PhiFlow's field
`.at(...)` / `advect.semi_lagrangian` samplers and the reference's
`scipy.interpolate.interp2d` staggered upsampler,
/root/reference/karman-2d/karman_pre.py:69-85).

Two implementations:

* `bilinear_sample` — gather-based, arbitrary coordinates.
* `shifted_stencil_sample` — gather-free: when the sample offsets are bounded
  (|delta| <= max_shift cells, the common semi-Lagrangian case), expresses the
  interpolation as a weighted sum of statically shifted copies of the field.
  This is pure VPU work on TPU (no gather), fuses with neighbours, and is
  exactly differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(values: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """values (B, H, W); yi/xi integer index arrays (B, ...) -> (B, ...)."""
    batch_shape = yi.shape
    b_idx = jnp.arange(values.shape[0]).reshape((-1,) + (1,) * (len(batch_shape) - 1))
    return values[b_idx, yi, xi]


def bilinear_sample(
    values: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    periodic: bool = False,
) -> jnp.ndarray:
    """Sample `values` (B, H, W) at fractional index coordinates (y, x).

    y, x: arrays of shape (B, ...) in index space of `values` (0 = first sample).
    Outside the array, OPEN domains clamp to the edge value (replicate
    extrapolation, PhiFlow's 'boundary' mode); PERIODIC wraps.
    """
    h, w = values.shape[-2:]
    if periodic:
        y = jnp.mod(y, h)
        x = jnp.mod(x, w)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        fy = y - y0
        fx = x - x0
        y1 = jnp.mod(y0 + 1, h)
        x1 = jnp.mod(x0 + 1, w)
        y0 = jnp.mod(y0, h)
        x0 = jnp.mod(x0, w)
    else:
        y = jnp.clip(y, 0.0, h - 1.0)
        x = jnp.clip(x, 0.0, w - 1.0)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.minimum(y0, h - 2) if h > 1 else y0
        x0 = jnp.minimum(x0, w - 2) if w > 1 else x0
        fy = y - y0
        fx = x - x0
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)

    v00 = _gather_2d(values, y0, x0)
    v01 = _gather_2d(values, y0, x1)
    v10 = _gather_2d(values, y1, x0)
    v11 = _gather_2d(values, y1, x1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def shifted_stencil_sample(
    values: jnp.ndarray,
    dy: jnp.ndarray,
    dx: jnp.ndarray,
    max_shift: int,
    periodic: bool = False,
) -> jnp.ndarray:
    """Gather-free bilinear sampling at (j + dy, i + dx) for each element (j, i).

    values, dy, dx: (B, H, W). Offsets are clamped to [-max_shift, max_shift].
    Result[b, j, i] = bilinear(values[b], j + dy[b,j,i], i + dx[b,j,i]).

    Implemented as a sum over (2*max_shift + 2)^2-ish statically shifted copies
    with elementwise hat weights — no gathers, so XLA maps it onto the VPU and
    fuses it with surrounding ops. Semi-Lagrangian backtraces have |delta| =
    |v| * dt / h, small for stable settings, so max_shift stays tiny (1-2 for
    the reference's karman/burgers configs).
    """
    h, w = values.shape[-2:]
    dy = jnp.clip(dy, -max_shift, max_shift)
    dx = jnp.clip(dx, -max_shift, max_shift)

    if not periodic:
        # Clamp the absolute sample position to the valid range (replicate).
        jj = jnp.arange(h, dtype=values.dtype)[None, :, None]
        ii = jnp.arange(w, dtype=values.dtype)[None, None, :]
        dy = jnp.clip(jj + dy, 0.0, h - 1.0) - jj
        dx = jnp.clip(ii + dx, 0.0, w - 1.0) - ii

    # fused Pallas tap-sum (one kernel fwd, one bwd) when hardware-validated;
    # the clamps above stay in XLA so their VJPs compose (ops/pallas/
    # advect_kernel.py). Weights are bit-identical to the loop below.
    from solver_in_the_loop_tpu.ops.pallas import advect_kernel as ak

    if values.ndim == 3 and ak.tap_sum_available(values.shape, max_shift, periodic):
        return ak.tap_sum(values,
                          jnp.broadcast_to(dy, values.shape).astype(values.dtype),
                          jnp.broadcast_to(dx, values.shape).astype(values.dtype),
                          max_shift, periodic)

    def shifted(sy: int, sx: int) -> jnp.ndarray:
        """values[b, j + sy, i + sx] with edge replication / wrap, statically."""
        if periodic:
            return jnp.roll(values, shift=(-sy, -sx), axis=(-2, -1))
        out = values
        if sy > 0:
            out = jnp.concatenate([out[:, sy:, :], jnp.repeat(out[:, -1:, :], sy, axis=1)], axis=1)
        elif sy < 0:
            out = jnp.concatenate([jnp.repeat(out[:, :1, :], -sy, axis=1), out[:, :sy, :]], axis=1)
        if sx > 0:
            out = jnp.concatenate([out[:, :, sx:], jnp.repeat(out[:, :, -1:], sx, axis=2)], axis=2)
        elif sx < 0:
            out = jnp.concatenate([jnp.repeat(out[:, :, :1], -sx, axis=2), out[:, :, :sx]], axis=2)
        return out

    result = jnp.zeros_like(values)
    for sy in range(-max_shift, max_shift + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
        for sx in range(-max_shift, max_shift + 2):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx))
            result = result + shifted(sy, sx) * (wy * wx)
    return result
