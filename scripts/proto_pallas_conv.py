"""Prototype: fused im2col 5x5 conv as a Pallas TPU kernel, vs XLA's conv.

Motivation (BENCH.md round-4 step profile): the 12 MarsMoon convolutions are
~31 of the 36.3 ms/iter SOL-32 device time, and XLA's space-to-batch conv at
(B=3, 64x32, C=32) runs at <10% MXU. This kernel reformulates the conv as one
MXU matmul per row-tile:

  rows r = ((b*H + y)*W + x) flatten batch+space; for each of the 25 taps the
  (TM, C) block of rows r+dy*W+dx (masked where x+dx / y+dy leave the image —
  batch crossing is covered by the y mask) is written into a (TM, 25*C)
  scratch patch matrix P; Y_tile = P @ Wmat (25*C, Cout) + bias.

Run on TPU:  python scripts/proto_pallas_conv.py [--iters 50] [--bf16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def conv_kernel(xp_ref, w_ref, b_ref, y_ref, p_ref, *, TM, W, H, C, halo):
    i = pl.program_id(0)
    row0 = i * TM
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    x = gr % W
    y = (gr // W) % H
    for tap in range(25):
        dy, dx = tap // 5 - 2, tap % 5 - 2
        shift = dy * W + dx
        blk = xp_ref[pl.ds(halo + row0 + shift, TM), :]
        valid = (x + dx >= 0) & (x + dx < W) & (y + dy >= 0) & (y + dy < H)
        p_ref[:, tap * C:(tap + 1) * C] = jnp.where(valid, blk, 0.0)
    y_ref[:, :] = (jnp.dot(p_ref[:, :], w_ref[:, :],
                           preferred_element_type=jnp.float32)
                   + b_ref[0, :][None, :])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--tm", type=int, default=512)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode correctness check (no timing)")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    B, H, W, C, Cout = 3, 64, 32, 32, 32
    M = B * H * W
    halo = 2 * W + 2
    TM = args.tm
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(0.1 * rng.randn(5, 5, C, Cout), jnp.float32)
    bias = jnp.asarray(0.01 * rng.randn(Cout), jnp.float32)

    import jax.experimental.pallas.tpu as pltpu

    kern = functools.partial(conv_kernel, TM=TM, W=W, H=H, C=C, halo=halo)
    pcall = pl.pallas_call(
        kern,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((M + 2 * halo, C), lambda i: (0, 0)),
            pl.BlockSpec((25 * C, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, Cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, 25 * C), dtype)],
        interpret=args.interpret,
    )

    @jax.jit
    def pallas_forward(x, w, bias):
        rows = x.reshape(M, C).astype(dtype)
        xp = jnp.pad(rows, ((halo, halo), (0, 0)))
        wmat = w.reshape(25 * C, Cout).astype(dtype)
        return pcall(xp, wmat, bias.reshape(1, Cout)).reshape(B, H, W, Cout)

    @jax.jit
    def xla_forward(x, w, bias):
        xc = x.astype(dtype)
        y = jax.lax.conv_general_dilated(
            xc, w.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y + bias[None, None, None, :]

    y_ref = xla_forward(x, w, bias)
    y_pal = pallas_forward(x, w, bias)
    err = float(jnp.max(jnp.abs(y_ref - y_pal)))
    print(f"max |pallas - xla| = {err:.3e}  (dtype={dtype.__name__})")

    # steady-state per-conv time: chain the conv on itself inside one scan
    def chain(f):
        @jax.jit
        def run(x, w, bias):
            def body(c, _):
                return f(c, w, bias), ()
            out, _ = jax.lax.scan(body, x, None, length=args.iters)
            return out
        return run

    for name, f in [("xla", xla_forward), ("pallas", pallas_forward)]:
        r = chain(f)
        out = r(x, w, bias)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = r(x, w, bias)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * args.iters)
        print(f"{name:7s} {dt*1e6:8.2f} us/conv  ({args.iters}-deep chain, {reps} reps)")


if __name__ == "__main__":
    main()
