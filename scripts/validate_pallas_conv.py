"""Real-TPU validation + A/B timing for the fused Pallas conv kernels.

Run ONLY when the TPU is free (one process at a time — CLAUDE.md):

    python scripts/validate_pallas_conv.py [--iters 30]

Three stages:

1. Correctness at the production conv shapes (B=3, 64x32 grid; 3->32, 32->32,
   32->2 channels, 5x5 SAME): Pallas forward + custom_vjp grads vs XLA's
   conv_general_dilated and jax.grad through it.
2. Micro timing: fwd and fwd+bwd loops, Pallas vs XLA, per shape.
3. End-to-end: the SOL-32 train step (same harness as ab_remat.py) with the
   dispatch forced OFF vs ON (SILT_PALLAS_CONV env, read at trace time).

On PASS *and* an end-to-end win it drops artifacts/perf/conv_ok, which
models/networks.Conv reads (via conv_kernel.conv_available) to enable the
Pallas path in production. Override either way with SILT_PALLAS_CONV=0/1.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = os.path.join(REPO, "artifacts", "perf", "conv_ok")


def _bench(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def check_shapes(report, variant):
    from solver_in_the_loop_tpu.ops.pallas import conv_kernel as ck

    os.environ["SILT_PALLAS_CONV_VARIANT"] = variant
    ok = True
    total = 0.0
    for cin, cout in ((3, 32), (32, 32), (32, 2)):
        rng = np.random.RandomState(cin + cout)
        x = jnp.asarray(rng.randn(3, 64, 32, cin), jnp.float32)
        w = jnp.asarray(0.1 * rng.randn(5, 5, cin, cout), jnp.float32)
        b = jnp.asarray(0.01 * rng.randn(cout), jnp.float32)
        cot = jnp.asarray(rng.randn(3, 64, 32, cout), jnp.float32)

        f_pal = jax.jit(ck.conv_same)
        f_ref = jax.jit(ck.conv_reference)
        y_pal, y_ref = f_pal(x, w, b), f_ref(x, w, b)
        err = float(jnp.max(jnp.abs(y_pal - y_ref)))

        g_pal = jax.jit(jax.grad(lambda *a: jnp.sum(ck.conv_same(*a) * cot),
                                 argnums=(0, 1, 2)))
        g_ref = jax.jit(jax.grad(lambda *a: jnp.sum(ck.conv_reference(*a) * cot),
                                 argnums=(0, 1, 2)))
        gerr = max(float(jnp.max(jnp.abs(a - e)))
                   for a, e in zip(g_pal(x, w, b), g_ref(x, w, b)))
        # fused epilogue (leaky_relu + skip) at the same shape — the form the
        # networks actually dispatch (models/networks.Conv)
        skip = jnp.asarray(rng.randn(3, 64, 32, cout), jnp.float32)
        e_pal = jax.jit(lambda x, w, b, s: ck.conv_fused(
            x, w, b, s, act="leaky_relu", slope=0.3))
        e_ref = jax.jit(lambda x, w, b, s: jax.nn.leaky_relu(
            ck.conv_reference(x, w, b) + s, 0.3))
        eerr = float(jnp.max(jnp.abs(e_pal(x, w, b, skip) - e_ref(x, w, b, skip))))
        ge_pal = jax.jit(jax.grad(
            lambda *a: jnp.sum(e_pal(*a) * cot), argnums=(0, 1, 2, 3)))
        ge_ref = jax.jit(jax.grad(
            lambda *a: jnp.sum(e_ref(*a) * cot), argnums=(0, 1, 2, 3)))
        geerr = max(float(jnp.max(jnp.abs(a - e)))
                    for a, e in zip(ge_pal(x, w, b, skip), ge_ref(x, w, b, skip)))

        good = err < 1e-3 and gerr < 5e-3 and eerr < 1e-3 and geerr < 5e-3
        ok &= good

        t_fp = _bench(f_pal, x, w, b)
        t_fr = _bench(f_ref, x, w, b)
        t_gp = _bench(g_pal, x, w, b)
        t_gr = _bench(g_ref, x, w, b)
        line = (f"[{variant}] {cin:3d}->{cout:3d}: fwd err {err:.2e} grad err {gerr:.2e} "
                f"epi err {eerr:.2e}/{geerr:.2e} [{'PASS' if good else 'FAIL'}]  "
                f"fwd {t_fp*1e6:7.1f}us pallas vs {t_fr*1e6:7.1f}us xla "
                f"({t_fr/t_fp:4.2f}x)  fwd+bwd {t_gp*1e6:7.1f}us vs "
                f"{t_gr*1e6:7.1f}us ({t_gr/t_gp:4.2f}x)")
        print(line, flush=True)
        report.append(line)
        total += t_fp + t_gp
    return ok, total


def e2e(report, iters, msteps=32):
    from solver_in_the_loop_tpu.models.features import Normalization
    from solver_in_the_loop_tpu.models.networks import build_model
    from solver_in_the_loop_tpu.physics.karman import KarmanFlow, karman_domain
    from solver_in_the_loop_tpu.train.trainer import (
        SolTrainConfig, make_karman_train_step, make_optimizer)

    res, batch, n_sims, n_frames = 32, 3, 6, 64
    dom = karman_domain(res)
    flow = KarmanFlow(dom, advection="shift", max_shift=2,
                      pressure_tol=1e-5, pressure_max_iter=500)
    norm = Normalization.karman(0.7, 0.12, 1.8e6)
    rng = np.random.RandomState(0)
    data = {
        "dens": jnp.asarray(rng.rand(n_sims, n_frames, dom.ny, dom.nx), jnp.float32),
        "u": jnp.asarray(0.1 * rng.randn(n_sims, n_frames, dom.ny, dom.nx + 1), jnp.float32),
        "v": jnp.asarray(1 + 0.1 * rng.randn(n_sims, n_frames, dom.ny + 1, dom.nx), jnp.float32),
        "re": jnp.asarray(1.6e5 * 2 ** np.arange(n_sims), jnp.float32),
    }
    all_idx = [jax.device_put(jnp.asarray(
        np.stack([(np.arange(batch) + i) % n_sims,
                  (np.arange(batch) * 7 + i) % (n_frames - msteps - 1)], 1),
        jnp.int32)) for i in range(8)]
    jax.block_until_ready(all_idx)

    times = {}
    for arm in ("0", "1"):
        os.environ["SILT_PALLAS_CONV"] = arm
        model = build_model("mars_moon")
        cfg = SolTrainConfig(msteps=msteps, lr=1e-4, batch_size=batch)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((batch, dom.ny, dom.nx, 3)))
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(params)
        train_step = make_karman_train_step(flow, model.apply, optimizer, cfg)
        for i in range(2):
            params, opt_state, loss, _ = train_step(
                params, opt_state, data, norm, all_idx[i % len(all_idx)])
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss, _ = train_step(
                params, opt_state, data, norm, all_idx[i % len(all_idx)])
        jax.block_until_ready(loss)
        times[arm] = (time.perf_counter() - t0) / iters
        line = (f"train step, SILT_PALLAS_CONV={arm}: {times[arm]*1e3:.2f} ms/iter"
                f"  loss={float(loss):.4g}")
        print(line, flush=True)
        report.append(line)
    del os.environ["SILT_PALLAS_CONV"]
    return times["0"], times["1"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--force", action="store_true",
                    help="drop the marker even without an e2e win")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()

    report = []
    totals = {}
    for variant in ("patch", "taps"):
        ok, totals[variant] = check_shapes(report, variant)
        if not ok:
            print(f"FAIL: correctness mismatch ({variant}) — not enabling")
            sys.exit(1)
    winner = min(totals, key=totals.get)
    line = (f"variant micro totals: patch {totals['patch']*1e6:.1f}us, "
            f"taps {totals['taps']*1e6:.1f}us -> {winner}")
    print(line, flush=True)
    report.append(line)
    os.environ["SILT_PALLAS_CONV_VARIANT"] = winner
    t_off, t_on = e2e(report, args.iters)
    speedup = t_off / t_on
    line = f"e2e speedup {speedup:.3f}x (off {t_off*1e3:.2f} -> on {t_on*1e3:.2f} ms/iter)"
    print(line, flush=True)
    report.append(line)
    if speedup > 1.01 or args.force:
        os.makedirs(os.path.dirname(MARKER), exist_ok=True)
        with open(MARKER, "w") as f:
            f.write(f"variant={winner}\n" + "\n".join(report) + "\n")
        print(f"PASS: marker dropped -> {MARKER} (variant={winner})")
    else:
        print("correct but no e2e win — marker NOT dropped")


if __name__ == "__main__":
    main()
