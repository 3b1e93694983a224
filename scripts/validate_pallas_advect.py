"""Real-TPU validation + A/B timing for the fused advection tap-sum kernel.

Run ONLY when the TPU is free (one process at a time — CLAUDE.md):

    python scripts/validate_pallas_advect.py [--iters 30]

Three stages (same protocol as scripts/validate_pallas_conv.py):

1. Correctness at the production advection shapes — karman OPEN (dens
   (3,64,32), u (3,64,33), v (3,65,32)) and burgers PERIODIC ((5,32,32),
   (5,32,33), (5,33,32)) — Pallas forward + custom_vjp grads vs the XLA
   shifted-stencil path (ops/interp.shifted_stencil_sample).
2. Micro timing per shape, fwd and fwd+bwd.
3. End-to-end: the SOL-32 train step with SILT_PALLAS_ADVECT forced 0 vs 1
   (on top of whatever conv dispatch state is already active).

On PASS *and* an end-to-end win it drops artifacts/perf/advect_ok, which
ops/interp.shifted_stencil_sample reads (via advect_kernel.tap_sum_available)
to enable the fused path in production. Override with SILT_PALLAS_ADVECT=0/1.
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
MARKER = os.path.join(REPO, "artifacts", "perf", "advect_ok")

SHAPES = [
    # (B, H, W, max_shift, periodic)
    (3, 64, 32, 2, False), (3, 64, 33, 2, False), (3, 65, 32, 2, False),
    (5, 32, 32, 2, True), (5, 32, 33, 2, True), (5, 33, 32, 2, True),
]


def _bench(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def check_shapes(report):
    from solver_in_the_loop_tpu.ops import interp

    ok = True
    total = 0.0
    for b, h, w, m, per in SHAPES:
        rng = np.random.RandomState(b + h + w)
        values = jnp.asarray(rng.randn(b, h, w), jnp.float32)
        dy = jnp.asarray(1.5 * rng.randn(b, h, w), jnp.float32)
        dx = jnp.asarray(1.5 * rng.randn(b, h, w), jnp.float32)
        cot = jnp.asarray(rng.randn(b, h, w), jnp.float32)

        def run(arm, grad=False):
            os.environ["SILT_PALLAS_ADVECT"] = arm
            f = lambda v, y, x: interp.shifted_stencil_sample(v, y, x, m, per)
            if grad:
                g = jax.jit(jax.grad(lambda *a: jnp.sum(f(*a) * cot),
                                     argnums=(0, 1, 2)))
                return g, g(values, dy, dx)
            fj = jax.jit(f)
            return fj, fj(values, dy, dx)

        try:
            f_pl, y_pl = run("1")
            f_xl, y_xl = run("0")
            err = float(jnp.max(jnp.abs(y_pl - y_xl)))
            g_pl, gs_pl = run("1", grad=True)
            g_xl, gs_xl = run("0", grad=True)
            gerr = max(float(jnp.max(jnp.abs(a - e))) for a, e in zip(gs_pl, gs_xl))
        except Exception as e:  # Mosaic lowering failures count as FAIL, with log
            line = f"({b},{h},{w}) m={m} {'per' if per else 'open'}: LOWERING FAIL {e}"
            print(line, flush=True)
            report.append(line)
            ok = False
            continue
        good = err < 1e-4 and gerr < 1e-3
        ok &= good

        os.environ["SILT_PALLAS_ADVECT"] = "1"
        t_fp = _bench(f_pl, values, dy, dx)
        t_gp = _bench(g_pl, values, dy, dx)
        os.environ["SILT_PALLAS_ADVECT"] = "0"
        t_fx = _bench(f_xl, values, dy, dx)
        t_gx = _bench(g_xl, values, dy, dx)
        line = (f"({b},{h},{w}) m={m} {'per' if per else 'open'}: "
                f"fwd err {err:.2e} grad err {gerr:.2e} "
                f"[{'PASS' if good else 'FAIL'}]  "
                f"fwd {t_fp*1e6:6.1f}us pallas vs {t_fx*1e6:6.1f}us xla "
                f"({t_fx/t_fp:4.2f}x)  fwd+bwd {t_gp*1e6:6.1f}us vs "
                f"{t_gx*1e6:6.1f}us ({t_gx/t_gp:4.2f}x)")
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

    times, losses = {}, {}
    for arm in ("0", "1"):
        os.environ["SILT_PALLAS_ADVECT"] = arm
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
        losses[arm] = float(loss)
        line = (f"train step, SILT_PALLAS_ADVECT={arm}: {times[arm]*1e3:.2f} "
                f"ms/iter  loss={losses[arm]:.6g}")
        print(line, flush=True)
        report.append(line)
    del os.environ["SILT_PALLAS_ADVECT"]
    if not (abs(losses["1"] - losses["0"])
            <= 1e-3 * max(1.0, abs(losses["0"]))):
        print(f"FAIL: e2e loss mismatch {losses}")
        sys.exit(1)
    return times["0"], times["1"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--force", action="store_true",
                    help="drop the marker even without an e2e win")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()

    report = []
    ok, _total = check_shapes(report)
    if not ok:
        print("FAIL: correctness mismatch — not enabling")
        sys.exit(1)
    t_off, t_on = e2e(report, args.iters)
    speedup = t_off / t_on
    line = f"e2e speedup {speedup:.3f}x (off {t_off*1e3:.2f} -> on {t_on*1e3:.2f} ms/iter)"
    print(line, flush=True)
    report.append(line)
    if speedup > 1.01 or args.force:
        os.makedirs(os.path.dirname(MARKER), exist_ok=True)
        with open(MARKER, "w") as f:
            f.write("\n".join(report) + "\n")
        print(f"PASS: marker dropped -> {MARKER}")
    else:
        print("correct but no e2e win — marker NOT dropped")


if __name__ == "__main__":
    main()
