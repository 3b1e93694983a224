"""A/B the per-unrolled-step remat policy of the SOL-32 train step on TPU.

The r4b device profile (runs/profile_r4b.log) shows the headline step is
~96% device-compute-bound (36.3 ms device vs 37.5 ms wall), dominated by
thousands of tiny fusions — op-count-bound at 32x32. The "pressure" remat
policy re-runs every stencil/conv in backward; at headline size the saved
residuals are a few MB, so remat may be pure overhead. Measure, don't guess.

    python scripts/ab_remat.py [--iters 30]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--msteps", type=int, default=32)
    args = ap.parse_args()

    from solver_in_the_loop_tpu.models.features import Normalization
    from solver_in_the_loop_tpu.models.networks import build_model
    from solver_in_the_loop_tpu.physics.karman import KarmanFlow, karman_domain
    from solver_in_the_loop_tpu.train.trainer import (
        SolTrainConfig,
        make_karman_train_step,
        make_optimizer,
    )

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
                  (np.arange(batch) * 7 + i) % (n_frames - args.msteps - 1)], 1),
        jnp.int32)) for i in range(8)]
    jax.block_until_ready(all_idx)

    variants = [
        ("remat=pressure", "float32", dict(remat=True, remat_policy="pressure")),
        ("remat=pressure+conv", "float32", dict(remat=True, remat_policy="pressure+conv")),
        ("remat=pressure+conv bf16", "bfloat16", dict(remat=True, remat_policy="pressure+conv")),
        ("remat=pressure bf16", "bfloat16", dict(remat=True, remat_policy="pressure")),
        ("remat=pressure+advect", "float32", dict(remat=True, remat_policy="pressure+advect")),
        ("remat=off", "float32", dict(remat=False)),
    ]
    results = {}
    for name, cdtype, kw in variants:
        model = build_model("mars_moon", compute_dtype=jnp.dtype(cdtype))
        cfg = SolTrainConfig(msteps=args.msteps, lr=1e-4, batch_size=batch, **kw)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((batch, dom.ny, dom.nx, 3)))
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(params)
        train_step = make_karman_train_step(flow, model.apply, optimizer, cfg)
        t_c = time.perf_counter()
        for i in range(2):
            params, opt_state, loss, _ = train_step(params, opt_state, data, norm,
                                                    all_idx[i % len(all_idx)])
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for i in range(args.iters):
            params, opt_state, loss, _ = train_step(params, opt_state, data, norm,
                                                    all_idx[i % len(all_idx)])
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(f"{name:24s} {dt*1e3:8.2f} ms/iter  (compile+warm {compile_s:.1f}s)  "
              f"loss={float(loss):.4g}", flush=True)

    base = results["remat=pressure"]
    for name, dt in results.items():
        print(f"{name:24s} {base/dt:5.2f}x vs pressure-policy baseline")


if __name__ == "__main__":
    main()
