"""Headline benchmark: SOL-32 karman-2d seconds per ADAM iteration.

The reference workload (BASELINE.md): msteps=32 unrolled differentiable solver
steps + mars_moon correction per step, batch of 3 Reynolds numbers on the
64x32 staggered grid, Adam update — one full forward+backward per iteration
(/root/reference/karman-2d/Makefile:78-80).

vs_baseline: the reference TF1+PhiFlow implementation measures ~1.35 s/iter on
its single-GPU setup (est. from the workload structure: 32 sequential pressure
solves forward + backward through the unrolled graph, plus a 33-frame
feed_dict per iteration; no public number is published — BASELINE.md). The
north-star target is >=10x, i.e. <=0.135 s/iter; vs_baseline reports
(reference_estimate / measured).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SEC_PER_ITER_EST = 1.35


def main() -> None:
    from solver_in_the_loop_tpu.models.features import Normalization
    from solver_in_the_loop_tpu.models.networks import build_model
    from solver_in_the_loop_tpu.physics.karman import KarmanFlow, karman_domain
    from solver_in_the_loop_tpu.train.trainer import (
        SolTrainConfig,
        make_karman_train_step,
        make_optimizer,
    )

    res = 32
    batch = 3
    msteps = 32
    n_sims, n_frames = 6, 64  # synthetic stand-in for the 6-sim training set

    dom = karman_domain(res)
    flow = KarmanFlow(dom, advection="shift", max_shift=2,
                      pressure_tol=1e-5, pressure_max_iter=500)
    cfg = SolTrainConfig(msteps=msteps, lr=1e-4, batch_size=batch, remat=True)
    model = build_model("mars_moon")
    norm = Normalization.karman(0.7, 0.12, 1.8e6)

    rng = np.random.RandomState(0)
    data = {
        "dens": jnp.asarray(rng.rand(n_sims, n_frames, dom.ny, dom.nx), jnp.float32),
        "u": jnp.asarray(0.1 * rng.randn(n_sims, n_frames, dom.ny, dom.nx + 1), jnp.float32),
        "v": jnp.asarray(1 + 0.1 * rng.randn(n_sims, n_frames, dom.ny + 1, dom.nx), jnp.float32),
        "re": jnp.asarray(1.6e5 * 2 ** np.arange(n_sims), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((batch, dom.ny, dom.nx, 3)))
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    train_step = make_karman_train_step(flow, model.apply, optimizer, cfg)

    def make_idx(i):
        sims = (np.arange(batch) + i) % n_sims
        frames = (np.arange(batch) * 7 + i) % (n_frames - msteps - 1)
        return jnp.asarray(np.stack([sims, frames], 1), jnp.int32)

    # warmup / compile
    for i in range(2):
        params, opt_state, loss, _ = train_step(params, opt_state, data, norm, make_idx(i))
    jax.block_until_ready(loss)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss, _ = train_step(params, opt_state, data, norm, make_idx(i))
    jax.block_until_ready(loss)
    sec_per_iter = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "karman2d_sol32_sec_per_adam_iter",
        "value": round(sec_per_iter, 6),
        "unit": "s/iter",
        "vs_baseline": round(REFERENCE_SEC_PER_ITER_EST / sec_per_iter, 2),
    }))


if __name__ == "__main__":
    main()
