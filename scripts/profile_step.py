"""Profile ONE SOL-32 training iteration on the real TPU and print a per-op
cost breakdown. Run only when the TPU is free (one process — CLAUDE.md):

    python scripts/profile_step.py [--msteps 32] [--iters 10]

Uses jax.profiler to capture a device trace of the steady-state train step,
then aggregates device-side op durations by fusion name prefix so the step's
time budget (convs vs CG kernel vs stencils vs Adam) is measurable instead of
guessed. The trace directory is printed for TensorBoard / xprof deep dives.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--msteps", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="runs/profile_step")
    ap.add_argument("--by-name", action="store_true",
                    help="aggregate by FULL op name (e.g. %%fusion.1234) instead "
                         "of the name prefix, and dump the compiled HLO so hot "
                         "fusions can be mapped back to source ops")
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
    cfg = SolTrainConfig(msteps=args.msteps, lr=1e-4, batch_size=batch, remat=True)
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

    # Pre-stage every iteration's index batch on device BEFORE tracing: on the
    # tunneled chip a per-iteration host->device feed costs ~100ms of
    # copy-start wait that swamps the trace (observed 71% copy-start in the
    # r4 first capture) and does not exist on a locally-attached host.
    all_idx = [jax.device_put(jnp.asarray(
        np.stack([(np.arange(batch) + i) % n_sims,
                  (np.arange(batch) * 7 + i) % (n_frames - args.msteps - 1)], 1),
        jnp.int32)) for i in range(max(args.iters, 2))]
    jax.block_until_ready(all_idx)

    def idx(i):
        return all_idx[i % len(all_idx)]

    for i in range(2):  # compile + warm
        params, opt_state, loss, _ = train_step(params, opt_state, data, norm, idx(i))
    jax.block_until_ready(loss)

    if args.by_name:
        os.makedirs(args.out, exist_ok=True)
        hlo = train_step.lower(params, opt_state, data, norm, idx(0)).compile().as_text()
        hlo_path = os.path.join(args.out, "hlo.txt")
        with open(hlo_path, "w") as f:
            f.write(hlo)
        print(f"compiled HLO ({len(hlo.splitlines())} lines) -> {hlo_path}")

    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            params, opt_state, loss, _ = train_step(params, opt_state, data, norm, idx(i))
        jax.block_until_ready(loss)
    wall = (time.perf_counter() - t0) / args.iters
    print(f"steady state: {wall:.4f} s/iter over {args.iters} iters")
    print(f"trace in {args.out} (load with TensorBoard profile plugin)")

    # crude device-op aggregation from the trace protobuf (best effort)
    try:
        from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
    except Exception:
        pass
    events = []
    for xp in glob.glob(os.path.join(args.out, "plugins/profile/*/*.xplane.pb")):
        try:
            try:
                from tensorflow.tsl.profiler.protobuf import xplane_pb2
            except ImportError:
                from tensorboard_plugin_profile.protobuf import xplane_pb2
            space = xplane_pb2.XSpace()
            with open(xp, "rb") as f:
                space.ParseFromString(f.read())
        except Exception as e:
            print(f"(xplane parse unavailable: {e})")
            break
        for plane in space.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                # Aggregate the op-level line only: the Steps/XLA Modules/Async
                # lines hold enclosing spans (whole step, copy-start waits)
                # that double-count or measure tunnel transfers, not compute.
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    events.append((name, ev.duration_ps / 1e6))  # us
    if events:
        agg = collections.Counter()
        n = collections.Counter()
        for name, us in events:
            key = name if args.by_name else name.split(".")[0].split("(")[0][:48]
            agg[key] += us
            n[key] += 1
        # %while is the msteps scan: it CONTAINS every fused op that also
        # appears as its own event, so drop it from the total to avoid 2x.
        while_ms = sum(us for k, us in agg.items() if k.startswith("%while")) / 1e3
        inner = {k: us for k, us in agg.items() if not k.startswith("%while")}
        total = sum(inner.values())
        print(f"\ndevice op time ({total/1e3:.2f} ms total across {args.iters}"
              f" iters; scan span %while={while_ms:.2f} ms"
              " contains the rest and is excluded):")
        for k, us in sorted(inner.items(), key=lambda kv: -kv[1])[:40 if args.by_name else 25]:
            print(f"  {us/1e3:9.3f} ms  {100*us/total:5.1f}%  n={n[k]:7d}  {k}")


if __name__ == "__main__":
    main()
