"""Headline benchmark: SOL-32 karman-2d seconds per ADAM iteration.

The reference workload (BASELINE.md): msteps=32 unrolled differentiable solver
steps + mars_moon correction per step, batch of 3 Reynolds numbers on the
64x32 staggered grid, Adam update — one full forward+backward per iteration
(/root/reference/karman-2d/Makefile:78-80).

Baseline basis (the reference publishes NO timing numbers):

* `vs_baseline` uses a DERIVED kernel-launch-bound floor for the TF1+PhiFlow
  reference on its single-GPU setup, computed in `derived_reference_floor()`
  from the reference call graph: TF1 graph mode launches one GPU kernel per
  elementwise op; the unrolled graph executes ~32 x (solver fwd ~60 ops +
  pressure CG ~100 iterations x ~10 ops) forward plus ~2x that backward,
  at ~5 us/launch => ~0.51 s/iter as a CONSERVATIVE floor (real runs also pay
  the 33-frame feed_dict and TF session overhead; BENCH.md). The round-1
  estimate of 1.35 s/iter is retained as `vs_r1_estimate` for continuity.
* `mfu` / `hbm_util` report the measured FLOP/s and bytes/s of OUR compiled
  step against the TPU v5e peaks (197 TFLOP/s bf16 — fp32 compute counted
  against the bf16 peak, so MFU is a lower bound — and 819 GB/s HBM),
  from XLA's compiled cost analysis.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12   # bf16; fp32 counted against this => MFU lower bound
V5E_PEAK_HBM = 819e9      # bytes/s
R1_REFERENCE_EST = 1.35   # round-1 hand estimate, kept for cross-round continuity


LAUNCH_US_BAND = (2.5, 5.0, 10.0)  # per-kernel-launch cost band (optimistic /
                                   # central / pessimistic for a 2020-era GPU)


def derived_reference_floor(msteps: int = 32, launch_us: float = 5.0) -> float:
    """Kernel-launch-bound floor (seconds/iter) for the TF1+PhiFlow reference.

    Op counts from the reference call graph (/root/reference/karman-2d/
    karman_train.py:397-457 unroll; PhiFlow TF1 CG pressure solve is a
    tf.while_loop of elementwise ops):
      solver forward  ~60 launches (2x diffuse, BC blend, 3x advection
                      backtrace+gather, inflow, divergence, grad-subtract)
      pressure CG     ~100 iterations x ~10 launches
      backward        ~2x forward (VJPs + adjoint CG)
    at ~launch_us us per kernel launch (central 5 us: 2020-era single GPU,
    submission-bound; `measured_launch_counts` cross-checks the op counts
    against OUR traced graph, and LAUNCH_US_BAND gives the sensitivity band —
    VERDICT r3 #4a).
    """
    ops_fwd = 60 + 100 * 10
    ops_per_step = ops_fwd * 3  # fwd + ~2x bwd
    return msteps * ops_per_step * launch_us * 1e-6


def _count_eqns(jaxpr):
    """(static_ops, [per-iteration while-body op counts]) for a jaxpr,
    descending into nested closed jaxprs (pjit, custom_vjp, scan bodies count
    once — the only trip-counted loop in the step is the CG while_loop)."""
    free = {"broadcast_in_dim", "reshape", "squeeze", "convert_element_type",
            "stop_gradient", "copy", "transpose"}  # metadata-only: no TF1 kernel launch
    n = 0
    while_bodies = []
    for eq in jaxpr.eqns:
        if eq.primitive.name in free:
            continue
        if eq.primitive.name == "while":
            b, wb = _count_eqns(eq.params["body_jaxpr"].jaxpr)
            c, _ = _count_eqns(eq.params["cond_jaxpr"].jaxpr)
            while_bodies.append(b + c)
            while_bodies += wb
            continue
        n += 1
        subs = []
        for v in eq.params.values():
            if hasattr(v, "jaxpr"):
                subs.append(v.jaxpr)
            elif isinstance(v, (list, tuple)):
                subs += [s.jaxpr for s in v if hasattr(s, "jaxpr")]
        for sub in subs:
            b, wb = _count_eqns(sub)
            n += b
            while_bodies += wb
        if subs:
            n -= 1  # the wrapper eqn itself shouldn't double-count
    return n, while_bodies


def measured_launch_counts(flow, dom, batch):
    """Measured cross-check of the analytic launch-count model: count the
    primitives in OUR traced solver step (the reference's TF1 graph executes
    an equivalent computation op by op, ~one kernel launch per primitive).
    Returns (static_ops_per_step, cg_body_ops_per_iteration)."""
    from solver_in_the_loop_tpu.core.grids import CenteredGrid, StaggeredGrid
    from solver_in_the_loop_tpu.physics.karman import initial_state

    d0, v0 = initial_state(dom, batch)
    re = jnp.full((batch,), 1.6e5, jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda d, u, v, r: flow.step(CenteredGrid(d, dom),
                                     StaggeredGrid(u, v, dom), r)
    )(d0.values, v0.u, v0.v, re).jaxpr
    static, bodies = _count_eqns(jaxpr)
    return static, (max(bodies) if bodies else 0)


def _cost_analysis(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def main() -> None:
    from solver_in_the_loop_tpu.models.features import Normalization
    from solver_in_the_loop_tpu.models.networks import build_model
    from solver_in_the_loop_tpu.ops.pallas import advect_kernel as _advect_kernel
    from solver_in_the_loop_tpu.ops.pallas import conv_kernel as _conv_kernel
    from solver_in_the_loop_tpu.physics.karman import KarmanFlow, karman_domain
    from solver_in_the_loop_tpu.train.trainer import (
        SolTrainConfig,
        make_karman_train_step,
        make_optimizer,
    )

    import os

    res = 32
    batch = 3
    msteps = 32
    n_sims, n_frames = 6, 64  # synthetic stand-in for the 6-sim training set

    # pressure tolerance: 1e-5 is the campaign default; the measured
    # sensitivity study (results_full_workload/tol_study.json) shows 500-step
    # rollout MAE is identical at 1e-3 — override for A/B via SILT_BENCH_PTOL
    ptol = float(os.environ.get("SILT_BENCH_PTOL", "1e-5"))

    dom = karman_domain(res)
    flow = KarmanFlow(dom, advection="shift", max_shift=2,
                      pressure_tol=ptol, pressure_max_iter=500)
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

    # compiled cost analysis for the roofline figures
    flops, bytes_accessed = _cost_analysis(
        train_step.lower(params, opt_state, data, norm, make_idx(0)).compile()
    )

    # warmup / compile
    for i in range(2):
        params, opt_state, loss, _ = train_step(params, opt_state, data, norm, make_idx(i))
    jax.block_until_ready(loss)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss, _ = train_step(params, opt_state, data, norm, make_idx(i))
    jax.block_until_ready(loss)
    sec_per_iter = (time.perf_counter() - t0) / iters

    # CG iteration diagnostics (VERDICT r2 weak #1): p50/p95 solve iterations
    # over a short real rollout, cold vs warm-started from the previous
    # pressure (the production step warm-starts; see ops/poisson.py)
    from solver_in_the_loop_tpu.ops.poisson import pressure_solve_iterations
    from solver_in_the_loop_tpu.ops.stencils import divergence
    from solver_in_the_loop_tpu.physics.karman import initial_state

    d_r, v_r = initial_state(dom, 1)
    re_r = jnp.asarray([1.6e5], jnp.float32)
    p_prev = jnp.zeros_like(d_r.values)
    p_prev2 = p_prev3 = p_prev
    it_cold, it_warm, it_extr = [], [], []
    it_pcold, it_pextr = [], []
    pre = jax.jit(flow.pre_projection)
    for i in range(60):
        if i >= 20:  # skip the impulsive transient
            _, vel_adv = pre(d_r, v_r, re_r, 1.0)
            div = divergence(vel_adv.u * flow.masks.face_u,
                             vel_adv.v * flow.masks.face_v)
            x0e = 3 * p_prev - 3 * p_prev2 + p_prev3
            it_cold.append(int(pressure_solve_iterations(
                div, flow.masks, tol=1e-5, max_iter=500)))
            it_warm.append(int(pressure_solve_iterations(
                div, flow.masks, tol=1e-5, max_iter=500, x0=p_prev)))
            it_extr.append(int(pressure_solve_iterations(
                div, flow.masks, tol=1e-5, max_iter=500, x0=x0e)))
            # the production path (FD-preconditioned, ops/poisson.py): cold =
            # what adjoint solves see, extrap = the forward warm start
            it_pcold.append(int(pressure_solve_iterations(
                div, flow.masks, tol=1e-5, max_iter=500, precon=True)))
            it_pextr.append(int(pressure_solve_iterations(
                div, flow.masks, tol=1e-5, max_iter=500, x0=x0e, precon=True)))
        d_r, v_r, p_new = flow.step(d_r, v_r, re_r, dt=1.0, p0=p_prev)
        p_prev3, p_prev2, p_prev = p_prev2, p_prev, p_new
    cg_stats = {
        # iteration percentiles are measured on the XLA CG/PCG paths (the
        # fused Pallas kernel exits per-element and exposes no counter;
        # solutions agree to tol so counts are representative) — ADVICE r3 #4
        "cg_iter_stats_path": "xla",
        "cg_iters_cold_p50": float(np.percentile(it_cold, 50)),
        "cg_iters_cold_p95": float(np.percentile(it_cold, 95)),
        "cg_iters_warm_p50": float(np.percentile(it_warm, 50)),
        "cg_iters_warm_p95": float(np.percentile(it_warm, 95)),
        "cg_iters_extrap_p50": float(np.percentile(it_extr, 50)),
        "cg_iters_extrap_p95": float(np.percentile(it_extr, 95)),
        "pcg_iters_cold_p50": float(np.percentile(it_pcold, 50)),
        "pcg_iters_cold_p95": float(np.percentile(it_pcold, 95)),
        "pcg_iters_extrap_p50": float(np.percentile(it_pextr, 50)),
        "pcg_iters_extrap_p95": float(np.percentile(it_pextr, 95)),
    }

    # reference-style host feeding proxy: the TF1 loop ships the 33 GT frames
    # host->device every iteration (karman_train.py:500-502); measure that
    # transfer on this machine to quantify the device-resident-dataset win
    win = np.zeros((msteps + 1, batch, dom.ny + 1, dom.nx + 1, 3), np.float32)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(jax.device_put(win))
    hostfeed_sec = (time.perf_counter() - t0) / 10

    # measured launch-count anchor (VERDICT r3 #4a): primitives in OUR traced
    # step graph (xla CG so the while body is visible) x the measured COLD
    # p50 iteration count (the TF1 reference cold-starts every solve)
    flow_xla = KarmanFlow(dom, advection="shift", max_shift=2,
                          pressure_tol=ptol, pressure_max_iter=500,
                          pressure_backend="xla")
    static_ops, cg_body_ops = measured_launch_counts(flow_xla, dom, batch)
    launches_fwd = static_ops + cg_stats["cg_iters_cold_p50"] * cg_body_ops
    floor_measured = {
        us: round(msteps * 3 * launches_fwd * us * 1e-6, 3)
        for us in LAUNCH_US_BAND
    }

    floor = derived_reference_floor(msteps)
    out = {
        "metric": "karman2d_sol32_sec_per_adam_iter",
        "value": round(sec_per_iter, 6),
        "unit": "s/iter",
        "vs_baseline": round(floor / sec_per_iter, 2),
        "baseline_basis": f"derived launch-bound floor {floor:.2f}s (bench.py docstring)",
        "ref_floor_measured_opcounts": {
            "static_ops_per_step": static_ops,
            "cg_body_ops_per_iter": cg_body_ops,
            "floor_s_by_launch_us": floor_measured,
            "vs_baseline_by_launch_us": {
                us: round(f / sec_per_iter, 2) for us, f in floor_measured.items()
            },
        },
        "vs_r1_estimate": round(R1_REFERENCE_EST / sec_per_iter, 2),
        "flops_per_iter": flops,
        "mfu": round(flops / sec_per_iter / V5E_PEAK_FLOPS, 5) if flops else None,
        "hbm_util": round(bytes_accessed / sec_per_iter / V5E_PEAK_HBM, 4)
                    if bytes_accessed else None,
        "hostfeed_transfer_s": round(hostfeed_sec, 6),
        "pressure_tol": ptol,
        # which hardware-validated Pallas kernels were live for this number
        "pallas_conv": _conv_kernel._enabled(),
        "pallas_advect": _advect_kernel._enabled(),
        **cg_stats,
    }
    print(json.dumps(out))


def wait_for_tpu(budget_s: float = 1500.0, probe_timeout: int = 300) -> bool:
    """Block until the TPU backend answers, or the retry budget runs out.

    The axon tunnel stalls fresh processes for minutes after an outage or
    after another process releases the chip (CLAUDE.md); round 4 lost its
    driver bench capture to an instant `Unable to initialize backend` failure
    (VERDICT r4 weak #1).  Probe in subprocesses (backend init failure is
    cached per-process in jax) with long timeouts and loop.
    """
    if os.environ.get("SILT_BENCH_NO_WAIT"):
        return True
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and all(p.strip() in ("cpu", "") for p in plats.split(",")):
        return True  # forced-CPU runs (tests) don't probe; 'axon' IS the TPU tunnel
    deadline = time.time() + budget_s
    n = 0
    while True:
        n += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); assert d[0].platform=='tpu', d"],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return True
            err = r.stderr.decode(errors="replace").strip().splitlines()
            print(f"[bench] TPU probe {n} failed: {err[-1] if err else 'rc=%d' % r.returncode}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] TPU probe {n} timed out ({probe_timeout}s)",
                  file=sys.stderr, flush=True)
        if time.time() >= deadline:
            return False
        time.sleep(min(60.0, max(1.0, deadline - time.time())))


def emit_stale(reason: str) -> None:
    """Emit the most recent committed hardware measurement, flagged stale,
    instead of a bare traceback — a transient tunnel outage at round end must
    not cost the round its bench number (VERDICT r4 next-step #3)."""
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        "runs/bench_a3.json", "artifacts/bench_a3.json",
        "artifacts/bench_queue.json", "artifacts/perf/bench_fdpcg.json",
        "artifacts/perf/bench_tol5.json",
    ]
    obj, src = None, None
    for rel in candidates:
        p = os.path.join(here, rel)
        try:
            with open(p) as f:
                obj = json.loads(f.readline())
            src = rel
            break
        except Exception:
            continue
    if obj is None:
        obj = {"metric": "karman2d_sol32_sec_per_adam_iter", "value": None,
               "unit": "s/iter", "vs_baseline": None}
        src = "none"
    obj["stale"] = True
    obj["stale_source"] = src
    obj["stale_reason"] = reason
    print(json.dumps(obj))


if __name__ == "__main__":
    _budget = float(os.environ.get("SILT_BENCH_WAIT_S", "1500"))
    if not wait_for_tpu(budget_s=_budget,
                        probe_timeout=int(min(300, max(10, _budget)))):
        emit_stale("TPU backend unavailable after retry budget")
    else:
        try:
            main()
        except Exception as e:  # mid-bench tunnel death: stale beats rc=1
            emit_stale(f"bench raised {type(e).__name__}: {e}")
