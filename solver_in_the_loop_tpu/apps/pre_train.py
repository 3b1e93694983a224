"""PRE supervised training CLI (karman + burgers).

Replicates `python karman_train_pre.py -o <dir>/tf --val 0.05 --epochs 400
--augment <pre-set>/sim_0*/` (/root/reference/karman-2d/karman_train_pre.py)
and the burgers variant (/root/reference/burgers/burgers_train_pre.py):

* features: [v, u, Re] (karman, karman_train_pre.py:162-181) or
  [v, u, fv, fu] (burgers, burgers_train_pre.py:161-181) from the stored
  pre-correction state; labels [corr_v, corr_u]
* nonzero-masked per-channel std, zero-centered standardization
  (tf_data.py:16-32)
* shuffled val split; random flip-x augmentation with per-channel sign flips
  ([1,-1,1,1,-1] karman :164 — u and corr_u negate; all +1 burgers :163)
* MSE, Adam, batch 32, lr x0.1 at epochs 81/121/161 and x0.5 at 181 (:127-144)
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import logging
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.train import checkpoint as ckpt
from solver_in_the_loop_tpu.utils.metrics import MetricsWriter

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("pre-train")
    p.add_argument("-o", "--opath", required=True, help="output dir (model, stats)")
    p.add_argument("--val", type=float, default=0.2)
    p.add_argument("--bsize", dest="batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", dest="steps_per_epoch", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--model", default="mars_moon")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--nsigma", type=float, default=1.0)
    p.add_argument("--novdata", action="store_true",
                   help="no held-out split: train and validate on the full set "
                        "(karman_train_pre.py:204-208)")
    p.add_argument("--nozerocen", action="store_true",
                   help="standardize subtracting the nonzero-masked channel mean "
                        "instead of zero-centered (karman_train_pre.py:220-221)")
    p.add_argument("--nostats", action="store_true", help="skip histogram PDF plots")
    p.add_argument("--leaky-alpha", type=float, default=0.3,
                   help="LeakyReLU negative slope (Keras default 0.3; "
                        "rounds 1-4a trained at 0.01)")
    p.add_argument("--resume", type=int, default=-1,
                   help="resume from model_epochNNNN.msgpack, replaying the "
                        "data/lr schedule of the skipped epochs")
    p.add_argument("tdata", nargs="+", help="PRE scene dirs (sim_*)")
    return p


def write_histogram_stats(opath: str, named_arrays) -> None:
    """Per-channel histogram pages -> stats.pdf + stats-png/ (parity with
    karman_train_pre.py:229-275)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    png_dir = os.path.join(opath, "stats-png")
    os.makedirs(png_dir, exist_ok=True)
    with PdfPages(os.path.join(opath, "stats.pdf")) as pdf:
        for name, arr in named_arrays:
            for c in range(arr.shape[-1]):
                dd = np.asarray(arr[..., c]).reshape(-1)
                plt.figure()
                plt.hist(dd, bins=100, log=True)
                plt.title(f"Histogram of {name}[{c}]  mean={dd.mean():.4g} std={dd.std():.4g}")
                plt.savefig(pdf, format="pdf")
                plt.savefig(os.path.join(png_dir, f"{name}_{c}.png"))
                plt.close("all")


def _epoch_path_keep(opath: str, cur_epoch: int):
    """Path of the now-superseded previous per-epoch checkpoint, or None if it
    should be kept (every 50th epoch stays as a durable snapshot)."""
    prev_ep = cur_epoch - 1
    if prev_ep <= 0 or prev_ep % 50 == 0:
        return None
    p = os.path.join(opath, f"model_epoch{prev_ep:04d}.msgpack")
    return p if os.path.exists(p) else None


def pre_lr_schedule(epoch: int, current_lr: float) -> float:
    if epoch == 181:
        return current_lr * 0.5
    if epoch in (81, 121, 161):
        return current_lr * 0.1
    return current_lr


def _read_collocated(path: str) -> np.ndarray:
    """npz staggered frame -> (1, Y, X, 2) collocated [v, u] (the reference's
    read_grid + channel reversal, karman_train_pre.py:85-108, 170)."""
    from solver_in_the_loop_tpu.io import scene as scene_io

    u, v = scene_io.legacy_to_staggered(scene_io.read_array(path))
    return np.stack([v[:, :-1, :], u[:, :, :-1]], axis=-1)


def load_pre_data(tdata, scenario: str):
    dirs = sorted(d for pat in tdata for d in _glob.glob(pat))
    vel_files, corr_files, frc_files, re_vals = [], [], [], []
    for d in dirs:
        vels = sorted(_glob.glob(os.path.join(d, "velo_0*.npz")))
        corrs = sorted(_glob.glob(os.path.join(d, "corr_0*.npz")))
        assert len(vels) == len(corrs), d
        vel_files += vels
        corr_files += corrs
        if scenario == "karman":
            with open(os.path.join(d, "params.pickle"), "rb") as f:
                re = float(pickle.load(f)["re"])
            re_vals += [re] * len(vels)
        else:
            frcs = sorted(_glob.glob(os.path.join(d, "forc_0*.npz")))
            assert len(frcs) == len(vels), d
            frc_files += frcs

    inputs, labels = [], []
    for i, (vf, cf) in enumerate(zip(vel_files, corr_files)):
        vu = _read_collocated(vf)
        if scenario == "karman":
            re_chan = np.full(vu.shape[:-1] + (1,), re_vals[i], np.float32)
            feat = np.concatenate([vu, re_chan], axis=-1)
        else:
            feat = np.concatenate([vu, _read_collocated(frc_files[i])], axis=-1)
        inputs.append(feat)
        labels.append(_read_collocated(cf))
    return np.concatenate(inputs, 0), np.concatenate(labels, 0)


def nonzero_channel_mean(data: np.ndarray) -> np.ndarray:
    """tf_data.dataStats 'in.mean'/'out.mean': mean over nonzero entries per
    channel (tf_data.py:18,22)."""
    out = []
    for i in range(data.shape[-1]):
        col = data[..., i][data[..., i] != 0]
        out.append(float(col.mean()) if col.size else 0.0)
    return np.asarray(out, np.float32)


def nonzero_channel_std(data: np.ndarray) -> np.ndarray:
    """tf_data.dataStats: std over nonzero entries per channel. Constant
    channels fall back to 1.0 (the reference divides by std(Re)=0 when trained
    on a single Reynolds number — the Makefile warns 'don't test with -n 1',
    karman-2d/Makefile:73; we guard instead)."""
    out = []
    for i in range(data.shape[-1]):
        col = data[..., i][data[..., i] != 0]
        s = float(col.std()) if col.size else 0.0
        out.append(s if s > 0 else 1.0)
    return np.asarray(out, np.float32)


def run(args, scenario: str = "karman"):
    np.random.seed(args.seed)
    inputs, labels = load_pre_data(args.tdata, scenario)
    log.info("%s PRE data: %s -> %s", scenario, inputs.shape, labels.shape)

    perm = np.random.permutation(inputs.shape[0])
    if args.novdata:
        # --novdata: train AND validate on the full shuffled set
        # (karman_train_pre.py:204-208)
        tr_in, tr_lb = inputs[perm], labels[perm]
        va_in, va_lb = inputs[perm], labels[perm]
    else:
        val_size = max(1, int(args.val * inputs.shape[0]))
        tr_in, tr_lb = inputs[perm][:-val_size], labels[perm][:-val_size]
        va_in, va_lb = inputs[perm][-val_size:], labels[perm][-val_size:]

    in_std = nonzero_channel_std(tr_in) * args.nsigma
    out_std = nonzero_channel_std(tr_lb) * args.nsigma
    # --nozerocen subtracts the nonzero-masked channel means before dividing
    # (reference zero_centered=False path, tf_data.py:29-32)
    in_mean = nonzero_channel_mean(tr_in) if args.nozerocen else np.zeros_like(in_std)
    out_mean = nonzero_channel_mean(tr_lb) if args.nozerocen else np.zeros_like(out_std)
    if args.resume > 0:
        # A resume must rebuild the net at the slope the run was started with
        # even when --leaky-alpha isn't re-passed, instead of silently changing
        # the activation and overwriting stats.json (ADVICE r4; same contract
        # as karman-train/burgers-train --resume). Absent key = pre-fix 0.01.
        try:
            with open(os.path.join(args.opath, "stats.json")) as f:
                old_alpha = json.load(f).get("leaky_alpha", 0.01)
            if old_alpha != args.leaky_alpha:
                log.info("resume: restoring leaky_alpha=%s from stats.json "
                         "(CLI said %s)", old_alpha, args.leaky_alpha)
                args.leaky_alpha = old_alpha
        except FileNotFoundError:
            pass

    stats = {
        "in.std": in_std.tolist(),
        "out.std": out_std.tolist(),
        "in.mean": in_mean.tolist(),
        "out.mean": out_mean.tolist(),
        "nozerocen": bool(args.nozerocen),
        "ext.std": float(in_std[2]) if scenario == "karman" else 0.0,
        "scenario": scenario,
        "nsigma": args.nsigma,
        "leaky_alpha": args.leaky_alpha,
    }
    os.makedirs(args.opath, exist_ok=True)
    with open(os.path.join(args.opath, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)

    tr_in = (tr_in - in_mean) / in_std
    tr_lb = (tr_lb - out_mean) / out_std
    va_in = jnp.asarray((va_in - in_mean) / in_std)
    va_lb = jnp.asarray((va_lb - out_mean) / out_std)

    if not args.nostats:
        write_histogram_stats(
            args.opath,
            [("inputs", inputs), ("labels", labels),
             ("input_train_norm", tr_in), ("label_train_norm", tr_lb)],
        )

    if scenario == "karman":
        flip_signs = np.asarray([1.0, -1.0, 1.0, 1.0, -1.0], np.float32)
    else:
        flip_signs = np.ones(tr_in.shape[-1] + 2, np.float32)

    model = build_model(args.model, leaky_slope=args.leaky_alpha)
    params = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((1,) + tr_in.shape[1:]))
    log.info("model %s: %d params", args.model, ckpt.param_count(params))

    opt = optax.inject_hyperparams(optax.adam)(learning_rate=args.lr)
    opt_state = opt.init(params)

    # TPU-first: the whole (few-hundred-MB) training set lives on device; each
    # step ships only a (B,) int32 index vector + (B,) flip flags through the
    # tunnel (the per-step host->device batch feed was the bottleneck at 400
    # epochs x ~93 steps — same redesign as train/trainer.py for SOL).
    tr_in_d = jnp.asarray(tr_in)
    tr_lb_d = jnp.asarray(tr_lb)
    flip_signs_d = jnp.asarray(flip_signs)

    @jax.jit
    def train_step(params, opt_state, x_all, y_all, sel, flip):
        x = x_all[sel]
        y = y_all[sel]
        if args.augment:
            both = jnp.concatenate([x, y], axis=-1)
            flipped = both[:, :, ::-1, :] * flip_signs_d
            both = jnp.where(flip[:, None, None, None], flipped, both)
            x, y = both[..., :-2], both[..., -2:]

        def loss_fn(p):
            pred = model.apply(p, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_mse(params, x, y):
        return jnp.mean((model.apply(params, x) - y) ** 2)

    writer = MetricsWriter(args.opath)
    n = tr_in.shape[0]
    steps = args.steps_per_epoch or max(1, n // args.batch_size)
    current_lr = args.lr
    rng = np.random.RandomState(args.seed)
    gstep = 0
    start_epoch = max(args.resume, 0)
    if start_epoch > 0:
        # Restore weights+opt and deterministically replay the skipped epochs'
        # RNG/lr schedule so a resumed run is bit-identical to an uninterrupted
        # one (same guarantee as karman-train --resume, karman_train.py:358-359).
        params, opt_state = ckpt.load_epoch_checkpoint(
            args.opath, start_epoch, params, opt_state)
        log.info("resumed from epoch %d", start_epoch)
        for epoch in range(start_epoch):
            current_lr = pre_lr_schedule(epoch, current_lr)
            epoch_perm = rng.permutation(n)
            pos = 0
            for _ in range(steps):
                if pos + args.batch_size > n:
                    epoch_perm = rng.permutation(n)
                    pos = 0
                sel_len = len(epoch_perm[pos:pos + args.batch_size])
                pos += args.batch_size
                if args.augment:
                    rng.rand(sel_len)
                gstep += 1
    for epoch in range(start_epoch, args.epochs):
        current_lr = pre_lr_schedule(epoch, current_lr)
        from solver_in_the_loop_tpu.train.trainer import set_learning_rate

        opt_state = set_learning_rate(opt_state, current_lr)
        epoch_perm = rng.permutation(n)
        ep_losses = []
        pos = 0
        for s in range(steps):
            # contiguous full batches from the shuffled permutation; reshuffle
            # if --steps overruns one pass (no mid-epoch index revisits)
            if pos + args.batch_size > n:
                epoch_perm = rng.permutation(n)
                pos = 0
            sel = epoch_perm[pos:pos + args.batch_size]
            pos += args.batch_size
            flip = rng.rand(len(sel)) > 0.5 if args.augment else np.zeros(len(sel), bool)
            params, opt_state, loss = train_step(
                params, opt_state, tr_in_d, tr_lb_d,
                jnp.asarray(sel, jnp.int32), jnp.asarray(flip))
            ep_losses.append(loss)  # stays on device; synced once per epoch
            gstep += 1
        val = float(eval_mse(params, va_in, va_lb))
        ep_loss = float(jnp.mean(jnp.stack(ep_losses)))
        writer.scalar("loss", ep_loss, gstep)
        writer.scalar("val_loss", val, gstep)
        writer.scalar("lr", current_lr, gstep)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            log.info("epoch %03d loss=%.6f val=%.6f lr=%.1e", epoch + 1, ep_loss, val, current_lr)
        # Per-epoch snapshot (reference ModelCheckpoint saves every epoch,
        # karman_train_pre.py:390) so a tunnel stall costs at most one epoch.
        ckpt.save_checkpoint(args.opath, params, opt_state, epoch=epoch + 1)
        prev = _epoch_path_keep(args.opath, epoch + 1)
        if prev:
            os.remove(prev)
    ckpt.save_checkpoint(args.opath, params)
    writer.close()
    return params, stats


def main(argv=None, scenario: str = "karman"):
    logging.basicConfig(level=logging.INFO)
    return run(build_parser().parse_args(argv), scenario)


if __name__ == "__main__":
    main()
