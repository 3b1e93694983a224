"""Burgers SOL/NON training CLI.

Replicates `python burgers_train.py --train <hires-set> -m 4 -n 10 -b 5 ...`
(/root/reference/burgers/burgers_train.py; Makefile burgers-fdt-sol04 / -non,
burgers/Makefile:70-77), including the --noforce variant.
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp

from solver_in_the_loop_tpu.models.features import Normalization
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.parallel.mesh import batch_sharding, data_parallel_mesh, replicate
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow, burgers_domain
from solver_in_the_loop_tpu.train import checkpoint as ckpt
from solver_in_the_loop_tpu.train.dataset import EpochSchedule, load_burgers_dataset
from solver_in_the_loop_tpu.train.trainer import (
    SolTrainConfig,
    make_burgers_train_step,
    make_optimizer,
    run_training,
)
from solver_in_the_loop_tpu.utils.metrics import MetricsWriter, setup_logging

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("burgers-train")
    p.add_argument("--train", required=True)
    p.add_argument("--skip-ds", action="store_true")
    p.add_argument("--only-ds", action="store_true")
    p.add_argument("--log", default=None)
    p.add_argument("--noforce", action="store_true")
    p.add_argument("-s", "--scale", type=int, default=4)
    p.add_argument("-n", "--nsims", type=int, default=1)
    p.add_argument("-b", "--sbatch", type=int, default=1)
    p.add_argument("-t", "--simsteps", type=int, default=200, help="frames per sim")
    p.add_argument("-m", "--msteps", type=int, default=2)
    p.add_argument("-e", "--epochs", type=int, default=10)
    p.add_argument("--dt", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-l", "--len", type=float, default=32.0)
    p.add_argument("--model", default="mars_moon")
    p.add_argument("--init", choices=["zero", "reference"], default="reference",
                   help="output-conv init: 'reference' (Keras glorot, the "
                        "reference's default behavior) or 'zero' (see BENCH.md "
                        "'Init ablation' — worse rollout MAE on karman)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--adplr", action="store_true")
    p.add_argument("--clip-grad", action=argparse.BooleanOptionalAction, default=True,
                   help="per-leaf grad-norm clip (reference karman_train.py:453); "
                        "protects glorot init's large early unrolled gradients")
    p.add_argument("--warmup-epochs", type=int, default=0,
                   help="run the first N epochs at lr/10 (default off: burgers "
                        "msteps<=4 trains stably at the shipped defaults; the "
                        "karman msteps=32 CLI defaults this to 1, see "
                        "karman-train --help)")
    p.add_argument("--resume", type=int, default=-1)
    p.add_argument("--inittf", default=None)
    p.add_argument("--pretf", default=None)
    p.add_argument("--tf", default="/tmp/silt/tf")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--remat-policy", choices=["pressure", "pressure+conv", "pressure+advect", "none"],
                   default="pressure+conv", help="what the per-step remat saves (BENCH.md A/B)")
    p.add_argument("--advect", choices=["gather", "shift"], default="shift")
    p.add_argument("--max-shift", type=int, default=2)
    p.add_argument("--leaky-alpha", type=float, default=0.3,
                   help="LeakyReLU negative slope (Keras default 0.3; "
                        "rounds 1-4a trained at 0.01)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--dp", action="store_true")
    p.add_argument("--profile", default=None, help="dump a jax profiler trace to this dir")
    p.add_argument("--debug-nans", action="store_true")
    return p


def run(args):
    setup_logging(args.log, args.resume)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.nsims % args.sbatch != 0:
        args.nsims = (args.nsims // args.sbatch) * args.sbatch
        log.info("nsims adjusted to %d", args.nsims)
    log.info("params: %s", vars(args))

    data_np = load_burgers_dataset(
        args.train, num_frames=args.simsteps, num_sims=args.nsims,
        scale=args.scale, skip_preprocessing=args.skip_ds,
    )
    if args.only_ds:
        return None

    stats = dict(data_np.stats)
    if args.resume > 0:
        stats = ckpt.load_stats(args.tf)
        # resume with the slope the run was started with (absent = pre-fix 0.01)
        args.leaky_alpha = stats.get("leaky_alpha", 0.01)
    if args.pretf is not None:
        ckpt.adopt_pretf_stats(stats, args, log)

    use_force = not args.noforce
    if "in.std" in stats and use_force:
        norm = Normalization(
            jnp.asarray(stats["in.std"][:4], jnp.float32),
            jnp.asarray(stats["out.std"][:2], jnp.float32),
        )
        in_ch = 4
    elif "in.std" in stats:
        norm = Normalization(
            jnp.asarray(stats["in.std"][:2], jnp.float32),
            jnp.asarray(stats["out.std"][:2], jnp.float32),
        )
        in_ch = 2
    elif use_force:
        norm = Normalization.burgers(
            stats["std.v"], stats["std.u"], stats["std.fv"], stats["std.fu"]
        )
        in_ch = 4
    else:
        norm = Normalization(
            jnp.asarray([stats["std.v"], stats["std.u"]], jnp.float32),
            jnp.asarray([stats["std.v"], stats["std.u"]], jnp.float32),
        )
        in_ch = 2

    res_y, res_x = data_np.resolution
    assert res_y == res_x
    dom = burgers_domain(res_x, args.len)
    flow = BurgersFlow(dom, advection=args.advect, max_shift=args.max_shift)

    cfg = SolTrainConfig(
        msteps=args.msteps, lr=args.lr, epochs=args.epochs, batch_size=args.sbatch,
        adplr=args.adplr, clip_grad=args.clip_grad, remat=not args.no_remat, remat_policy=args.remat_policy,
        seed=args.seed, dt=args.dt, warmup_epochs=args.warmup_epochs,
    )
    stats["leaky_alpha"] = args.leaky_alpha  # apply CLIs rebuild with this
    model = build_model(args.model, compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                        init=args.init, leaky_slope=args.leaky_alpha)
    params = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((args.sbatch, res_y, res_x, in_ch)))
    log.info("model %s: %d params", args.model, ckpt.param_count(params))
    try:  # keras model.summary parity (burgers_train.py:439)
        log.info("\n%s", model.tabulate(jax.random.PRNGKey(0),
                                        jnp.zeros((args.sbatch, res_y, res_x, in_ch)),
                                        depth=1, console_kwargs={"width": 100}))
    except Exception:  # pragma: no cover - cosmetic only
        pass

    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    if args.pretf:
        params, _ = ckpt.load_checkpoint(args.pretf, params)
    if args.inittf:
        params, _ = ckpt.load_checkpoint(args.inittf, params)
    if args.resume > 0:
        params, opt_state = ckpt.load_epoch_checkpoint(args.tf, args.resume, params, opt_state)
    else:
        ckpt.save_stats(args.tf, stats)

    data = {
        "u": jnp.asarray(data_np.u),
        "v": jnp.asarray(data_np.v),
        "fu": jnp.asarray(data_np.fu),
        "fv": jnp.asarray(data_np.fv),
    }
    sharding = None
    pad_batch_to = None
    if args.dp:
        mesh = data_parallel_mesh()
        sharding = batch_sharding(mesh)
        data = replicate(data, mesh)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        if args.sbatch % mesh.size != 0:
            pad_batch_to = -(-args.sbatch // mesh.size) * mesh.size
            log.info(
                "data-parallel over %d devices: batch %d padded to %d with "
                "zero-weighted rows (gradients exact, %d rows of compute wasted); "
                "for full efficiency pick a batch size divisible by %d",
                mesh.size, args.sbatch, pad_batch_to,
                pad_batch_to - args.sbatch, mesh.size)
        else:
            log.info("data-parallel over %d devices", mesh.size)

    train_step = make_burgers_train_step(flow, model.apply, optimizer, cfg, use_force=use_force)
    schedule = EpochSchedule(args.nsims, args.simsteps, args.sbatch, seed=args.seed)
    writer = MetricsWriter(args.tf)

    def on_epoch_end(epoch, params_, opt_state_):
        if epoch == 0 or epoch % 10 == 9:
            # burgers also snapshots epoch 1 (burgers_train.py:497)
            ckpt.save_checkpoint(args.tf, params_, opt_state_, epoch=epoch + 1)

    if args.profile:
        from solver_in_the_loop_tpu.utils.profiling import trace

        idx0 = jnp.zeros((cfg.batch_size, 2), jnp.int32)
        with trace(args.profile):
            out = train_step(params, opt_state, data, norm, idx0)
            jax.block_until_ready(out[2])
        params, opt_state = out[0], out[1]
        log.info("profiler trace written to %s", args.profile)

    result = run_training(
        train_step, params, opt_state, data, norm, schedule, cfg,
        start_epoch=max(args.resume, 0), on_epoch_end=on_epoch_end,
        metrics_writer=writer, sharding=sharding, pad_batch_to=pad_batch_to,
    )
    ckpt.save_checkpoint(args.tf, result.params)
    writer.close()
    log.info("final loss %.6f; %.4f sec/iter (best epoch), %.4f (median epoch)",
             result.losses[-1], result.sec_per_iter, result.sec_per_iter_median)
    return result


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
