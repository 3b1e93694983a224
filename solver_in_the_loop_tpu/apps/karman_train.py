"""Karman SOL/NON training CLI.

Replicates `python karman_train.py --train <hires-set> -m 32 -n 6 -b 3 ...`
(/root/reference/karman-2d/karman_train.py; Makefile targets karman-fdt-non /
karman-fdt-sol32, karman-2d/Makefile:73-80). See train/trainer.py for the
TPU-first training-step design.
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.models.features import Normalization
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.parallel.mesh import data_parallel_mesh, batch_sharding, replicate
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, karman_domain
from solver_in_the_loop_tpu.train import checkpoint as ckpt
from solver_in_the_loop_tpu.train.dataset import EpochSchedule, load_karman_dataset
from solver_in_the_loop_tpu.train.trainer import (
    SolTrainConfig,
    make_karman_train_step,
    make_optimizer,
    run_training,
)
from solver_in_the_loop_tpu.utils.metrics import MetricsWriter, setup_logging

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("karman-train")
    p.add_argument("--train", required=True, help="hires training scene set")
    p.add_argument("--skip-ds", action="store_true")
    p.add_argument("--only-ds", action="store_true")
    p.add_argument("--log", default=None)
    p.add_argument("-s", "--scale", type=int, default=4)
    p.add_argument("-n", "--nsims", type=int, default=1)
    p.add_argument("-b", "--sbatch", type=int, default=1)
    p.add_argument("-t", "--simsteps", type=int, default=1500, help="frames per sim")
    p.add_argument("-m", "--msteps", type=int, default=2)
    p.add_argument("-e", "--epochs", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-l", "--len", type=float, default=100.0)
    p.add_argument("--model", default="mars_moon")
    p.add_argument("--init", choices=["zero", "reference"], default="reference",
                   help="output-conv init: 'reference' (Keras glorot, the "
                        "reference's karman_train.py:101-138 behavior; needs "
                        "grad clipping, on by default) or 'zero' (stable "
                        "without clipping but converges to a worse basin — "
                        "2.3-2.6x higher rollout MAE at 20 epochs; BENCH.md "
                        "'Init ablation')")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--reg-loss", action="store_true",
                   help="accepted for reference CLI parity; the reference sums "
                        "keras model.losses which is empty for these models "
                        "(karman_train.py:441-443), so this is a no-op")
    p.add_argument("--adplr", action="store_true")
    p.add_argument("--clip-grad", action=argparse.BooleanOptionalAction, default=True,
                   help="per-leaf grad-norm clip (reference karman_train.py:453); "
                        "required for --init reference (diverges in 2 epochs "
                        "without it, BENCH.md 'Init ablation')")
    p.add_argument("--warmup-epochs", type=int, default=1,
                   help="run the first N epochs at lr/10. The reference has no "
                        "warmup, but at its own defaults (LeakyReLU 0.3 + "
                        "glorot + clip 0.001 + lr 1e-4) the msteps=32 unrolled "
                        "forward overflows to NaN within ~20 ADAM iterations "
                        "on this rebuild, with or without clipping (measured, "
                        "BENCH.md round-5); one epoch at lr/10 descends "
                        "cleanly. Set 0 to disable.")
    p.add_argument("--resume", type=int, default=-1)
    p.add_argument("--inittf", default=None, help="warm-start checkpoint (msgpack)")
    p.add_argument("--pretf", default=None, help="supervised pre-trained checkpoint")
    p.add_argument("--tf", default="/tmp/silt/tf", help="output dir (models, logs)")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--remat-policy", choices=["pressure", "pressure+conv", "pressure+advect", "none"],
                   default="pressure+conv", help="what the per-step remat saves (BENCH.md A/B)")
    p.add_argument("--advect", choices=["gather", "shift"], default="shift")
    p.add_argument("--max-shift", type=int, default=2)
    p.add_argument("--leaky-alpha", type=float, default=0.3,
                   help="LeakyReLU negative slope (Keras default 0.3, "
                        "karman_train.py:105; rounds 1-4a trained at 0.01)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 network compute")
    p.add_argument("--dp", action="store_true", help="shard the batch over all devices")
    p.add_argument("--ptol", type=float, default=1e-5, help="pressure CG tolerance")
    p.add_argument("--pmaxiter", type=int, default=1000, help="pressure CG max iterations")
    p.add_argument("--profile", default=None, help="dump a jax profiler trace to this dir")
    p.add_argument("--debug-nans", action="store_true", help="enable jax_debug_nans")
    return p


def run(args):
    setup_logging(args.log, args.resume)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.nsims % args.sbatch != 0:
        args.nsims = (args.nsims // args.sbatch) * args.sbatch
        log.info("nsims adjusted to %d (batch size divisibility)", args.nsims)
    log.info("params: %s", vars(args))

    data_np = load_karman_dataset(
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

    if "in.std" in stats:
        # supervised-init normalization contract (karman_train.py:352-356)
        norm = Normalization(
            jnp.asarray([stats["in.std"][0], stats["in.std"][1], stats["ext.std"]], jnp.float32),
            jnp.asarray(stats["out.std"][:2], jnp.float32),
        )
    else:
        norm = Normalization.karman(stats["std.v"], stats["std.u"], stats["ext.std"])

    res_y, res_x = data_np.resolution
    dom = karman_domain(res_x, args.len)
    assert dom.resolution == (res_y, res_x), (dom.resolution, data_np.resolution)
    flow = KarmanFlow(dom, advection=args.advect, max_shift=args.max_shift,
                      pressure_tol=args.ptol, pressure_max_iter=args.pmaxiter)

    cfg = SolTrainConfig(
        msteps=args.msteps, lr=args.lr, epochs=args.epochs, batch_size=args.sbatch,
        adplr=args.adplr, clip_grad=args.clip_grad, remat=not args.no_remat, remat_policy=args.remat_policy,
        seed=args.seed, warmup_epochs=args.warmup_epochs,
    )
    stats["leaky_alpha"] = args.leaky_alpha  # apply CLIs rebuild with this
    model = build_model(args.model, compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                        init=args.init, leaky_slope=args.leaky_alpha)
    feat_shape = (args.sbatch, res_y, res_x, 3)
    params = model.init(jax.random.PRNGKey(args.seed), jnp.zeros(feat_shape))
    log.info("model %s: %d params", args.model, ckpt.param_count(params))
    try:  # keras model.summary parity (karman_train.py:459)
        log.info("\n%s", model.tabulate(jax.random.PRNGKey(0), jnp.zeros(feat_shape),
                                        depth=1, console_kwargs={"width": 100}))
    except Exception:  # pragma: no cover - cosmetic only
        pass

    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    if args.pretf:
        params, _ = ckpt.load_checkpoint(args.pretf, params)
        log.info("loaded pre-trained model %s", args.pretf)
    if args.inittf:
        params, _ = ckpt.load_checkpoint(args.inittf, params)
        log.info("warm start from %s", args.inittf)
    if args.resume > 0:
        params, opt_state = ckpt.load_epoch_checkpoint(args.tf, args.resume, params, opt_state)
        log.info("resumed from epoch %d", args.resume)
    else:
        ckpt.save_stats(args.tf, stats)

    data = {
        "dens": jnp.asarray(data_np.dens),
        "u": jnp.asarray(data_np.u),
        "v": jnp.asarray(data_np.v),
        "re": jnp.asarray(data_np.re),
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

    train_step = make_karman_train_step(flow, model.apply, optimizer, cfg)
    schedule = EpochSchedule(args.nsims, args.simsteps, args.sbatch, seed=args.seed)
    writer = MetricsWriter(args.tf)

    def on_epoch_end(epoch, params_, opt_state_):
        if epoch % 10 == 9:
            ckpt.save_checkpoint(args.tf, params_, opt_state_, epoch=epoch + 1)

    if args.profile:
        # phi2-equivalent first-step trace (karman-2d-phi2/karman_train.py:548-554)
        from solver_in_the_loop_tpu.utils.profiling import trace

        idx0 = jnp.zeros((cfg.batch_size, 2), jnp.int32)  # doesn't consume the schedule RNG
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
