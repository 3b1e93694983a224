"""Karman test rollout CLI: 500 recurrent steps with per-step net correction.

Replicates `python karman_apply.py --model ... --stats ... --initdH ... -t 500`
(/root/reference/karman-2d/karman_apply.py; run_test targets at
karman-2d/Makefile:119-127). Unlike the reference (NumPy solver + Keras
predict per step), the full rollout is one jitted scan on device.
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import CenteredGrid, StaggeredGrid
from solver_in_the_loop_tpu.core.resample import downsample_centered, downsample_staggered
from solver_in_the_loop_tpu.io import scene as scene_io
from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.models.features import Normalization
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, initial_state, karman_domain
from solver_in_the_loop_tpu.train import checkpoint as ckpt
from solver_in_the_loop_tpu.train.rollout import karman_rollout

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("karman-apply")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--model", required=True, help="trained checkpoint (msgpack)")
    p.add_argument("--stats", required=True, help="dataStats.json from training")
    p.add_argument("--leaky-alpha", type=float, default=None,
                   help="override the LeakyReLU slope (default: the value "
                        "recorded in the stats json; 0.01 if absent)")
    p.add_argument("--arch", default="mars_moon")
    p.add_argument("-t", "--simsteps", type=int, default=500)
    p.add_argument("-r", "--res", type=int, default=32)
    p.add_argument("--re", type=float, nargs="+", default=[1e6])
    p.add_argument("--initdH", default=None)
    p.add_argument("--initvH", default=None)
    p.add_argument("-d", "-s", "--scale", type=int, default=4, dest="scale")
    p.add_argument("-l", "--len", type=float, default=100.0)
    p.add_argument("--advect", choices=["gather", "shift"], default="shift")
    p.add_argument("--max-shift", type=int, default=2)
    p.add_argument("--no-model", action="store_true", help="pure-solver rollout (source run)")
    p.add_argument("--ptol", type=float, default=1e-5, help="pressure CG tolerance")
    p.add_argument("--pmaxiter", type=int, default=1000, help="pressure CG max iterations")
    return p


def load_initial(args, dom, batch):
    if args.initdH or args.initvH:
        d_hi = scene_io.legacy_to_centered(scene_io.read_array(args.initdH))
        u_hi, v_hi = scene_io.legacy_to_staggered(scene_io.read_array(args.initvH))
        d_lo = downsample_centered(jnp.asarray(d_hi), args.scale)
        u_lo, v_lo = downsample_staggered(jnp.asarray(u_hi), jnp.asarray(v_hi), args.scale)
        d0 = CenteredGrid(jnp.broadcast_to(d_lo, dom.centered_shape(batch)), dom)
        v0 = StaggeredGrid(
            jnp.broadcast_to(u_lo, dom.u_shape(batch)),
            jnp.broadcast_to(v_lo, dom.v_shape(batch)),
            dom,
        )
        return d0, v0
    return initial_state(dom, batch)


def _leaky(args, stats) -> float:
    """LeakyReLU slope for rebuilding a trained model: explicit --leaky-alpha
    wins, else the slope recorded at train time (dataStats/stats json
    "leaky_alpha"); absent means a pre-round-4-fix checkpoint trained at the
    jax default 0.01 (the reference Keras default is 0.3, karman_train.py:105).
    """
    if getattr(args, "leaky_alpha", None) is not None:
        return args.leaky_alpha
    return float(stats.get("leaky_alpha", 0.01))


def run(args):
    dom = karman_domain(args.res, args.len)
    flow = KarmanFlow(dom, advection=args.advect, max_shift=args.max_shift,
                      pressure_tol=args.ptol, pressure_max_iter=args.pmaxiter)
    batch = len(args.re)
    d0, v0 = load_initial(args, dom, batch)

    with open(args.stats) as f:
        stats = json.load(f)
    norm = Normalization.karman(stats["std.v"], stats["std.u"], stats["ext.std"])

    params = None
    model_apply = None
    if not args.no_model:
        model = build_model(args.arch, leaky_slope=_leaky(args, stats))
        feat = jnp.zeros((batch, dom.ny, dom.nx, 3))
        params = model.init(jax.random.PRNGKey(0), feat)
        params, _ = ckpt.load_checkpoint(args.model, params)
        model_apply = model.apply
        log.info("loaded model %s (%d params)", args.model, ckpt.param_count(params))

    rollout = karman_rollout(flow, steps=args.simsteps - 1, model_apply=model_apply, norm=norm)
    frames = rollout(params, d0, v0, jnp.asarray(args.re, jnp.float32))
    dens = np.asarray(frames["dens"])
    uu, vv = np.asarray(frames["u"]), np.asarray(frames["v"])
    cu, cv = np.asarray(frames["corr_u"]), np.asarray(frames["corr_v"])

    for b in range(batch):
        sc = Scene.create(args.output)
        params_out = vars(args).copy()
        params_out["re"] = float(args.re[b])
        sc.write_params(params_out)
        log.info("writing %s (re=%.0f)", sc.path, params_out["re"])
        sc.write_centered("denTf", 0, np.asarray(d0.values[b : b + 1]))
        sc.write_staggered("velTf", 0, np.asarray(v0.u[b : b + 1]), np.asarray(v0.v[b : b + 1]))
        sc.write_staggered("corTf", 0, np.zeros_like(np.asarray(v0.u[b : b + 1])),
                           np.zeros_like(np.asarray(v0.v[b : b + 1])))
        frame_ids = [t + 1 for t in range(dens.shape[0])]
        sc.write_centered_batch("denTf", frame_ids, dens[:, b])
        sc.write_staggered_batch("velTf", frame_ids, uu[:, b], vv[:, b])
        sc.write_staggered_batch("corTf", frame_ids, cu[:, b], cv[:, b])
    return frames


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
