"""Burgers test rollout CLI: 200 steps driven by downsampled hi-res test forces.

Replicates `python burgers_apply.py --model ... --loadfH "sim_x/forc_0*.npz"`
(/root/reference/burgers/burgers_apply.py:129-151; run_test at
burgers/Makefile:104-111).
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import StaggeredGrid
from solver_in_the_loop_tpu.core.resample import downsample_staggered
from solver_in_the_loop_tpu.io import scene as scene_io
from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.models.features import Normalization
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow, burgers_domain
from solver_in_the_loop_tpu.train import checkpoint as ckpt
from solver_in_the_loop_tpu.train.rollout import burgers_rollout

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("burgers-apply")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--stats", required=True)
    p.add_argument("--leaky-alpha", type=float, default=None,
                   help="override the LeakyReLU slope (default: the value "
                        "recorded in the stats json; 0.01 if absent)")
    p.add_argument("--arch", default="mars_moon")
    p.add_argument("--noforce", action="store_true")
    p.add_argument("-t", "--simsteps", type=int, default=200)
    p.add_argument("-r", "--res", type=int, default=32)
    p.add_argument("-l", "--len", type=float, default=32.0)
    p.add_argument("--dt", type=float, default=0.1)
    p.add_argument("--initvH", required=True, help="hires velocity npz init")
    p.add_argument("--loadfH", default=None, help="glob of hires force npz to replay")
    p.add_argument("-d", "--scale", type=int, default=4)
    p.add_argument("--advect", choices=["gather", "shift"], default="shift")
    p.add_argument("--max-shift", type=int, default=2)
    p.add_argument("--no-model", action="store_true")
    return p


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
    dom = burgers_domain(args.res, args.len)
    flow = BurgersFlow(dom, advection=args.advect, max_shift=args.max_shift)

    u_hi, v_hi = scene_io.legacy_to_staggered(scene_io.read_array(args.initvH))
    u0, v0arr = downsample_staggered(jnp.asarray(u_hi), jnp.asarray(v_hi), args.scale)
    v0 = StaggeredGrid(u0, v0arr, dom)

    steps = args.simsteps - 1
    use_force = not args.noforce
    if use_force:
        fc_files = sorted(_glob.glob(args.loadfH))
        assert len(fc_files) >= steps, f"need {steps} force frames, got {len(fc_files)}"
        fus, fvs = [], []
        for fp in fc_files[:steps]:
            fu_hi, fv_hi = scene_io.legacy_to_staggered(scene_io.read_array(fp))
            fu_lo, fv_lo = downsample_staggered(jnp.asarray(fu_hi), jnp.asarray(fv_hi), args.scale)
            fus.append(fu_lo)
            fvs.append(fv_lo)
        fu, fv = jnp.stack(fus), jnp.stack(fvs)
    else:
        fu = jnp.zeros((steps,) + dom.u_shape(1))
        fv = jnp.zeros((steps,) + dom.v_shape(1))

    with open(args.stats) as f:
        stats = json.load(f)
    if use_force:
        norm = Normalization.burgers(stats["std.v"], stats["std.u"], stats["std.fv"], stats["std.fu"])
        in_ch = 4
    else:
        norm = Normalization(
            jnp.asarray([stats["std.v"], stats["std.u"]], jnp.float32),
            jnp.asarray([stats["std.v"], stats["std.u"]], jnp.float32),
        )
        in_ch = 2

    params, model_apply = None, None
    if not args.no_model:
        model = build_model(args.arch, leaky_slope=_leaky(args, stats))
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, dom.ny, dom.nx, in_ch)))
        params, _ = ckpt.load_checkpoint(args.model, params)
        model_apply = model.apply

    _, rollout_replay = burgers_rollout(
        flow, steps=steps, model_apply=model_apply, norm=norm, dt=args.dt,
        use_force_features=use_force,
    )
    frames = rollout_replay(params, v0, fu, fv)
    uu, vv = np.asarray(frames["u"]), np.asarray(frames["v"])

    sc = Scene.create(args.output)
    sc.write_params(vars(args).copy())
    log.info("writing %s", sc.path)
    sc.write_staggered("velTf", 0, np.asarray(v0.u), np.asarray(v0.v))
    frame_ids = [t + 1 for t in range(uu.shape[0])]
    sc.write_staggered_batch("velTf", frame_ids, uu[:, 0], vv[:, 0])
    return frames


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
