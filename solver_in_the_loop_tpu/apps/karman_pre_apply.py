"""Karman PRE rollout CLI: like karman-apply but with the supervised model's
standardize/deStandardize normalization contract.

Replicates `python karman_apply_pre.py --stats tf/stats.pickle --model ...`
(/root/reference/karman-2d/karman_apply_pre.py:140-159): features divided by
in.std (zero-centered standardize), predictions multiplied by out.std.
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.models.features import Normalization
from solver_in_the_loop_tpu.models.networks import build_model
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, karman_domain
from solver_in_the_loop_tpu.train import checkpoint as ckpt
from solver_in_the_loop_tpu.train.rollout import karman_rollout
from solver_in_the_loop_tpu.apps.karman_apply import load_initial

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("karman-pre-apply")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--stats", required=True, help="stats.json from PRE training")
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
    dom = karman_domain(args.res, args.len)
    flow = KarmanFlow(dom, advection=args.advect, max_shift=args.max_shift)
    batch = len(args.re)
    d0, v0 = load_initial(args, dom, batch)

    with open(args.stats) as f:
        stats = json.load(f)
    norm = Normalization(
        jnp.asarray(stats["in.std"], jnp.float32),
        jnp.asarray(stats["out.std"][:2], jnp.float32),
        in_means=(jnp.asarray(stats["in.mean"], jnp.float32)
                  if stats.get("nozerocen") else None),
        out_means=(jnp.asarray(stats["out.mean"][:2], jnp.float32)
                   if stats.get("nozerocen") else None),
    )

    model = build_model(args.arch, leaky_slope=_leaky(args, stats))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((batch, dom.ny, dom.nx, 3)))
    params, _ = ckpt.load_checkpoint(args.model, params)

    rollout = karman_rollout(flow, steps=args.simsteps - 1, model_apply=model.apply, norm=norm)
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
