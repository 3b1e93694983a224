"""Burgers data generation: forced viscous sims with random sine forces.

Replicates `python burgers.py -o <dir> -r 128 --seed <i> ...`
(/root/reference/burgers/burgers.py; Makefile burgers-fdt-hires-set,
burgers/Makefile:20-29). The whole sim is one jitted scan; forces advance in
closed form (phase(t) = phase0 + t*dt*omega) inside the device program.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import StaggeredGrid
from solver_in_the_loop_tpu.core.random_fields import randfreq_staggered
from solver_in_the_loop_tpu.core.resample import downsample_staggered
from solver_in_the_loop_tpu.io import scene as scene_io
from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.io.thumbs import save_thumb, thumb_dir_for
from solver_in_the_loop_tpu.physics.burgers import (
    BurgersFlow,
    burgers_domain,
    random_forces,
    sample_force_sum,
)
from solver_in_the_loop_tpu.train.rollout import burgers_rollout

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("burgers-gen")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--thumb", action="store_true")
    p.add_argument("--noforce", action="store_true")
    p.add_argument("-s", "--skipsteps", type=int, default=0)
    p.add_argument("-t", "--simsteps", type=int, default=200)
    p.add_argument("-r", "--res", type=int, default=32)
    p.add_argument("-l", "--len", type=float, default=32.0)
    p.add_argument("--dt", type=float, default=0.1)
    p.add_argument("--initvH", default=None)
    p.add_argument("--loadfH", default=None, help="glob of hires force npz files to replay")
    p.add_argument("-d", "--scale", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-forces", type=int, default=20)
    p.add_argument("--advect", choices=["gather", "shift"], default="gather")
    p.add_argument("--max-shift", type=int, default=2)
    return p


def run(args):
    rng = np.random.RandomState(args.seed)
    dom = burgers_domain(args.res, args.len)
    flow = BurgersFlow(dom, advection=args.advect, max_shift=args.max_shift)

    # reference call order: forces drawn first, then the init field (burgers.py:100-121)
    forces = random_forces(rng, num_forces=args.num_forces) if not args.noforce else []
    v0 = randfreq_staggered(rng, dom, batch=1)

    if args.initvH:
        u_hi, v_hi = scene_io.legacy_to_staggered(scene_io.read_array(args.initvH))
        u_lo, v_lo = downsample_staggered(jnp.asarray(u_hi), jnp.asarray(v_hi), args.scale)
        v0 = StaggeredGrid(u_lo, v_lo, dom)

    total_steps = args.simsteps + args.skipsteps - 1
    rollout_analytic, rollout_replay = burgers_rollout(flow, steps=total_steps, dt=args.dt)

    import glob as _glob

    fc_files = sorted(_glob.glob(args.loadfH)) if args.loadfH else None
    if fc_files:
        fus, fvs = [], []
        for fp in fc_files[:total_steps]:
            fu_hi, fv_hi = scene_io.legacy_to_staggered(scene_io.read_array(fp))
            fu_lo, fv_lo = downsample_staggered(jnp.asarray(fu_hi), jnp.asarray(fv_hi), args.scale)
            fus.append(fu_lo)
            fvs.append(fv_lo)
        fu = jnp.stack(fus)
        fv = jnp.stack(fvs)
        frames = rollout_replay(None, v0, fu, fv)
        frames = {**frames, "fu": fu, "fv": fv}
        f0 = StaggeredGrid(fu[0], fv[0], dom)
    elif args.noforce:
        zero_fu = jnp.zeros((total_steps,) + dom.u_shape(1))
        zero_fv = jnp.zeros((total_steps,) + dom.v_shape(1))
        frames = rollout_replay(None, v0, zero_fu, zero_fv)
        frames = {**frames, "fu": zero_fu, "fv": zero_fv}
        f0 = dom.staggered_grid(0.0, 0.0)
    else:
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *forces)
        frames = rollout_analytic(None, v0, stacked)
        f0 = sample_force_sum(forces, dom)

    uu, vv = np.asarray(frames["u"]), np.asarray(frames["v"])
    fu, fv = np.asarray(frames["fu"]), np.asarray(frames["fv"])

    sc = Scene.create(args.output)
    sc.write_params(vars(args).copy())

    def write_thumbs(idx, u, v, gu, gv):
        td = thumb_dir_for(sc.path)
        save_thumb(u, 100000.0, os.path.join(td, f"velU_{idx:06d}.png"))
        save_thumb(v, 100000.0, os.path.join(td, f"velV_{idx:06d}.png"))
        save_thumb(gu, 100000.0, os.path.join(td, f"frcU_{idx:06d}.png"))
        save_thumb(gv, 100000.0, os.path.join(td, f"frcV_{idx:06d}.png"))

    # with-scoped per-scene run.log (karman.py:131): repeated programmatic
    # run() calls must not accumulate root-logger handlers (ADVICE r2 item 1)
    with scene_io.scene_run_log(sc.path):
        log.info("params: %s", vars(args))
        log.info("writing %s", sc.path)

        if args.skipsteps == 0:
            sc.write_staggered("velo", 0, np.asarray(v0.u[0])[None], np.asarray(v0.v[0])[None])
            sc.write_staggered("forc", 0, np.asarray(f0.u[0])[None], np.asarray(f0.v[0])[None])
            if args.thumb:
                write_thumbs(0, np.asarray(v0.u[0]), np.asarray(v0.v[0]),
                             np.asarray(f0.u[0]), np.asarray(f0.v[0]))
        # loop step i (1-based) writes frame i - skipsteps when i >= skipsteps;
        # all kept frames go through the native thread-pool batch writer
        keep = [t for t in range(uu.shape[0]) if t + 1 >= max(args.skipsteps, 1)]
        frame_ids = [t + 1 - args.skipsteps for t in keep]
        sc.write_staggered_batch("velo", frame_ids, uu[keep, 0], vv[keep, 0])
        sc.write_staggered_batch("forc", frame_ids, fu[keep, 0], fv[keep, 0])
        if args.thumb:
            for t, idx in zip(keep, frame_ids):
                write_thumbs(idx, uu[t, 0], vv[t, 0], fu[t, 0], fv[t, 0])
    return sc


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
