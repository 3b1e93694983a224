"""Karman data generation: hi-res reference sims / lo-res source sims.

Replicates `python karman.py -o <dir> -r 128 --re <Re> ...`
(/root/reference/karman-2d/karman.py; Makefile targets karman-fdt-hires-set /
karman-fdt-lores-set, karman-2d/Makefile:20-46).

TPU-first: the whole simulation is ONE jitted lax.scan rollout (the reference
crosses host<->device every frame, karman.py:149-151), and `--re` accepts
multiple values which run BATCHED in a single rollout — the Makefile's
sequential shell loop over 6 Reynolds numbers becomes one device program.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import CenteredGrid, StaggeredGrid
from solver_in_the_loop_tpu.core.resample import downsample_centered, downsample_staggered
from solver_in_the_loop_tpu.io import scene as scene_io
from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.io.thumbs import save_thumb, thumb_dir_for
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, initial_state, karman_domain
from solver_in_the_loop_tpu.train.rollout import karman_rollout

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("karman-gen")
    p.add_argument("-o", "--output", required=True, help="output parent directory")
    p.add_argument("--thumb", action="store_true", help="save thumbnail images")
    p.add_argument("-t", "--simsteps", type=int, default=1500)
    p.add_argument("-s", "--skipsteps", type=int, default=999)
    p.add_argument("-r", "--res", type=int, default=32)
    p.add_argument("--re", type=float, nargs="+", default=[1e6],
                   help="Reynolds number(s); multiple values run batched")
    p.add_argument("--initdH", default=None, help="hires density npz to downsample as init")
    p.add_argument("--initvH", default=None, help="hires velocity npz to downsample as init")
    p.add_argument("-d", "--scale", type=int, default=4)
    p.add_argument("-l", "--len", type=float, default=100.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--advect", choices=["gather", "shift"], default="gather")
    p.add_argument("--max-shift", type=int, default=4)
    return p


def run(args) -> None:
    np.random.seed(args.seed)
    dom = karman_domain(args.res, args.len)
    flow = KarmanFlow(dom, advection=args.advect, max_shift=args.max_shift)
    batch = len(args.re)

    if args.initdH or args.initvH:
        assert args.initdH and args.initvH, "provide both --initdH and --initvH"
        d_hi = scene_io.legacy_to_centered(scene_io.read_array(args.initdH))
        u_hi, v_hi = scene_io.legacy_to_staggered(scene_io.read_array(args.initvH))
        d_np = np.asarray(downsample_centered(jnp.asarray(d_hi), args.scale))
        u_lo, v_lo = downsample_staggered(jnp.asarray(u_hi), jnp.asarray(v_hi), args.scale)
        d0 = CenteredGrid(jnp.broadcast_to(jnp.asarray(d_np), dom.centered_shape(batch)), dom)
        v0 = StaggeredGrid(
            jnp.broadcast_to(jnp.asarray(u_lo), dom.u_shape(batch)),
            jnp.broadcast_to(jnp.asarray(v_lo), dom.v_shape(batch)),
            dom,
        )
    else:
        d0, v0 = initial_state(dom, batch)

    re = jnp.asarray(args.re, jnp.float32)
    dt = 1.0
    alpha = dt * args.res * args.res / min(args.re)
    assert alpha <= 0.25, (
        f"explicit diffusion unstable: alpha={alpha:.4f} > 0.25 for res={args.res}, "
        f"min Re={min(args.re)} (see SURVEY.md §7)"
    )

    rollout = karman_rollout(flow, steps=args.simsteps - 1, collect_from=args.skipsteps)
    frames = rollout(None, d0, v0, re)
    dens = np.asarray(frames["dens"])  # (T, B, Y, X)
    uu = np.asarray(frames["u"])
    vv = np.asarray(frames["v"])
    log.info("rollout done: %s frames x %s sims", dens.shape[0], batch)

    for b in range(batch):
        sc = Scene.create(args.output)
        params = vars(args).copy()
        params["re"] = float(args.re[b])
        sc.write_params(params)
        # with-scoped so an exception mid-scene can't leak the FileHandler
        # into the next scene's run.log (ADVICE r2 item 1)
        with scene_io.scene_run_log(sc.path):
            log.info("params: %s", params)
            log.info("writing %s (re=%.0f)", sc.path, params["re"])

            if args.skipsteps == 0:
                sc.write_centered("dens", 0, np.asarray(d0.values[b])[None])
                sc.write_staggered("velo", 0, np.asarray(v0.u[b])[None], np.asarray(v0.v[b])[None])
            # collected steps are skipsteps+1 .. simsteps-1 (karman.py:149-159);
            # all frames flushed through the native thread-pool batch writer
            frame_ids = [args.skipsteps + 1 + t for t in range(dens.shape[0])]
            sc.write_centered_batch("dens", frame_ids, dens[:, b])
            sc.write_staggered_batch("velo", frame_ids, uu[:, b], vv[:, b])
            if args.thumb:
                td = thumb_dir_for(sc.path)
                if args.skipsteps == 0:
                    save_thumb(np.asarray(d0.values[b]), 10000.0, os.path.join(td, "dens_000000.png"))
                    save_thumb(np.asarray(v0.u[b]), 10000.0, os.path.join(td, "velU_000000.png"))
                    save_thumb(np.asarray(v0.v[b]), 10000.0, os.path.join(td, "velV_000000.png"))
                for t, idx in enumerate(frame_ids):
                    save_thumb(dens[t, b], 10000.0, os.path.join(td, f"dens_{idx:06d}.png"))
                    save_thumb(uu[t, b], 10000.0, os.path.join(td, f"velU_{idx:06d}.png"))
                    save_thumb(vv[t, b], 10000.0, os.path.join(td, f"velV_{idx:06d}.png"))
            log.info("done %s", sc.path)


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
