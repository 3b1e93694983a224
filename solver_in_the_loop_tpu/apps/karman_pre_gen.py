"""Karman PRE data generation: hi-res + corrected lo-res sims in lockstep.

Replicates `python karman_pre.py -o <dir> -r 32 --re <Re> --beta 1.0`
(/root/reference/karman-2d/karman_pre.py:423-453; Makefile karman-fdt-pre-set
/ presr-set at karman-2d/Makefile:51-59). Per step:

  1. hi-res solver step; lo-res solver step (on the previously corrected state)
  2. vdiff = v_hi - upsample4x(v_lo), projected divergence-free on the hi-res
     domain with obstacles (karman_pre.py:374-375)
  3. gradient-constrained least-squares correction (pre/lsq.py) with temporal
     regularizer beta/dt; lo state += correction
  4. write densH/veloH/densC/veloC + model inputs dens/velo + label corr
"""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.resample import upsample_staggered
from solver_in_the_loop_tpu.io import scene as scene_io
from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.ops.poisson import make_incompressible
from solver_in_the_loop_tpu.physics.karman import KarmanFlow, initial_state, karman_domain
from solver_in_the_loop_tpu.core.grids import StaggeredGrid
from solver_in_the_loop_tpu.pre.lsq import build_pre_geometry, solve_correction

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("karman-pre-gen")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--thumb", action="store_true")
    p.add_argument("-t", "--simsteps", type=int, default=1500)
    p.add_argument("-s", "--skipsteps", type=int, default=999)
    p.add_argument("-r", "--res", type=int, default=32)
    p.add_argument("-l", "--len", type=float, default=100.0)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--re", type=float, default=1e6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--advect", choices=["gather", "shift"], default="gather")
    p.add_argument("--max-shift", type=int, default=4)
    return p


def run(args):
    np.random.seed(args.seed)
    dom_lo = karman_domain(args.res, args.len)
    dom_hi = karman_domain(args.res * args.scale, args.len)
    flow_lo = KarmanFlow(dom_lo, advection=args.advect, max_shift=args.max_shift)
    flow_hi = KarmanFlow(dom_hi, advection=args.advect, max_shift=args.max_shift)
    geom = build_pre_geometry(dom_lo, dom_hi, args.scale, bnd=2)

    d_hi, v_hi = initial_state(dom_hi, 1)
    from solver_in_the_loop_tpu.core.resample import downsample_centered, downsample_staggered
    from solver_in_the_loop_tpu.core.grids import CenteredGrid

    d_co = CenteredGrid(downsample_centered(d_hi.values, args.scale), dom_lo)
    u_lo, v_lo = downsample_staggered(v_hi.u, v_hi.v, args.scale)
    v_co = StaggeredGrid(u_lo, v_lo, dom_lo)

    sc = Scene.create(args.output)
    sc.write_params(vars(args).copy())

    corr_u = jnp.zeros(dom_lo.u_shape(1))
    corr_v = jnp.zeros(dom_lo.v_shape(1))
    dt = 1.0

    import jax

    @jax.jit
    def pre_step(d_hi, v_hi, d_co, v_co, corr_u, corr_v, p_hi, p_lo, p_vd):
        """One fused lockstep frame: hi step, lo step, projected vdiff,
        constrained LS correction — a single device dispatch per frame.
        All three pressure solves warm-start from the previous frame's
        pressures (p_hi, p_lo, p_vd)."""
        d_hi, v_hi, p_hi = flow_hi.step(d_hi, v_hi, args.re, dt=dt, p0=p_hi)
        d_co, v_co_base, p_lo = flow_lo.step(d_co, v_co, args.re, dt=dt, p0=p_lo)
        up_u, up_v = upsample_staggered(v_co_base.u, v_co_base.v, args.scale)
        vdiff = StaggeredGrid(v_hi.u - up_u, v_hi.v - up_v, dom_hi)
        vdiff, p_vd = make_incompressible(vdiff, flow_hi.masks, p0=p_vd)
        corr_u, corr_v = solve_correction(
            geom, vdiff.u, vdiff.v, corr_u, corr_v,
            beta=args.beta / dt, constrained=True,
        )
        v_co = StaggeredGrid(v_co_base.u + corr_u, v_co_base.v + corr_v, dom_lo)
        return d_hi, v_hi, d_co, v_co, v_co_base, corr_u, corr_v, p_hi, p_lo, p_vd

    p_hi = jnp.zeros_like(d_hi.values)
    p_lo = jnp.zeros_like(d_co.values)
    p_vd = jnp.zeros_like(d_hi.values)
    # previous-frame pressures for quadratic extrapolated warm starts
    # (3p1-3p2+p3; CG iterations p50 82 -> ~28 measured, BENCH.md)
    p_hi2, p_lo2, p_vd2 = p_hi, p_lo, p_vd
    p_hi3, p_lo3, p_vd3 = p_hi, p_lo, p_vd

    # per-scene run.log scoped with/try-finally so an exception mid-scene
    # doesn't leak the FileHandler (ADVICE r2 item 1)
    with scene_io.scene_run_log(sc.path):
        log.info("params: %s", vars(args))
        log.info("writing %s", sc.path)
        for i in range(1, args.simsteps):
            if i >= 4:
                x_hi = 3 * p_hi - 3 * p_hi2 + p_hi3
                x_lo = 3 * p_lo - 3 * p_lo2 + p_lo3
                x_vd = 3 * p_vd - 3 * p_vd2 + p_vd3
            elif i == 3:
                x_hi, x_lo, x_vd = 2 * p_hi - p_hi2, 2 * p_lo - p_lo2, 2 * p_vd - p_vd2
            else:
                x_hi, x_lo, x_vd = p_hi, p_lo, p_vd
            p_hi3, p_lo3, p_vd3 = p_hi2, p_lo2, p_vd2
            p_hi2, p_lo2, p_vd2 = p_hi, p_lo, p_vd
            (d_hi, v_hi, d_co, v_co, v_co_base, corr_u, corr_v,
             p_hi, p_lo, p_vd) = pre_step(
                d_hi, v_hi, d_co, v_co, corr_u, corr_v, x_hi, x_lo, x_vd
            )

            if i % 25 == 0 or i == 1:
                log.info("step %06d |corr|max=%.4f", i, float(jnp.max(jnp.abs(corr_u))))
            if args.skipsteps < i:
                # device->host fetches only for stored frames (the 999-frame
                # warmup stays fully on device)
                den_in = np.asarray(d_co.values)
                vel_in_u, vel_in_v = np.asarray(v_co_base.u), np.asarray(v_co_base.v)
                if args.thumb:
                    import os

                    from solver_in_the_loop_tpu.io.thumbs import save_thumb, thumb_dir_for

                    td = thumb_dir_for(sc.path)
                    save_thumb(np.asarray(d_hi.values[0]), 10000.0, os.path.join(td, f"densH_{i:06d}.png"))
                    save_thumb(np.asarray(v_co.u[0]), 10000.0, os.path.join(td, f"velUC_{i:06d}.png"))
                    save_thumb(np.asarray(v_co.v[0]), 10000.0, os.path.join(td, f"velVC_{i:06d}.png"))
                    save_thumb(np.asarray(corr_u[0]), 10000.0, os.path.join(td, f"corUC_{i:06d}.png"))
                    save_thumb(np.asarray(corr_v[0]), 10000.0, os.path.join(td, f"corVC_{i:06d}.png"))
                sc.write_centered("densH", i, np.asarray(d_hi.values))
                sc.write_staggered("veloH", i, np.asarray(v_hi.u), np.asarray(v_hi.v))
                sc.write_centered("densC", i, np.asarray(d_co.values))
                sc.write_staggered("veloC", i, np.asarray(v_co.u), np.asarray(v_co.v))
                sc.write_centered("dens", i, den_in)
                sc.write_staggered("velo", i, vel_in_u, vel_in_v)
                sc.write_staggered("corr", i, np.asarray(corr_u), np.asarray(corr_v))
    return sc


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
