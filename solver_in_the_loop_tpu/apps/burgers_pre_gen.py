"""Burgers PRE data generation: hi-res + corrected lo-res in lockstep, forces
replayed from a recorded hi-res sim.

Replicates `python burgers_pre.py -o <dir> --loadfH "simX/forc_0*.npz"`
(/root/reference/burgers/burgers_pre.py:436-470): unconstrained regularized
least squares (no gradient constraint, no projection of vdiff;
burgers_pre.py:311-318), periodic domains treated with the same boundary-margin
masks as the reference.
"""

from __future__ import annotations

import argparse
import glob as _glob
import logging

import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.grids import StaggeredGrid
from solver_in_the_loop_tpu.core.random_fields import randfreq_staggered
from solver_in_the_loop_tpu.core.resample import downsample_staggered, upsample_staggered
from solver_in_the_loop_tpu.io import scene as scene_io
from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.physics.burgers import BurgersFlow, burgers_domain
from solver_in_the_loop_tpu.pre.lsq import build_pre_geometry, solve_correction

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("burgers-pre-gen")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--thumb", action="store_true")
    p.add_argument("-t", "--simsteps", type=int, default=200)
    p.add_argument("-r", "--res", type=int, default=32)
    p.add_argument("-l", "--len", type=float, default=32.0)
    p.add_argument("--dt", type=float, default=0.1)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--initvH", default=None, help="hires velocity npz init")
    p.add_argument("--loadfH", required=True, help="glob of hires force npz files")
    p.add_argument("--advect", choices=["gather", "shift"], default="gather")
    p.add_argument("--max-shift", type=int, default=2)
    return p


def run(args):
    rng = np.random.RandomState(args.seed)
    dom_lo = burgers_domain(args.res, args.len)
    dom_hi = burgers_domain(args.res * args.scale, args.len)
    flow_lo = BurgersFlow(dom_lo, advection=args.advect, max_shift=args.max_shift)
    flow_hi = BurgersFlow(dom_hi, advection=args.advect, max_shift=args.max_shift)
    geom = build_pre_geometry(dom_lo, dom_hi, args.scale, bnd=2)

    fc_files = sorted(_glob.glob(args.loadfH))
    assert len(fc_files) >= args.simsteps, (len(fc_files), args.simsteps)

    if args.initvH:
        u_hi, v_hi_arr = scene_io.legacy_to_staggered(scene_io.read_array(args.initvH))
        v_hi = StaggeredGrid(jnp.asarray(u_hi), jnp.asarray(v_hi_arr), dom_hi)
    else:
        v_hi = randfreq_staggered(rng, dom_hi, 1)
    u_lo, v_lo = downsample_staggered(v_hi.u, v_hi.v, args.scale)
    v_co = StaggeredGrid(u_lo, v_lo, dom_lo)

    def load_force(i):
        fu_hi, fv_hi = scene_io.legacy_to_staggered(scene_io.read_array(fc_files[i]))
        fu_lo, fv_lo = downsample_staggered(jnp.asarray(fu_hi), jnp.asarray(fv_hi), args.scale)
        return (
            StaggeredGrid(jnp.asarray(fu_hi), jnp.asarray(fv_hi), dom_hi),
            StaggeredGrid(fu_lo, fv_lo, dom_lo),
        )

    sc = Scene.create(args.output)
    sc.write_params(vars(args).copy())

    corr_u = jnp.zeros(dom_lo.u_shape(1))
    corr_v = jnp.zeros(dom_lo.v_shape(1))
    f_hi, f_co = load_force(0)

    import jax

    @jax.jit
    def pre_step(v_hi, v_co, f_hi, f_co, corr_u, corr_v):
        """Fused lockstep frame (one dispatch): hi/lo forced steps + LS fit."""
        v_hi = flow_hi.step_with_f(v_hi, f_hi, dt=args.dt)
        v_co_base = flow_lo.step_with_f(v_co, f_co, dt=args.dt)
        up_u, up_v = upsample_staggered(v_co_base.u, v_co_base.v, args.scale)
        corr_u, corr_v = solve_correction(
            geom, v_hi.u - up_u, v_hi.v - up_v, corr_u, corr_v,
            beta=args.beta / args.dt, constrained=False,
        )
        v_co = StaggeredGrid(v_co_base.u + corr_u, v_co_base.v + corr_v, dom_lo)
        return v_hi, v_co, v_co_base, corr_u, corr_v

    # with-scoped per-scene run.log (karman.py:131; ADVICE r2 item 1)
    with scene_io.scene_run_log(sc.path):
        log.info("params: %s", vars(args))
        log.info("writing %s", sc.path)
        for i in range(1, args.simsteps):
            v_hi, v_co, v_co_base, corr_u, corr_v = pre_step(
                v_hi, v_co, f_hi, f_co, corr_u, corr_v
            )
            vel_in_u, vel_in_v = np.asarray(v_co_base.u), np.asarray(v_co_base.v)

            f_hi, f_co = load_force(i)

            if i % 25 == 0 or i == 1:
                log.info("step %06d |corr|max=%.5f", i, float(jnp.max(jnp.abs(corr_u))))
            if args.thumb:
                import os

                from solver_in_the_loop_tpu.io.thumbs import save_thumb, thumb_dir_for

                td = thumb_dir_for(sc.path)
                save_thumb(np.asarray(v_co.u[0]), 100000.0, os.path.join(td, f"velUC_{i:06d}.png"))
                save_thumb(np.asarray(v_co.v[0]), 100000.0, os.path.join(td, f"velVC_{i:06d}.png"))
                save_thumb(np.asarray(corr_u[0]), 100000.0, os.path.join(td, f"corUC_{i:06d}.png"))
                save_thumb(np.asarray(corr_v[0]), 100000.0, os.path.join(td, f"corVC_{i:06d}.png"))
            sc.write_staggered("veloH", i, np.asarray(v_hi.u), np.asarray(v_hi.v))
            sc.write_staggered("veloC", i, np.asarray(v_co.u), np.asarray(v_co.v))
            sc.write_staggered("velo", i, vel_in_u, vel_in_v)
            sc.write_staggered("corr", i, np.asarray(corr_u), np.asarray(corr_v))
            sc.write_staggered("forcH", i, np.asarray(f_hi.u), np.asarray(f_hi.v))
            sc.write_staggered("forc", i, np.asarray(f_co.u), np.asarray(f_co.v))
    return sc


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
