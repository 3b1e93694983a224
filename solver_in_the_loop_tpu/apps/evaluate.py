"""Rollout accuracy evaluation: velocity MAE of a run_test scene vs the
downsampled hi-res reference trajectory.

The north-star accuracy metric (BASELINE.md): 100-step (and 500-step) rollout
velocity MAE across unseen Reynolds numbers. The reference repo has no
equivalent tool — errors were judged from the paper's plots; this makes the
check reproducible.

    python -m solver_in_the_loop_tpu evaluate \
        --run karman-fdt-sol32/run_test/sim_000000 \
        --ref karman-fdt-hires-testset/sim_000000 --ref-offset 1000 --scale 4 \
        --steps 100
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import jax.numpy as jnp
import numpy as np

from solver_in_the_loop_tpu.core.resample import downsample_staggered
from solver_in_the_loop_tpu.io.scene import Scene

log = logging.getLogger(__name__)


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser("evaluate")
    p.add_argument("--run", required=True, help="rollout scene dir (velTf frames)")
    p.add_argument("--ref", required=True, help="hi-res reference scene dir (velo frames)")
    p.add_argument("--ref-offset", type=int, default=0,
                   help="reference frame number matching rollout frame 0")
    p.add_argument("--scale", type=int, default=4, help="reference downsampling factor")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--field", default="velTf")
    return p


def run(args):
    run_sc = Scene(args.run)
    ref_sc = Scene(args.ref)
    # clamp to the longest contiguous frame prefix 1..N — a mid-range gap
    # (interrupted generation / partial batch write) must clamp too, not only
    # a short run (ADVICE r2 item 3)
    have = set(run_sc.frames(args.field))
    n_contig = 0
    while (n_contig + 1) in have:
        n_contig += 1
    if n_contig <= 0:
        # An empty scene or one whose frames don't start at 1 (e.g. gen output
        # with skipsteps) must fail loudly — a silent 0-step eval would be
        # captured as a "result" by batch drivers (ADVICE r3 item 1).
        log.error("no contiguous rollout frames starting at 1 in %s (have: %s)",
                  args.run, sorted(have)[:5])
        sys.exit(2)
    if args.steps > n_contig:
        log.warning("only %d contiguous rollout frames available; clamping --steps %d",
                    n_contig, args.steps)
        args.steps = n_contig
    # batch all frames, downsample once on device (per-frame roundtrips are slow)
    ur, vr, uh, vh = [], [], [], []
    for t in range(1, args.steps + 1):
        u_r, v_r = run_sc.read_staggered(args.field, t)
        u_h, v_h = ref_sc.read_staggered("velo", args.ref_offset + t)
        ur.append(u_r[0])
        vr.append(v_r[0])
        uh.append(u_h[0])
        vh.append(v_h[0])
    u_g, v_g = downsample_staggered(jnp.asarray(np.stack(uh)), jnp.asarray(np.stack(vh)), args.scale)
    du = jnp.mean(jnp.abs(jnp.asarray(np.stack(ur)) - u_g), axis=(1, 2))
    dv = jnp.mean(jnp.abs(jnp.asarray(np.stack(vr)) - v_g), axis=(1, 2))
    maes = [float(x) for x in np.asarray(0.5 * (du + dv))]
    out = {
        "steps": args.steps,
        "mae_mean": float(np.mean(maes)),
        "mae_final": maes[-1],
        "mae_per_step_head": maes[:10],
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
