"""Training datasets: Scene frame preloading, 4x preprocessing cache, stats,
and the reference-equivalent epoch shuffle schedule.

Reference: `PhifDataset` (/root/reference/karman-2d/karman_train.py:187-337 and
/root/reference/burgers/burgers_train.py:189-324). TPU-first difference: the
whole downsampled dataset is pushed to device HBM once (a few tens of MB), and
each training iteration gathers its (batch, msteps+1) window on device — no
host->device feed of 33 frames per ADAM iteration (the reference ships them in
a feed_dict every step, karman_train.py:500-502).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import random as _random
from typing import Dict, List, Optional

import numpy as np

from solver_in_the_loop_tpu.core.resample import (
    downsample_centered,
    downsample_staggered,
)
from solver_in_the_loop_tpu.io import scene as scene_io
from solver_in_the_loop_tpu.io.scene import Scene
from solver_in_the_loop_tpu.utils.stats import abs_std

log = logging.getLogger(__name__)


def _ds_path(path: str) -> str:
    """Downsampled-cache filename next to the original ('ds_' prefix,
    karman_train.py:258-259)."""
    d, b = os.path.split(path)
    return os.path.join(d, "ds_" + b)


def _downsample_centered_file(src: str, dst: str, scale: int) -> None:
    arr = scene_io.read_array(src)  # (1, Y, X, 1)
    lo = downsample_centered(np.asarray(arr[..., 0]), scale)
    scene_io.write_array(dst, np.asarray(lo)[..., None])


def _downsample_staggered_file(src: str, dst: str, scale: int) -> None:
    u, v = scene_io.legacy_to_staggered(scene_io.read_array(src))
    u_lo, v_lo = downsample_staggered(u, v, scale)
    scene_io.write_array(dst, scene_io.staggered_to_legacy(np.asarray(u_lo), np.asarray(v_lo)))


@dataclasses.dataclass
class KarmanDataset:
    """Preloaded karman training data (host numpy; move to device via trainer).

    dens (S, F, Y, X); u (S, F, Y, X+1); v (S, F, Y+1, X); re (S,)
    stats keys: 'std.dens', 'std.v', 'std.u', 'ext.std' (std of Re values,
    karman_train.py:251-255).
    """

    dens: np.ndarray
    u: np.ndarray
    v: np.ndarray
    re: np.ndarray
    stats: Dict[str, float]

    @property
    def num_sims(self) -> int:
        return self.dens.shape[0]

    @property
    def num_frames(self) -> int:
        return self.dens.shape[1]

    @property
    def resolution(self):
        return self.dens.shape[2:4]


def load_karman_dataset(
    dirpath: str,
    num_frames: int,
    num_sims: Optional[int] = None,
    scale: int = 4,
    skip_preprocessing: bool = False,
) -> KarmanDataset:
    scenes = Scene.list(dirpath)[: num_sims or None]
    assert scenes, f"no sim_* scenes under {dirpath}"

    if not skip_preprocessing:
        for sc in scenes:
            for frame in sc.frames("dens")[:num_frames]:
                src = sc.frame_path("dens", frame)
                if not os.path.isfile(_ds_path(src)):
                    _downsample_centered_file(src, _ds_path(src), scale)
            for frame in sc.frames("velo")[:num_frames]:
                src = sc.frame_path("velo", frame)
                if not os.path.isfile(_ds_path(src)):
                    _downsample_staggered_file(src, _ds_path(src), scale)

    dens, us, vs, res = [], [], [], []
    for sc in scenes:
        d_frames = sc.frames("ds_dens")[:num_frames]
        v_frames = sc.frames("ds_velo")[:num_frames]
        assert len(d_frames) >= num_frames and len(v_frames) >= num_frames, (
            f"{sc.path}: need {num_frames} cached frames"
        )
        dens.append(np.stack([sc.read_centered("ds_dens", f)[0] for f in d_frames]))
        uv = [sc.read_staggered("ds_velo", f) for f in v_frames]
        us.append(np.stack([x[0][0] for x in uv]))
        vs.append(np.stack([x[1][0] for x in uv]))
        res.append(float(sc.read_params()["re"]))

    data = KarmanDataset(
        dens=np.stack(dens),
        u=np.stack(us),
        v=np.stack(vs),
        re=np.asarray(res, np.float32),
        stats={},
    )
    data.stats = {
        "std.dens": abs_std(data.dens),
        "std.v": abs_std(data.v),
        "std.u": abs_std(data.u),
        "ext.std": float(np.std(np.abs(data.re))),
    }
    log.info("karman dataset: %s sims x %s frames @ %s; stats=%s",
             data.num_sims, data.num_frames, data.resolution, data.stats)
    return data


@dataclasses.dataclass
class BurgersDataset:
    """u/v velocity + fu/fv force frames (S, F, ...); SMAC resolution is the
    file resolution minus 1 (burgers_train.py:231-232 handled natively here)."""

    u: np.ndarray
    v: np.ndarray
    fu: np.ndarray
    fv: np.ndarray
    stats: Dict[str, float]

    @property
    def num_sims(self) -> int:
        return self.u.shape[0]

    @property
    def num_frames(self) -> int:
        return self.u.shape[1]

    @property
    def resolution(self):
        y = self.v.shape[2] - 1
        x = self.u.shape[3] - 1
        return (y, x)


def load_burgers_dataset(
    dirpath: str,
    num_frames: int,
    num_sims: Optional[int] = None,
    scale: int = 4,
    skip_preprocessing: bool = False,
) -> BurgersDataset:
    scenes = Scene.list(dirpath)[: num_sims or None]
    assert scenes, f"no sim_* scenes under {dirpath}"

    if not skip_preprocessing:
        for sc in scenes:
            for name in ("velo", "forc"):
                for frame in sc.frames(name)[:num_frames]:
                    src = sc.frame_path(name, frame)
                    if not os.path.isfile(_ds_path(src)):
                        _downsample_staggered_file(src, _ds_path(src), scale)

    us, vs, fus, fvs = [], [], [], []
    for sc in scenes:
        vf = sc.frames("ds_velo")[:num_frames]
        ff = sc.frames("ds_forc")[:num_frames]
        uv = [sc.read_staggered("ds_velo", f) for f in vf]
        us.append(np.stack([x[0][0] for x in uv]))
        vs.append(np.stack([x[1][0] for x in uv]))
        fuv = [sc.read_staggered("ds_forc", f) for f in ff]
        fus.append(np.stack([x[0][0] for x in fuv]))
        fvs.append(np.stack([x[1][0] for x in fuv]))

    data = BurgersDataset(
        u=np.stack(us), v=np.stack(vs), fu=np.stack(fus), fv=np.stack(fvs), stats={}
    )
    data.stats = {
        "std.v": abs_std(data.v),
        "std.u": abs_std(data.u),
        "std.fv": abs_std(data.fv),
        "std.fu": abs_std(data.fu),
    }
    log.info("burgers dataset: %s sims x %s frames @ %s; stats=%s",
             data.num_sims, data.num_frames, data.resolution, data.stats)
    return data


class EpochSchedule:
    """Reference-equivalent (sim, frame) shuffle schedule.

    Per epoch: all pairs with frame < F - msteps are shuffled and partitioned
    into (num_sims) rows of (F - msteps) steps; iteration (batch ib, step i)
    consumes rows [ib*B .. ib*B+B) at column i (karman_train.py:267-313).
    Yields int32 index arrays of shape (iters, B, 2) for a whole epoch.
    """

    def __init__(self, num_sims: int, num_frames: int, batch_size: int, seed: int = 0):
        assert num_sims % batch_size == 0
        self.num_sims = num_sims
        self.num_frames = num_frames
        self.batch_size = batch_size
        self.num_batches = num_sims // batch_size
        self.rng = _random.Random(seed)

    def steps_per_epoch(self, msteps: int) -> int:
        return self.num_batches * (self.num_frames - msteps)

    def epoch_indices(self, msteps: int) -> np.ndarray:
        steps = self.num_frames - msteps
        pairs: List = [
            (s, f) for s in range(self.num_sims) for f in range(steps)
        ]
        self.rng.shuffle(pairs)
        grid = np.asarray(pairs, np.int32).reshape(self.num_sims, steps, 2)
        # iterate: for each batch ib, for each step i -> rows ib*B..ib*B+B at col i
        out = []
        for ib in range(self.num_batches):
            rows = grid[ib * self.batch_size : (ib + 1) * self.batch_size]  # (B, steps, 2)
            out.append(np.transpose(rows, (1, 0, 2)))  # (steps, B, 2)
        return np.concatenate(out, axis=0)  # (iters, B, 2)
