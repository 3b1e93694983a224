"""Scene on-disk I/O, byte-compatible with the reference's PhiFlow layout.

Layout (SURVEY.md §2.2 'Scene I/O'; /root/reference/karman-2d/karman.py:128,143-147):
  <parent>/sim_%06d/
      params.pickle            (run params; 're' is read back as data metadata,
                                karman_train.py:246-249)
      <name>_%06d.npz          one array under the npz default key

Legacy array conventions (quarantined HERE, nowhere else):
* centered field:  (1, Y, X, 1)
* staggered field: (1, Y+1, X+1, 2) where the on-disk channel order is
  [u, v] — PhiFlow's read/write reverse the in-memory [v, u] order, noted at
  /root/reference/karman-2d/karman.py:104. Component u occupies rows 0..Y-1
  (top row zero-padded), v occupies cols 0..X-1 (right column zero-padded).
"""

from __future__ import annotations

import json
import os
import pickle
import re as _re
from typing import Tuple

import numpy as np


def staggered_to_legacy(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(B, Y, X+1), (B, Y+1, X) -> on-disk (B, Y+1, X+1, 2) with [...,0]=u, [...,1]=v."""
    b, y, _ = u.shape
    x = v.shape[2]
    out = np.zeros((b, y + 1, x + 1, 2), np.float32)
    out[:, :-1, :, 0] = u
    out[:, :, :-1, 1] = v
    return out


def legacy_to_staggered(arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """on-disk (B, Y+1, X+1, 2) -> (u (B, Y, X+1), v (B, Y+1, X))."""
    u = arr[:, :-1, :, 0]
    v = arr[:, :, :-1, 1]
    return np.ascontiguousarray(u), np.ascontiguousarray(v)


def centered_to_legacy(values: np.ndarray) -> np.ndarray:
    return values[..., None].astype(np.float32)


def legacy_to_centered(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr[..., 0])


def read_array(path: str) -> np.ndarray:
    """Load an npz frame in the legacy layout (batch dim guaranteed).

    Uses the native multithreaded reader (native/sceneio.cpp) when built,
    falling back to numpy."""
    from solver_in_the_loop_tpu.io import native_npz

    arr = native_npz.read_npz(path)
    if arr is None:
        with np.load(path) as f:
            arr = f[f.files[-1]]
    if arr.ndim < 4:
        arr = arr[None]
    return arr


def write_array(path: str, arr: np.ndarray) -> None:
    from solver_in_the_loop_tpu.io import native_npz

    arr = np.asarray(arr, np.float32)
    if not native_npz.write_npz(path, arr):
        np.savez_compressed(path, arr)


class Scene:
    """A sim_%06d output directory of npz frames + params metadata."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @classmethod
    def create(cls, parent: str) -> "Scene":
        os.makedirs(parent, exist_ok=True)
        existing = [
            int(m.group(1))
            for d in os.listdir(parent)
            if (m := _re.fullmatch(r"sim_(\d{6})", d))
        ]
        idx = max(existing, default=-1) + 1
        return cls(os.path.join(parent, f"sim_{idx:06d}"))

    @classmethod
    def list(cls, parent: str):
        dirs = sorted(
            d for d in os.listdir(parent) if _re.fullmatch(r"sim_\d{6}", d)
        ) if os.path.isdir(parent) else []
        return [cls(os.path.join(parent, d)) for d in dirs]

    # --- params -----------------------------------------------------------
    def write_params(self, params: dict) -> None:
        with open(os.path.join(self.path, "params.pickle"), "wb") as f:
            pickle.dump(params, f)
        with open(os.path.join(self.path, "params.json"), "w") as f:
            json.dump({k: v for k, v in params.items() if _json_ok(v)}, f, indent=1)

    def read_params(self) -> dict:
        p = os.path.join(self.path, "params.pickle")
        if os.path.isfile(p):
            with open(p, "rb") as f:
                return pickle.load(f)
        with open(os.path.join(self.path, "params.json")) as f:
            return json.load(f)

    # --- frames -----------------------------------------------------------
    def frame_path(self, name: str, frame: int) -> str:
        return os.path.join(self.path, f"{name}_{frame:06d}.npz")

    def write_centered(self, name: str, frame: int, values: np.ndarray) -> None:
        write_array(self.frame_path(name, frame), centered_to_legacy(np.asarray(values)))

    def write_staggered(self, name: str, frame: int, u: np.ndarray, v: np.ndarray) -> None:
        write_array(
            self.frame_path(name, frame), staggered_to_legacy(np.asarray(u), np.asarray(v))
        )

    def write_centered_batch(self, name: str, frame_ids, values: np.ndarray) -> None:
        """values (N, Y, X): one legacy frame (1, Y, X, 1) per frame id, flushed
        through the native thread-pool batch writer (io/native_npz.py) — the
        data generators are host-compression-bound after the device rollout."""
        from solver_in_the_loop_tpu.io import native_npz

        legacy = np.asarray(values, np.float32)[:, None, :, :, None]
        paths = [self.frame_path(name, f) for f in frame_ids]
        if not native_npz.write_npz_batch(paths, legacy):
            for p, fr in zip(paths, legacy):
                write_array(p, fr)

    def write_staggered_batch(self, name: str, frame_ids, u: np.ndarray, v: np.ndarray) -> None:
        """u (N, Y, X+1), v (N, Y+1, X): legacy (1, Y+1, X+1, 2) frames via the
        native batch writer. The legacy encoding lives ONLY in
        staggered_to_legacy (treating N as its batch axis here), so the on-disk
        layout has exactly one definition (ADVICE r2 item 4)."""
        from solver_in_the_loop_tpu.io import native_npz

        legacy = staggered_to_legacy(
            np.asarray(u, np.float32), np.asarray(v, np.float32))[:, None]
        paths = [self.frame_path(name, f) for f in frame_ids]
        if not native_npz.write_npz_batch(paths, legacy):
            for p, fr in zip(paths, legacy):
                write_array(p, fr)

    def read_centered(self, name: str, frame: int) -> np.ndarray:
        return legacy_to_centered(read_array(self.frame_path(name, frame)))

    def read_staggered(self, name: str, frame: int) -> Tuple[np.ndarray, np.ndarray]:
        return legacy_to_staggered(read_array(self.frame_path(name, frame)))

    def frames(self, name: str):
        pat = _re.compile(rf"{name}_(\d{{6}})\.npz")
        return sorted(
            int(m.group(1)) for fn in os.listdir(self.path) if (m := pat.fullmatch(fn))
        )


class scene_run_log:
    """Context manager attaching a per-scene run.log FileHandler to the root
    logger for the duration of a scene's generation (reference karman.py:131
    logs each run into <scene>/run.log)."""

    def __init__(self, scene_path: str):
        import logging

        self._logging = logging
        self._handler = logging.FileHandler(os.path.join(scene_path, "run.log"))
        self._handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s"))

    def __enter__(self):
        self._logging.getLogger().addHandler(self._handler)
        return self

    def __exit__(self, *exc):
        self._logging.getLogger().removeHandler(self._handler)
        self._handler.close()
        return False


def _json_ok(v) -> bool:
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False
