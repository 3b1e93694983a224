"""PNG thumbnail output (reference --thumb flag, karman.py:21-31, 160-165)."""

from __future__ import annotations

import os

import numpy as np


def save_thumb(array2d: np.ndarray, scale: float, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    ima = np.asarray(np.asarray(array2d, np.float64) * scale, dtype="i")
    Image.fromarray(ima).save(path)


def thumb_dir_for(scene_path: str) -> str:
    """thumb/<sim_xxxxxx>/ next to the scene's parent (karman.py:161-162)."""
    parent, base = os.path.split(os.path.normpath(scene_path))
    return os.path.join(parent, "thumb", base)
