"""Channel-wise data statistics and (de)normalization.

Functional equivalent of the reference's `tf_data.py` helpers
(/root/reference/karman-2d/tf_data.py:16-50): per-channel mean/std/min/max
with optional nonzero masking, plus mean-std standardize and min-max
normalize, and the SOL trainers' std-of-absolute-values statistics
(`PhifDataset.dataStats`, karman_train.py:234-255).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def channel_stats(data: np.ndarray, nonzero_only: bool = False) -> Dict[str, np.ndarray]:
    """data (N, H, W, C) -> per-channel {'mean','std','min','max'}.

    nonzero_only computes mean/std over nonzero entries per channel
    (tf_data.py:20-24's masked variant).
    """
    c = data.shape[-1]
    flat = data.reshape(-1, c)
    if nonzero_only:
        mean = np.zeros(c, np.float64)
        std = np.zeros(c, np.float64)
        for i in range(c):
            col = flat[:, i]
            nz = col[col != 0]
            if nz.size == 0:
                mean[i], std[i] = 0.0, 1.0
            else:
                mean[i], std[i] = nz.mean(), nz.std()
    else:
        mean = flat.mean(axis=0)
        std = flat.std(axis=0)
    std = np.where(std == 0, 1.0, std)
    return {
        "mean": mean.astype(np.float32),
        "std": std.astype(np.float32),
        "min": flat.min(axis=0).astype(np.float32),
        "max": flat.max(axis=0).astype(np.float32),
    }


def abs_std(data: np.ndarray) -> float:
    """std of |data| — the SOL trainers' normalization statistic
    (karman_train.py:236-242)."""
    return float(np.std(np.abs(np.asarray(data, np.float64))))


def standardize(data, mean, std):
    return (data - mean) / std


def destandardize(data, mean, std):
    return data * std + mean


def normalize(data, vmin, vmax):
    rng = np.where((vmax - vmin) == 0, 1.0, vmax - vmin)
    return (data - vmin) / rng


def denormalize(data, vmin, vmax):
    return data * (vmax - vmin) + vmin


def stats_dict_to_lists(stats: Dict) -> Dict:
    """JSON-serializable copy (numpy -> lists)."""
    out = {}
    for k, v in stats.items():
        if isinstance(v, dict):
            out[k] = stats_dict_to_lists(v)
        elif isinstance(v, np.ndarray):
            out[k] = v.tolist()
        elif isinstance(v, (np.floating, np.integer)):
            out[k] = float(v)
        elif isinstance(v, (list, tuple)):
            out[k] = [float(x) if isinstance(x, (np.floating, np.integer)) else x for x in v]
        else:
            out[k] = v
    return out
