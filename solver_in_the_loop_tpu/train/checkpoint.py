"""Checkpoint / resume: params, optimizer state, step, dataStats, RNG key.

Reference behaviour being replaced (SURVEY.md §5 'Checkpoint / resume'):
Keras h5 snapshots every 10 epochs + final model.h5, `--resume N` reloading
epoch-N weights and skipping N epochs of the re-seeded data schedule, and
`dataStats.pickle` persisted at train start
(/root/reference/karman-2d/karman_train.py:358-359, 472-477, 514-517).

Format: msgpack via flax.serialization (model_epoch%04d.msgpack, model.msgpack)
plus dataStats.json — self-describing, framework-portable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def _epoch_path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(ckpt_dir, f"model_epoch{epoch:04d}.msgpack")


def save_checkpoint(ckpt_dir: str, params: Any, opt_state: Any = None,
                    epoch: Optional[int] = None) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    path = _epoch_path(ckpt_dir, epoch) if epoch is not None else os.path.join(
        ckpt_dir, "model.msgpack"
    )
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    return path


def load_checkpoint(path: str, params_template: Any, opt_state_template: Any = None):
    """Restore (params, opt_state) from a checkpoint file using templates for
    the pytree structure."""
    with open(path, "rb") as f:
        blob = f.read()
    target = {"params": params_template}
    if opt_state_template is not None:
        target["opt_state"] = opt_state_template
    restored = serialization.from_bytes(target, blob)
    params = restored["params"]
    opt_state = restored.get("opt_state", opt_state_template)
    return params, opt_state


def load_epoch_checkpoint(ckpt_dir: str, epoch: int, params_template, opt_state_template=None):
    return load_checkpoint(_epoch_path(ckpt_dir, epoch), params_template, opt_state_template)


def save_stats(ckpt_dir: str, stats: Dict) -> None:
    """dataStats persisted at train start and reloaded on resume
    (karman_train.py:474, 358-359)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "dataStats.json"), "w") as f:
        json.dump(stats, f, indent=1)


def load_stats(ckpt_dir: str) -> Dict:
    with open(os.path.join(ckpt_dir, "dataStats.json")) as f:
        return json.load(f)


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def adopt_pretf_stats(stats: Dict, args, log) -> None:
    """Supervised-init (--pretf) contract, shared by karman/burgers trainers.

    Adopt the PRE checkpoint's normalization scales (karman_train.py:352-356;
    the burgers reference intends the same but its pretf+forces branch
    IndexErrors at burgers_train.py:410) and rebuild the net at the
    leaky_alpha the checkpoint was trained with (absent key = pre-round-4
    0.01) — loaded weights must run under the activation they were trained
    with (ADVICE r4 medium). Mutates `stats` and `args.leaky_alpha` in place.
    """
    with open(os.path.join(os.path.dirname(args.pretf), "stats.json")) as f:
        pre_stats = json.load(f)
    stats["in.std"] = pre_stats["in.std"]
    stats["out.std"] = pre_stats["out.std"]
    pre_alpha = pre_stats.get("leaky_alpha", 0.01)
    if pre_alpha != args.leaky_alpha:
        log.info("--pretf checkpoint trained at leaky_alpha=%s; overriding CLI %s",
                 pre_alpha, args.leaky_alpha)
        args.leaky_alpha = pre_alpha
