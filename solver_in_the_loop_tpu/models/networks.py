"""Correction networks (flax.linen), NHWC, fully convolutional.

Exact architecture parity with the reference (SURVEY.md §2.3):

* Mercury  — conv5x5(32) ReLU -> conv5x5(64) ReLU -> conv5x5(2)
  (/root/reference/karman-2d/karman_train.py:92-99)
* MarsMoon — conv5x5(32)+LeakyReLU stem, 5 residual blocks
  [conv5x5(32) LeakyReLU conv5x5(32) + skip, LeakyReLU], conv5x5(2) head;
  ~570k params (/root/reference/karman-2d/karman_train.py:101-138)
* JupiterMoon — stem conv5x5(32) ReLU; res-blocks 2@32, 2@64 (1x1 projection
  on width change), 2@32 (1x1 projection), head conv5x5(2)
  (/root/reference/burgers/burgers_train_pre.py:343-369)

Inputs are normalized collocated features (B, Y, X, C) with C=3 for karman
[v, u, Re] or C=4 for burgers [v, u, fv, fu]; outputs (B, Y, X, 2) = [dv, du].

All convs run in a configurable compute dtype (bfloat16 on TPU by default for
the MXU; params stay float32).

Deviation from the reference (deliberate): the output conv is zero-initialized
so an untrained network corrects nothing. With the reference's default init an
untrained net emits corrections as large as the flow itself (|corr| ~ |v|),
and the msteps=32 unrolled rollout explodes before the first update (the
normalized initial loss is ~1e10 and Adam NaNs within two iterations on real
karman data). Zero output init makes the initial unroll exactly the stable
pure-solver rollout and lets training grow corrections from zero; capacity and
all other layers are unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class Mercury(nn.Module):
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        x = nn.Conv(32, (5, 5), padding="SAME", dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (5, 5), padding="SAME", dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(2, (5, 5), padding="SAME", dtype=self.compute_dtype,
                    kernel_init=nn.initializers.zeros)(x)
        return x.astype(jnp.float32)


class _ResBlock(nn.Module):
    features: int
    project: bool = False  # 1x1 projection on the skip when width changes
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skip = x
        y = nn.Conv(self.features, (5, 5), padding="SAME", dtype=self.compute_dtype)(x)
        y = nn.leaky_relu(y)
        y = nn.Conv(self.features, (5, 5), padding="SAME", dtype=self.compute_dtype)(y)
        if self.project:
            skip = nn.Conv(self.features, (1, 1), padding="SAME", dtype=self.compute_dtype)(skip)
        return nn.leaky_relu(skip + y)


class MarsMoon(nn.Module):
    """Default SOL/NON correction net (--model mars_moon)."""

    features: int = 32
    blocks: int = 5
    out_channels: int = 2
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        x = nn.Conv(self.features, (5, 5), padding="SAME", dtype=self.compute_dtype)(x)
        x = nn.leaky_relu(x)
        for _ in range(self.blocks):
            x = _ResBlock(self.features, compute_dtype=self.compute_dtype)(x)
        x = nn.Conv(self.out_channels, (5, 5), padding="SAME", dtype=self.compute_dtype,
                    kernel_init=nn.initializers.zeros)(x)
        return x.astype(jnp.float32)


class JupiterMoon(nn.Module):
    """Burgers PRE 3-stage ResNet (32 -> 64 -> 32 with 1x1 projections)."""

    stage_features: Sequence[int] = (32, 32, 64, 64, 32, 32)
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        x = nn.Conv(32, (5, 5), padding="SAME", dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        prev = 32
        for feats in self.stage_features:
            x = _ResBlock(feats, project=(feats != prev), compute_dtype=self.compute_dtype)(x)
            prev = feats
        x = nn.Conv(2, (5, 5), padding="SAME", dtype=self.compute_dtype,
                    kernel_init=nn.initializers.zeros)(x)
        return x.astype(jnp.float32)


_MODELS = {"mercury": Mercury, "mars_moon": MarsMoon, "jupiter_moon": JupiterMoon}


def build_model(name: str, compute_dtype: Dtype = jnp.float32) -> nn.Module:
    """Registry lookup (replaces the reference's `eval('model_%s' % name)`,
    karman_train.py:394)."""
    if name not in _MODELS:
        raise KeyError(f"unknown model '{name}'; available: {sorted(_MODELS)}")
    return _MODELS[name](compute_dtype=compute_dtype)
