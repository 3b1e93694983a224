"""Correction networks (flax.linen), NHWC, fully convolutional.

Exact architecture parity with the reference (SURVEY.md §2.3):

* Mercury  — conv5x5(32) ReLU -> conv5x5(64) ReLU -> conv5x5(2)
  (/root/reference/karman-2d/karman_train.py:92-99)
* MarsMoon — conv5x5(32)+LeakyReLU stem, 5 residual blocks
  [conv5x5(32) LeakyReLU conv5x5(32) + skip, LeakyReLU], conv5x5(2) head;
  ~570k params (/root/reference/karman-2d/karman_train.py:101-138)
* JupiterMoon — stem conv5x5(32) ReLU; blocks [conv5x5(F) ReLU -> conv3x3(F)
  linear -> skip add (1x1 projection on width change) -> LeakyReLU]: 2@32,
  2@64, 2@32; head conv5x5(2); 401,730 params
  (/root/reference/burgers/burgers_train_pre.py:343-369)

Every LeakyReLU uses the Keras default alpha=0.3 the reference inherits
(keras.layers.LeakyReLU(), karman_train.py:105). Rounds 1-4a accidentally
used the jax default 0.01; checkpoints from those rounds record
leaky_alpha=0.01 in their stats json and the apply CLIs rebuild them at that
slope (--leaky-alpha overrides).

Inputs are normalized collocated features (B, Y, X, C) with C=3 for karman
[v, u, Re] or C=4 for burgers [v, u, fv, fu]; outputs (B, Y, X, 2) = [dv, du].

All convs run in a configurable compute dtype (bfloat16 on TPU by default for
the MXU; params stay float32).

Init modes (measured head-to-head in BENCH.md "Init ablation"):

* `init="reference"` (trainer-CLI default since round 3) — Keras glorot_uniform on every
  conv including the head (Keras Conv2D default,
  /root/reference/karman-2d/karman_train.py:101-138). An untrained net then
  emits corrections as large as the flow itself, so the msteps=32 unroll
  explodes unless gradients are clipped — pair with the reference's own
  mitigation `--clip-grad` (karman_train.py:451-454), on by default in the
  trainers. 2.3-2.6x lower rollout MAE than zero init at 20 epochs.
* `init="zero"` — zero output conv: the initial unroll is exactly the stable
  pure-solver rollout and training grows corrections from zero. Stable
  without clipping, but converges to a worse basin (the rounds-1-3 campaign
  default; kept for reproducing those tables).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


class Conv(nn.Conv):
    """nn.Conv with a fused epilogue (optional skip-add + activation, the
    same fusion Keras applies via Conv2D(activation=...)) that dispatches to
    the fused Pallas im2col conv kernels (ops/pallas/conv_kernel) when
    available: real TPU, hardware-validated marker present, odd square K>1
    kernel, working set within VMEM. Parameters (HWIO "kernel" + "bias") and
    the flax auto-name ("Conv_N") are identical to nn.Conv, so checkpoints
    are interchangeable between the Pallas and XLA paths."""

    act: str = "none"  # none | relu | leaky_relu
    act_slope: float = 0.3

    @nn.compact
    def __call__(self, x, skip=None):
        from ..ops.pallas import conv_kernel as ck
        ks = tuple(self.kernel_size)
        cin = x.shape[-1]
        # The Pallas path implements exactly stride-1 SAME dense convolution;
        # anything else must fall through to nn.Conv (ADVICE r4: the class
        # reads as a general drop-in, so guard the dispatch, not just assume).
        stride1 = self.strides in (None, 1, (1, 1))
        plain = (stride1 and self.padding == "SAME"
                 and self.kernel_dilation in (None, 1, (1, 1))
                 and self.input_dilation in (None, 1, (1, 1))
                 and self.feature_group_count == 1)
        if (plain and x.ndim == 4 and self.use_bias
                and ck.conv_available(x.shape, ks, cin, self.features)):
            kernel = self.param("kernel", self.kernel_init,
                                ks + (cin, self.features), self.param_dtype)
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            dt = self.dtype or x.dtype
            return ck.conv_fused(
                x.astype(dt), kernel.astype(dt), bias.astype(dt),
                None if skip is None else skip.astype(dt),
                act=self.act, slope=self.act_slope)
        y = super().__call__(x)
        if skip is not None:
            y = y + skip
        if self.act == "relu":
            y = nn.relu(y)
        elif self.act == "leaky_relu":
            y = nn.leaky_relu(y, self.act_slope)
        return y


def _conv(features, kernel, dtype, kinit, act="none", slope=0.3):
    """SAME conv (+fused skip/activation epilogue) whose output is
    remat-named "conv": under the trainer's "pressure+conv" checkpoint policy
    every conv output is saved across the msteps scan, so the backward pass
    never re-runs a convolution (the convs are the dominant device cost of
    the train step — BENCH.md round-4 step profile). The Conv module is
    constructed here (not at call time) so flax submodule numbering — and
    therefore checkpoint param names — follows construction order."""
    conv = Conv(features, kernel, padding="SAME", dtype=dtype,
                kernel_init=kinit, act=act, act_slope=slope)
    return lambda x, skip=None: checkpoint_name(conv(x, skip), "conv")


def _conv_inits(init: str):
    """(hidden, output) conv kernel initializers for an init mode.

    * "zero"      — flax-default hidden convs, zero output conv (stable unroll).
    * "reference" — Keras Conv2D default glorot_uniform everywhere
      (/root/reference/karman-2d/karman_train.py:101-138).
    """
    if init == "zero":
        return nn.linear.default_kernel_init, nn.initializers.zeros
    if init == "reference":
        glorot = nn.initializers.glorot_uniform()
        return glorot, glorot
    raise KeyError(f"unknown init mode '{init}' (use 'zero' or 'reference')")


class Mercury(nn.Module):
    compute_dtype: Dtype = jnp.float32
    init_mode: str = "zero"

    @nn.compact
    def __call__(self, x):
        kinit, out_kinit = _conv_inits(self.init_mode)
        x = x.astype(self.compute_dtype)
        x = _conv(32, (5, 5), self.compute_dtype, kinit, act="relu")(x)
        x = _conv(64, (5, 5), self.compute_dtype, kinit, act="relu")(x)
        x = _conv(2, (5, 5), self.compute_dtype, out_kinit)(x)
        return x.astype(jnp.float32)


class _ResBlock(nn.Module):
    """mars_moon residual block: conv5x5 -> LeakyReLU -> conv5x5 -> skip-add
    -> LeakyReLU (/root/reference/karman-2d/karman_train.py:107-111)."""

    features: int
    project: bool = False  # 1x1 projection on the skip when width changes
    compute_dtype: Dtype = jnp.float32
    init_mode: str = "zero"
    leaky_slope: float = 0.3

    @nn.compact
    def __call__(self, x):
        kinit, _ = _conv_inits(self.init_mode)
        # construction order (= checkpoint param numbering): conv1, conv2, proj
        c1 = _conv(self.features, (5, 5), self.compute_dtype, kinit,
                   act="leaky_relu", slope=self.leaky_slope)
        c2 = _conv(self.features, (5, 5), self.compute_dtype, kinit,
                   act="leaky_relu", slope=self.leaky_slope)
        proj = (_conv(self.features, (1, 1), self.compute_dtype, kinit)
                if self.project else None)
        y = c1(x)
        skip = proj(x) if proj is not None else x
        return c2(y, skip=skip)


class MarsMoon(nn.Module):
    """Default SOL/NON correction net (--model mars_moon)."""

    features: int = 32
    blocks: int = 5
    out_channels: int = 2
    compute_dtype: Dtype = jnp.float32
    init_mode: str = "zero"
    leaky_slope: float = 0.3

    @nn.compact
    def __call__(self, x):
        kinit, out_kinit = _conv_inits(self.init_mode)
        x = x.astype(self.compute_dtype)
        x = _conv(self.features, (5, 5), self.compute_dtype, kinit,
                  act="leaky_relu", slope=self.leaky_slope)(x)
        for _ in range(self.blocks):
            x = _ResBlock(self.features, compute_dtype=self.compute_dtype,
                          init_mode=self.init_mode,
                          leaky_slope=self.leaky_slope)(x)
        x = _conv(self.out_channels, (5, 5), self.compute_dtype, out_kinit)(x)
        return x.astype(jnp.float32)


class _JupiterBlock(nn.Module):
    """jupiter_moon residual block — distinct from _ResBlock: conv5x5 with
    fused ReLU -> conv3x3 (linear) -> skip-add (1x1 projection on width
    change) -> LeakyReLU (/root/reference/burgers/burgers_train_pre.py:348-367)."""

    features: int
    project: bool = False
    compute_dtype: Dtype = jnp.float32
    init_mode: str = "zero"
    leaky_slope: float = 0.3

    @nn.compact
    def __call__(self, x):
        kinit, _ = _conv_inits(self.init_mode)
        c1 = _conv(self.features, (5, 5), self.compute_dtype, kinit, act="relu")
        c2 = _conv(self.features, (3, 3), self.compute_dtype, kinit,
                   act="leaky_relu", slope=self.leaky_slope)
        proj = (_conv(self.features, (1, 1), self.compute_dtype, kinit)
                if self.project else None)
        y = c1(x)
        skip = proj(x) if proj is not None else x
        return c2(y, skip=skip)


class JupiterMoon(nn.Module):
    """Burgers PRE 3-stage ResNet (32 -> 64 -> 32 with 1x1 projections),
    reference-exact blocks (/root/reference/burgers/burgers_train_pre.py:343-369)."""

    stage_features: Sequence[int] = (32, 32, 64, 64, 32, 32)
    compute_dtype: Dtype = jnp.float32
    init_mode: str = "zero"
    leaky_slope: float = 0.3

    @nn.compact
    def __call__(self, x):
        kinit, out_kinit = _conv_inits(self.init_mode)
        x = x.astype(self.compute_dtype)
        x = _conv(32, (5, 5), self.compute_dtype, kinit, act="relu")(x)
        prev = 32
        for feats in self.stage_features:
            x = _JupiterBlock(feats, project=(feats != prev),
                              compute_dtype=self.compute_dtype,
                              init_mode=self.init_mode,
                              leaky_slope=self.leaky_slope)(x)
            prev = feats
        x = _conv(2, (5, 5), self.compute_dtype, out_kinit)(x)
        return x.astype(jnp.float32)


_MODELS = {"mercury": Mercury, "mars_moon": MarsMoon, "jupiter_moon": JupiterMoon}


def build_model(name: str, compute_dtype: Dtype = jnp.float32,
                init: str = "zero", leaky_slope: float = 0.3) -> nn.Module:
    """Registry lookup (replaces the reference's `eval('model_%s' % name)`,
    karman_train.py:394).

    Library default stays init="zero" (safe without grad clipping, e.g. for
    bench/dryrun harnesses); the trainer CLIs default to init="reference"
    with clipping on — see the module docstring.

    leaky_slope=0.3 is the Keras LeakyReLU() default alpha the reference
    inherits everywhere it uses LeakyReLU (karman_train.py:105). Checkpoints
    from before round 4's parity fix were trained at 0.01 (the jax default);
    their dataStats.json records leaky_alpha so the apply CLIs rebuild them
    correctly (absent key = 0.01).
    """
    if name not in _MODELS:
        raise KeyError(f"unknown model '{name}'; available: {sorted(_MODELS)}")
    kw = {} if name == "mercury" else {"leaky_slope": leaky_slope}
    return _MODELS[name](compute_dtype=compute_dtype, init_mode=init, **kw)
