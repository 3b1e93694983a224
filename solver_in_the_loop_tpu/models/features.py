"""Feature construction and the normalization contract of the correction nets.

Reference semantics (/root/reference/karman-2d/karman_train.py:77-90, 412-424;
/root/reference/burgers/burgers_train.py:75-96, 398-417):

* features = collocated lower-face velocity samples [v, u] (+ Re constant
  channel for karman, + force channels [fv, fu] for burgers), divided
  channel-wise by the dataset's std-of-absolute-value statistics.
* the model's 2-channel output is multiplied by [std_v, std_u] and zero-padded
  back onto the staggered grid (top row of v, right column of u are zero).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from solver_in_the_loop_tpu.core.grids import Domain, StaggeredGrid


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Normalization:
    """Channel scales for feature inputs and correction outputs.

    in_scales:  (C_in,)  divisors for the feature channels
    out_scales: (2,)     multipliers for the model output [dv, du]
    Mirrors dataStats['std'] / ['ext.std'] ('in.std'/'out.std' when seeded from
    a supervised PRE model, karman_train.py:352-356, 416-421).
    """

    in_scales: jnp.ndarray
    out_scales: jnp.ndarray
    # optional channel means for the --nozerocen PRE contract
    # (tf_data.standardize zero_centered=False, tf_data.py:29-32); None = the
    # default zero-centered standardize.
    in_means: Optional[jnp.ndarray] = None
    out_means: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (self.in_scales, self.out_scales, self.in_means, self.out_means), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    @classmethod
    def karman(cls, std_v: float, std_u: float, std_re: float) -> "Normalization":
        return cls(
            jnp.asarray([std_v, std_u, std_re], jnp.float32),
            jnp.asarray([std_v, std_u], jnp.float32),
        )

    @classmethod
    def burgers(cls, std_v, std_u, std_fv, std_fu) -> "Normalization":
        return cls(
            jnp.asarray([std_v, std_u, std_fv, std_fu], jnp.float32),
            jnp.asarray([std_v, std_u], jnp.float32),
        )


def karman_features(velocity: StaggeredGrid, re, norm: Normalization) -> jnp.ndarray:
    """(B, Y, X, 3): [v, u, Re] / in_scales."""
    vu = velocity.to_collocated()
    b, y, x, _ = vu.shape
    re_chan = jnp.broadcast_to(
        jnp.asarray(re, jnp.float32).reshape(-1, 1, 1, 1), (b, y, x, 1)
    )
    feat = jnp.concatenate([vu, re_chan], axis=-1)
    if norm.in_means is not None:
        feat = feat - norm.in_means
    return feat / norm.in_scales


def burgers_features(
    velocity: StaggeredGrid, force: Optional[StaggeredGrid], norm: Normalization
) -> jnp.ndarray:
    """(B, Y, X, 4): [v, u, fv, fu] / in_scales ((B,Y,X,2) without force)."""
    vu = velocity.to_collocated()
    if force is not None:
        vu = jnp.concatenate([vu, force.to_collocated()], axis=-1)
    if norm.in_means is not None:
        vu = vu - norm.in_means
    return vu / norm.in_scales


def correction_to_staggered(
    net_out: jnp.ndarray, norm: Normalization, domain: Domain
) -> StaggeredGrid:
    """Model output (B, Y, X, 2) -> scaled staggered correction field."""
    out = net_out * norm.out_scales
    if norm.out_means is not None:
        out = out + norm.out_means
    return StaggeredGrid.from_collocated(out, domain)
