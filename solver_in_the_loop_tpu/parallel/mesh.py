"""Device mesh + data-parallel sharding helpers.

The reference is single-device (SURVEY.md §2.4: no tf.distribute/NCCL/MPI).
The TPU build's first-class parallelism is data-parallel over ICI: the batch
dimension (Re sweep x mini-batch) is sharded across the mesh's 'data' axis,
parameters and the preloaded dataset are replicated, and XLA inserts the
gradient all-reduce (psum over ICI) during jit partitioning — no explicit
collectives in user code.

The mesh API is multi-host-shape agnostic: `data_parallel_mesh` uses every
addressable device by default, and works identically on a v5e-8 slice or the
CPU fake mesh (--xla_force_host_platform_device_count=8) used in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """device_put every leaf with its leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
