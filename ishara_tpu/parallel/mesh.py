"""Device mesh + sharding helpers.

The reference's multi-device story is transparent DP (`nn.DataParallel`,
`tf.distribute.TPUStrategy` — SURVEY.md §2.4). Here it is explicit and
compiler-driven: a 1-D ``data`` mesh over ICI, batch axis sharded, params
replicated; XLA inserts the gradient all-reduce. The mesh helpers accept any
device list so tests run on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = -1, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if num_devices not in (-1, None):
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a pytree of [B, ...] arrays batch-sharded on the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
