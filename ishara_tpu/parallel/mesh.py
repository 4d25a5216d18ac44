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


DCN_AXIS = "dcn"


def make_multislice_mesh(num_slices: int = -1, devices=None,
                         axes: tuple[str, str] = (DCN_AXIS, DATA_AXIS)) -> Mesh:
    """2-D (dcn, data) mesh for multi-slice data parallelism (ROADMAP #6).

    On real multi-slice TPU the outer axis follows each device's
    ``slice_index`` so the gradient all-reduce decomposes into fast
    ICI reductions within a slice and one DCN reduction across slices
    (GSPMD emits the hierarchical collective from the mesh axis order —
    outermost axis = slowest network, the standard TPU recipe). Elsewhere
    (CPU simulation, single slice) devices are split sequentially into
    ``num_slices`` equal rows."""
    devices = list(jax.devices()) if devices is None else list(devices)
    slice_ids = sorted({getattr(d, "slice_index", 0) for d in devices})
    if len(slice_ids) > 1:
        rows = [[d for d in devices if d.slice_index == s]
                for s in slice_ids]
        if num_slices not in (-1, None) and num_slices != len(rows):
            raise ValueError(f"{len(rows)} hardware slices visible, "
                             f"asked for {num_slices}")
        width = min(len(r) for r in rows)
        arr = np.asarray([r[:width] for r in rows])
    else:
        if num_slices in (-1, None):
            raise ValueError("num_slices required when the platform does "
                             "not report slice_index")
        n = num_slices
        per = len(devices) // n
        if per == 0:
            raise ValueError(f"{len(devices)} devices < {n} slices")
        arr = np.asarray(devices[: n * per]).reshape(n, per)
    return Mesh(arr, axes)


def multislice_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over BOTH mesh axes (every device holds B / n_dev)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a pytree of [B, ...] arrays batch-sharded on the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
