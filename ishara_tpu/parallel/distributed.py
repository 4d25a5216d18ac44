"""Multi-process (multi-host pod) initialization and data feeding.

The reference's only multi-device modes are single-process
(``nn.DataParallel``; ``tf.distribute.TPUStrategy`` on one host —
SURVEY.md §2.4). For pods, JAX requires one process per host and an explicit
``jax.distributed.initialize``; this module provides

* :func:`initialize_distributed` — idempotent wrapper resolving the
  coordinator from args or env (JAX's own auto-detection covers real TPU
  pods, where the metadata server supplies everything);
* :func:`process_shard` — (process_index, process_count) for sharding the
  corpus per host (``ParquetASLFR(process_index=..., process_count=...)``);
* :func:`host_local_to_global` — assemble per-host batch shards into one
  globally-sharded array (``jax.make_array_from_process_local_data``), the
  feeding path for a pjit train step over a pod-wide mesh.

Single-process (this repo's CI and the one tunneled v5e chip) every function
degrades to a no-op/identity, so the same Trainer code runs everywhere.
"""

from __future__ import annotations

import os

import jax


_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize JAX's distributed runtime if (and only if) a multi-process
    setup is configured. Returns True when running multi-process.

    Resolution order: explicit args -> env (``ISHARA_COORDINATOR``,
    ``ISHARA_NUM_PROCESSES``, ``ISHARA_PROCESS_ID``) -> JAX auto-detection
    (TPU pod metadata). Safe to call repeatedly and in single-process runs.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "ISHARA_COORDINATOR")
    env_n = os.environ.get("ISHARA_NUM_PROCESSES")
    env_i = os.environ.get("ISHARA_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None)
    process_id = process_id if process_id is not None else (
        int(env_i) if env_i else None)

    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process: nothing to initialize

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def process_shard() -> tuple[int, int]:
    """(process_index, process_count) for corpus sharding; (0, 1) when
    single-process."""
    return jax.process_index(), jax.process_count()


def host_local_to_global(batch, mesh, axis: str = "data"):
    """Per-host batch shard [B_local, ...] -> global array [B_global, ...]
    sharded over ``axis`` of a (possibly multi-host) mesh.

    Single-process this is exactly ``shard_batch``; multi-process it uses
    ``jax.make_array_from_process_local_data`` so each host contributes only
    its local rows — no cross-host gather of host data ever happens.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
