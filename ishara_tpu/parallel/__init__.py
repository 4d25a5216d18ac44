from .distributed import (
    host_local_to_global,
    initialize_distributed,
    process_shard,
)
from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "host_local_to_global",
    "initialize_distributed",
    "make_mesh",
    "process_shard",
    "replicated",
    "shard_batch",
]
