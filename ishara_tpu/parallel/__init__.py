from .distributed import (
    host_local_to_global,
    initialize_distributed,
    process_shard,
)
from .mesh import (
    DATA_AXIS,
    DCN_AXIS,
    batch_sharding,
    make_mesh,
    make_multislice_mesh,
    multislice_batch_sharding,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "DCN_AXIS",
    "batch_sharding",
    "host_local_to_global",
    "initialize_distributed",
    "make_mesh",
    "make_multislice_mesh",
    "multislice_batch_sharding",
    "process_shard",
    "replicated",
    "shard_batch",
]
