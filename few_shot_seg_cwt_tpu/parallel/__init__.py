from .mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    distributed_init,
    is_main_process,
    to_host,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "distributed_init",
    "is_main_process",
    "to_host",
]
