from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    replicate,
    param_shardings,
    shard_batch,
    initialize_distributed,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "replicate",
    "param_shardings",
    "shard_batch",
    "initialize_distributed",
]
