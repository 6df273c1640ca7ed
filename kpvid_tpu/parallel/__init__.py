from .mesh import make_mesh
from .sharding import (
    batch_sharding,
    replicate,
    param_sharding_rules,
    shard_batch,
    shard_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "param_sharding_rules",
    "shard_batch",
    "shard_state",
]
