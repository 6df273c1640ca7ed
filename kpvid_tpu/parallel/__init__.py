from .distributed import (
    barrier,
    is_primary,
    local_batch_size,
    maybe_initialize,
    synced_compile,
    put_batch,
)
from .dp_step import make_dp_reduce_step
from .inventory import (
    CollectiveInventory,
    collective_inventory,
    inventory_compiled,
)
from .mesh import make_mesh
from .sharding import (
    batch_sharding,
    replicate,
    param_sharding_rules,
    shard_batch,
    shard_state,
)

__all__ = [
    "CollectiveInventory",
    "collective_inventory",
    "inventory_compiled",
    "make_dp_reduce_step",
    "make_mesh",
    "batch_sharding",
    "replicate",
    "param_sharding_rules",
    "shard_batch",
    "shard_state",
    "barrier",
    "is_primary",
    "local_batch_size",
    "maybe_initialize",
    "synced_compile",
    "put_batch",
]
