from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    zero1_opt_state_sharding,
    param_sharding,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "zero1_opt_state_sharding",
    "param_sharding",
]
