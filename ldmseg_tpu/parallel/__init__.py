from .tp import tp_param_sharding, apply_tp
from .sp import spatial_constraint, batch_constraint, has_spatial_axis
from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    zero1_opt_state_sharding,
    param_sharding,
    prefetch_to_device,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "zero1_opt_state_sharding",
    "param_sharding",
    "prefetch_to_device",
    "tp_param_sharding",
    "apply_tp",
    "spatial_constraint",
    "batch_constraint",
    "has_spatial_axis",
]
