"""Mesh/sharding layer (TPU-native replacement for SURVEY §2.4/§5.8)."""

from .distributed import (
    any_process,
    broadcast_from_primary,
    global_batch_from_local,
    initialize_from_env,
    is_multiprocess,
    is_primary_process,
    process_shard,
)
from .infer import BatchedInpainter
from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    auto_spatial,
    batch_sharding,
    batch_spec,
    local_mesh_like,
    make_mesh,
    pad_to_multiple,
    parse_mesh_arg,
    replicated,
    shard_batch,
    shard_train_step,
)

__all__ = [
    "BatchedInpainter",
    "any_process",
    "broadcast_from_primary",
    "DATA_AXIS",
    "global_batch_from_local",
    "initialize_from_env",
    "is_multiprocess",
    "is_primary_process",
    "process_shard",
    "SPATIAL_AXIS",
    "auto_spatial",
    "batch_sharding",
    "batch_spec",
    "local_mesh_like",
    "make_mesh",
    "pad_to_multiple",
    "parse_mesh_arg",
    "replicated",
    "shard_batch",
    "shard_train_step",
]
