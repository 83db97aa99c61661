from .sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    batch_shardings_for,
    make_mesh,
    param_partition_spec,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh",
    "param_partition_spec", "param_shardings", "batch_sharding",
    "batch_shardings_for", "replicated", "shard_params", "shard_batch",
]
