"""Mesh + sharding rules: the TPU-native scaling layer.

The reference has NO distributed support at all — no torch.distributed, one
device string (SURVEY §2 "Parallelism inventory: none"). This framework adds
SPMD scaling the JAX way: one 2-axis ``Mesh`` ("data", "model") over ICI,
``NamedSharding`` annotations, and jit/GSPMD inserting the collectives.

  * data axis  — batch sharding; gradients all-reduce (psum) automatically
    under jit when params are replicated across "data".
  * model axis — tensor parallelism for the transformer matmuls: column-
    parallel for QKV/up-projections (kernel [in, out] sharded on out), row-
    parallel for merge/down-projections (sharded on in), following the
    Megatron pattern, so each attention block needs a single all-reduce that
    XLA emits on its own. Embeddings, norms, convs stay replicated (the
    vision towers are frozen; their FLOPs already ride the data axis).

Used by the trainer (params + batch placement), __graft_entry__.dryrun
(8-virtual-device CPU validation) and the multichip tests.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Dense-module names that are column-parallel (shard kernel dim 1 = out):
_COL_PARALLEL = {
    "q", "k", "v", "wi",                      # T5
    "query", "key", "value", "intermediate",  # ViT / RoBERTa
    "linear_q", "linear_k", "linear_v", "fc1",  # SGA
}
# ... and row-parallel (shard kernel dim 0 = in):
_ROW_PARALLEL = {
    "o", "wo",                                # T5
    "out", "output",                          # ViT / RoBERTa
    "linear_merge", "fc2", "attention_output",  # SGA
}


def make_mesh(data_axis_size: int = -1, model_axis_size: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis_size == -1:
        if n % model_axis_size:
            raise ValueError(f"{n} devices not divisible by model axis "
                             f"{model_axis_size}")
        data_axis_size = n // model_axis_size
    use = data_axis_size * model_axis_size
    grid = np.asarray(devices[:use]).reshape(data_axis_size, model_axis_size)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def param_partition_spec(path: Tuple, leaf: Any) -> P:
    """Megatron-style TP spec from the param path (module/leaf names)."""
    names = [getattr(e, "key", None) for e in path]
    leaf_name = names[-1] if names else None
    module = names[-2] if len(names) >= 2 else None

    if leaf_name == "kernel" and getattr(leaf, "ndim", 0) == 2:
        if module in _COL_PARALLEL:
            return P(None, MODEL_AXIS)
        if module in _ROW_PARALLEL:
            return P(MODEL_AXIS, None)
    if leaf_name == "bias" and module in _COL_PARALLEL:
        return P(MODEL_AXIS)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree matching ``params`` (TP on the model axis,
    replicated over data)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_partition_spec(path, leaf)),
        params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shardings_for(batch: Any, mesh: Mesh) -> Any:
    """Per-leaf batch shardings: arrays with a batch dim ride the data axis,
    scalars are replicated."""
    def spec(leaf):
        if getattr(leaf, "ndim", 0) >= 1:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, batch)


def stacked_batch_shardings_for(batch: Any, mesh: Mesh) -> Any:
    """Shardings for a [K, B, ...] stacked batch (steps-per-dispatch scan):
    the scan dim replicated, the batch dim on the data axis."""
    def spec(leaf):
        if getattr(leaf, "ndim", 0) >= 2:
            return NamedSharding(mesh, P(None, DATA_AXIS))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.device_put(batch, batch_shardings_for(batch, mesh))
