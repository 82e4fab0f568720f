"""Device-mesh and sharding utilities.

The reference has NO distributed execution (SURVEY §2.9: isolated docker
containers + a shared results volume). Scale-out here is green-field
TPU-native design: a (data, model) `jax.sharding.Mesh`, batch sharding over
`data` (keyframes / candidate pairs / images are embarrassingly parallel),
and Megatron-style tensor sharding of the large transformer kernels over
`model` when a model axis is requested. XLA inserts the ICI collectives.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh. n_data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_model < 1 or n % n_model:
        raise ValueError(f"model axis {n_model} does not divide {n} devices")
    if n_data == -1:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style tensor-parallel rules for the transformer kernels:
# column-parallel (shard output features) for qkv / fc1, row-parallel
# (shard input features) for proj / fc2. Everything else replicates.
_COL_PARALLEL = re.compile(r"(qkv|fc1|feat_hidden|score_hidden|token_hidden)$")
_ROW_PARALLEL = re.compile(r"(proj|fc2)$")


def _spec_for(path: Tuple[str, ...], leaf) -> P:
    if getattr(leaf, "ndim", 0) != 2 or path[-1] != "kernel":
        return P()
    owner = path[-2] if len(path) >= 2 else ""
    if _COL_PARALLEL.search(owner):
        return P(None, MODEL_AXIS)
    if _ROW_PARALLEL.search(owner):
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for a Flax param tree: TP on transformer kernels
    over `model` (when the axis size divides the dim), replicated otherwise."""
    model_size = mesh.shape[MODEL_AXIS]

    def to_sharding(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = _spec_for(keys, leaf)
        # drop the model axis if it doesn't divide the dimension
        if spec != P():
            dim = 0 if spec[0] == MODEL_AXIS else 1
            if leaf.shape[dim] % model_size:
                spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the leading axis split over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
