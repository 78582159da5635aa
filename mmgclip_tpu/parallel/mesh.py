"""Device mesh construction and sharding helpers.

The reference is single-device (reference: mmgclip_model.py:24) — this module
is the new first-class component replacing implicit placement: a named
`jax.sharding.Mesh` with a ``data`` axis (DP over batch) and a ``model`` axis
(reserved for tensor-parallel tower sharding), plus NamedSharding helpers.
Collectives ride ICI within a slice; multi-slice meshes extend over DCN by
passing a 2-level devices array.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a [data, model] mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"Mesh {data}x{model} does not match {n} devices")
    device_array = np.asarray(devices).reshape(data, model)
    return Mesh(device_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, tree):
    """Place every array in ``tree`` with its batch axis sharded over data."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
