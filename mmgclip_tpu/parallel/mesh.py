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
SLICE_AXIS = "slice"  # DCN axis between TPU slices
PIPE_AXIS = "pipe"  # pipeline stages (parallel/pipeline.py)
EXPERT_AXIS = "expert"  # MoE experts (parallel/expert.py)


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


def create_multislice_mesh(
    n_slices: int,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """[slice, data, model] mesh: the `slice` axis spans DCN (between TPU
    slices), `data`/`model` ride ICI within a slice.

    Layouts should keep heavy collectives off the slice axis: the
    global-batch contrastive gather runs over ("slice", "data") but
    gradient psums dominate traffic and stay on ICI when parameters are
    replicated per-slice.  With `jax.devices()` ordering, devices of one
    slice are contiguous, so reshape(n_slices, data, model) puts ICI
    neighbors together.
    """
    devices = list(devices if devices is not None else jax.devices())
    per_slice = len(devices) // n_slices
    if data is None:
        data = per_slice // model
    if n_slices * data * model != len(devices):
        raise ValueError(
            f"Mesh {n_slices}x{data}x{model} does not match {len(devices)} devices"
        )
    device_array = np.asarray(devices).reshape(n_slices, data, model)
    return Mesh(device_array, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over slice+data axes (DP)."""
    axes = tuple(a for a in (SLICE_AXIS, DATA_AXIS) if a in mesh.axis_names)
    spec = PartitionSpec(axes if len(axes) > 1 else axes[0])
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def put_global(tree, sharding: NamedSharding):
    """Pod-shaped placement of a process-identical host/device pytree.

    Single-process (every device addressable): plain ``jax.device_put`` —
    byte-identical to the pre-pod behavior.  Multi-process: ``device_put``
    cannot target non-addressable devices, so every leaf becomes a GLOBAL
    ``jax.Array`` via ``jax.make_array_from_process_local_data`` in its
    "target array" mode (local_data = the full process-identical value,
    ``global_shape`` passed explicitly): each device looks up ITS OWN index
    block, so ANY spec assembles correctly — batch specs over ``data``,
    leading ``model``/``expert`` specs (expert-stacked ``[E, ...]`` leaves
    on restore), ZeRO moments sharded at dim > 0, replication.  Only each
    device's own shard crosses the host link (SURVEY §2.4: no process
    materializes another host's shard on device).

    Callers should pass host (numpy) values when they have them — a device
    leaf costs an extra D2H fetch per call on multi-process meshes.

    Replaces the single-process placement the reference hard-codes
    (reference: mmgclip/networks/mmgclip_model.py:24)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def leaf(x):
        x = np.asarray(jax.device_get(x))
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree_util.tree_map(leaf, tree)


def shard_batch(mesh: Mesh, tree):
    """Place every array in ``tree`` with its batch axis sharded over data."""
    return put_global(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return put_global(tree, replicated(mesh))
