"""ZeRO-1: shard optimizer state over the data axis.

No reference counterpart (single-device AdamW, reference:
mmgclip/experiments/ClassifierExperiment.py:71-75).  With data parallelism
the optimizer moments are the largest redundant state — AdamW keeps 2x the
parameter bytes on every chip.  ZeRO-1 shards each moment tensor over the
``data`` axis and lets GSPMD insert the reduce-scatter/all-gather pair around
the update: pass these shardings as the jitted train step's in/out shardings
(or device_put the state once) and XLA does the rest — no manual collectives,
same numerics (tests/test_zero.py).

Each leaf shards its first axis divisible by the data-axis size; leaves with
no divisible axis (scalars, odd shapes) replicate.  Step counters and other
non-float bookkeeping replicate too.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import DATA_AXIS, put_global

P = PartitionSpec


def _leaf_spec(leaf, n_shards: int) -> PartitionSpec:
    if n_shards <= 1:
        return P()  # nothing to shard over (data=1 or model-only meshes)
    shape = getattr(leaf, "shape", ())
    for axis, dim in enumerate(shape):
        if dim % n_shards == 0 and dim >= n_shards:
            return P(*([None] * axis), DATA_AXIS)
    return P()


def zero1_shardings(opt_state, mesh: Mesh):
    """NamedSharding pytree for an optax state: moment tensors sharded over
    ``data``, everything unshardable replicated."""
    n_shards = int(mesh.shape.get(DATA_AXIS, 1))
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n_shards)), opt_state
    )


def shard_opt_state(opt_state, mesh: Mesh):
    """Place an optax state tree with ZeRO-1 shardings.

    Placement rides ``put_global`` (pod-shaped: assembles global arrays on
    multi-process meshes — the DATA axis can land at dim > 0 here, which
    only the target-array assembly handles; plain device_put otherwise)."""
    return jax.tree_util.tree_map(
        lambda leaf, s: put_global(leaf, s), opt_state, zero1_shardings(opt_state, mesh)
    )


def opt_state_bytes_per_device(opt_state) -> int:
    """Per-device bytes actually held for a (possibly sharded) state tree."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(opt_state):
        if hasattr(leaf, "addressable_shards"):
            # ONE device's shard — this is per-device accounting, not global
            shard = leaf.addressable_shards[0]
            total += int(np.prod(shard.data.shape)) * leaf.dtype.itemsize
        elif hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
    return total
