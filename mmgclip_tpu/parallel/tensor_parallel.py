"""Tensor-parallel sharding layouts for the towers.

The reference has no model parallelism (SURVEY §2.4).  Here the `model` mesh
axis carries a Megatron-style layout for the BERT tower's stacked weights:
QKV and MLP-in partition over their output (head / intermediate) dimension,
attention-out and MLP-out over their input dimension — so each pair needs
only one psum per block, which GSPMD inserts automatically when params are
placed with these specs under jit.

`text_tower_specs` returns a pytree of PartitionSpecs matching
models/bert.py's stacked param tree; `shard_text_tower` applies them.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import MODEL_AXIS, put_global

P = PartitionSpec


def text_tower_specs() -> dict:
    """PartitionSpecs for the stacked BertEncoder param tree (leading axis =
    layers, never sharded)."""
    return {
        "params": {
            "word_embeddings": {"embedding": P(None, MODEL_AXIS)},
            "position_embeddings": {"embedding": P(None, MODEL_AXIS)},
            "token_type_embeddings": {"embedding": P(None, MODEL_AXIS)},
            "embeddings_norm": {"scale": P(), "bias": P()},
            # column-parallel: split the HEADS axis ([L, H, 3, heads, dh] —
            # sharding the heads axis propagates through the qkv einsum and
            # the (heads, dh)->H ctx merge, so attention stays local per
            # shard; the old concatenated-3H column split put shard
            # boundaries mid-K/V and degraded to a per-layer all-gather)
            "qkv_kernel": P(None, None, None, MODEL_AXIS, None),
            "qkv_bias": P(None, None, MODEL_AXIS, None),
            # row-parallel: split input features (psum after)
            "out_kernel": P(None, MODEL_AXIS, None),
            "out_bias": P(),
            "attn_norm_scale": P(),
            "attn_norm_bias": P(),
            "mlp_in_kernel": P(None, None, MODEL_AXIS),
            "mlp_in_bias": P(None, MODEL_AXIS),
            "mlp_out_kernel": P(None, MODEL_AXIS, None),
            "mlp_out_bias": P(),
            "out_norm_scale": P(),
            "out_norm_bias": P(),
        }
    }


def shard_text_tower(variables, mesh: Mesh):
    """Place BERT variables on the mesh with the TP layout.

    Placement rides ``put_global`` (pod-shaped: assembles global arrays on
    multi-process meshes, plain device_put otherwise — CLAUDE.md invariant)."""
    specs = text_tower_specs()

    def place(path, leaf):
        node = specs
        for key in path:
            key_name = getattr(key, "key", None)
            if key_name is None:
                return put_global(leaf, NamedSharding(mesh, P()))
            node = node.get(key_name, None)
            if node is None:
                return put_global(leaf, NamedSharding(mesh, P()))
        spec = node if isinstance(node, PartitionSpec) else P()
        return put_global(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, variables)
