"""Pipeline parallelism over the stacked transformer layers.

The reference has no model parallelism of any kind (SURVEY §2.4); this module
adds the pipeline dimension the TPU build reserves for text towers too deep
for one chip's HBM.  The design is the standard TPU collective-permute
pipeline (GPipe schedule): the stacked layer parameters ([L, ...], the same
layout models/bert.py scans over) shard their leading layer axis over a
``pipe`` mesh axis, the batch splits into M microbatches, and activations
rotate stage-to-stage with ``lax.ppermute`` over ICI — no host involvement,
one fused XLA program.  Bubble fraction is the usual (S-1)/(M+S-1).

Everything runs inside ``shard_map``: each stage holds L/S layers, scans its
local slice per step, and the last stage records finished microbatches.  The
result equals the plain sequential scan exactly (tests/test_pipeline.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from .mesh import PIPE_AXIS

P = PartitionSpec


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def pipeline_spmd(
    layer_fn: Callable,
    local_params,
    microbatches,
    *,
    axis_name: str = PIPE_AXIS,
    remat: bool = False,
):
    """The per-stage program (call inside ``shard_map`` over ``axis_name``).

    layer_fn(state, p) -> state: one layer applied to one microbatch's state
        (``state`` may be any pytree — e.g. (hidden, attention_mask)).
    local_params: this stage's slice of the stacked layer tree [L/S, ...].
    microbatches: [M, mb, ...] pytree of the full microbatched input,
        replicated across stages (stage 0 ingests; the copy keeps the SPMD
        program shape-uniform, which XLA requires).
    Returns the [M, mb, ...] final-layer states, replicated via psum.
    """
    n_stages = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    leaves = jax.tree_util.tree_leaves(microbatches)
    n_micro = leaves[0].shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def run_local(state):
        body = layer_fn
        if remat:
            # rematerialize each layer in the backward pass: activation
            # memory per stage drops from O(L/S) layers to O(1) at the cost
            # of one extra forward (the standard GPipe+checkpoint recipe)
            body = jax.checkpoint(layer_fn)
        return jax.lax.scan(lambda h, p: (body(h, p), None), state, local_params)[0]

    def take_micro(t):
        idx = jnp.clip(t, 0, n_micro - 1)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, idx, 0, keepdims=False), microbatches
        )

    def step(carry, t):
        state, outputs = carry
        # stage 0 ingests microbatch t (steps past M re-ingest the last one;
        # that work never reaches the final stage inside the loop, so it is
        # discarded — the standard drain bubble)
        state = _tree_where(stage == 0, take_micro(t), state)
        state = run_local(state)
        # the microbatch that entered at t - (S-1) finishes at the last stage now
        out_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        take = (stage == n_stages - 1) & (t >= n_stages - 1)

        def record(out_leaf, state_leaf):
            current = jax.lax.dynamic_index_in_dim(out_leaf, out_idx, 0, keepdims=False)
            new = jnp.where(take, state_leaf, current)
            return jax.lax.dynamic_update_index_in_dim(out_leaf, new, out_idx, 0)

        outputs = jax.tree_util.tree_map(record, outputs, state)
        state = jax.lax.ppermute(state, axis_name, perm)
        return (state, outputs), None

    init_state = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x[0]), microbatches)
    init_out = jax.tree_util.tree_map(jnp.zeros_like, microbatches)
    (_, outputs), _ = jax.lax.scan(
        step, (init_state, init_out), jnp.arange(n_micro + n_stages - 1)
    )
    # only the last stage wrote non-zeros; psum replicates the result to all
    return jax.lax.psum(outputs, axis_name)


def stacked_layer_specs(stacked_params, axis_name: str = PIPE_AXIS):
    """PartitionSpecs sharding every leaf's leading (layer) axis over the
    pipe axis."""
    return jax.tree_util.tree_map(
        lambda leaf: P(axis_name, *([None] * (leaf.ndim - 1))), stacked_params
    )


def pipeline_forward(
    layer_fn: Callable,
    stacked_params,
    state,
    mesh: Mesh,
    *,
    axis_name: str = PIPE_AXIS,
    num_microbatches: Optional[int] = None,
    remat: bool = False,
):
    """Run ``state`` through all L stacked layers, pipelined over the mesh's
    ``axis_name`` dimension.  Equals ``lax.scan(layer_fn, state, stacked)``.

    state: pytree whose leaves share a leading batch axis divisible by the
    microbatch count (defaults to the stage count).
    """
    n_stages = mesh.shape[axis_name]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not split over {n_stages} stages")
    n_micro = int(num_microbatches or n_stages)
    batch = jax.tree_util.tree_leaves(state)[0].shape[0]
    if batch % n_micro:
        raise ValueError(f"batch {batch} does not split into {n_micro} microbatches")

    microbatches = jax.tree_util.tree_map(
        lambda x: x.reshape(n_micro, batch // n_micro, *x.shape[1:]), state
    )
    fn = jax.shard_map(
        partial(pipeline_spmd, layer_fn, axis_name=axis_name, remat=remat),
        mesh=mesh,
        in_specs=(stacked_layer_specs(stacked_params, axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(stacked_params, microbatches)
    return jax.tree_util.tree_map(lambda x: x.reshape(batch, *x.shape[2:]), out)


def pipelined_bert_forward(
    variables,
    input_ids,
    attention_mask,
    mesh: Mesh,
    *,
    config,
    token_type_ids=None,
    axis_name: str = PIPE_AXIS,
    num_microbatches: Optional[int] = None,
    remat: bool = False,
):
    """BertEncoder forward with the layer stack pipeline-parallel.

    Numerically identical to ``BertEncoder.apply`` (models/bert.py): the
    embeddings are computed replicated (three table lookups + layernorm —
    negligible next to the stack) and the scanned stack becomes the
    collective-permute pipeline, each stage running ``bert_layer`` on its
    slice of the stacked parameter tree.
    """
    from ..models.bert import bert_embeddings, bert_layer

    enc = variables["params"]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    hidden = bert_embeddings(enc, input_ids, token_type_ids, eps=config.layer_norm_eps)

    stacked_keys = (
        "qkv_kernel", "qkv_bias", "out_kernel", "out_bias",
        "attn_norm_scale", "attn_norm_bias",
        "mlp_in_kernel", "mlp_in_bias", "mlp_out_kernel", "mlp_out_bias",
        "out_norm_scale", "out_norm_bias",
    )
    stacked = {k: enc[k] for k in stacked_keys}
    # same policy as BertEncoder: flash is opt-in, XLA is the measured
    # default (ops/flash_attention.py docstring)
    use_flash = config.use_flash_attention and jax.default_backend() == "tpu"

    def layer_fn(state, p):
        h, mask = state
        h = bert_layer(
            h, p, mask,
            heads=config.num_attention_heads,
            eps=config.layer_norm_eps,
            use_flash=use_flash,
            dtype=config.dtype,
        )
        return h, mask

    out_hidden, _ = pipeline_forward(
        layer_fn, stacked, (hidden, attention_mask), mesh,
        axis_name=axis_name, num_microbatches=num_microbatches, remat=remat,
    )
    return out_hidden
