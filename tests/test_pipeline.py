"""Pipeline parallelism: collective-permute GPipe schedule == sequential scan.

The pipe axis shards the stacked layer params' leading axis; microbatches
rotate stage-to-stage via ppermute (parallel/pipeline.py).  Oracle is the
plain ``lax.scan`` over all layers — the exact program models/bert.py runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgclip_tpu.models.bert import BertConfig, init_bert
from mmgclip_tpu.parallel import PIPE_AXIS, pipeline_forward, pipelined_bert_forward
from mmgclip_tpu.parallel.pipeline import stacked_layer_specs

P = jax.sharding.PartitionSpec


def _pipe_mesh(n_stages):
    devices = np.asarray(jax.devices()[:n_stages])
    return jax.sharding.Mesh(devices, (PIPE_AXIS,))


def _mlp_layer(h, p):
    return jnp.tanh(h @ p["w"] + p["b"])


def _stacked_mlp(n_layers, width, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.normal(scale=0.3, size=(n_layers, width, width)), jnp.float32),
        "b": jnp.asarray(rng.normal(scale=0.1, size=(n_layers, width)), jnp.float32),
    }


@pytest.mark.parametrize("n_stages,n_layers,n_micro", [(2, 4, 2), (4, 8, 4), (4, 8, 8)])
def test_pipeline_equals_sequential_scan(n_stages, n_layers, n_micro):
    width, batch = 16, 8
    stacked = _stacked_mlp(n_layers, width)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(batch, width)), jnp.float32)

    expected = jax.lax.scan(lambda h, p: (_mlp_layer(h, p), None), x, stacked)[0]
    mesh = _pipe_mesh(n_stages)
    got = pipeline_forward(
        _mlp_layer, stacked, x, mesh, num_microbatches=n_micro
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6, atol=1e-6)


def test_pipeline_pytree_state():
    """State may be a pytree (e.g. (hidden, mask)); non-hidden leaves pass through."""
    width, batch, n_layers, n_stages = 8, 4, 4, 2
    stacked = _stacked_mlp(n_layers, width, seed=2)

    def layer(state, p):
        h, scale = state
        return _mlp_layer(h, p) * scale[:, None], scale

    x = jnp.asarray(np.random.default_rng(3).normal(size=(batch, width)), jnp.float32)
    scale = jnp.asarray([1.0, 0.5, 2.0, 1.5], jnp.float32)

    expected = jax.lax.scan(lambda s, p: (layer(s, p), None), (x, scale), stacked)[0][0]
    got, got_scale = pipeline_forward(layer, stacked, (x, scale), _pipe_mesh(n_stages))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_scale), np.asarray(scale))


def test_pipeline_rejects_bad_splits():
    stacked = _stacked_mlp(4, 8)
    x = jnp.zeros((4, 8), jnp.float32)
    mesh = _pipe_mesh(3)
    with pytest.raises(ValueError, match="layers"):
        pipeline_forward(_mlp_layer, stacked, x, mesh)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_forward(_mlp_layer, stacked, x, _pipe_mesh(2), num_microbatches=3)


def test_pipelined_bert_matches_encoder():
    """The pipelined text tower == BertEncoder.apply to float tolerance."""
    cfg = BertConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
    )
    module, variables = init_bert(cfg, seed=0)
    rng = np.random.default_rng(0)
    batch, seq = 8, 16
    input_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, seq)), jnp.int32)
    lengths = rng.integers(4, seq + 1, size=batch)
    attention_mask = jnp.asarray(
        (np.arange(seq)[None, :] < lengths[:, None]).astype(np.int32)
    )

    expected = module.apply(variables, input_ids, attention_mask)
    mesh = _pipe_mesh(4)
    got = pipelined_bert_forward(
        variables, input_ids, attention_mask, mesh, config=cfg, num_microbatches=4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_pipeline_backward_matches_sequential():
    """The pipeline is DIFFERENTIABLE: grads through the collective-permute
    schedule equal grads through the sequential scan (XLA transposes the
    ppermute rotation and the psum combine), i.e. GPipe training semantics,
    not just a forward-only schedule."""
    stacked = _stacked_mlp(8, 16, seed=4)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(8, 16)), jnp.float32)
    mesh = _pipe_mesh(4)

    def loss_pp(params):
        return jnp.sum(pipeline_forward(_mlp_layer, params, x, mesh) ** 2)

    def loss_seq(params):
        out = jax.lax.scan(lambda h, p: (_mlp_layer(h, p), None), x, params)[0]
        return jnp.sum(out ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        g_pp, g_seq,
    )

    # remat=True (per-layer rematerialization) changes memory, not numerics
    def loss_remat(params):
        return jnp.sum(pipeline_forward(_mlp_layer, params, x, mesh, remat=True) ** 2)

    g_remat = jax.grad(loss_remat)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        g_remat, g_seq,
    )


def test_pipeline_params_actually_sharded():
    """The stacked layer tree shards its leading axis over the pipe axis —
    each stage's addressable shard holds L/S layers."""
    mesh = _pipe_mesh(4)
    stacked = _stacked_mlp(8, 16)
    specs = stacked_layer_specs(stacked)
    sharded = jax.device_put(
        stacked,
        jax.tree_util.tree_map(lambda s: jax.sharding.NamedSharding(mesh, s), specs),
    )
    shard = sharded["w"].addressable_shards[0]
    assert shard.data.shape == (2, 16, 16)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 16)), jnp.float32)
    expected = jax.lax.scan(lambda h, p: (_mlp_layer(h, p), None), x, stacked)[0]
    got = pipeline_forward(_mlp_layer, sharded, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6, atol=1e-6)
