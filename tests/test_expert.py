"""Expert parallelism: MoE projection head + expert-axis sharding.

The head is a TPU-native extension (the reference's projection heads are all
dense, reference: mmgclip/networks/projection.py).  Oracle for routing is a
per-token numpy loop over the same weights; EP correctness is sharded ==
replicated on the virtual 8-device mesh.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgclip_tpu.models.projections import MoEProjectionHead, get_projection_head
from mmgclip_tpu.parallel import EXPERT_AXIS, moe_param_specs, shard_moe_params

P = jax.sharding.PartitionSpec


def _init_head(n, h=16, p=8, e=4, capacity_factor=100.0, seed=0):
    head = MoEProjectionHead(
        embedding_dim=h, projection_dim=p, n_experts=e, capacity_factor=capacity_factor
    )
    x = jnp.asarray(np.random.default_rng(seed).normal(size=(n, h)), jnp.float32)
    variables = head.init(jax.random.key(seed), x)
    return head, variables, x


def _oracle(params, x, capacity):
    """Per-token numpy re-computation of top-1 routing with capacity."""
    router, w_in, b_in = params["router"], params["w_in"], params["b_in"]
    w_out, b_out = params["w_out"], params["b_out"]
    logits = x @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    counts = np.zeros(router.shape[1], int)
    out = np.zeros((x.shape[0], w_out.shape[-1]), np.float32)
    for i, (xi, pi) in enumerate(zip(x, probs)):
        expert = int(pi.argmax())
        if counts[expert] >= capacity:
            counts[expert] += 1
            continue  # dropped: zero output
        counts[expert] += 1
        hidden = xi @ w_in[expert] + b_in[expert]
        hidden = hidden * 0.5 * (1.0 + np.vectorize(math.erf)(hidden / np.sqrt(2.0)))
        out[i] = (hidden @ w_out[expert] + b_out[expert]) * pi[expert]
    return out


def test_registry_has_moe_head():
    assert get_projection_head("MoEProjectionHead") is MoEProjectionHead


def test_moe_matches_per_token_oracle():
    head, variables, x = _init_head(n=12, capacity_factor=100.0)
    got = np.asarray(head.apply(variables, x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    expected = _oracle(params, np.asarray(x), capacity=10_000)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_moe_capacity_drops_overflow_tokens():
    """With capacity 1, the second token routed to an expert gets zero output."""
    head, variables, x = _init_head(n=12, e=4, capacity_factor=4.0 / 12.0)  # capacity=1
    got = np.asarray(head.apply(variables, x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    expected = _oracle(params, np.asarray(x), capacity=1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    # some token must actually have overflowed for this test to mean anything
    probs = np.asarray(jax.nn.softmax(x @ variables["params"]["router"], axis=-1))
    routed = np.bincount(probs.argmax(-1), minlength=4)
    assert routed.max() > 1
    assert (np.abs(expected).sum(-1) == 0).any()


def test_switch_aux_loss_sown():
    """The head sows the Switch load-balancing loss: 1.0 at perfectly
    uniform routing, larger when routing collapses, and differentiable
    through the router."""
    head, variables, x = _init_head(n=16, e=4)
    _y, state = head.apply(variables, x, mutable=["intermediates"])
    aux = float(state["intermediates"]["aux_loss"][0])
    # E * sum(f_e * P_e) >= 1 always (Cauchy-Schwarz-ish); == 1 iff uniform
    assert aux >= 1.0 - 1e-5

    def aux_of(params):
        _y, st = head.apply({"params": params}, x, mutable=["intermediates"])
        return st["intermediates"]["aux_loss"][0]

    grads = jax.grad(aux_of)(variables["params"])
    assert float(jnp.abs(grads["router"]).sum()) > 0.0

    # force total collapse: a router that sends everything to expert 0
    collapsed = dict(variables["params"])
    collapsed["router"] = jnp.zeros_like(collapsed["router"]).at[:, 0].set(10.0)
    _y, st = head.apply({"params": collapsed}, x, mutable=["intermediates"])
    assert float(st["intermediates"]["aux_loss"][0]) > aux


def test_l2_normalize_gradient_finite_at_zero_rows():
    """Capacity-dropped MoE tokens emit exact-zero rows; normalizing them
    must not NaN the backward pass (models/clip.py::l2_normalize clamps the
    SQUARED norm before the sqrt)."""
    from mmgclip_tpu.models.clip import l2_normalize

    x = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, 4.0]], jnp.float32)

    def loss(x):
        return jnp.sum(l2_normalize(x) ** 2)

    grads = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(grads)).all()
    # non-zero rows still normalize exactly
    np.testing.assert_allclose(
        np.asarray(l2_normalize(x)[1]), [0.6, 0.0, 0.8], rtol=1e-6
    )


def test_moe_dropped_tokens_train_without_nan():
    """End-to-end: capacity-1 head (guaranteed drops) through l2_normalize
    and a contrastive-style loss keeps every gradient finite."""
    from mmgclip_tpu.models.clip import l2_normalize

    head, variables, x = _init_head(n=12, e=4, capacity_factor=4.0 / 12.0)  # capacity=1
    out = np.asarray(head.apply(variables, x))
    assert (np.abs(out).sum(-1) == 0).any(), "fixture must actually drop tokens"

    def loss(params):
        emb = l2_normalize(head.apply({"params": params}, x))
        logits = emb @ emb.T
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(12), jnp.arange(12)])

    value, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(value))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_router_receives_gradient():
    head, variables, x = _init_head(n=8)

    def loss(params):
        return jnp.sum(head.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(grads["router"]).sum()) > 0.0
    assert float(jnp.abs(grads["w_in"]).sum()) > 0.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_expert_parallel_matches_replicated():
    """Experts sharded over the expert axis == replicated compute, and the
    shards are real (each device holds E/8 experts)."""
    head, variables, x = _init_head(n=16, h=16, p=8, e=8)
    expected = np.asarray(jax.jit(head.apply)(variables, x))

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), (EXPERT_AXIS,))
    specs = moe_param_specs(variables["params"], n_experts=8)
    assert specs["w_in"] == P(EXPERT_AXIS, None, None)
    assert specs["router"] == P()

    sharded = shard_moe_params(variables["params"], mesh, n_experts=8)
    assert sharded["w_in"].addressable_shards[0].data.shape[0] == 1

    got = np.asarray(jax.jit(head.apply)({"params": sharded}, x))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_expert_parallel_gradients_match_replicated():
    """Gradients with experts sharded over the expert axis == replicated
    gradients — EP training is a placement decision for the backward pass
    too (GSPMD transposes the dispatch/combine all_to_alls)."""
    head, variables, x = _init_head(n=16, h=16, p=8, e=8)

    def loss(params):
        return jnp.sum(head.apply({"params": params}, x) ** 2)

    expected = jax.jit(jax.grad(loss))(variables["params"])

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), (EXPERT_AXIS,))
    sharded = shard_moe_params(variables["params"], mesh, n_experts=8)
    got = jax.jit(jax.grad(loss))(sharded)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        expected, got,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_moe_head_through_mmgclip_config():
    """MMGCLIP builds with the MoE projection config group; extra knobs pass
    through to the head."""
    from mmgclip_tpu.config import Config
    from mmgclip_tpu.models import MMGCLIP

    cfg = Config(
        {
            "networks": {
                "logit_temperature": 0.07,
                "image_encoder": {
                    "name": "ConvNextTiny",
                    "image_features_dimension": 768,
                    "convnext_tiny_clf_path": "",
                },
                "text_encoder": {
                    "name": "BertEncoder",
                    "config": {
                        "vocab_size": 64,
                        "hidden_size": 32,
                        "num_hidden_layers": 2,
                        "num_attention_heads": 4,
                        "intermediate_size": 64,
                        "max_position_embeddings": 32,
                    },
                },
                "dropout": {"config": {"dropout": 0.0}},
            },
            "projection": {
                "config": {
                    "projection_name": "MoEProjectionHead",
                    "output_projection_dimension": 64,
                    "n_experts": 4,
                    "capacity_factor": 2.0,
                }
            },
            "tokenizer": {"config": {"tokenizer_name": "wordpiece", "sequence_length": 16}},
            "loss": {"config": {"loss_name": "CLIPLoss"}},
        }
    )
    model = MMGCLIP(cfg, seed=0)
    assert model.image_projection.n_experts == 4
    rng = np.random.default_rng(0)
    batch = {
        "image_features": jnp.asarray(rng.normal(size=(8, 1, 768, 1, 1)), jnp.float32),
        "text_tokens": {
            "input_ids": jnp.asarray(rng.integers(0, 64, size=(8, 16)), jnp.int32),
            "attention_mask": jnp.ones((8, 16), jnp.int32),
            "token_type_ids": jnp.zeros((8, 16), jnp.int32),
        },
    }
    out = model.forward(model.trainable_params, batch)
    assert out["logits_per_image"].shape == (8, 8)
    assert np.isfinite(np.asarray(out["logits_per_image"])).all()
