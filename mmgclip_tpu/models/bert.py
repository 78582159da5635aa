"""BERT-style text tower in flax.linen with Pallas attention, TPU-first.

Functional replacement for the reference's frozen HF ``AutoModel`` text
encoder (reference: mmgclip/networks/encoder.py:121-156).  The tower returns
``last_hidden_state``; EOS pooling happens in the CLIP head.  Weights can be
converted from a HuggingFace torch checkpoint when one is available
(``load_hf_weights``); with zero egress the tower is seeded deterministically.

TPU-first structure: all transformer layers share one set of *stacked*
parameters ([layers, ...]) and run under ``jax.lax.scan`` — one layer body in
the compiled program instead of 12 unrolled copies.  Attention defaults to
the XLA path — measured faster than the Pallas flash kernel at every product
configuration on a real v5e (see BertConfig.use_flash_attention, which turns
the kernel on for long-context experiments).  The tower
is frozen in every reference training configuration, so it always runs
deterministically (no dropout) — the reference leaves HF dropout active on
the frozen tower during training, which only adds noise to features that
carry no gradient.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.flash_attention import attention_reference, flash_attention


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 28996  # Bio_ClinicalBERT / bert-base-cased vocabulary
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    # default OFF: tower-level A/B on the real v5e (BENCH_MODE=text)
    # measured the Pallas flash path at 0.6-0.7x the XLA attention path at
    # every product configuration — XLA's dot_general absorbs the
    # [b,s,h,d]<->[b,h,s,d] layouts that a pallas_call forces into
    # materialized transposes, and pad-trimmed product batches run at
    # s=32 where the kernel doesn't tile anyway.  The kernel stays
    # config-reachable (networks.text_encoder.config.use_flash_attention)
    # and the bench A/B keeps the comparison honest.
    use_flash_attention: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "BertConfig":
        """A small config for tests and CPU smoke runs."""
        return BertConfig(
            vocab_size=512,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=128,
        )


def _layer_norm(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def bert_embeddings(enc_params, input_ids, token_type_ids, *, eps):
    """Embedding block over the BertEncoder param subtree (word + position +
    token-type lookups, then layernorm).

    Single source for every consumer that computes embeddings outside the
    flax module (parallel/pipeline.py's pipelined forward); equality with the
    module's own nn.Embed path is pinned by
    tests/test_pipeline.py::test_pipelined_bert_matches_encoder.
    """
    s = input_ids.shape[1]
    hidden = (
        jnp.take(enc_params["word_embeddings"]["embedding"], input_ids, axis=0)
        + jnp.take(enc_params["position_embeddings"]["embedding"], jnp.arange(s), axis=0)[None]
        + jnp.take(enc_params["token_type_embeddings"]["embedding"], token_type_ids, axis=0)
    )
    return _layer_norm(
        hidden,
        enc_params["embeddings_norm"]["scale"],
        enc_params["embeddings_norm"]["bias"],
        eps,
    )


def bert_layer(hidden, p, attention_mask, *, heads, eps, use_flash, dtype):
    """One post-LN transformer block over a single layer's param slice.

    ``p`` is one [H, ...]-shaped slice of the stacked tree (no leading layer
    axis).  Shared by the scanned encoder below and the pipeline-parallel
    forward (parallel/pipeline.py), so both paths stay numerically identical.
    """
    b, s, H = hidden.shape
    # qkv_kernel is [H, 3, heads, head_dim] (heads as their OWN axis, not
    # folded into a 3H column): a Megatron column-parallel sharding lives on
    # the heads axis and propagates straight through the einsum — the old
    # [H, 3H] layout put tp shard boundaries mid-K/V, which GSPMD cannot
    # push through the (3, heads, dh) reshape, degrading TP to a per-layer
    # qkv all-gather
    qkv = jnp.einsum("bsh,hknd->bsknd", hidden, p["qkv_kernel"].astype(dtype))
    qkv = qkv + p["qkv_bias"].astype(dtype)  # bias [3, heads, dh] broadcasts
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    if use_flash:
        ctx = flash_attention(q, k, v, attention_mask)
    else:
        ctx = attention_reference(q, k, v, attention_mask)
    ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, s, H)
    attn = ctx @ p["out_kernel"].astype(dtype) + p["out_bias"].astype(dtype)
    hidden = _layer_norm(hidden + attn, p["attn_norm_scale"], p["attn_norm_bias"], eps)

    mlp = hidden @ p["mlp_in_kernel"].astype(dtype) + p["mlp_in_bias"].astype(dtype)
    mlp = nn.gelu(mlp, approximate=False)
    mlp = mlp @ p["mlp_out_kernel"].astype(dtype) + p["mlp_out_bias"].astype(dtype)
    return _layer_norm(hidden + mlp, p["out_norm_scale"], p["out_norm_bias"], eps)


class BertEncoder(nn.Module):
    """Embeddings + scanned transformer stack; returns last_hidden_state."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, deterministic: bool = True):
        cfg = self.config
        b, s = input_ids.shape
        heads = cfg.num_attention_heads
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(s)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings")(pos_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings")(token_type_ids)
        hidden = word + pos + typ
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(hidden)

        L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
        dh = H // heads
        # explicit fan axes: the leading L is a scan/stack axis, not receptive
        # field — default lecun_normal would fold it (and the 3/heads axes of
        # the qkv kernel) into fan_in, shrinking init std by sqrt(L*3*heads)
        # and crippling from-scratch towers
        lecun = nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=0)
        lecun_qkv = nn.initializers.lecun_normal(in_axis=1, out_axis=(2, 3, 4), batch_axis=0)
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        stacked = {
            # [L, H, 3, heads, dh] — see bert_layer for why heads is its own
            # axis (TP sharding propagation)
            "qkv_kernel": self.param("qkv_kernel", lecun_qkv, (L, H, 3, heads, dh)),
            "qkv_bias": self.param("qkv_bias", zeros, (L, 3, heads, dh)),
            "out_kernel": self.param("out_kernel", lecun, (L, H, H)),
            "out_bias": self.param("out_bias", zeros, (L, H)),
            "attn_norm_scale": self.param("attn_norm_scale", ones, (L, H)),
            "attn_norm_bias": self.param("attn_norm_bias", zeros, (L, H)),
            "mlp_in_kernel": self.param("mlp_in_kernel", lecun, (L, H, I)),
            "mlp_in_bias": self.param("mlp_in_bias", zeros, (L, I)),
            "mlp_out_kernel": self.param("mlp_out_kernel", lecun, (L, I, H)),
            "mlp_out_bias": self.param("mlp_out_bias", zeros, (L, H)),
            "out_norm_scale": self.param("out_norm_scale", ones, (L, H)),
            "out_norm_bias": self.param("out_norm_bias", zeros, (L, H)),
        }

        # opt-in (see BertConfig.use_flash_attention) and TPU-only; the XLA
        # path is the measured default (ops/flash_attention.py docstring)
        use_flash = cfg.use_flash_attention and jax.default_backend() == "tpu"

        def layer(hidden, p):
            hidden = bert_layer(
                hidden, p, attention_mask,
                heads=heads, eps=cfg.layer_norm_eps, use_flash=use_flash, dtype=cfg.dtype,
            )
            return hidden, None

        hidden, _ = jax.lax.scan(layer, hidden, stacked)
        return hidden


def init_bert(config: BertConfig, seed: int = 0):
    """Initialize (module, params) with a deterministic seed."""
    module = BertEncoder(config)
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = jax.jit(lambda k, x: module.init(k, x, deterministic=True))(jax.random.key(seed), dummy)
    return module, params


def trim_padded_tail(text_tokens: Dict, multiple: int = 32) -> Dict:
    """Drop all-padding tail columns from a right-padded token batch.

    The product tokenizes to a fixed ``sequence_length`` (256, reference
    parity) but real prompts are a few dozen tokens — the tower then spends
    ~90% of its FLOPs on columns that are masked at every attention layer
    and ignored by ``eos_pool``.  Trimming the tail to the batch's max valid
    length (rounded up to ``multiple`` so compile count stays bounded at
    s/multiple programs) is numerically exact for BOTH tower families:
    attention masks padded keys to -inf (extra masked keys contribute
    exp(-inf)=0 to the softmax), position embeddings are absolute over the
    valid prefix (BERT: arange; BioGPT: cumsum(mask)), and LayerNorm/MLP act
    per token.  Measured on the v5e: the bank encode at the committed prompt
    banks (max 17 tokens -> s=32) runs ~5x the s=256 program.

    No-op for traced inputs (shapes must be concrete) and when ``multiple``
    is falsy.  Host-side arrays are trimmed host-side; device arrays cost
    one [b, s] mask fetch.
    """
    if not multiple:
        return text_tokens
    ids = text_tokens.get("input_ids")
    mask = text_tokens.get("attention_mask")
    if ids is None or mask is None:
        return text_tokens
    if any(isinstance(t, jax.core.Tracer) for t in text_tokens.values()):
        return text_tokens
    s = ids.shape[-1]
    import numpy as np

    lens = np.asarray(jax.device_get(mask)).sum(axis=-1)
    target = int(-(-max(int(lens.max(initial=1)), 1) // multiple) * multiple)
    if target >= s:
        return text_tokens
    return {k: v[..., :target] if getattr(v, "ndim", 0) >= 1 and v.shape[-1] == s else v
            for k, v in text_tokens.items()}


def eos_pool(last_hidden_state, attention_mask):
    """Pool the final non-pad token per sequence.

    Matches the reference's EOS pooling
    (reference: mmgclip/networks/mmgclip_model.py:110-111):
    ``eos_idx = attention_mask.sum(-1) - 1``.
    """
    eos_idx = jnp.sum(attention_mask, axis=-1).astype(jnp.int32) - 1
    eos_idx = jnp.clip(eos_idx, 0, last_hidden_state.shape[1] - 1)
    return jnp.take_along_axis(last_hidden_state, eos_idx[:, None, None], axis=1)[:, 0, :]


def load_hf_weights(params: Dict, torch_state_dict: Dict[str, Any], config: BertConfig) -> Dict:
    """Map a HuggingFace ``BertModel`` torch state dict onto our param tree.

    Per-layer tensors stack along a leading [layers] axis for the scanned
    encoder.  Usable offline from a local checkpoint file.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}

    def t(name):
        return jnp.asarray(sd[name])

    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    enc = p["params"]

    enc["word_embeddings"]["embedding"] = t("embeddings.word_embeddings.weight")
    enc["position_embeddings"]["embedding"] = t("embeddings.position_embeddings.weight")
    enc["token_type_embeddings"]["embedding"] = t("embeddings.token_type_embeddings.weight")
    enc["embeddings_norm"]["scale"] = t("embeddings.LayerNorm.weight")
    enc["embeddings_norm"]["bias"] = t("embeddings.LayerNorm.bias")

    stacks: Dict[str, list] = {key: [] for key in (
        "qkv_kernel", "qkv_bias", "out_kernel", "out_bias",
        "attn_norm_scale", "attn_norm_bias",
        "mlp_in_kernel", "mlp_in_bias", "mlp_out_kernel", "mlp_out_bias",
        "out_norm_scale", "out_norm_bias",
    )}
    H = config.hidden_size
    heads = config.num_attention_heads
    dh = H // heads
    for i in range(config.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        # HF projection weights are [H_out, H_in]; transposed, the output
        # axis is heads-major, so reshape(H, heads, dh) is the per-head view
        qw = t(f"{pre}.attention.self.query.weight").T.reshape(H, heads, dh)
        kw = t(f"{pre}.attention.self.key.weight").T.reshape(H, heads, dh)
        vw = t(f"{pre}.attention.self.value.weight").T.reshape(H, heads, dh)
        stacks["qkv_kernel"].append(jnp.stack([qw, kw, vw], axis=1))  # [H, 3, heads, dh]
        stacks["qkv_bias"].append(
            jnp.stack(
                [t(f"{pre}.attention.self.{n}.bias").reshape(heads, dh)
                 for n in ("query", "key", "value")]
            )
        )
        stacks["out_kernel"].append(t(f"{pre}.attention.output.dense.weight").T)
        stacks["out_bias"].append(t(f"{pre}.attention.output.dense.bias"))
        stacks["attn_norm_scale"].append(t(f"{pre}.attention.output.LayerNorm.weight"))
        stacks["attn_norm_bias"].append(t(f"{pre}.attention.output.LayerNorm.bias"))
        stacks["mlp_in_kernel"].append(t(f"{pre}.intermediate.dense.weight").T)
        stacks["mlp_in_bias"].append(t(f"{pre}.intermediate.dense.bias"))
        stacks["mlp_out_kernel"].append(t(f"{pre}.output.dense.weight").T)
        stacks["mlp_out_bias"].append(t(f"{pre}.output.dense.bias"))
        stacks["out_norm_scale"].append(t(f"{pre}.output.LayerNorm.weight"))
        stacks["out_norm_bias"].append(t(f"{pre}.output.LayerNorm.bias"))
    for key, vals in stacks.items():
        enc[key] = jnp.stack(vals)
    return p
