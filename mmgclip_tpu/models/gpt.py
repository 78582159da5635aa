"""Causal (decoder-only) text tower — the BioGPT ablation family.

The reference's generic ``AutoModel`` wrapper let it swap BioGPT in as the
text encoder for its ablation study (reference: mmgclip/networks/encoder.py:138;
configs/tokenizer/biogpt.yaml; BASELINE.md text-encoder ablation table).
This is a from-scratch BioGPT-topology decoder: scaled embeddings
(sqrt(d) * tok), OPT-style learned positions with a +2 offset indexed by the
attention mask's cumulative sum, pre-LN blocks with causal+padding attention,
final layer norm.  EOS pooling (the CLIP head's last-valid-token pick) works
unchanged — for a causal model the last token summarizes the sequence.

Layers run scanned over stacked params like the BERT tower;
``load_biogpt_weights`` converts a HuggingFace BioGptModel state dict.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.flash_attention import NEG_INF
from .bert import _layer_norm  # shared LN body — keep one implementation



@dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 42384  # microsoft/biogpt vocabulary
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-5
    scale_embedding: bool = True
    position_offset: int = 2  # OPT/BioGPT learned-position offset
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "GPTConfig":
        return GPTConfig(
            vocab_size=256,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            max_position_embeddings=64,
        )




class CausalTextEncoder(nn.Module):
    """Embeddings + scanned pre-LN causal blocks; returns last_hidden_state."""

    config: GPTConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, deterministic: bool = True):
        cfg = self.config
        b, s = input_ids.shape
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)

        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed_tokens")(input_ids)
        if cfg.scale_embedding:
            tok = tok * jnp.sqrt(jnp.asarray(cfg.hidden_size, tok.dtype))
        # BioGPT positions: (cumsum(mask) * mask - 1) + offset — 0-based over
        # valid tokens, padded steps pinned to offset-1
        positions = jnp.cumsum(attention_mask, axis=1) * attention_mask - 1 + cfg.position_offset
        pos = nn.Embed(
            cfg.max_position_embeddings + cfg.position_offset, cfg.hidden_size, name="embed_positions"
        )(positions.astype(jnp.int32))
        hidden = (tok + pos).astype(cfg.dtype)

        L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
        # leading L is a scan/stack axis — keep it out of fan_in (see bert.py)
        lecun = nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=0)
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        stacked = {
            "qkv_kernel": self.param("qkv_kernel", lecun, (L, H, 3 * H)),
            "qkv_bias": self.param("qkv_bias", zeros, (L, 3 * H)),
            "out_kernel": self.param("out_kernel", lecun, (L, H, H)),
            "out_bias": self.param("out_bias", zeros, (L, H)),
            "attn_norm_scale": self.param("attn_norm_scale", ones, (L, H)),
            "attn_norm_bias": self.param("attn_norm_bias", zeros, (L, H)),
            "mlp_in_kernel": self.param("mlp_in_kernel", lecun, (L, H, I)),
            "mlp_in_bias": self.param("mlp_in_bias", zeros, (L, I)),
            "mlp_out_kernel": self.param("mlp_out_kernel", lecun, (L, I, H)),
            "mlp_out_bias": self.param("mlp_out_bias", zeros, (L, H)),
            "mlp_norm_scale": self.param("mlp_norm_scale", ones, (L, H)),
            "mlp_norm_bias": self.param("mlp_norm_bias", zeros, (L, H)),
        }

        eps = cfg.layer_norm_eps
        causal = jnp.tril(jnp.ones((s, s), bool))
        key_valid = attention_mask[:, None, None, :] > 0  # [b, 1, 1, s]
        mask = causal[None, None, :, :] & key_valid

        def layer(hidden, p):
            # pre-LN attention block
            x = _layer_norm(hidden, p["attn_norm_scale"], p["attn_norm_bias"], eps)
            qkv = x @ p["qkv_kernel"].astype(cfg.dtype) + p["qkv_bias"].astype(cfg.dtype)
            qkv = qkv.reshape(b, s, 3, heads, head_dim)
            q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.asarray(head_dim, scores.dtype))
            scores = jnp.where(mask, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, s, H)
            hidden = hidden + (ctx @ p["out_kernel"].astype(cfg.dtype) + p["out_bias"].astype(cfg.dtype))

            # pre-LN MLP block
            x = _layer_norm(hidden, p["mlp_norm_scale"], p["mlp_norm_bias"], eps)
            x = nn.gelu(x @ p["mlp_in_kernel"].astype(cfg.dtype) + p["mlp_in_bias"].astype(cfg.dtype), approximate=False)
            hidden = hidden + (x @ p["mlp_out_kernel"].astype(cfg.dtype) + p["mlp_out_bias"].astype(cfg.dtype))
            return hidden, None

        hidden, _ = jax.lax.scan(layer, hidden, stacked)
        return nn.LayerNorm(epsilon=eps, name="final_norm")(hidden)


def init_gpt(config: GPTConfig, seed: int = 0):
    module = CausalTextEncoder(config)
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = jax.jit(lambda k, x: module.init(k, x, deterministic=True))(jax.random.key(seed), dummy)
    return module, params


def load_biogpt_weights(params: Dict, torch_state_dict: Dict[str, Any], config: GPTConfig) -> Dict:
    """Map a HuggingFace ``BioGptModel`` state dict onto the stacked tree."""
    import numpy as np

    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}

    def t(name):
        return jnp.asarray(sd[name])

    p = jax.tree_util.tree_map(lambda x: x, params)
    enc = p["params"]
    enc["embed_tokens"]["embedding"] = t("embed_tokens.weight")
    enc["embed_positions"]["embedding"] = t("embed_positions.weight")
    enc["final_norm"]["scale"] = t("layer_norm.weight")
    enc["final_norm"]["bias"] = t("layer_norm.bias")

    stacks: Dict[str, list] = {key: [] for key in (
        "qkv_kernel", "qkv_bias", "out_kernel", "out_bias",
        "attn_norm_scale", "attn_norm_bias",
        "mlp_in_kernel", "mlp_in_bias", "mlp_out_kernel", "mlp_out_bias",
        "mlp_norm_scale", "mlp_norm_bias",
    )}
    for i in range(config.num_hidden_layers):
        pre = f"layers.{i}"
        qw = t(f"{pre}.self_attn.q_proj.weight").T
        kw = t(f"{pre}.self_attn.k_proj.weight").T
        vw = t(f"{pre}.self_attn.v_proj.weight").T
        stacks["qkv_kernel"].append(jnp.concatenate([qw, kw, vw], axis=1))
        stacks["qkv_bias"].append(
            jnp.concatenate([t(f"{pre}.self_attn.{n}_proj.bias") for n in ("q", "k", "v")])
        )
        stacks["out_kernel"].append(t(f"{pre}.self_attn.out_proj.weight").T)
        stacks["out_bias"].append(t(f"{pre}.self_attn.out_proj.bias"))
        stacks["attn_norm_scale"].append(t(f"{pre}.self_attn_layer_norm.weight"))
        stacks["attn_norm_bias"].append(t(f"{pre}.self_attn_layer_norm.bias"))
        stacks["mlp_in_kernel"].append(t(f"{pre}.fc1.weight").T)
        stacks["mlp_in_bias"].append(t(f"{pre}.fc1.bias"))
        stacks["mlp_out_kernel"].append(t(f"{pre}.fc2.weight").T)
        stacks["mlp_out_bias"].append(t(f"{pre}.fc2.bias"))
        stacks["mlp_norm_scale"].append(t(f"{pre}.final_layer_norm.weight"))
        stacks["mlp_norm_bias"].append(t(f"{pre}.final_layer_norm.bias"))
    for key, vals in stacks.items():
        enc[key] = jnp.stack(vals)
    return p
