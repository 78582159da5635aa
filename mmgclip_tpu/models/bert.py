"""BERT-style text tower in flax.linen with Pallas attention.

Functional replacement for the reference's frozen HF ``AutoModel`` text
encoder (reference: mmgclip/networks/encoder.py:121-156).  The tower returns
``last_hidden_state``; EOS pooling happens in the CLIP head.  Weights can be
converted from a HuggingFace torch checkpoint when one is available
(``load_hf_weights``); with zero egress the tower is seeded deterministically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

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
    hidden_dropout: float = 0.1
    use_flash_attention: bool = True
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


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask):
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        b, s, _ = hidden.shape

        qkv = nn.DenseGeneral(features=(3, heads, head_dim), name="qkv", dtype=cfg.dtype)(hidden)
        q, k, v = jnp.moveaxis(qkv, -3, 0)  # each [b, s, h, d]
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))

        on_tpu = jax.default_backend() == "tpu"
        if cfg.use_flash_attention and on_tpu:
            ctx = flash_attention(q, k, v, attention_mask)
        else:
            ctx = attention_reference(q, k, v, attention_mask)

        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, s, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, name="out", dtype=cfg.dtype)(ctx)
        return out


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attention_mask, deterministic: bool = True):
        cfg = self.config
        attn = BertSelfAttention(cfg, name="attention")(hidden, attention_mask)
        attn = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(attn)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attention_norm")(hidden + attn)

        mlp = nn.Dense(cfg.intermediate_size, name="intermediate", dtype=cfg.dtype)(hidden)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = nn.Dense(cfg.hidden_size, name="output", dtype=cfg.dtype)(mlp)
        mlp = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(mlp)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="output_norm")(hidden + mlp)
        return hidden


class BertEncoder(nn.Module):
    """Embeddings + transformer stack; returns last_hidden_state [b, s, h]."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, deterministic: bool = True):
        cfg = self.config
        b, s = input_ids.shape
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
        hidden = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(hidden)

        for i in range(cfg.num_hidden_layers):
            hidden = BertLayer(cfg, name=f"layer_{i}")(hidden, attention_mask, deterministic)
        return hidden


def init_bert(config: BertConfig, seed: int = 0):
    """Initialize (module, params) with a deterministic seed."""
    module = BertEncoder(config)
    dummy = jnp.zeros((1, 8), jnp.int32)
    params = jax.jit(lambda k, x: module.init(k, x, deterministic=True))(jax.random.key(seed), dummy)
    return module, params


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

    Usable offline from a local checkpoint file; returns a new params pytree.
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

    heads = config.num_attention_heads
    head_dim = config.hidden_size // heads
    for i in range(config.num_hidden_layers):
        layer = enc[f"layer_{i}"]
        pre = f"encoder.layer.{i}"
        qw = t(f"{pre}.attention.self.query.weight").T.reshape(config.hidden_size, heads, head_dim)
        kw = t(f"{pre}.attention.self.key.weight").T.reshape(config.hidden_size, heads, head_dim)
        vw = t(f"{pre}.attention.self.value.weight").T.reshape(config.hidden_size, heads, head_dim)
        layer["attention"]["qkv"]["kernel"] = jnp.stack([qw, kw, vw], axis=1)
        qb = t(f"{pre}.attention.self.query.bias").reshape(heads, head_dim)
        kb = t(f"{pre}.attention.self.key.bias").reshape(heads, head_dim)
        vb = t(f"{pre}.attention.self.value.bias").reshape(heads, head_dim)
        layer["attention"]["qkv"]["bias"] = jnp.stack([qb, kb, vb], axis=0)
        layer["attention"]["out"]["kernel"] = t(f"{pre}.attention.output.dense.weight").T
        layer["attention"]["out"]["bias"] = t(f"{pre}.attention.output.dense.bias")
        layer["attention_norm"]["scale"] = t(f"{pre}.attention.output.LayerNorm.weight")
        layer["attention_norm"]["bias"] = t(f"{pre}.attention.output.LayerNorm.bias")
        layer["intermediate"]["kernel"] = t(f"{pre}.intermediate.dense.weight").T
        layer["intermediate"]["bias"] = t(f"{pre}.intermediate.dense.bias")
        layer["output"]["kernel"] = t(f"{pre}.output.dense.weight").T
        layer["output"]["bias"] = t(f"{pre}.output.dense.bias")
        layer["output_norm"]["scale"] = t(f"{pre}.output.LayerNorm.weight")
        layer["output_norm"]["bias"] = t(f"{pre}.output.LayerNorm.bias")
    return p
