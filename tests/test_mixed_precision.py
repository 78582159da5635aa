"""Mixed-precision config plumbing: tower dtype selectable from YAML.

bf16 is the production TPU compute dtype (MXU-native, half the HBM traffic);
the knob is `networks.{image,text}_encoder.config.dtype`.  Params stay
float32 — only per-op compute casts, so features match float32 within bf16
tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mmgclip_tpu.config import Config
from mmgclip_tpu.models.clip import _bert_config_from, resolve_dtype


def test_resolve_dtype_table():
    assert resolve_dtype("bfloat16") is jnp.bfloat16
    assert resolve_dtype("bf16") is jnp.bfloat16
    assert resolve_dtype("float32") is jnp.float32
    assert resolve_dtype(jnp.float16) is jnp.float16  # passthrough
    with pytest.raises(ValueError, match="Unknown dtype"):
        resolve_dtype("int7")


def test_bert_config_dtype_from_yaml():
    cfg = Config(
        {"networks": {"text_encoder": {"config": {
            "vocab_size": 64, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 64,
            "max_position_embeddings": 32, "dtype": "bfloat16",
        }}}}
    )
    bc = _bert_config_from(cfg, vocab_size=None)
    assert bc.dtype is jnp.bfloat16


def _encode_config(dtype=None):
    encoder_cfg = {"micro": True, "in_channels": 1}
    if dtype:
        encoder_cfg["dtype"] = dtype
    return Config(
        {
            "networks": {
                "image_encoder": {
                    "name": "ConvNextTiny",
                    "image_features_dimension": 768,
                    "convnext_tiny_clf_path": "",
                    "config": encoder_cfg,
                }
            }
        }
    )


def test_encode_tower_bf16_close_to_f32():
    from mmgclip_tpu.ingest.encode import load_convnext_tower

    module32, params, _ = load_convnext_tower(_encode_config())
    module16, _params, cfg16 = load_convnext_tower(_encode_config("bfloat16"))
    assert cfg16.dtype is jnp.bfloat16

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 1)), jnp.float32
    )
    f32 = np.asarray(module32.apply(params, x), np.float32)
    bf16 = np.asarray(module16.apply(params, x), np.float32)
    cos = (f32 * bf16).sum(-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(bf16, axis=-1)
    )
    assert cos.min() > 0.99, f"bf16 features diverged: cosine {cos.min()}"
