"""Numerics parity of the JAX towers against torch oracles.

The parity gate (BASELINE.md) requires tower numerics to match the reference
within tolerance once weights are converted.  These tests construct torch
models locally (no hub access needed), convert their random weights through
the same converters used for the real artifacts, and compare forward passes.

BERT: vs transformers.BertModel (the reference's exact text tower class,
reference: mmgclip/networks/encoder.py:138).
ConvNeXt: vs transformers.ConvNextModel (same topology as the torchvision
ConvNeXt-Tiny the reference's TorchScript artifact derives from).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from mmgclip_tpu.models.bert import BertConfig, eos_pool, init_bert, load_hf_weights
from mmgclip_tpu.models.convnext import ConvNeXtConfig, init_convnext, load_torchvision_weights

pytestmark = pytest.mark.slow  # heavy jit/e2e tier; fast tier: -m 'not slow'


def test_bert_matches_transformers_bert():
    hf_config = transformers.BertConfig(
        vocab_size=200,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=96,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.BertModel(hf_config, add_pooling_layer=False).eval()

    config = BertConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=96,
    )
    module, params = init_bert(config)
    params = load_hf_weights(params, hf_model.state_dict(), config)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 200, size=(3, 24))
    mask = np.ones((3, 24), np.int64)
    mask[0, 18:] = 0
    mask[2, 10:] = 0

    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    ours = np.asarray(
        module.apply(
            params,
            jnp.asarray(ids, jnp.int32),
            attention_mask=jnp.asarray(mask, jnp.int32),
            deterministic=True,
        )
    )

    # compare only non-pad positions (HF computes garbage at padded queries,
    # which EOS pooling never reads)
    for b in range(3):
        valid = int(mask[b].sum())
        np.testing.assert_allclose(ours[b, :valid], theirs[b, :valid], atol=2e-4)

    # EOS pooling picks the same vectors
    pooled = np.asarray(eos_pool(jnp.asarray(ours), jnp.asarray(mask)))
    for b in range(3):
        valid = int(mask[b].sum())
        np.testing.assert_allclose(pooled[b], theirs[b, valid - 1], atol=2e-4)


def _hf_convnext_to_torchvision_names(state_dict, depths):
    """transformers.ConvNextModel names -> torchvision convnext names."""
    out = {}
    out["features.0.0.weight"] = state_dict["embeddings.patch_embeddings.weight"]
    out["features.0.0.bias"] = state_dict["embeddings.patch_embeddings.bias"]
    out["features.0.1.weight"] = state_dict["embeddings.layernorm.weight"]
    out["features.0.1.bias"] = state_dict["embeddings.layernorm.bias"]
    stage_idx = [1, 3, 5, 7]
    down_idx = [None, 2, 4, 6]
    for stage, depth in enumerate(depths):
        if stage > 0:
            di = down_idx[stage]
            pre = f"encoder.stages.{stage}.downsampling_layer"
            out[f"features.{di}.0.weight"] = state_dict[f"{pre}.0.weight"]
            out[f"features.{di}.0.bias"] = state_dict[f"{pre}.0.bias"]
            out[f"features.{di}.1.weight"] = state_dict[f"{pre}.1.weight"]
            out[f"features.{di}.1.bias"] = state_dict[f"{pre}.1.bias"]
        si = stage_idx[stage]
        for b in range(depth):
            pre = f"encoder.stages.{stage}.layers.{b}"
            tgt = f"features.{si}.{b}"
            out[f"{tgt}.block.0.weight"] = state_dict[f"{pre}.dwconv.weight"]
            out[f"{tgt}.block.0.bias"] = state_dict[f"{pre}.dwconv.bias"]
            out[f"{tgt}.block.2.weight"] = state_dict[f"{pre}.layernorm.weight"]
            out[f"{tgt}.block.2.bias"] = state_dict[f"{pre}.layernorm.bias"]
            out[f"{tgt}.block.3.weight"] = state_dict[f"{pre}.pwconv1.weight"]
            out[f"{tgt}.block.3.bias"] = state_dict[f"{pre}.pwconv1.bias"]
            out[f"{tgt}.block.5.weight"] = state_dict[f"{pre}.pwconv2.weight"]
            out[f"{tgt}.block.5.bias"] = state_dict[f"{pre}.pwconv2.bias"]
            out[f"{tgt}.layer_scale"] = state_dict[f"{pre}.layer_scale_parameter"]
    return out


def test_convnext_matches_transformers_convnext():
    depths = (2, 2, 3, 2)
    dims = (16, 32, 64, 128)
    hf_config = transformers.ConvNextConfig(
        num_channels=3, hidden_sizes=list(dims), depths=list(depths), drop_path_rate=0.0
    )
    torch.manual_seed(0)
    hf_model = transformers.ConvNextModel(hf_config).eval()

    config = ConvNeXtConfig(depths=depths, dims=dims, num_classes=2)
    module, params = init_convnext(config, image_size=32)
    mapped = _hf_convnext_to_torchvision_names(hf_model.state_dict(), depths)
    params = load_torchvision_weights(params, mapped, config)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()

    ours = np.asarray(module.apply(params, jnp.asarray(x), pool=False))
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), atol=3e-4)

    # pooled features match mean over spatial dims
    pooled = np.asarray(module.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(pooled, theirs.mean(axis=(2, 3)), atol=3e-4)


def test_gpt_tower_matches_transformers_biogpt():
    from mmgclip_tpu.models.gpt import GPTConfig, init_gpt, load_biogpt_weights

    hf_config = transformers.BioGptConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.BioGptModel(hf_config).eval()

    config = GPTConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64,
    )
    module, params = init_gpt(config)
    params = load_biogpt_weights(params, hf_model.state_dict(), config)

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 256, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0

    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    ours = np.asarray(
        module.apply(params, jnp.asarray(ids, jnp.int32), attention_mask=jnp.asarray(mask, jnp.int32))
    )
    for b in range(2):
        valid = int(mask[b].sum())
        np.testing.assert_allclose(ours[b, :valid], theirs[b, :valid], atol=3e-4)


def test_convnext_npz_artifact_roundtrip(tmp_path):
    """The production weight path: torch state dict -> converter -> serialized
    .npz -> load_convnext_tower -> features match the torch oracle."""
    from flax import serialization

    from mmgclip_tpu.config import Config
    from mmgclip_tpu.ingest.encode import load_convnext_tower

    depths, dims = (1, 1, 2, 1), (8, 16, 32, 768)
    hf_config = transformers.ConvNextConfig(
        num_channels=1, hidden_sizes=list(dims), depths=list(depths), drop_path_rate=0.0
    )
    torch.manual_seed(0)
    hf_model = transformers.ConvNextModel(hf_config).eval()

    config = ConvNeXtConfig(depths=depths, dims=dims, num_classes=2, in_channels=1)
    module, params = init_convnext(config, image_size=32)
    mapped = _hf_convnext_to_torchvision_names(hf_model.state_dict(), depths)
    params = load_torchvision_weights(params, mapped, config)

    artifact = tmp_path / "clf.npz"
    artifact.write_bytes(serialization.to_bytes(jax.device_get(params)))

    cfg = Config(
        {
            "networks": {
                "image_encoder": {
                    "name": "ConvNextTiny",
                    "convnext_tiny_clf_path": str(artifact),
                    "image_features_dimension": 768,
                    "config": {"micro": True, "in_channels": 1},
                }
            }
        }
    )
    loaded_module, loaded_params, _cn = load_convnext_tower(cfg)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)
    ours = np.asarray(loaded_module.apply(loaded_params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs.mean(axis=(2, 3)), atol=3e-4)


def test_load_convnext_tower_adapts_stem_channels(tmp_path):
    """A converted GRAYSCALE artifact (the reference's product ConvNeXt has a
    1-channel stem) must load into a tower whose config did not say
    in_channels=1: flax from_bytes restores by tree structure without shape
    checks, so without adaptation the mismatch only explodes at apply time
    (the reproduce-flow bug this pins down)."""
    from flax import serialization

    from mmgclip_tpu.config import Config
    from mmgclip_tpu.ingest.encode import load_convnext_tower

    gray = dataclasses.replace(ConvNeXtConfig.micro(), in_channels=1)
    _module, params = init_convnext(gray, image_size=32)
    artifact = tmp_path / "gray_clf.npz"
    artifact.write_bytes(serialization.to_bytes(jax.device_get(params)))

    cfg = Config(
        {
            "networks": {
                "image_encoder": {
                    "name": "ConvNextTiny",
                    "convnext_tiny_clf_path": str(artifact),
                    "image_features_dimension": 768,
                    # note: no in_channels override — the loader must adapt
                    "config": {"micro": True},
                }
            }
        }
    )
    loaded_module, loaded_params, cn = load_convnext_tower(cfg)
    assert cn.in_channels == 1
    assert loaded_module.config.in_channels == 1
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    feats = np.asarray(loaded_module.apply(loaded_params, jnp.asarray(x)))
    assert feats.shape == (2, gray.dims[-1]) and np.isfinite(feats).all()
