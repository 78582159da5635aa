"""Int8 quantized encode path (ops/quant.py + ConvNeXtConfig.quant)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmgclip_tpu.models.convnext import ConvNeXt, ConvNeXtConfig, init_convnext
from mmgclip_tpu.ops.quant import int8_dot, int8_quantize


def test_int8_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    q, scale = int8_quantize(x)
    assert q.dtype == jnp.int8
    recon = np.asarray(q, np.float32) * np.asarray(scale)
    err = np.abs(recon - np.asarray(x)).max()
    assert err <= float(np.abs(np.asarray(x)).max()) / 127.0 + 1e-6


def test_int8_dot_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 64)) * 0.05, jnp.float32)
    exact = np.asarray(jnp.einsum("bhwc,cf->bhwf", x, w))
    quant = np.asarray(int8_dot(x, w, out_dtype=jnp.float32))
    denom = np.abs(exact).max()
    assert np.abs(quant - exact).max() / denom < 0.05


def test_int8_tower_feature_deviation_bounded():
    """The quantized tower's pooled features stay close to the bf16 tower's
    (the bound the bench reports as int8_max_feature_rel_err)."""
    config = ConvNeXtConfig(depths=(2, 2), dims=(32, 64), in_channels=1,
                            dtype=jnp.float32)
    module, params = init_convnext(config, seed=0, image_size=32)
    q_module = ConvNeXt(ConvNeXtConfig(depths=(2, 2), dims=(32, 64), in_channels=1,
                                       dtype=jnp.float32, quant="int8"))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, size=(4, 32, 32, 1)), jnp.float32)
    ref = np.asarray(jax.jit(module.apply)(params, x))
    quant = np.asarray(jax.jit(q_module.apply)(params, x))
    assert quant.shape == ref.shape
    # cosine similarity per image + bounded relative error
    cos = np.sum(ref * quant, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(quant, axis=-1)
    )
    assert cos.min() > 0.99
    rel = np.abs(quant - ref).max() / np.abs(ref).max()
    assert rel < 0.2
