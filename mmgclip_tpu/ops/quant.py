"""Int8 quantized matmul path for the encode tower.

The v5e MXU executes int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs
197 TFLOP/s), which is the stated route past the 5k img/s north star
(BASELINE.json) once the program is compute-bound.  This module implements
AQT-style dynamic symmetric quantization: activations per-tensor, weights
per-output-channel, int32 accumulation via ``dot_general``'s
``preferred_element_type``, dequantized by the product of the two scales.
No reference counterpart (the reference runs torch float32 end to end —
mmgclip/networks/image_features.py:95-101); the feature-error bound vs the
bf16 tower is tested (tests/test_quant.py) and reported by the bench.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def int8_quantize(x, axis=None, eps=1e-8):
    """Symmetric int8 quantization.  ``axis``: reduction axes for the scale
    (None = per-tensor); returns (q int8, scale f32 broadcastable to x)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dot(x, w, out_dtype=jnp.bfloat16):
    """``x @ w`` with int8 inputs and int32 accumulation on the MXU.

    x: [..., c] activations (dynamic per-tensor scale);
    w: [c, f] weights (per-output-channel scale).
    Returns [..., f] in ``out_dtype``.
    """
    xq, xs = int8_quantize(x)  # scalar scale
    wq, ws = int8_quantize(w, axis=0)  # [1, f]
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (xs * ws)).astype(out_dtype)
