"""Pallas depthwise 7x7 convolution (the ConvNeXt block's spatial mixer).

XLA lowers grouped convs through its generic conv emitter; on TPU the
depthwise case is memory-bound VPU work that benefits from an explicit
kernel: each program holds one image's zero-padded activation in VMEM and
accumulates the 49 taps as shifted multiply-adds — no im2col
materialization, one HBM read per input element.  ConvNeXt stage
activations (<=64x64x96 ... 8x8x768 after the stem) fit VMEM comfortably.

NHWC, stride 1, SAME padding, kernel [7, 7, 1, C] (flax/HWIO depthwise
layout).  `depthwise_conv7x7` falls back to `lax.conv_general_dilated` for
shapes that don't tile (C % 128 != 0, tiny spatial) and on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7
HALO = K // 2  # 3


def _dw_kernel(x_ref, w_ref, b_ref, o_ref):
    """x_ref: [1, H + 2*HALO, W + 2*HALO, C] zero-padded image;
    w_ref: [K, K, 1, C]; b_ref: [1, C]; o_ref: [1, H, W, C]."""
    x = x_ref[0]
    h_pad, w_pad, c = x.shape
    height = h_pad - 2 * HALO
    width = w_pad - 2 * HALO

    acc = jnp.zeros((height, width, c), jnp.float32)
    for ky in range(K):
        for kx in range(K):
            tap = w_ref[ky, kx, 0, :].astype(jnp.float32)
            window = x[ky : ky + height, kx : kx + width, :].astype(jnp.float32)
            acc = acc + window * tap
    o_ref[0] = (acc + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dw_call(x, w, b, interpret):
    n, h, width, c = x.shape
    xp = jnp.pad(x, ((0, 0), (HALO, HALO), (HALO, HALO), (0, 0)))

    return pl.pallas_call(
        _dw_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, h + 2 * HALO, width + 2 * HALO, c),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((K, K, 1, c), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, width, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(xp, w, b.reshape(1, c))


def depthwise_conv7x7(x, w, b=None, interpret: bool = False):
    """Depthwise 7x7, stride 1, SAME.  x: [n, h, w, c]; w: [7, 7, 1, c]."""
    n, h, width, c = x.shape
    if b is None:
        b = jnp.zeros((c,), x.dtype)

    # VMEM budget: padded input + the fp32 accumulator + the output block +
    # one shifted-window temporary — the earlier padded-in/out-only estimate
    # undercounted ~50% and let near-bound shapes reach Mosaic allocation
    # failures instead of the lax fallback
    vmem_bytes = ((h + 2 * HALO) * (width + 2 * HALO) * c * 4
                  + 3 * h * width * c * 4)
    usable = (
        (interpret or jax.default_backend() == "tpu")
        and c % 128 == 0
        and vmem_bytes < 12 * 1024 * 1024
    )
    if not usable:
        return (
            jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            )
            + b.astype(x.dtype)
        )
    return _dw_call(x, w.astype(x.dtype), b.astype(x.dtype), interpret)
