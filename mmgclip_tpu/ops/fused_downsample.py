"""Fused LayerNorm + 2x2/2 downsample conv: the remaining inter-stage glue.

With the residual blocks fused (ops/fused_block.py), the per-layer v5e
roofline (bench.py `v5e_fused_per_stage`, `time_frac`) attributes most of
the remaining gap to speed-of-light to the UNFUSED stem/downsample glue —
and the downsample LayerNorms are its largest movable term: the lax path
reads and writes the FULL-resolution tensor once for the LN and again for
the strided conv (~4 element-passes).  This kernel runs

    y = conv2x2_stride2(LayerNorm(x))        (models/convnext.py downsample)

as one Pallas program: the LN output lives only in VMEM, so HBM traffic
drops to one read of x + one write of the 4x-smaller y (~1.25 passes).

Structure: grid (n, out-bands).  Stride == kernel means output rows never
share input rows — no halo, one input band block of 2*band_h rows per
program.  Mosaic cannot deinterleave lanes or sublanes in-kernel (strided
vector slices are rejected), so the dx pairing happens OUTSIDE via a FREE
minor-dim view reshape ([n,H,W,C] -> [n,H,W/2,2C]: a bitcast in XLA) — the
two dx halves are then contiguous lane slices.  Per row-chunk: LN in fp32
per original pixel, zero rows/cols beyond the true (h, w) (reproducing the
model's LN-then-zero-pad order at odd sizes exactly), dy parities split by
a major-dim reshape, and FOUR [rows*w_out, cin] @ [cin, cout] MXU matmuls
(one per 2x2 tap) accumulate with the bias.

The op is differentiable (custom_vjp through the identical-math lax path)
and falls back to that path off-TPU or when no band fits VMEM, mirroring
fused_block's gate.  Reference chain being replaced: the torchvision
ConvNeXt downsample blocks the reference's TorchScript artifact runs
(mmgclip/networks/image_features.py:95-101 via encoder.py:40-55).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banding import (
    CHUNK_BUDGET as _CHUNK_BUDGET,
    VMEM_BUDGET as _VMEM_BUDGET,
    largest_fitting_divisor,
    pick_tile,
    scan_padded_heights,
)


def _pick_tile(bh: int, w_out: int, cin: int, cout: int) -> int:
    """Largest divisor of `bh` whose fp32 chunk intermediates fit
    (module-level _CHUNK_BUDGET/_VMEM_BUDGET stay patchable test knobs)."""
    return pick_tile(bh, (2 * w_out * 2 * cin + w_out * cout) * 4, _CHUNK_BUDGET)


def _working_set(bh, w_in, cin, cout, dtype_bytes, tile):
    io = 2 * (2 * bh * w_in * cin + bh * (w_in // 2) * cout) * dtype_bytes
    weights = (4 * cin * cout + cout + 2 * cin) * dtype_bytes
    chunk = (2 * tile * w_in * cin + tile * (w_in // 2) * cout) * 4
    return io + weights + chunk


def _pick_band(h_out, w_in, cin, cout, dtype_bytes):
    """(h_out_pad, band) — smallest padding with the largest fitting band of
    output rows; None when even a 1-row band exceeds VMEM."""

    def band_for(h_pad):
        return largest_fitting_divisor(
            h_pad,
            lambda band: _working_set(
                band, w_in, cin, cout, dtype_bytes,
                _pick_tile(band, w_in // 2, cin, cout),
            ) < _VMEM_BUDGET,
        )

    return scan_padded_heights(max(h_out, 2), 8, band_for)


def _kernel(x_ref, ns_ref, nb_ref, k_ref, b_ref, o_ref, *,
            tile: int, h_valid: int, w_valid: int, eps: float):
    """x_ref [1, 2*BH, Wp/2, 2*Cin] input band — the ARRAY was view-reshaped
    OUTSIDE the kernel so each lane row holds a (dx=0, dx=1) column pair (a
    free minor-dim merge in XLA; Mosaic cannot deinterleave lanes/sublanes
    in-kernel).  o_ref [1, BH, Wp/2, Cout]; k_ref [2, 2, Cin, Cout].

    Per chunk: the two dx halves come off contiguous lane slices, LayerNorm
    runs per original pixel (fp32), rows/cols beyond the true (h, w) zero
    POST-LN (the model zero-pads after the norm at odd sizes), the dy
    parities split by a MAJOR-dim reshape, and four [rows, Cin] @
    [Cin, Cout] MXU matmuls accumulate the 2x2 taps."""
    bh, w_out, cout = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
    cin = k_ref.shape[2]
    band = pl.program_id(1)
    ns = ns_ref[0].astype(jnp.float32)
    nb = nb_ref[0].astype(jnp.float32)
    bias = b_ref[0].astype(jnp.float32)

    def layernorm(v):
        mean = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=-1, keepdims=True)
        return (v - mean) * jax.lax.rsqrt(var + eps) * ns + nb

    def chunk(i, _):
        r0 = pl.multiple_of(i * tile, tile)
        rows = x_ref[0, pl.ds(2 * r0, 2 * tile), :, :].astype(jnp.float32)
        row0 = (band * bh + r0) * 2
        rids = row0 + jax.lax.broadcasted_iota(
            jnp.int32, (2 * tile, w_out, cin), 0)
        cols2 = 2 * jax.lax.broadcasted_iota(
            jnp.int32, (2 * tile, w_out, cin), 1)
        acc = jnp.broadcast_to(bias, (tile * w_out, cout))
        for dx in (0, 1):
            half = rows[:, :, dx * cin : (dx + 1) * cin]  # contiguous lanes
            y = layernorm(half)
            # zero beyond the true image: LN-then-pad order, exact odd sizes
            y = jnp.where((rids < h_valid) & (cols2 + dx < w_valid), y, 0.0)
            y4 = y.reshape(tile, 2, w_out, cin)  # dy split on the major dim
            for dy in (0, 1):
                part = y4[:, dy, :, :].reshape(tile * w_out, cin)
                w_tap = k_ref[dy, dx]
                acc = acc + jnp.dot(part.astype(w_tap.dtype), w_tap,
                                    preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(r0, tile), :, :] = acc.reshape(
            tile, w_out, cout).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bh // tile, chunk, 0)


@functools.partial(jax.jit, static_argnames=(
    "band", "tile", "h_valid", "w_valid", "eps", "interpret"))
def _fused_call(x, ns, nb, kernel, b, *, band, tile, h_valid, w_valid, eps,
                interpret):
    n, h2, w_in, cin = x.shape  # h2 = 2 * h_out_pad, w_in even
    h_out, w_out, cout = h2 // 2, w_in // 2, kernel.shape[3]
    n_bands = h_out // band
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    # free minor-dim merge: lanes hold (dx, ci) pairs so the kernel never
    # needs a strided deinterleave (unsupported in Mosaic)
    xr = x.reshape(n, h2, w_out, 2 * cin)

    def vspec(shape):
        return pl.BlockSpec(shape, lambda i, bb: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, tile=tile, h_valid=h_valid,
                          w_valid=w_valid, eps=eps),
        grid=(n, n_bands),
        in_specs=[
            pl.BlockSpec((1, 2 * band, w_out, 2 * cin),
                         lambda i, bb: (i, bb, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec((1, cin)), vspec((1, cin)),
            vspec((2, 2, cin, cout)),
            vspec((1, cout)),
        ],
        out_specs=pl.BlockSpec((1, band, w_out, cout),
                               lambda i, bb: (i, bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, cout), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xr, row(ns), row(nb), kernel, row(b))


def _lax_ln_downsample(x, ns, nb, kernel, bias, eps=1e-6):
    """Identical-math lax path: models/convnext.py downsample body
    (LayerNorm -> bottom/right-padded 2x2/2 conv).  LN in fp32, like
    nn.LayerNorm promotes with its fp32 params."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps) * ns.astype(jnp.float32)
         + nb.astype(jnp.float32)).astype(dt)
    h, w = x.shape[1], x.shape[2]
    pad = ((0, (-h) % 2), (0, (-w) % 2))
    return jax.lax.conv_general_dilated(
        y, kernel.astype(dt), (2, 2), ((0, pad[0][1]), (0, pad[1][1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(dt)


# tests flip this to drive the REAL kernel (interpret mode) off-TPU
FORCE_INTERPRET = False


def kernel_available(shape, cout: int, dtype_itemsize: int,
                     interpret: bool = False) -> bool:
    """True iff fused_ln_downsample would take the KERNEL path for this
    input.  The model gates on this so the off-TPU/unfittable fallback runs
    the ORIGINAL flax LayerNorm+Conv modules — keeping the use_fused_blocks
    knob byte-neutral off TPU (the fused-block contract)."""
    if not (interpret or FORCE_INTERPRET or jax.default_backend() == "tpu"):
        return False
    _n, h, w, cin = shape
    return _pick_band(-(-h // 2), w + (w % 2), cin, cout,
                      dtype_itemsize) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ln_downsample(x, ns, nb, kernel, bias, interpret=False):
    """LayerNorm + 2x2/2 conv, VMEM-fused.  x: [n, h, w, cin] NHWC;
    kernel: [2, 2, cin, cout].  Odd h/w follow the model's LN-then-zero-pad
    (bottom/right) convention exactly.  Kernel on TPU (or interpret) when a
    band fits VMEM; identical-math lax fallback otherwise."""
    return _route(x, ns, nb, kernel, bias, interpret=interpret)


def _route(x, ns, nb, kernel, bias, *, interpret):
    interpret = interpret or FORCE_INTERPRET
    n, h, w, cin = x.shape
    cout = kernel.shape[3]
    h_out, w_pad = -(-h // 2), w + (w % 2)
    backend_ok = interpret or jax.default_backend() == "tpu"
    if backend_ok:
        picked = _pick_band(h_out, w_pad, cin, cout, x.dtype.itemsize)
        if picked is not None:
            h_out_pad, band = picked
            xp = jnp.pad(x, ((0, 0), (0, 2 * h_out_pad - h),
                             (0, w_pad - w), (0, 0)))
            out = _fused_call(
                xp, ns, nb, kernel, bias, band=band,
                tile=_pick_tile(band, w_pad // 2, cin, cout),
                h_valid=h, w_valid=w, eps=1e-6, interpret=interpret)
            return out[:, :h_out]
    return _lax_ln_downsample(x, ns, nb, kernel, bias)


def _fwd(x, ns, nb, kernel, bias, interpret):
    out = fused_ln_downsample(x, ns, nb, kernel, bias, interpret)
    return out, (x, ns, nb, kernel, bias)


def _bwd(interpret, residuals, ct):
    _, vjp = jax.vjp(_lax_ln_downsample, *residuals)
    return vjp(ct)


fused_ln_downsample.defvjp(_fwd, _bwd)
