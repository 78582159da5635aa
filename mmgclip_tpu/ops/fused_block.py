"""Fused ConvNeXt-block Pallas kernel: the whole residual block in VMEM.

The per-layer v5e roofline (bench.py, BENCH_r03) shows the encode tower is
HBM-bound in stages 0-2 because every block intermediate — the dwconv
output, the LayerNorm output, and the 4x-expanded pw1/GELU tensor — makes a
round trip through HBM: ~25 element-passes of HBM traffic per block in the
unfused lax path.  This kernel runs the ENTIRE ConvNeXt block

    y = x + gamma * pw2(gelu(pw1(LN(dwconv7x7(x)))))

(reference loop being replaced: mmgclip/networks/image_features.py:87-117)
as one Pallas program per image with every intermediate VMEM-resident:
HBM traffic drops to one read of x and one write of y (~2 element-passes,
plus batch-amortized weights).

Structure per program (one image):
  * the input block is zero-extended into a [H+6, W+6, C] VMEM scratch —
    the SAME-padding halo is materialized on-chip, never in HBM;
  * output rows are produced in row-chunks: for each chunk the 49 dwconv
    taps accumulate in fp32, LayerNorm normalizes over C, and the chunk's
    [rows*W, C] matrix rides the MXU through pw1 -> GELU -> pw2 — the
    4C-wide intermediate only ever exists for one chunk;
  * layer-scale gamma and the residual add finish in registers before the
    single HBM write.

`fused_convnext_block` is differentiable: forward runs the kernel, backward
re-derives gradients through the mathematically identical lax path (the
image tower is frozen in every shipped training config, so the bwd path is
a correctness safety net, not a hot path).  Images whose whole-image
working set exceeds VMEM — the reference encodes mammograms at NATIVE
resolution (mmgclip/networks/image_features.py:28, ToTensor only, no
resize), so large shape buckets are the product norm — run the ROW-BANDED
grid instead (`_kernel_banded`): one program per [band_h, W, C] output
band, halo assembled in VMEM from prev/cur/next BlockSpec blocks.  Heights
with no usable band divisor (most real FFDM shapes) are zero-padded at the
bottom to the nearest band-friendly height — exact under SAME padding, see
`_pad_to_band` — so on TPU the op only falls back to the lax path when even
the smallest band exceeds VMEM (and always on non-TPU backends).
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

K = 7
HALO = K // 2  # 3


def _pick_tile_h(h: int, w: int, c: int) -> int:
    """Largest divisor of `h` whose 4C-wide fp32 MLP chunk fits the budget
    (module-level _CHUNK_BUDGET/_VMEM_BUDGET stay patchable knobs — tests
    shrink them to force multi-chunk/banded routing on tiny shapes)."""
    return pick_tile(h, w * 4 * c * 4, _CHUNK_BUDGET)


def _erf(x):
    """fp32 erf via the Abramowitz-Stegun 7.1.26 rational approximation
    (max abs error 1.5e-7 — far below bf16 resolution), spelled with exp
    only: Mosaic lowers neither the erf nor the erfc primitive on TPU."""
    p = np.float32(0.3275911)
    a1, a2, a3, a4, a5 = (np.float32(v) for v in
                          (0.254829592, -0.284496736, 1.421413741,
                           -1.453152027, 1.061405429))
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x, tanh_approx: bool):
    """GELU on the in-kernel fp32 intermediate.

    exact (default): 0.5*x*(1+erf(x/sqrt(2))) via the A&S erf above —
    byte-level parity target is jax.nn.gelu(approximate=False).
    tanh: the standard tanh approximation (max abs error ~3e-4, an order
    below bf16 resolution at GELU-active magnitudes) — it drops the A&S
    rational poly, cutting the VPU cost of the block's largest elementwise
    pass (the 4C-wide tensor).  The per-layer v5e roofline prices the
    difference (bench.py: stages 0/1 are VPU-bound once fused)."""
    if not tanh_approx:
        return 0.5 * x * (1.0 + _erf(x * np.float32(1 / np.sqrt(2))))
    c0 = np.float32(np.sqrt(2.0 / np.pi))
    c1 = np.float32(0.044715)
    return 0.5 * x * (1.0 + jnp.tanh(c0 * (x + c1 * x * x * x)))


def _quantize_chunk(y):
    """In-kernel dynamic symmetric int8 quantization (per-chunk scale).

    Mirrors ops/quant.py::int8_quantize's per-tensor scheme at chunk
    granularity — a strictly finer partition, so the error bound can only
    tighten vs the unfused int8 path."""
    amax = jnp.max(jnp.abs(y))
    scale = jnp.maximum(amax, np.float32(1e-8)) * np.float32(1.0 / 127.0)
    q = jnp.clip(jnp.round(y / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _split_rest(rest, quant: bool):
    """Unpack the trailing (weights..., o_ref, xpad_ref) refs shared by the
    whole-image and banded kernels.  ``quant=False`` rest:
    (w1, b1, w2, b2, g, o, xpad); ``quant=True`` rest:
    (w1q, ws1, b1, w2q, ws2, b2, g, o, xpad) with int8 per-output-channel-
    scaled weights and int32 MXU accumulation — the v5e runs int8 x int8 at
    2x the bf16 MXU rate, and with every quantize/dequantize VMEM-resident
    the unfused int8 path's extra HBM round trips (the reason it measured
    as a slowdown) disappear."""
    if quant:
        (w1_ref, ws1_ref, b1_ref, w2_ref, ws2_ref, b2_ref,
         g_ref, o_ref, xpad_ref) = rest
        scales = (ws1_ref[0].astype(jnp.float32), ws2_ref[0].astype(jnp.float32))
    else:
        w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref, xpad_ref = rest
        scales = (None, None)
    return w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref, xpad_ref, scales


def _chunk_loop(xpad_ref, o_ref, dwk_ref, consts, *, rows: int, tile_h: int,
                w: int, c: int, eps: float, quant: bool, gelu_tanh: bool):
    """Produce `rows` output rows in `tile_h`-row chunks.

    Output row r (written to o_ref[0, r]) is computed from xpad rows
    [r, r+7) — xpad row r+HALO holds image row r, so the taps see the
    SAME-padding window and the residual is read from xpad's interior
    (identical values to the input block, one buffer instead of two)."""
    (dw_bias, n_scale, n_bias, w1, b1, w2, b2, gamma, ws1, ws2) = consts

    def chunk(i, _):
        r0 = pl.multiple_of(i * tile_h, tile_h)
        # --- depthwise 7x7: 49 shifted multiply-adds, fp32 accumulation
        acc = jnp.zeros((tile_h, w, c), jnp.float32)
        for ky in range(K):
            for kx in range(K):
                tap = dwk_ref[ky, kx, 0, :].astype(jnp.float32)
                win = xpad_ref[pl.ds(r0 + ky, tile_h), kx : kx + w, :]
                acc = acc + win.astype(jnp.float32) * tap
        acc = acc + dw_bias
        # --- LayerNorm over C
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(acc - mean), axis=-1, keepdims=True)
        y = (acc - mean) * jax.lax.rsqrt(var + eps) * n_scale + n_bias
        # --- MLP on the MXU; the 4C intermediate lives only for this chunk
        if quant:
            yq, ys = _quantize_chunk(y.reshape(tile_h * w, c))
            hmid = jnp.dot(yq, w1, preferred_element_type=jnp.int32)
            hmid = hmid.astype(jnp.float32) * (ys * ws1) + b1
        else:
            y2 = y.astype(w1.dtype).reshape(tile_h * w, c)
            hmid = jnp.dot(y2, w1, preferred_element_type=jnp.float32) + b1
        # GELU spelled in-kernel (Mosaic lowers neither the erf nor the
        # erfc primitive that jax.nn.gelu uses); gelu_tanh trades the A&S
        # poly for the cheaper tanh form on the 4C-wide tensor
        hmid = _gelu(hmid, gelu_tanh)
        if quant:
            hq, hs = _quantize_chunk(hmid)
            out = jnp.dot(hq, w2, preferred_element_type=jnp.int32)
            out = out.astype(jnp.float32) * (hs * ws2) + b2
        else:
            out = jnp.dot(hmid.astype(w2.dtype), w2,
                          preferred_element_type=jnp.float32) + b2
        out = out.reshape(tile_h, w, c) * gamma
        # --- layer scale + residual, single HBM write
        residual = xpad_ref[pl.ds(r0 + HALO, tile_h), HALO : HALO + w, :]
        o_ref[0, pl.ds(r0, tile_h), :, :] = (
            residual.astype(jnp.float32) + out).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows // tile_h, chunk, 0)


def _load_consts(dwb_ref, ns_ref, nb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 g_ref, scales):
    return (dwb_ref[0].astype(jnp.float32),
            ns_ref[0].astype(jnp.float32),
            nb_ref[0].astype(jnp.float32),
            w1_ref[:], b1_ref[0].astype(jnp.float32),
            w2_ref[:], b2_ref[0].astype(jnp.float32),
            g_ref[0].astype(jnp.float32), scales[0], scales[1])


def _kernel(x_ref, dwk_ref, dwb_ref, ns_ref, nb_ref, *rest,
            tile_h: int, eps: float, quant: bool, gelu_tanh: bool = False):
    """Whole-image program: x_ref/o_ref [1, H, W, C] VMEM blocks;
    xpad_ref [H+6, W+6, C] VMEM scratch (see _split_rest for `rest`)."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    (w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref, xpad_ref,
     scales) = _split_rest(rest, quant)

    # materialize the SAME-padding halo on-chip
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[HALO : HALO + h, HALO : HALO + w, :] = x_ref[0]

    consts = _load_consts(dwb_ref, ns_ref, nb_ref, w1_ref, b1_ref, w2_ref,
                          b2_ref, g_ref, scales)
    _chunk_loop(xpad_ref, o_ref, dwk_ref, consts, rows=h, tile_h=tile_h,
                w=w, c=c, eps=eps, quant=quant, gelu_tanh=gelu_tanh)


def _kernel_banded(xm_ref, xc_ref, xn_ref, dwk_ref, dwb_ref, ns_ref, nb_ref,
                   *rest, n_bands: int, tile_h: int, eps: float, quant: bool,
                   gelu_tanh: bool = False):
    """Row-banded program for images whose whole-image working set exceeds
    VMEM: grid (n, n_bands), each program produces one [band_h, W, C]
    output band.  The input arrives as THREE BlockSpec-fed band blocks —
    previous / current / next, with edge bands clamped by the index map —
    so Mosaic's automatic pipeline double-buffers the HBM reads; the 7x7
    halo (3 rows each side) is assembled in the [band_h+6, W+6, C] scratch
    from the neighbor blocks.  Clamped edge blocks are simply not copied
    (the scratch is pre-zeroed = SAME padding).  Extra HBM cost vs the
    whole-image kernel: x is read ~3x instead of 1x — still ~8x less
    traffic than the unfused path's ~25 element-passes, and the large
    early stages this serves are VPU-bound, not HBM-bound."""
    bh, w, c = xc_ref.shape[1], xc_ref.shape[2], xc_ref.shape[3]
    (w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref, xpad_ref,
     scales) = _split_rest(rest, quant)
    b = pl.program_id(1)

    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[HALO : HALO + bh, HALO : HALO + w, :] = xc_ref[0]

    @pl.when(b > 0)
    def _top_halo():
        xpad_ref[0:HALO, HALO : HALO + w, :] = xm_ref[0, bh - HALO : bh, :, :]

    @pl.when(b < n_bands - 1)
    def _bottom_halo():
        xpad_ref[HALO + bh : bh + 2 * HALO, HALO : HALO + w, :] = \
            xn_ref[0, 0:HALO, :, :]

    consts = _load_consts(dwb_ref, ns_ref, nb_ref, w1_ref, b1_ref, w2_ref,
                          b2_ref, g_ref, scales)
    _chunk_loop(xpad_ref, o_ref, dwk_ref, consts, rows=bh, tile_h=tile_h,
                w=w, c=c, eps=eps, quant=quant, gelu_tanh=gelu_tanh)


@functools.partial(jax.jit, static_argnames=("tile_h", "eps", "interpret", "gelu_tanh"))
def _fused_call(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, *, tile_h, eps, interpret,
                gelu_tanh=False):
    n, h, w, c = x.shape
    row = lambda v: v.reshape(1, -1)  # noqa: E731 - 2D for clean (sublane, lane) layout

    def vspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, eps=eps, quant=False,
                          gelu_tanh=gelu_tanh),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            vspec((K, K, 1, c)),
            vspec((1, c)), vspec((1, c)), vspec((1, c)),
            vspec((c, 4 * c)), vspec((1, 4 * c)),
            vspec((4 * c, c)), vspec((1, c)),
            vspec((1, c)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2 * HALO, w + 2 * HALO, c), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(x, dwk, row(dwb), row(ns), row(nb), w1, row(b1), w2, row(b2), row(g))


@functools.partial(jax.jit, static_argnames=("tile_h", "eps", "interpret", "gelu_tanh"))
def _fused_call_int8(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, *, tile_h, eps,
                     interpret, gelu_tanh=False):
    """Int8 variant: weights quantized per-output-channel OUTSIDE the kernel
    (batch-amortized, and XLA hoists it across pmapped/scanned calls);
    activations quantized per-chunk INSIDE, so nothing int8-related ever
    touches HBM."""
    from .quant import int8_quantize

    n, h, w, c = x.shape
    w1q, ws1 = int8_quantize(w1, axis=0)  # [c,4c] int8, [1,4c] f32
    w2q, ws2 = int8_quantize(w2, axis=0)  # [4c,c] int8, [1,c]  f32
    row = lambda v: v.reshape(1, -1)  # noqa: E731

    def vspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, eps=eps, quant=True,
                          gelu_tanh=gelu_tanh),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            vspec((K, K, 1, c)),
            vspec((1, c)), vspec((1, c)), vspec((1, c)),
            vspec((c, 4 * c)), vspec((1, 4 * c)), vspec((1, 4 * c)),
            vspec((4 * c, c)), vspec((1, c)), vspec((1, c)),
            vspec((1, c)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2 * HALO, w + 2 * HALO, c), x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(x, dwk, row(dwb), row(ns), row(nb),
      w1q, ws1, row(b1), w2q, ws2, row(b2), row(g))


@functools.partial(jax.jit, static_argnames=(
    "band_h", "tile_h", "eps", "interpret", "gelu_tanh", "quant"))
def _fused_call_banded(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, *, band_h,
                       tile_h, eps, interpret, gelu_tanh=False, quant=False):
    """Row-banded pallas_call: grid (n, h // band_h); the input is passed
    THREE times with prev/cur/next index maps (edge bands clamp to
    themselves and the kernel skips the copy) so the halo never touches
    HBM twice and Mosaic keeps its automatic input double-buffering."""
    n, h, w, c = x.shape
    n_bands = h // band_h
    row = lambda v: v.reshape(1, -1)  # noqa: E731

    def vspec(shape):
        return pl.BlockSpec(shape, lambda i, b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def band_spec(index_fn):
        return pl.BlockSpec((1, band_h, w, c), index_fn,
                            memory_space=pltpu.VMEM)

    x_prev = band_spec(lambda i, b: (i, jnp.maximum(b - 1, 0), 0, 0))
    x_cur = band_spec(lambda i, b: (i, b, 0, 0))
    x_next = band_spec(lambda i, b: (i, jnp.minimum(b + 1, n_bands - 1), 0, 0))

    if quant:
        from .quant import int8_quantize

        w1q, ws1 = int8_quantize(w1, axis=0)
        w2q, ws2 = int8_quantize(w2, axis=0)
        weight_specs = [vspec((c, 4 * c)), vspec((1, 4 * c)), vspec((1, 4 * c)),
                        vspec((4 * c, c)), vspec((1, c)), vspec((1, c))]
        weight_args = (w1q, ws1, row(b1), w2q, ws2, row(b2))
    else:
        weight_specs = [vspec((c, 4 * c)), vspec((1, 4 * c)),
                        vspec((4 * c, c)), vspec((1, c))]
        weight_args = (w1, row(b1), w2, row(b2))

    return pl.pallas_call(
        functools.partial(_kernel_banded, n_bands=n_bands, tile_h=tile_h,
                          eps=eps, quant=quant, gelu_tanh=gelu_tanh),
        grid=(n, n_bands),
        in_specs=[x_prev, x_cur, x_next,
                  vspec((K, K, 1, c)),
                  vspec((1, c)), vspec((1, c)), vspec((1, c)),
                  *weight_specs,
                  vspec((1, c))],
        out_specs=pl.BlockSpec((1, band_h, w, c), lambda i, b: (i, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((band_h + 2 * HALO, w + 2 * HALO, c),
                                   x.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, x, x, dwk, row(dwb), row(ns), row(nb), *weight_args, row(g))


def _lax_block(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, eps=1e-6,
               gelu_tanh=False):
    """The reference-math lax path (models/convnext.py block body)."""
    c = x.shape[-1]
    dt = x.dtype
    y = jax.lax.conv_general_dilated(
        x, dwk.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    ) + dwb.astype(dt)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    y = ((y - mean) * jax.lax.rsqrt(var + eps) * ns + nb).astype(dt)
    y = jnp.einsum("bhwc,cf->bhwf", y, w1.astype(dt)) + b1.astype(dt)
    y = jax.nn.gelu(y, approximate=gelu_tanh)
    y = jnp.einsum("bhwf,fc->bhwc", y, w2.astype(dt)) + b2.astype(dt)
    return x + g.astype(dt) * y


def _lax_block_int8(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, eps=1e-6,
                    gelu_tanh=False):
    """Reference-math int8 fallback: the unfused quant path of
    models/convnext.py (int8_dot on the two pointwise convs)."""
    from .quant import int8_dot

    c = x.shape[-1]
    dt = x.dtype
    y = jax.lax.conv_general_dilated(
        x, dwk.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    ) + dwb.astype(dt)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    y = ((y - mean) * jax.lax.rsqrt(var + eps) * ns + nb).astype(dt)
    y = int8_dot(y, w1, out_dtype=dt) + b1.astype(dt)
    y = jax.nn.gelu(y, approximate=gelu_tanh)
    y = int8_dot(y, w2, out_dtype=dt) + b2.astype(dt)
    return x + g.astype(dt) * y


def _vmem_working_set(h, w, c, dtype_bytes, tile_h):
    io_blocks = 2 * 2 * h * w * c * dtype_bytes  # in+out, double-buffered
    scratch = (h + 2 * HALO) * (w + 2 * HALO) * c * dtype_bytes
    weights = (49 * c + 8 * c * c + 7 * c) * dtype_bytes
    chunk = tile_h * w * (4 * c + 2 * c) * 4  # fp32 intermediate + dw acc
    return io_blocks + scratch + weights + chunk


def _banded_working_set(band_h, w, c, dtype_bytes, tile_h):
    # 3 input band blocks (prev/cur/next) + 1 output, all double-buffered
    io_blocks = 2 * 4 * band_h * w * c * dtype_bytes
    scratch = (band_h + 2 * HALO) * (w + 2 * HALO) * c * dtype_bytes
    weights = (49 * c + 8 * c * c + 7 * c) * dtype_bytes
    chunk = tile_h * w * (4 * c + 2 * c) * 4
    return io_blocks + scratch + weights + chunk


def _pick_band_h(h, w, c, dtype_bytes):
    """Largest divisor of `h` giving >= 2 bands of >= 2*HALO rows whose
    banded working set fits the VMEM budget; None if no divisor does
    (then the caller pads to a band-friendly height, see _pad_to_band)."""
    return largest_fitting_divisor(
        h,
        lambda band: _banded_working_set(
            band, w, c, dtype_bytes, _pick_tile_h(band, w, c)
        ) < _VMEM_BUDGET,
        lo=2 * HALO,
        hi=h // 2,
    )


def _pad_to_band(h, w, c, dtype_bytes):
    """(h_pad, band_h) making the banded kernel admissible when `h` itself
    has no usable band divisor — real mammogram shapes rarely do (the
    reference encodes at NATIVE resolution, image_features.py:28, and a
    true FFDM post-stem height like 573 = 3*191 offers no divisor in
    [6, h/2] that fits VMEM).  Scans a one-kernel-width window of padded
    heights and keeps the largest fitting band (ties -> least padding).

    Bottom ZERO-row padding is mathematically EXACT under SAME semantics:
    the pad rows are precisely the zeros SAME padding injects at the true
    bottom border (so the dwconv windows of rows [0, h) see identical
    values), and every other op in the block — LayerNorm over C, the 1x1
    pointwise convs, layer-scale, residual — is per-pixel.  Output rows
    [0, h) therefore match the unpadded run bit-for-bit; the caller slices
    the pad rows off.  Returns None only if even the smallest band exceeds
    VMEM (then the lax fallback is genuinely required)."""
    start = max(h, 4 * HALO)  # need >= 2 bands of >= 2*HALO rows
    return scan_padded_heights(
        start, 2 * K, lambda h_pad: _pick_band_h(h_pad, w, c, dtype_bytes)
    )


# tests flip this to drive the REAL kernel (interpret mode) through the
# model path on the CPU backend, where the default gate would fall back
FORCE_INTERPRET = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_convnext_block(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, interpret=False,
                         gelu_tanh=False):
    """One ConvNeXt block, VMEM-fused.  x: [n, h, w, c] NHWC.

    Kernel path on TPU (or `interpret=True`) when the per-image working set
    fits VMEM; identical-math lax fallback otherwise.  `gelu_tanh` swaps the
    exact-erf GELU for the tanh approximation IN BOTH PATHS (the fallback
    keeps byte-level parity with whatever math the kernel runs).
    Differentiable via the lax path (frozen-tower configs never take the
    backward)."""
    return _route(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g,
                  interpret=interpret, gelu_tanh=gelu_tanh, quant=False)


def _route(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, *, interpret, gelu_tanh,
           quant):
    """Shared gate: whole-image kernel when the working set fits VMEM,
    row-banded kernel when a band divisor fits, PAD-to-band + banded when it
    doesn't (exact — see _pad_to_band), lax math only when even the smallest
    band exceeds VMEM (and always off-TPU).  `quant` selects the int8
    variants throughout."""
    interpret = interpret or FORCE_INTERPRET
    n, h, w, c = x.shape
    tile_h = _pick_tile_h(h, w, c)
    backend_ok = interpret or jax.default_backend() == "tpu"
    if backend_ok:
        if _vmem_working_set(h, w, c, x.dtype.itemsize, tile_h) < _VMEM_BUDGET:
            call = _fused_call_int8 if quant else _fused_call
            return call(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g,
                        tile_h=tile_h, eps=1e-6, interpret=interpret,
                        gelu_tanh=gelu_tanh)
        band_h = _pick_band_h(h, w, c, x.dtype.itemsize)
        if band_h is not None:  # native-resolution images: row-banded grid
            return _fused_call_banded(
                x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, band_h=band_h,
                tile_h=_pick_tile_h(band_h, w, c), eps=1e-6,
                interpret=interpret, gelu_tanh=gelu_tanh, quant=quant)
        padded = _pad_to_band(h, w, c, x.dtype.itemsize)
        if padded is not None:  # divisor-free heights (true FFDM shapes):
            # zero-pad the bottom to the nearest band-friendly height — exact
            # under SAME padding (see _pad_to_band) — and slice the pad off
            h_pad, band_h = padded
            xp = jnp.pad(x, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)))
            out = _fused_call_banded(
                xp, dwk, dwb, ns, nb, w1, b1, w2, b2, g, band_h=band_h,
                tile_h=_pick_tile_h(band_h, w, c), eps=1e-6,
                interpret=interpret, gelu_tanh=gelu_tanh, quant=quant)
            return out[:, :h]
    lax = _lax_block_int8 if quant else _lax_block
    return lax(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, gelu_tanh=gelu_tanh)


def _fwd(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, interpret, gelu_tanh):
    out = fused_convnext_block(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g,
                               interpret, gelu_tanh)
    return out, (x, dwk, dwb, ns, nb, w1, b1, w2, b2, g)


def _bwd(interpret, gelu_tanh, residuals, ct):
    _, vjp = jax.vjp(
        lambda *args: _lax_block(*args, gelu_tanh=gelu_tanh), *residuals)
    return vjp(ct)


fused_convnext_block.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_convnext_block_int8(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g,
                              interpret=False, gelu_tanh=False):
    """One ConvNeXt block, VMEM-fused with int8 pointwise matmuls.

    Combines the two levers the per-layer v5e roofline says matter: the
    fused kernel removes the HBM round trips that bind stages 0-2, and the
    int8 MXU rate (394 TOPS vs 197 bf16 TFLOP/s on v5e) halves what's left
    of the now-MXU-bound pointwise time.  Weight scales are per-output-
    channel (ops/quant.py scheme); activation scales are per-row-chunk —
    a finer partition than the unfused path's per-tensor scale.  Backward
    differentiates the unfused int8 math (frozen-tower safety net, as for
    the bf16 kernel)."""
    return _route(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g,
                  interpret=interpret, gelu_tanh=gelu_tanh, quant=True)


def _fwd_int8(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g, interpret, gelu_tanh):
    out = fused_convnext_block_int8(x, dwk, dwb, ns, nb, w1, b1, w2, b2, g,
                                    interpret, gelu_tanh)
    return out, (x, dwk, dwb, ns, nb, w1, b1, w2, b2, g)


def _bwd_int8(interpret, gelu_tanh, residuals, ct):
    _, vjp = jax.vjp(
        lambda *args: _lax_block_int8(*args, gelu_tanh=gelu_tanh), *residuals)
    return vjp(ct)


fused_convnext_block_int8.defvjp(_fwd_int8, _bwd_int8)
