"""Fused stem: 4x4/4 patchify conv + LayerNorm in one Pallas program.

The stem is the other unfused glue term the per-layer projection itemizes
(`time_frac` in bench.py): the lax path writes the stem conv's output to
HBM and reads+writes it again for the LayerNorm (~3 passes of the
[H/4, W/4, 96] tensor).  Here the conv output stays in VMEM and the LN
happens before the single HBM write (~1 pass).

Unlike the downsample kernel's dx-pair merge (a real relayout copy on TPU
— see ops/fused_downsample.py, shipped default-off), the stem's patch
gather happens OUTSIDE the kernel on the TINY pre-stem tensor (256² gray
bf16 = 128 KB/image; two extra passes of it are negligible next to the LN
round trip it saves): XLA transposes [n, H, W, C] into non-overlapping
[n, H/4, W/4, 16*C] patches (stride == kernel: no halo), and the kernel is
then a plain [rows, 16*C] @ [16*C, 96] MXU matmul + fp32 LayerNorm.

Exactness: bottom/right zero-padding to multiples of 4 mirrors the model's
``br_pad`` convention; the bucketed-encode ``valid_hw`` path needs no
special casing (its mask applies AFTER the stem norm, outside this op).
Differentiable via the identical-math lax path (the tower is frozen in
every shipped training config).  Reference chain being replaced: the
TorchScript ConvNeXt stem the reference runs inside ``model.features``
(mmgclip/networks/image_features.py:95-101).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banding import (
    CHUNK_BUDGET as _CHUNK_BUDGET,
    VMEM_BUDGET as _VMEM_BUDGET,
    largest_fitting_divisor,
    pick_tile,
    scan_padded_heights,
)


def _pick_tile(bh: int, w_out: int, cin16: int, cout: int) -> int:
    # _CHUNK_BUDGET/_VMEM_BUDGET stay module-level patchable knobs (tests)
    return pick_tile(bh, w_out * (cin16 + cout) * 4, _CHUNK_BUDGET)


def _working_set(bh, w_out, cin16, cout, dtype_bytes, tile):
    io = 2 * bh * w_out * (cin16 + cout) * dtype_bytes
    weights = (cin16 * cout + cout + 2 * cout) * dtype_bytes
    chunk = tile * w_out * (cin16 + cout) * 4
    return io + weights + chunk


def _pick_band(h_out, w_out, cin16, cout, dtype_bytes):
    """(h_out_pad, band) for the output-band grid; None if nothing fits."""

    def band_for(h_pad):
        return largest_fitting_divisor(
            h_pad,
            lambda band: _working_set(
                band, w_out, cin16, cout, dtype_bytes,
                _pick_tile(band, w_out, cin16, cout),
            ) < _VMEM_BUDGET,
        )

    return scan_padded_heights(max(h_out, 1), 8, band_for)


def _kernel(x_ref, k_ref, b_ref, ns_ref, nb_ref, o_ref, *, tile: int,
            eps: float):
    """x_ref [1, BH, W_out, 16*Cin] patch block; o_ref [1, BH, W_out, Cout].
    Per chunk: one MXU matmul (the 4x4/4 conv over flattened patches), bias,
    then LayerNorm in fp32 before the single HBM write."""
    bh, w_out, cout = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
    cin16 = x_ref.shape[3]
    bias = b_ref[0].astype(jnp.float32)
    ns = ns_ref[0].astype(jnp.float32)
    nb = nb_ref[0].astype(jnp.float32)

    def chunk(i, _):
        r0 = pl.multiple_of(i * tile, tile)
        rows = x_ref[0, pl.ds(r0, tile), :, :]
        flat = rows.reshape(tile * w_out, cin16)
        y = jnp.dot(flat.astype(k_ref.dtype), k_ref[:],
                    preferred_element_type=jnp.float32) + bias
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps) * ns + nb
        o_ref[0, pl.ds(r0, tile), :, :] = y.reshape(
            tile, w_out, cout).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bh // tile, chunk, 0)


@functools.partial(jax.jit, static_argnames=("band", "tile", "eps", "interpret"))
def _fused_call(patches, kernel2d, bias, ns, nb, *, band, tile, eps, interpret):
    n, h_out, w_out, cin16 = patches.shape
    cout = kernel2d.shape[1]
    row = lambda v: v.reshape(1, -1)  # noqa: E731

    def vspec(shape):
        return pl.BlockSpec(shape, lambda i, bb: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, tile=tile, eps=eps),
        grid=(n, h_out // band),
        in_specs=[
            pl.BlockSpec((1, band, w_out, cin16), lambda i, bb: (i, bb, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec((cin16, cout)),
            vspec((1, cout)), vspec((1, cout)), vspec((1, cout)),
        ],
        out_specs=pl.BlockSpec((1, band, w_out, cout),
                               lambda i, bb: (i, bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, cout), patches.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(patches, kernel2d, row(bias), row(ns), row(nb))


def _patchify(x):
    """[n, H, W, C] -> [n, ceil(H/4), ceil(W/4), 16*C] non-overlapping 4x4
    patches, (dy, dx, ci)-minor — matching kernel.reshape(16*C, cout).
    Bottom/right zero pad == the model's br_pad convention."""
    n, h, w, c = x.shape
    ph, pw = (-h) % 4, (-w) % 4
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    ho, wo = (h + ph) // 4, (w + pw) // 4
    x = x.reshape(n, ho, 4, wo, 4, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, ho, wo, 16 * c)


def _lax_stem(x, kernel, bias, ns, nb, eps=1e-6):
    """Identical-math lax path: models/convnext.py stem (br_pad 4x4/4 conv
    -> fp32 LayerNorm)."""
    dt = x.dtype
    h, w = x.shape[1], x.shape[2]
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(dt), (4, 4), ((0, (-h) % 4), (0, (-w) % 4)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(dt)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.var(yf, axis=-1, keepdims=True)
    return ((yf - mean) * jax.lax.rsqrt(var + eps) * ns.astype(jnp.float32)
            + nb.astype(jnp.float32)).astype(dt)


# tests flip this to drive the REAL kernel (interpret mode) off-TPU
FORCE_INTERPRET = False


def kernel_available(shape, cout: int, dtype_itemsize: int,
                     interpret: bool = False) -> bool:
    """True iff fused_stem would take the KERNEL path — the model gates on
    this so the fallback runs the ORIGINAL flax modules (byte-neutral off
    TPU, like ops/fused_downsample.py)."""
    if not (interpret or FORCE_INTERPRET or jax.default_backend() == "tpu"):
        return False
    _n, h, w, cin = shape
    return _pick_band(-(-h // 4), -(-w // 4), 16 * cin, cout,
                      dtype_itemsize) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_stem(x, kernel, bias, ns, nb, interpret=False):
    """ConvNeXt stem (4x4/4 conv + LayerNorm), VMEM-fused.  x: [n,H,W,Cin];
    kernel: [4,4,Cin,Cout].  Kernel path on TPU (or interpret) when a band
    fits VMEM; identical-math lax fallback otherwise."""
    return _route(x, kernel, bias, ns, nb, interpret=interpret)


def _route(x, kernel, bias, ns, nb, *, interpret):
    interpret = interpret or FORCE_INTERPRET
    n, h, w, cin = x.shape
    cout = kernel.shape[3]
    backend_ok = interpret or jax.default_backend() == "tpu"
    if backend_ok:
        h_out, w_out = -(-h // 4), -(-w // 4)
        picked = _pick_band(h_out, w_out, 16 * cin, cout, x.dtype.itemsize)
        if picked is not None:
            h_pad, band = picked
            patches = _patchify(x)
            if h_pad != h_out:
                patches = jnp.pad(
                    patches, ((0, 0), (0, h_pad - h_out), (0, 0), (0, 0)))
            out = _fused_call(
                patches, kernel.reshape(16 * cin, cout), bias, ns, nb,
                band=band, tile=_pick_tile(band, w_out, 16 * cin, cout),
                eps=1e-6, interpret=interpret)
            return out[:, :h_out]
    return _lax_stem(x, kernel, bias, ns, nb)


def _fwd(x, kernel, bias, ns, nb, interpret):
    out = fused_stem(x, kernel, bias, ns, nb, interpret)
    return out, (x, kernel, bias, ns, nb)


def _bwd(interpret, residuals, ct):
    _, vjp = jax.vjp(_lax_stem, *residuals)
    return vjp(ct)


fused_stem.defvjp(_fwd, _bwd)
