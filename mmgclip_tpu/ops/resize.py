"""Device-side image resize: separable weight-matrix matmuls on the MXU.

The reference encodes mammograms at NATIVE resolution — its transform chain
is ToTensor only (reference: mmgclip/networks/image_features.py:28,95-99,
no Resize stage) — which makes >=5,000 img/s/chip physically impossible on
v5e 47+ GFLOP/image towers (bench.py prices it: 512-input already needs
236 TFLOP/s > the 197 bf16 peak).  The north star's ingest chain therefore
names resize as a fused stage: raw uint8 crosses PCIe, and the downscale
happens ON DEVICE inside the same XLA program as the windowing, the
normalization and the tower.

TPU-first formulation: 2-D resampling with a separable kernel is exactly a
pair of small matrix products

    y = R_h @ x @ R_w^T        (per image / channel)

where ``R_h [H_out, H_in]`` and ``R_w [W_out, W_in]`` hold the 1-D
resampling weights.  The weights are numpy constants of the (static) shape
pair, so XLA sees two plain matmuls that tile straight onto the MXU — no
gather, no dynamic indexing, and the [H_out, W_in] intermediate fuses with
the surrounding elementwise chain.  Supported kernels:

* ``area`` — box/average resampling (each output cell integrates the input
  cells it covers).  The anti-aliased choice for the large downscale
  factors mammography needs (2294x1914 -> 256-512 class sizes); identical
  to torch's ``interpolate(mode="area")`` / PIL BOX.
* ``bilinear`` — half-pixel-center tent kernel, identical to
  ``jax.image.resize(method="linear")`` / torch ``align_corners=False``.

Both are linear in the input, so uint8 pixels can ride the matmul directly
after a cast — the intensity transform (an affine map) commutes with them
up to the windowing clip, and the encode path applies it after the resize
where the pixel count is smallest.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _resize_weights(n_in: int, n_out: int, method: str) -> np.ndarray:
    """[n_out, n_in] float32 resampling matrix; rows sum to 1."""
    if method == "area":
        # output cell i integrates input interval [i*s, (i+1)*s), s = in/out
        s = n_in / n_out
        w = np.zeros((n_out, n_in), np.float32)
        for i in range(n_out):
            lo, hi = i * s, (i + 1) * s
            j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
            for j in range(j0, min(j1, n_in)):
                w[i, j] = (min(j + 1, hi) - max(j, lo)) / s
        return w
    if method == "bilinear":
        # half-pixel centers (jax.image "linear" / torch align_corners=False)
        s = n_in / n_out
        w = np.zeros((n_out, n_in), np.float32)
        for i in range(n_out):
            c = (i + 0.5) * s - 0.5
            j0 = int(np.floor(c))
            f = c - j0
            w[i, min(max(j0, 0), n_in - 1)] += 1.0 - f
            w[i, min(max(j0 + 1, 0), n_in - 1)] += f
        return w
    raise ValueError(f"resize method must be 'area' or 'bilinear', got {method!r}")


def resize2d(x, out_hw: Tuple[int, int], method: str = "area",
             dtype=jnp.float32, precision=None):
    """Resize [..., H, W] or [n, H, W, C] images to ``out_hw``.

    The channel axis is detected by convention: rank-4 inputs are NHWC,
    everything else treats the last two axes as (H, W).  Compute is fp32
    (weight rows sum to 1, so uint8 inputs stay in the uint8 value range);
    cast to ``dtype`` on the way out.

    ``precision``: matmul precision for the two einsums.  ``None`` (the
    default) lowers to a SINGLE bf16 MXU pass on TPU — XLA truncates fp32
    operands to bf16 — which is the fast path the bench prices at the bf16
    peak; the truncation error is bounded by
    tests/test_resize.py::test_default_precision_truncation_bound (~1e-2
    worst-case / ~5e-3 mean of the post-normalization [-1, 1] range,
    verified on the real chip by a DEFAULT-vs-HIGHEST probe).  Pass
    ``jax.lax.Precision.HIGHEST`` (config:
    ``dataset.config.encode_resize_precision: highest``) for oracle-exact
    resampling on TPU at ~6 MXU passes per matmul.  Off-TPU (CPU tests,
    oracles) fp32 is exact either way.
    """
    nhwc = x.ndim == 4
    h_ax, w_ax = (1, 2) if nhwc else (x.ndim - 2, x.ndim - 1)
    h_in, w_in = x.shape[h_ax], x.shape[w_ax]
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    rh = jnp.asarray(_resize_weights(h_in, h_out, method))
    rw = jnp.asarray(_resize_weights(w_in, w_out, method))
    xf = x.astype(jnp.float32)
    if nhwc:
        y = jnp.einsum("oh,nhwc->nowc", rh, xf, precision=precision)
        y = jnp.einsum("pw,nowc->nopc", rw, y, precision=precision)
    else:
        y = jnp.einsum("oh,...hw->...ow", rh, xf, precision=precision)
        y = jnp.einsum("pw,...ow->...op", rw, y, precision=precision)
    return y.astype(dtype)


def host_block_sum(pixels: np.ndarray, k: int) -> np.ndarray:
    """[..., H, W] uint8/uint16 -> [..., ceil(H/k), ceil(W/k)] EXACT integer
    k x k block sums (host side, pure adds — one touch per pixel).

    This is the host half of the prepooled ingest chain
    (``dataset.config.encode_host_prepool``): the host link then carries
    2 bytes per k^2 pixels instead of 1-2 bytes per pixel — at k=4 a
    2294x1914 uint8 mammogram shrinks 4.39 MB -> 0.55 MB, lifting the PCIe
    ceiling the north-star bench prices ~16x — and the device reconstructs
    the block-MEAN image exactly (integer sums lose nothing;
    ``_block_sum_weights`` divides by the true per-block pixel counts,
    including partial edge blocks, which are zero-padded here).

    uint8 input sums into uint16 (k <= 16: 16^2 * 255 = 65280 fits),
    uint16 into uint32 — the sum dtype also tells the device program which
    source intensity scale applies (257x for 8-bit PNGs, 1x for 16-bit).
    """
    if pixels.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"host_block_sum expects uint8/uint16 pixels, got {pixels.dtype}")
    if not 2 <= int(k) <= 16:
        raise ValueError(f"prepool block must be in [2, 16], got {k}")
    out_dtype = np.uint16 if pixels.dtype == np.uint8 else np.uint32
    *lead, h, w = pixels.shape
    hb, wb = -(-h // k), -(-w // k)
    pad = [(0, 0)] * len(lead) + [(0, hb * k - h), (0, wb * k - w)]
    x = np.pad(pixels, pad).astype(out_dtype)
    return x.reshape(*lead, hb, k, wb, k).sum(axis=(-3, -1), dtype=out_dtype)


@functools.lru_cache(maxsize=256)
def _block_sum_weights(n_in: int, n_out: int, k: int, method: str) -> np.ndarray:
    """[n_out, ceil(n_in/k)] float32 weights that resample integer k-block
    SUMS directly: the per-pixel resample matrix with its columns aggregated
    per block, divided by each block's TRUE pixel count.  Applying it to
    block sums is EXACTLY the area/bilinear resample of the piecewise-
    constant block-mean image — the only information lost vs the per-pixel
    resample is within-block variation at output-cell boundaries (bounded by
    tests/test_resize.py::test_prepool_error_bound; zero for block-constant
    images)."""
    w = _resize_weights(n_in, n_out, method)
    nb = -(-n_in // k)
    wp = np.zeros((n_out, nb * k), np.float32)
    wp[:, :n_in] = w
    wb = wp.reshape(n_out, nb, k).sum(-1)
    counts = np.full(nb, float(k), np.float32)
    counts[-1] = n_in - k * (nb - 1)
    return wb / counts


def resize_to_canvas_from_block_sums(sums, native_hw: Tuple[int, int],
                                     canvas_hw: Tuple[int, int], k: int,
                                     method: str = "area", dtype=jnp.float32,
                                     precision=None):
    """Device half of the prepooled ingest chain: [n, Hb, Wb] integer block
    sums (``host_block_sum``) -> aspect-preserving resample onto the fixed
    canvas in SOURCE intensity units, same top-left/zero-pad convention and
    ``valid_hw`` contract as ``resize_to_canvas``."""
    h, w = int(native_hw[0]), int(native_hw[1])
    ch, cw = int(canvas_hw[0]), int(canvas_hw[1])
    vh, vw = fit_shape((h, w), (ch, cw))
    rh = jnp.asarray(_block_sum_weights(h, vh, int(k), method))
    rw = jnp.asarray(_block_sum_weights(w, vw, int(k), method))
    xf = sums.astype(jnp.float32)
    y = jnp.einsum("oh,nhw->now", rh, xf, precision=precision)
    y = jnp.einsum("pw,now->nop", rw, y, precision=precision)
    y = y.astype(dtype)
    y = jnp.pad(y, ((0, 0), (0, ch - vh), (0, cw - vw)))
    valid_hw = jnp.broadcast_to(jnp.asarray([vh, vw], jnp.int32), (sums.shape[0], 2))
    return y, valid_hw


def fit_shape(in_hw: Tuple[int, int], canvas_hw: Tuple[int, int]) -> Tuple[int, int]:
    """Aspect-preserving fit of ``in_hw`` inside ``canvas_hw`` (static math:
    called at trace time with concrete bucket shapes)."""
    h, w = int(in_hw[0]), int(in_hw[1])
    ch, cw = int(canvas_hw[0]), int(canvas_hw[1])
    scale = min(ch / h, cw / w)
    return max(1, min(ch, round(h * scale))), max(1, min(cw, round(w * scale)))


def resize_to_canvas(x, canvas_hw: Tuple[int, int], method: str = "area",
                     dtype=jnp.float32, precision=None):
    """Aspect-preserving resize of [n, H, W] images onto a fixed canvas.

    Images scale (up or down) to fit ``canvas_hw`` without distortion and
    land top-left; the remainder is zero — exactly the convention of the
    bucketed-encode masked tower (models/convnext.py ``valid_hw``), so the
    result feeds the EXACT masked encode unchanged.  Returns
    ``(canvas [n, ch, cw], valid_hw [n, 2] int32)``.
    """
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    ch, cw = int(canvas_hw[0]), int(canvas_hw[1])
    vh, vw = fit_shape((h, w), (ch, cw))
    y = resize2d(x, (vh, vw), method=method, dtype=dtype, precision=precision)
    y = jnp.pad(y, ((0, 0), (0, ch - vh), (0, cw - vw)))
    valid_hw = jnp.broadcast_to(jnp.asarray([vh, vw], jnp.int32), (n, 2))
    return y, valid_hw
