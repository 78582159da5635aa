"""Device-side image intensity preprocessing.

The reference decodes 8-bit PNGs on the host, multiplies by 65535 to restore
the 16-bit DICOM range, then normalizes (x - 32767.5) / 32767.5
(reference: mmgclip/networks/image_features.py:95-99, generate_report.py:88-93).
Here the whole chain is a single fused affine on device, applied to raw
uint8/uint16 pixels so the host->device transfer carries 1-2 bytes/pixel
instead of 4-byte floats.

The chain is split into two composable stages so the device-side resize
(ops/resize.py) can run between them in the 16-bit intensity domain:

    to_16bit -> [resize] -> normalize_16bit(window=...)

``to_16bit`` and resize are both linear, and the windowing clip is applied
after the resample (windowing an averaged intensity — the standard order),
so the fused ingest program stays mathematically well-defined at every
stage.  ``intensity_transform`` remains the no-resize composition.
"""

from __future__ import annotations

import jax.numpy as jnp

# For 8-bit pixels: ToTensor() scales p/255, then *65535 => 257*p exactly.
_SCALE_8 = 257.0
_CENTER = 32767.5


def to_16bit(pixels):
    """uint8/uint16/float pixels -> fp32 in the 16-bit DICOM intensity
    domain [0, 65535] (the reference's working range)."""
    x = pixels
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * _SCALE_8
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32)
    # already-float inputs are assumed ToTensor-style [0, 1]
    return x.astype(jnp.float32) * 65535.0


def normalize_16bit(x, out_dtype=jnp.float32, window=None):
    """fp32 16-bit-domain intensities -> normalized [-1, 1].

    ``window=(center, width)`` applies DICOM-style intensity windowing:
    intensities map linearly from ``[center - width/2, center + width/2]``
    onto [-1, 1] and clip outside — the radiology display transform, fused
    into the encode program (one extra VPU pass only when a window is set).
    ``window=(32767.5, 65535)`` is EXACTLY the reference's full-range
    normalization (the clip is then a no-op), so the default path stays the
    clip-free affine.
    """
    if window is not None:
        center, width = float(window[0]), float(window[1])
        if width <= 0:
            raise ValueError(f"window width must be positive, got {width}")
        # true division (not a reciprocal multiply): at the full-range window
        # this makes the branch BYTE-identical to the reference affine below
        y = (x - center) / (width * 0.5)
        return jnp.clip(y, -1.0, 1.0).astype(out_dtype)
    return ((x - _CENTER) / _CENTER).astype(out_dtype)


def intensity_transform(pixels, out_dtype=jnp.float32, window=None):
    """uint8/uint16 pixels -> normalized [-1, 1] float, reference-equivalent.

    Accepts [..., H, W] or [..., H, W, C]; dtype decides the scaling branch.
    See ``normalize_16bit`` for the optional windowing stage.
    """
    return normalize_16bit(to_16bit(pixels), out_dtype=out_dtype, window=window)
