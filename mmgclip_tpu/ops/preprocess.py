"""Device-side image intensity preprocessing.

The reference decodes 8-bit PNGs on the host, multiplies by 65535 to restore
the 16-bit DICOM range, then normalizes (x - 32767.5) / 32767.5
(reference: mmgclip/networks/image_features.py:95-99, generate_report.py:88-93).
Here the whole chain is a single fused affine on device, applied to raw
uint8/uint16 pixels so the host->device transfer carries 1-2 bytes/pixel
instead of 4-byte floats.
"""

from __future__ import annotations

import jax.numpy as jnp

# For 8-bit pixels: ToTensor() scales p/255, then *65535 => 257*p exactly.
_SCALE_8 = 257.0
_CENTER = 32767.5


def intensity_transform(pixels, out_dtype=jnp.float32):
    """uint8/uint16 pixels -> normalized [-1, 1] float, reference-equivalent.

    Accepts [..., H, W] or [..., H, W, C]; dtype decides the scaling branch.
    """
    x = pixels
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) * _SCALE_8
    elif x.dtype == jnp.uint16:
        x = x.astype(jnp.float32)
    else:
        # already-float inputs are assumed ToTensor-style [0, 1]
        x = x.astype(jnp.float32) * 65535.0
    return ((x - _CENTER) / _CENTER).astype(out_dtype)
