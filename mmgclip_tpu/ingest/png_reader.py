"""PNG decoding for the ingest pipeline.

Prefers the native C++ libpng shim (native/png_decode.cc, built to
libmmg_png.so) for parallel high-throughput decode; falls back to PIL.
Returns grayscale uint8/uint16 arrays [H, W] — intensity scaling happens on
device (ops/preprocess.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidate = os.path.join(here, "native", "libmmg_png.so")
    if os.path.isfile(candidate):
        try:
            lib = ctypes.CDLL(candidate)
            lib.mmg_png_read_info.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.mmg_png_read_info.restype = ctypes.c_int
            lib.mmg_png_decode_gray.argtypes = [
                ctypes.c_char_p,
                ctypes.c_void_p,
                ctypes.c_size_t,
            ]
            lib.mmg_png_decode_gray.restype = ctypes.c_int
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def decode_png(path: str) -> np.ndarray:
    """Decode a PNG to a grayscale [H, W] array (uint8 or uint16)."""
    lib = _load_native()
    if lib is not None:
        width = ctypes.c_int()
        height = ctypes.c_int()
        depth = ctypes.c_int()
        if lib.mmg_png_read_info(path.encode(), ctypes.byref(width), ctypes.byref(height), ctypes.byref(depth)) == 0:
            dtype = np.uint16 if depth.value > 8 else np.uint8
            out = np.empty((height.value, width.value), dtype)
            rc = lib.mmg_png_decode_gray(path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
            if rc == 0:
                return out
    from PIL import Image

    with Image.open(path) as img:
        if img.mode not in ("L", "I;16", "I"):
            img = img.convert("L")
        arr = np.asarray(img)
    if arr.dtype == np.int32:  # PIL "I" mode
        arr = arr.astype(np.uint16)
    return arr
