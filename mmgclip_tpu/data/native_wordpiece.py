"""ctypes binding for the native batch WordPiece encoder.

``native/wordpiece.cc`` implements the ASCII subset of HF BertTokenizer
semantics exactly (for pure-ASCII text the Unicode machinery — NFD accent
stripping, Mn/Cc/Cf/P* categories — reduces to ASCII rules); the Python
:class:`~mmgclip_tpu.data.tokenizer.WordPieceTokenizer` remains the source
of truth and handles everything non-ASCII.  Byte-equality of the two paths
is pinned by tests/test_native_wordpiece.py.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidate = os.path.join(here, "native", "libmmg_wordpiece.so")
    if os.path.isfile(candidate):
        try:
            lib = ctypes.CDLL(candidate)
            lib.wp_create.argtypes = [ctypes.c_char_p]
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_free.argtypes = [ctypes.c_void_p]
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ]
            lib.wp_encode_batch.restype = ctypes.c_int
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


class NativeWordPiece:
    """Native encoder over a WordPiece vocabulary (ids must be dense 0..n-1)."""

    def __init__(self, vocab: Dict[str, int], lowercase: bool = True,
                 max_input_chars_per_word: int = 100):
        lib = _load_native()
        if lib is None:
            raise RuntimeError("libmmg_wordpiece.so not available")
        self._lib = lib
        self.lowercase = lowercase
        self.max_chars = max_input_chars_per_word
        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        if [i for _t, i in ordered] != list(range(len(ordered))):
            raise ValueError("native WordPiece needs dense token ids 0..n-1")
        if any("\n" in tok for tok, _i in ordered):
            # a newline inside a token would corrupt the line-indexed blob
            raise ValueError("native WordPiece cannot encode newline tokens")
        blob = "\n".join(tok for tok, _i in ordered).encode("utf-8")
        self._handle = lib.wp_create(blob)

    def __del__(self):
        lib = getattr(self, "_lib", None)
        handle = getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.wp_free(handle)

    def encode_batch(
        self, texts: Sequence[str], max_len: int
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """[n] ASCII texts -> (ids, mask) int32 [n, max_len]; None when any
        text is non-ASCII (caller must use the Python path)."""
        if not all(t.isascii() for t in texts):
            return None
        blob = "".join(texts).encode("ascii")
        offsets = np.zeros(len(texts) + 1, np.int64)
        np.cumsum([len(t) for t in texts], out=offsets[1:])
        ids = np.empty((len(texts), max_len), np.int32)
        mask = np.empty((len(texts), max_len), np.int32)
        rc = self._lib.wp_encode_batch(
            self._handle, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(texts), max_len, int(self.lowercase), self.max_chars,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            return None
        return ids, mask


def native_available() -> bool:
    return _load_native() is not None
