"""Shared VMEM-banding heuristics for the fused Pallas kernels.

The three fused kernels (ops/fused_block.py, ops/fused_downsample.py,
ops/fused_stem.py) all answer the same two questions with per-kernel cost
formulas:

* how many output rows per fp32 compute chunk fit the chunk budget
  (``pick_tile``), and
* which (padded height, band height) makes a row-banded grid admissible
  under the VMEM budget (``largest_fitting_divisor`` per candidate height +
  ``scan_padded_heights`` over a small padding window — bottom zero-row
  padding is exact under the kernels' SAME-padding semantics, see
  fused_block._pad_to_band).

Only the search loops and budgets live here — per-kernel working-set
formulas stay next to their kernels.  Tuning the budgets in ONE place keeps
the three kernels' VMEM behavior in lockstep (they run back-to-back inside
the same tower program).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

# per-core VMEM is 16 MiB on current TPUs; leave headroom for Mosaic's own
# buffers and the double-buffered pipeline
VMEM_BUDGET = 12 * 1024 * 1024
# fp32 intermediates materialized per compute chunk inside a kernel body
CHUNK_BUDGET = 2 * 1024 * 1024


def pick_tile(bh: int, per_row_fp32_bytes: int, budget: int = CHUNK_BUDGET) -> int:
    """Largest divisor of ``bh`` whose fp32 chunk intermediates fit ``budget``."""
    max_rows = max(1, budget // max(per_row_fp32_bytes, 1))
    for tile in range(min(bh, max_rows), 0, -1):
        if bh % tile == 0:
            return tile
    return 1


def largest_fitting_divisor(
    h: int, fits: Callable[[int], bool], lo: int = 1, hi: Optional[int] = None
) -> Optional[int]:
    """Largest divisor ``d`` of ``h`` in ``[lo, hi]`` with ``fits(d)``;
    None when no divisor fits."""
    hi = h if hi is None else hi
    for d in sorted((d for d in range(lo, hi + 1) if h % d == 0), reverse=True):
        if fits(d):
            return d
    return None


def scan_padded_heights(
    h_min: int, window: int, band_for_height: Callable[[int], Optional[int]]
) -> Optional[Tuple[int, int]]:
    """Scan padded heights ``[h_min, h_min + window)`` and keep the
    ``(h_pad, band)`` with the LARGEST band (ties -> least padding); None
    when no height in the window yields a band."""
    best = None
    for h_pad in range(h_min, h_min + window):
        band = band_for_height(h_pad)
        if band is not None and (best is None or band > best[1]):
            best = (h_pad, band)
    return best
