"""Profiling / tracing hooks (new subsystem; SURVEY §5.1 — absent in the
reference, which only wall-clock-timed epochs).

`maybe_trace` wraps a region in a jax.profiler trace when enabled; traces land
in TensorBoard-compatible format under the given directory.  `StepTimer`
records per-step wall time with device fencing for honest numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional


@contextlib.contextmanager
def maybe_trace(enabled: bool, logdir: str) -> Iterator[None]:
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with block_until_ready fencing."""

    def __init__(self):
        self.times: List[float] = []
        self._start: Optional[float] = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self, fence=None) -> float:
        if fence is not None:
            import jax

            jax.block_until_ready(fence)
        elapsed = time.perf_counter() - self._start
        self.times.append(elapsed)
        return elapsed

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
