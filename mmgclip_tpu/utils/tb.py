"""Scalar metric logging.

TensorBoard scalars matching the reference tag set
(reference: ClassifierExperiment.py:90,130,233,241,256,271,276,320) plus a
JSONL mirror that always works (the TensorBoard event writer is optional —
it needs the torch or tensorboardX backends)."""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from .seeding import create_directory_if_not_exists


class ScalarWriter:
    def __init__(self, log_dir: str):
        self.log_dir = create_directory_if_not_exists(log_dir)
        # single-writer on a pod: scalars are computed from replicated
        # values, so every process would append IDENTICAL lines — and on a
        # shared log dir the interleaved appends corrupt scalars.jsonl.
        # Process 0 writes; the rest no-op.
        self._primary = True
        try:
            import jax

            self._primary = jax.process_index() == 0
        except Exception:
            pass
        self._jsonl = (
            open(os.path.join(log_dir, "scalars.jsonl"), "a") if self._primary else None
        )
        self._tb = None
        if self._primary:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
