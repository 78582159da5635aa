"""Deterministic seeding (reference: mmgclip/utils/global_utils.py:7-25).

The TPU build routes all randomness through explicit PRNGs: a `jax.random.key`
for device-side randomness (dropout, init) and a `random.Random`/numpy
Generator pair for host-side randomness (prompt sampling, splits).  `seeding()`
still seeds the global stdlib/numpy state for parity with reference scripts
that rely on it.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Rngs:
    """Explicit per-concern RNG handles derived from one seed."""

    seed: int

    @property
    def host(self) -> random.Random:
        return random.Random(self.seed)

    @property
    def numpy(self) -> np.random.Generator:
        return np.random.default_rng(self.seed)

    def jax_key(self):
        import jax

        return jax.random.key(self.seed)


def seeding(seed: int) -> Rngs:
    """Seed global host RNG state and return explicit handles."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return Rngs(seed)


def create_directory_if_not_exists(path: str) -> str:
    if path is None:
        raise ValueError("Invalid path passed.")
    os.makedirs(path, exist_ok=True)
    return str(path)
