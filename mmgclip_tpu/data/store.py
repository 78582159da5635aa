"""Feature store IO.

The framework writes ``.npy`` feature files (mmap-friendly, torch-free);
``.pth`` files from the reference's extractor
(reference: mmgclip/networks/image_features.py:107-117) load transparently
when torch is importable, so an existing store can be reused as-is.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def save_features(path: str, features: np.ndarray) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not path.endswith(".npy"):
        path = path + ".npy"
    np.save(path, np.asarray(features))
    return path


def load_features(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".pth"):
        import torch  # compat-only import

        tensor = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(tensor.detach().numpy() if hasattr(tensor, "detach") else tensor)
    raise ValueError(f"Unknown feature file type: {path}")


def load_features_batch(paths) -> np.ndarray:
    return np.stack([load_features(p) for p in paths], axis=0)
