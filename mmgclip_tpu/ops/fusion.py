"""Study-level view fusion (reference: mmgclip/networks/image_features.py:225-247).

Fuses per-view 768-d feature vectors into one study vector.  All methods are
jit-friendly reductions over the leading view axis.
"""

from __future__ import annotations

import jax.numpy as jnp

FUSION_METHODS = ("maxpool", "avgpool", "stack", "concat")


def fuse_views(view_features, method: str = "avgpool"):
    """view_features: [n_views, d] (or [b, n_views, d]) -> fused features."""
    axis = view_features.ndim - 2
    if method == "maxpool":
        return jnp.max(view_features, axis=axis)
    if method == "avgpool":
        return jnp.mean(view_features, axis=axis)
    if method == "stack":
        return view_features
    if method == "concat":
        return jnp.reshape(view_features, view_features.shape[:axis] + (-1,))
    raise ValueError(f"Unknown fusion method {method!r}; one of {FUSION_METHODS}")
