"""Projection-head family mapping tower features into the joint space.

Same four head types as the reference (reference: mmgclip/networks/projection.py:4-101)
— bias-free linear, multi-linear stack with ReLU+dropout, BatchNorm MLP, and
residual MLP — as flax.linen modules registered by name.  "ZeroProjection" is
a sentinel resolved by the CLIP head (no projection parameters at all).
"""

from __future__ import annotations

from typing import Sequence, Union

from flax import linen as nn

from ..config.registry import PROJECTIONS


@PROJECTIONS.register("LinearProjectionLayer")
class LinearProjectionLayer(nn.Module):
    """Single bias-free linear map (reference: projection.py:4-33)."""

    embedding_dim: int
    projection_dim: int = 512
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.Dense(self.projection_dim, use_bias=False, name="layer")(x)


@PROJECTIONS.register("MultiLinearHead")
class MultiLinearHead(nn.Module):
    """Linear stack with ReLU+dropout between layers (reference: projection.py:36-61).

    ``projection_dim`` is the list of layer output widths, e.g. [768, 512].
    """

    embedding_dim: int
    projection_dim: Union[Sequence[int], int] = (768, 512)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dims = list(self.projection_dim) if not isinstance(self.projection_dim, int) else [self.projection_dim]
        for i, width in enumerate(dims):
            x = nn.Dense(width, name=f"layers_{i}")(x)
            if i < len(dims) - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


@PROJECTIONS.register("ProjectionHead")
class ProjectionHead(nn.Module):
    """MLP with BatchNorm (reference: projection.py:64-83; unused by stock configs)."""

    embedding_dim: int
    hidden_dims: Sequence[int] = (512, 256, 128)
    projection_dim: int = 64
    dropout: float = 0.1
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, width in enumerate(self.hidden_dims):
            x = nn.Dense(width, name=f"hidden_{i}")(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(use_running_average=deterministic, name=f"bn_{i}")(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.projection_dim, name="out")(x)


@PROJECTIONS.register("MLPProjectionHead")
class MLPProjectionHead(nn.Module):
    """Linear -> GELU -> Linear -> Dropout -> residual -> LayerNorm
    (reference: projection.py:85-101)."""

    embedding_dim: int
    projection_dim: int = 512
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        projected = nn.Dense(self.projection_dim, name="projection")(x)
        x = nn.gelu(projected, approximate=False)
        x = nn.Dense(self.projection_dim, name="fc")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = x + projected
        return nn.LayerNorm(name="layer_norm")(x)


def get_projection_head(name: str):
    """Name -> module class (reference: projection_controller.py:3-24)."""
    return PROJECTIONS.get(name)
