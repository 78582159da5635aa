"""Projection-head family mapping tower features into the joint space.

Same four head types as the reference (reference: mmgclip/networks/projection.py:4-101)
— bias-free linear, multi-linear stack with ReLU+dropout, BatchNorm MLP, and
residual MLP — as flax.linen modules registered by name.  "ZeroProjection" is
a sentinel resolved by the CLIP head (no projection parameters at all).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
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


@PROJECTIONS.register("MoEProjectionHead")
class MoEProjectionHead(nn.Module):
    """Mixture-of-experts projection head (TPU-native extension; no reference
    counterpart — the reference's heads are all dense, projection.py:4-101).

    Switch-style top-1 routing with a static per-expert capacity: the router
    picks one expert per embedding, tokens dispatch/combine through one-hot
    einsums (fixed shapes, fully jittable), and the gate probability scales
    the expert output so the router receives gradient.  Tokens routed past an
    expert's capacity are dropped (zero output) — the standard Switch
    contract.  Expert weights carry a leading [E, ...] axis, so expert
    parallelism is a sharding decision: place them with
    ``parallel/expert.py``'s specs over an ``expert`` mesh axis and GSPMD
    turns the dispatch/combine einsums into all_to_alls.
    """

    embedding_dim: int
    projection_dim: int = 512
    dropout: float = 0.0
    n_experts: int = 8
    capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n, h = x.shape
        e, p = self.n_experts, self.projection_dim
        # static capacity: trace-time python arithmetic on the batch dim
        capacity = max(1, int(self.capacity_factor * n / e))

        lecun = nn.initializers.lecun_normal()
        # leading e is a stack-of-experts axis, not receptive field — keep it
        # out of fan_in (see bert.py)
        lecun_stacked = nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=0)
        router = self.param("router", lecun, (h, e))
        w_in = self.param("w_in", lecun_stacked, (e, h, p))
        b_in = self.param("b_in", nn.initializers.zeros, (e, p))
        w_out = self.param("w_out", lecun_stacked, (e, p, p))
        b_out = self.param("b_out", nn.initializers.zeros, (e, p))

        probs = jax.nn.softmax((x @ router).astype(jnp.float32), axis=-1)
        expert_idx = jnp.argmax(probs, axis=-1)  # [n]
        expert_onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.int32)  # [n, e]
        # position of each token within its expert's queue (exclusive count
        # of earlier same-expert tokens)
        position = jnp.sum(
            (jnp.cumsum(expert_onehot, axis=0) - expert_onehot) * expert_onehot, axis=-1
        )
        # Switch capacity drop happens inside one_hot: positions >= capacity
        # are out of range and produce an all-zero row (no extra keep factor
        # needed — the token simply vanishes from dispatch and its projected
        # embedding is exactly zero; the zero-safe l2_normalize downstream
        # keeps that row finite, so a dropped token contributes a uniform
        # all-zero logits row rather than NaNs)
        dispatch = (
            expert_onehot.astype(x.dtype)[:, :, None]
            * jax.nn.one_hot(position, capacity, dtype=x.dtype)[:, None, :]
        )  # [n, e, c]
        gate = jnp.sum(probs.astype(x.dtype) * expert_onehot.astype(x.dtype), axis=-1)
        combine = dispatch * gate[:, None, None]

        expert_in = jnp.einsum("nec,nh->ech", dispatch, x)
        hidden = nn.gelu(
            jnp.einsum("ech,ehp->ecp", expert_in, w_in) + b_in[:, None, :],
            approximate=False,
        )
        expert_out = jnp.einsum("ecp,epq->ecq", hidden, w_out) + b_out[:, None, :]
        y = jnp.einsum("nec,ecq->nq", combine, expert_out)

        # Switch load-balancing auxiliary loss: E * sum_e f_e * P_e, where
        # f_e = fraction of tokens routed to e (hard assignment) and
        # P_e = mean router probability for e.  Equals 1.0 under perfectly
        # uniform routing, grows as routing collapses; differentiable through
        # P_e.  Consumers fetch it via
        # ``apply(..., mutable=["intermediates"])`` ->
        # intermediates["aux_loss"]; it is advisory — the reference workload
        # trains dense heads, so nothing adds it to the objective by default.
        token_fraction = jnp.mean(expert_onehot.astype(jnp.float32), axis=0)
        mean_prob = jnp.mean(probs, axis=0)
        self.sow("intermediates", "aux_loss", e * jnp.sum(token_fraction * mean_prob))

        return nn.Dropout(self.dropout, deterministic=deterministic)(y)


def get_projection_head(name: str):
    """Name -> module class (reference: projection_controller.py:3-24)."""
    return PROJECTIONS.get(name)
