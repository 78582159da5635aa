"""Contrastive losses as pure jittable functions.

Reference semantics (reference: mmgclip/loss/losses.py:6-216) with TPU-native
reformulations:

* CLIPLoss — symmetric cross-entropy over [n, n] logits, labels arange(n).
* MMGCLIPLoss — CLIP term recomputed from embeddings plus a text-to-text
  (report vs impression) term, total = clip + 0.5 * t2t.
* AveragedMedicalCLIPLoss — the reference greedily clusters near-duplicate
  texts with a Python loop (losses.py:148-162); here the same greedy order is
  expressed as a fixed-shape `lax.scan` plus one-hot column averaging, so the
  whole loss stays inside jit (no host callback, no dynamic shapes).

All functions accept the model-output dict via ``**kwargs`` so
``loss_fn(**outputs)`` works like the reference's ``criterion(**outputs)``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config.registry import LOSSES


def _cross_entropy(logits, labels):
    """Mean CE with integer labels; ignores -inf-masked columns naturally."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


@LOSSES.register("CLIPLoss")
def clip_loss(logits_per_image, logits_per_text, **_):
    """Symmetric InfoNCE (reference: losses.py:28-44)."""
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)
    loss_i = _cross_entropy(logits_per_image, labels)
    loss_t = _cross_entropy(logits_per_text, labels)
    return (loss_i + loss_t) / 2.0, labels


@LOSSES.register("MMGCLIPLoss")
def mmgclip_loss(
    image_embeddings,
    text_embeddings,
    text_embeddings2,
    logit_scale,
    t2t_weight: float = 0.5,
    **_,
):
    """CXR-CLIP-style loss: CLIP + weighted T2T term (reference: losses.py:46-96)."""
    n = image_embeddings.shape[0]
    labels = jnp.arange(n)

    logits_per_image = logit_scale * image_embeddings @ text_embeddings.T
    logits_per_text = logit_scale * text_embeddings @ image_embeddings.T
    loss_clip = (_cross_entropy(logits_per_image, labels) + _cross_entropy(logits_per_text, labels)) / 2.0

    logits_t2t1 = logit_scale * text_embeddings2 @ text_embeddings.T
    logits_t1t2 = logit_scale * text_embeddings @ text_embeddings2.T
    loss_t2t = (_cross_entropy(logits_t2t1, labels) + _cross_entropy(logits_t1t2, labels)) / 2.0

    return loss_clip + t2t_weight * loss_t2t, labels


def assign_similarity_labels(cosine_sim, threshold: float = 0.65):
    """Greedy duplicate-text clustering, jit-compatible.

    Reproduces the reference's sequential assignment
    (reference: losses.py:121-162): scanning rows in order, an unlabeled row
    becomes a new cluster leader and claims every later unlabeled row whose
    similarity meets the threshold.  Labels are dense 0..k-1 in leader scan
    order, exactly as the reference's ``current_label`` counter produces —
    the dense values matter because the forward CE indexes columns of the
    full [n, n] text-logit matrix with them (reference: losses.py:211-214).
    """
    n = cosine_sim.shape[0]
    init_labels = jnp.full((n,), -1, jnp.int32)

    def step(labels, i):
        is_leader = labels[i] < 0
        labels = jnp.where(is_leader & (labels < 0) & (cosine_sim[i] >= threshold), i, labels)
        labels = jax.lax.cond(is_leader, lambda l: l.at[i].set(i), lambda l: l, labels)
        return labels, None

    leader_idx, _ = jax.lax.scan(step, init_labels, jnp.arange(n))
    # leader -> dense rank: a row is a leader iff labeled with its own index;
    # cumsum over leader flags gives each leader its 0-based discovery rank
    is_leader = leader_idx == jnp.arange(n)
    dense_of_row = jnp.cumsum(is_leader.astype(jnp.int32)) - 1  # valid at leader rows
    return dense_of_row[leader_idx]


def average_logits_by_label(logits, labels):
    """Column-average logits over clusters; invalid columns -> -inf.

    Returns an [n, n] matrix whose column c is the mean of columns with
    label == c (reference: losses.py:164-186, fixed-shape formulation).
    """
    n = logits.shape[1]
    membership = (labels[None, :] == jnp.arange(n)[:, None]).astype(logits.dtype)  # [c, j]
    counts = jnp.sum(membership, axis=1)  # [c]
    sums = logits @ membership.T  # [n, c]
    averaged = sums / jnp.maximum(counts, 1.0)[None, :]
    return jnp.where(counts[None, :] > 0, averaged, -jnp.inf)


@LOSSES.register("AveragedMedicalCLIPLoss")
def averaged_medical_clip_loss(
    image_embeddings,
    text_embeddings,
    logit_scale,
    logits_per_image,
    logits_per_text,
    similarity_threshold: float = 0.65,
    **_,
):
    """CE over duplicate-averaged logit columns (reference: losses.py:98-216)."""
    sims = text_embeddings @ text_embeddings.T
    norms = jnp.linalg.norm(text_embeddings, axis=-1, keepdims=True)
    sims = sims / jnp.maximum(norms * norms.T, 1e-12)

    labels = assign_similarity_labels(sims, similarity_threshold)
    averaged_per_image = average_logits_by_label(logits_per_image, labels)

    loss_i = _cross_entropy(averaged_per_image, labels)
    loss_t = _cross_entropy(logits_per_text, labels)
    return (loss_i + loss_t) / 2.0, labels


def create_loss(name: str, **kwargs):
    """Name -> loss callable (reference: loss_controller.py:3-23)."""
    fn = LOSSES.get(name)
    return partial(fn, **kwargs) if kwargs else fn
