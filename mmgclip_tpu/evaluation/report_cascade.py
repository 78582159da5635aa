"""The report-generation decision cascade as ONE jitted device program.

The reference walks its decision tree with 7-9 separate tiny model forwards,
crossing the host<->device boundary at every step
(reference: generate_report.py:204-367; SURVEY §3.4).  Here every prompt bank
is embedded once into a padded [n_banks, max_prompts, d] table, and a single
jitted function computes ALL decisions — mass type, malignancy, shape,
margin, calcification attributes, both BI-RADS branches, architectural
distortion — in one device call: each decision is a masked argmax over one
row of similarities against the same image embedding.  Branching happens on
the host afterwards, on integer outputs.

generate_report.py composes this with the template assembly.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import l2_normalize

BANKS: Dict[str, List[str]] = {
    "mass_type": [
        "Mammogram revealed a mass.",
        "Mammogram revealed calcifications.",
        "No findings are present.",
    ],
    "mass_malignancy": [
        "Mass suggestive of benign pathology.",
        "Mass suggestive of malignant pathology.",
    ],
    "mass_shape": ["Mass shape is oval.", "Mass shape is round.", "Mass shape is irregular."],
    "mass_margin": [
        "Mass margin is circumscribed.",
        "Mass margin is obscured.",
        "Mass margin is spiculated.",
        "Mass margin is ill defined.",
    ],
    "calc_malignancy": [
        "Calcifications suggestive of benign pathology.",
        "Calcifications suggestive of malignant pathology.",
    ],
    "calc_distribution": [
        "Mammogram revealed calcifications with diffuse distribution.",
        "Mammogram revealed calcifications with regional distribution.",
        "Mammogram revealed calcifications with grouped distribution.",
        "Mammogram revealed calcifications with linear distribution.",
        "Mammogram revealed calcifications with segmental distribution.",
    ],
    "birads_benign": ["BIRADS score of 0.", "BIRADS score of 2.", "BIRADS score of 3."],
    "birads_malignant": [
        "BIRADS score of 0.",
        "BIRADS score of 4.",
        "BIRADS score of 5.",
        "BIRADS score of 6.",
    ],
    "arch_distortion": [
        "Mammogram displayed architectural distortion.",
        "Mammography showed no evidence of architectural distortion.",
    ],
}

BANK_ORDER = list(BANKS.keys())

# run_cascade packs per-bank argmaxes base-8 into one int32 scalar
assert max(len(v) for v in BANKS.values()) <= 8
assert 3 * len(BANK_ORDER) <= 31


def build_prompt_table(model, params, tokenizer) -> tuple:
    """Embed every bank once -> padded [n_banks, max_prompts, d] table and a
    validity mask [n_banks, max_prompts]."""
    max_prompts = max(len(v) for v in BANKS.values())
    rows = []
    masks = []
    for name in BANK_ORDER:
        prompts = BANKS[name]
        tokens = tokenizer(
            prompts, padding="max_length", truncation=True,
            max_length=int(model.config.tokenizer.config.sequence_length),
        )
        tokens = {k: jnp.asarray(v) for k, v in tokens.items()}
        pooled = model.apply_text_tower(tokens)
        emb = l2_normalize(model.project_text(params, pooled, train=False))
        pad = max_prompts - emb.shape[0]
        rows.append(jnp.pad(emb, ((0, pad), (0, 0))))
        masks.append(jnp.asarray([1] * emb.shape[0] + [0] * pad, jnp.int32))
    return jnp.stack(rows), jnp.stack(masks)


@partial(jax.jit, static_argnums=())
def run_cascade(image_embedding, prompt_table, prompt_mask) -> jnp.ndarray:
    """All cascade decisions in one device call, packed into ONE scalar.

    image_embedding: [d] L2-normalized; prompt_table: [n_banks, p, d];
    prompt_mask: [n_banks, p] validity.  The per-bank argmaxes (each < 8)
    pack base-8 into a single int32: one scalar host fetch is the cheapest
    possible D2H on high-latency links (measured on the TPU tunnel: a scalar
    fetch ~30ms vs ~600ms+ for a [9] array and ~12s for 9 separate outputs).
    Unpack with :func:`unpack_decisions`.
    """
    sims = jnp.einsum("d,bpd->bp", image_embedding, prompt_table)
    sims = jnp.where(prompt_mask > 0, sims, -jnp.inf)
    winners = jnp.argmax(sims, axis=-1)  # [n_banks], each < 8
    base = 8 ** jnp.arange(winners.shape[0], dtype=jnp.int32)
    return jnp.sum(winners.astype(jnp.int32) * base)


@jax.jit
def run_cascade_batch(image_embeddings, prompt_table, prompt_mask) -> jnp.ndarray:
    """Batched cascade: [n, d] embeddings -> packed int32 [n].

    One device program and ONE array fetch for n reports — n times fewer
    D2H round trips than looping :func:`run_cascade` (the batched serving
    path; the single-image scalar variant stays optimal for n == 1 on
    high-latency links)."""
    sims = jnp.einsum("nd,bpd->nbp", image_embeddings, prompt_table)
    sims = jnp.where(prompt_mask[None] > 0, sims, -jnp.inf)
    winners = jnp.argmax(sims, axis=-1)  # [n, n_banks]
    base = 8 ** jnp.arange(winners.shape[1], dtype=jnp.int32)
    return jnp.sum(winners.astype(jnp.int32) * base[None, :], axis=-1)


def unpack_decisions(packed: int) -> Dict[str, int]:
    """Base-8 packed scalar -> {bank_name: argmax}."""
    packed = int(packed)
    out = {}
    for name in BANK_ORDER:
        out[name] = packed % 8
        packed //= 8
    return out


def decide(model, params, tokenizer, image_features) -> Dict[str, int]:
    """Convenience wrapper: features -> dict of decision indices.

    The prompt table depends only on (params, tokenizer); it is cached on
    the model instance so repeated calls never re-run the frozen text tower
    (serving keeps its own cache — mmgclip_tpu/serving.py)."""
    feats = jnp.asarray(image_features)
    if feats.ndim == 1:
        feats = feats[None, :]
    flat = model.apply_image_tower(params, feats)
    emb = l2_normalize(model.project_image(params, flat, train=False))[0]
    # strong references + `is`: id() could be recycled by new objects.
    # The table depends on BOTH params and tokenizer (the docstring's own
    # contract) — a params-only key would reuse token ids from a previous
    # tokenizer silently
    cached = getattr(model, "_cascade_table_cache", None)
    if cached is None or cached[0] is not params or cached[1] is not tokenizer:
        table, mask = build_prompt_table(model, params, tokenizer)
        model._cascade_table_cache = (params, tokenizer, table, mask)
    _, _, table, mask = model._cascade_table_cache
    return unpack_decisions(run_cascade(emb, table, mask))  # one scalar fetch
