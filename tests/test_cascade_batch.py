"""Batched cascade == the per-image scalar cascade, decision for decision."""

import jax.numpy as jnp
import numpy as np

from mmgclip_tpu.evaluation.report_cascade import (
    BANK_ORDER,
    BANKS,
    run_cascade,
    run_cascade_batch,
    unpack_decisions,
)


def _table(seed=0, d=64):
    rng = np.random.default_rng(seed)
    max_prompts = max(len(v) for v in BANKS.values())
    table = jnp.asarray(rng.normal(size=(len(BANKS), max_prompts, d)), jnp.float32)
    mask = jnp.asarray(
        [[1] * len(BANKS[n]) + [0] * (max_prompts - len(BANKS[n])) for n in BANK_ORDER],
        jnp.int32,
    )
    return table, mask


def test_batch_matches_per_image_cascade():
    table, mask = _table()
    rng = np.random.default_rng(1)
    embeddings = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)

    packed = np.asarray(run_cascade_batch(embeddings, table, mask))
    assert packed.shape == (16,)
    for i in range(16):
        expected = unpack_decisions(run_cascade(embeddings[i], table, mask))
        assert unpack_decisions(packed[i]) == expected


def test_engine_cascade_decisions_batched(tmp_path):
    """The serving engine's batch path returns per-image decision dicts with
    valid bank indices."""
    # exercised end-to-end (engine + real checkpoint) in tests/test_serving.py;
    # here the pure batch function handles a big batch in one call
    table, mask = _table(seed=2)
    embeddings = jnp.asarray(np.random.default_rng(3).normal(size=(64, 64)), jnp.float32)
    packed = np.asarray(run_cascade_batch(embeddings, table, mask))
    for p in packed:
        decisions = unpack_decisions(p)
        for name in BANK_ORDER:
            assert 0 <= decisions[name] < len(BANKS[name])
