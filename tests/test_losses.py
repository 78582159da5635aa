import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgclip_tpu.losses import (
    assign_similarity_labels,
    average_logits_by_label,
    averaged_medical_clip_loss,
    clip_loss,
    create_loss,
    mmgclip_loss,
)


def _torch_style_ce(logits, labels):
    """Oracle: mean cross-entropy like torch.nn.functional.cross_entropy."""
    logits = np.asarray(logits, np.float64)
    shifted = logits - logits.max(-1, keepdims=True)
    log_probs = shifted - np.log(np.exp(shifted).sum(-1, keepdims=True))
    return -np.mean(log_probs[np.arange(len(labels)), labels])


def test_clip_loss_matches_ce_oracle():
    rng = np.random.default_rng(0)
    lpi = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    lpt = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    loss, labels = clip_loss(lpi, lpt)
    expected = (_torch_style_ce(lpi, np.arange(8)) + _torch_style_ce(lpt, np.arange(8))) / 2
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(labels), np.arange(8))


def test_clip_loss_perfect_alignment_is_low():
    eye = jnp.eye(8) * 100.0
    loss, _ = clip_loss(eye, eye)
    assert float(loss) < 1e-3
    uniform = jnp.zeros((8, 8))
    loss_u, _ = clip_loss(uniform, uniform)
    np.testing.assert_allclose(float(loss_u), np.log(8), rtol=1e-5)


def test_mmgclip_loss_reduces_to_clip_plus_t2t():
    rng = np.random.default_rng(1)
    emb = lambda: jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    img, txt, txt2 = emb(), emb(), emb()
    scale = jnp.asarray(5.0)
    loss, labels = mmgclip_loss(img, txt, txt2, scale)
    lpi = np.asarray(scale * img @ txt.T)
    lpt = np.asarray(scale * txt @ img.T)
    clip_term = (_torch_style_ce(lpi, np.arange(4)) + _torch_style_ce(lpt, np.arange(4))) / 2
    t21 = np.asarray(scale * txt2 @ txt.T)
    t12 = np.asarray(scale * txt @ txt2.T)
    t2t = (_torch_style_ce(t21, np.arange(4)) + _torch_style_ce(t12, np.arange(4))) / 2
    np.testing.assert_allclose(float(loss), clip_term + 0.5 * t2t, rtol=1e-5)


def _greedy_reference_labels(sim, threshold):
    """The reference's Python loop (reference: losses.py:148-162)."""
    n = sim.shape[0]
    labels = [-1] * n
    current = 0
    for i in range(n):
        if labels[i] == -1:
            labels[i] = current
            for j in range(i + 1, n):
                if sim[i][j] >= threshold and labels[j] == -1:
                    labels[j] = current
            current += 1
    return labels


def test_assign_labels_matches_reference_greedy():
    rng = np.random.default_rng(2)
    for _ in range(10):
        sim = rng.uniform(-1, 1, size=(12, 12))
        sim = (sim + sim.T) / 2
        np.fill_diagonal(sim, 1.0)
        ours = np.asarray(assign_similarity_labels(jnp.asarray(sim, jnp.float32), 0.65))
        ref = _greedy_reference_labels(sim, 0.65)
        # dense 0..k-1 values must match the reference exactly — the forward
        # CE indexes full text-logit columns with them
        np.testing.assert_array_equal(ours, ref)


def test_assign_labels_docstring_example():
    # the 8x8 alternating pattern from the reference docstring (losses.py:129-139)
    base = np.full((8, 8), -0.0237)
    for i in range(8):
        for j in range(8):
            if i % 2 == j % 2:
                base[i, j] = 1.0
    labels = np.asarray(assign_similarity_labels(jnp.asarray(base, jnp.float32), 0.65))
    expected_partition = [0, 1, 0, 1, 0, 1, 0, 1]
    for a in range(8):
        for b in range(8):
            assert (labels[a] == labels[b]) == (expected_partition[a] == expected_partition[b])


def test_average_logits_by_label():
    logits = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    labels = jnp.asarray([0, 2, 0, 2])
    averaged = np.asarray(average_logits_by_label(logits, labels))
    np.testing.assert_allclose(averaged[:, 0], np.asarray(logits[:, [0, 2]]).mean(1))
    np.testing.assert_allclose(averaged[:, 2], np.asarray(logits[:, [1, 3]]).mean(1))
    assert np.isneginf(averaged[:, 1]).all() and np.isneginf(averaged[:, 3]).all()


def test_averaged_medical_clip_loss_runs_under_jit():
    rng = np.random.default_rng(3)
    txt = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    # duplicate texts 0<->4 to force a cluster
    txt = txt.at[4].set(txt[0])
    img = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    scale = jnp.asarray(np.exp(np.log(1 / 0.07)), jnp.float32)
    lpi = scale * img @ txt.T
    lpt = scale * txt @ img.T
    fn = jax.jit(averaged_medical_clip_loss)
    loss, labels = fn(img, txt, scale, lpi, lpt)
    assert np.isfinite(float(loss))
    labels = np.asarray(labels)
    assert labels[0] == labels[4]
    # gradient flows
    grad = jax.grad(lambda e: averaged_medical_clip_loss(img, e, scale, scale * img @ e.T, scale * e @ img.T)[0])(txt)
    assert np.isfinite(np.asarray(grad)).all()


def _reference_averaged_loss(img, txt, scale, threshold=0.65):
    """Numpy re-implementation of the reference forward
    (reference: losses.py:188-216): cos_sim -> greedy labels -> per-cluster
    column means iterated in ``set(labels)`` order (for dense small ints,
    CPython set iteration is increasing, i.e. dense order) -> symmetric CE,
    with the text term indexing the FULL [n, n] text-logit matrix by the
    dense labels."""
    img, txt = np.asarray(img, np.float64), np.asarray(txt, np.float64)
    lpi = scale * img @ txt.T
    lpt = scale * txt @ img.T
    norm = np.maximum(np.linalg.norm(txt, axis=1, keepdims=True), 1e-12)
    sim = (txt / norm) @ (txt / norm).T
    labels = _greedy_reference_labels(sim, threshold)
    uniq = sorted(set(labels))  # == set-iteration order for dense non-negative ints
    averaged = np.stack(
        [lpi[:, [i for i, l in enumerate(labels) if l == u]].mean(1) for u in uniq], axis=1
    )
    labels = np.asarray(labels)
    return (_torch_style_ce(averaged, labels) + _torch_style_ce(lpt, labels)) / 2


def test_averaged_loss_value_equals_reference_oracle():
    """Loss-VALUE equality on 100 random batches, with forced duplicate
    clusters (exact duplicates + near-duplicates + unique rows)."""
    rng = np.random.default_rng(7)
    scale = float(np.exp(np.log(1 / 0.07)))
    fn = jax.jit(averaged_medical_clip_loss)
    for trial in range(100):
        n = int(rng.integers(2, 13))
        txt = rng.normal(size=(n, 16))
        # duplicate a random subset of rows onto earlier rows to force clusters
        for j in range(1, n):
            if rng.uniform() < 0.4:
                src = int(rng.integers(0, j))
                txt[j] = txt[src] + (rng.normal(size=16) * 1e-3 if rng.uniform() < 0.5 else 0.0)
        img = rng.normal(size=(n, 16))
        lpi = scale * img @ txt.T
        lpt = scale * txt @ img.T
        loss, labels = fn(
            jnp.asarray(img, jnp.float32), jnp.asarray(txt, jnp.float32),
            jnp.asarray(scale, jnp.float32),
            jnp.asarray(lpi, jnp.float32), jnp.asarray(lpt, jnp.float32),
        )
        expected = _reference_averaged_loss(img, txt, scale)
        np.testing.assert_allclose(float(loss), expected, rtol=2e-4, atol=1e-5, err_msg=f"trial {trial}")
        sim = np.asarray(txt) / np.linalg.norm(txt, axis=1, keepdims=True)
        np.testing.assert_array_equal(
            np.asarray(labels), _greedy_reference_labels(sim @ sim.T, 0.65), err_msg=f"trial {trial}"
        )


def test_create_loss_registry():
    assert create_loss("CLIPLoss") is clip_loss
    with pytest.raises(ValueError):
        create_loss("NotALoss")
    fn = create_loss("AveragedMedicalCLIPLoss", similarity_threshold=0.9)
    assert callable(fn)


def test_averaged_loss_through_model_forward_contract():
    """create_loss('AveragedMedicalCLIPLoss')(**model_outputs) works — the
    forward dict carries every argument the loss needs."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    scale = jnp.asarray(5.0, jnp.float32)
    outputs = {
        "image_embeddings": img,
        "text_embeddings": txt,
        "logit_scale": scale,
        "logits_per_image": scale * img @ txt.T,
        "logits_per_text": scale * txt @ img.T,
    }
    loss, labels = create_loss("AveragedMedicalCLIPLoss")(**outputs)
    assert np.isfinite(float(loss))
    assert labels.shape == (6,)
