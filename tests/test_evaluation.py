import os

import numpy as np
import pytest

import mmgclip_tpu.evaluation.metrics as M

sklearn_metrics = pytest.importorskip("sklearn.metrics")


def test_roc_curve_matches_sklearn():
    rng = np.random.default_rng(0)
    for _ in range(5):
        y = rng.integers(0, 2, 50)
        if y.min() == y.max():
            continue
        s = rng.normal(size=50)
        fpr, tpr, _ = M.roc_curve(y, s)
        sk_fpr, sk_tpr, _ = sklearn_metrics.roc_curve(y, s)
        np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
        np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)


def test_auc_and_roc_auc_score_match_sklearn():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 200)
    s = rng.normal(size=200) + y * 0.5
    assert M.roc_auc_score(y, s) == pytest.approx(sklearn_metrics.roc_auc_score(y, s), abs=1e-12)
    fpr, tpr, _ = M.roc_curve(y, s)
    assert M.auc(fpr, tpr) == pytest.approx(sklearn_metrics.auc(fpr, tpr), abs=1e-12)
    # with ties
    s_tied = np.round(s)
    assert M.roc_auc_score(y, s_tied) == pytest.approx(sklearn_metrics.roc_auc_score(y, s_tied), abs=1e-12)


def test_f1_accuracy_confusion_match_sklearn():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 3, 100)
    p = rng.integers(0, 3, 100)
    assert M.accuracy_score(y, p) == pytest.approx(sklearn_metrics.accuracy_score(y, p))
    np.testing.assert_array_equal(
        M.confusion_matrix(y, p, labels=range(3)), sklearn_metrics.confusion_matrix(y, p, labels=range(3))
    )
    yb = rng.integers(0, 2, 100)
    pb = rng.integers(0, 2, 100)
    assert M.f1_score(yb, pb) == pytest.approx(sklearn_metrics.f1_score(yb, pb))
    assert M.f1_score(y, p, average="micro") == pytest.approx(
        sklearn_metrics.f1_score(y, p, average="micro")
    )


def test_bootstrap_ci_sane():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 2, 300)
    s = y + rng.normal(scale=0.5, size=300)  # strong signal
    ci = M.bootstrap_auc_ci(y, s, n_iterations=200, seed=0)
    assert 0.8 < ci["lower"] <= ci["mean"] <= ci["upper"] <= 1.0
    assert ci["n_valid"] > 150
    # deterministic given seed
    ci2 = M.bootstrap_auc_ci(y, s, n_iterations=200, seed=0)
    assert ci == ci2


def test_softmax_rows_sum_to_one():
    x = np.random.default_rng(4).normal(size=(5, 7)) * 50
    p = M.softmax(x, axis=1)
    np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-12)
    assert (p >= 0).all()


def test_mean_roc_curve():
    fpr1, tpr1 = np.array([0, 0.5, 1]), np.array([0, 0.8, 1])
    fpr2, tpr2 = np.array([0, 0.2, 1]), np.array([0, 0.6, 1])
    mean_fpr, mean_tpr, std, mean_auc = M.mean_roc_curve([(fpr1, tpr1), (fpr2, tpr2)])
    assert mean_fpr.shape == mean_tpr.shape == (100,)
    assert 0.5 < mean_auc <= 1.0

def test_zeroshot_label_prompt_skips_unknown_enum():
    """Enums without a fixed label-prompt bank (the gtr_* families are valid
    dataset.eval.enum_classes values) must skip loudly, not KeyError away the
    whole evaluation run before results.txt is written."""
    from mmgclip_tpu.evaluation.evaluator import Evaluator

    out = Evaluator.zeroshot_label_prompt(None, None, None, None, "gtr_MassMargin")
    assert out is None
