"""tools/compare_runs.py — the cross-experiment aggregation CLI (the
counterpart of the reference's models_performance_reporting.ipynb cells
3/5/6 and evaluate.ipynb)."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from compare_runs import compare_runs, load_run  # noqa: E402


def _fake_run(root, name, aucs, with_curves=True):
    """A minimal experiment dir shaped like the Evaluator's output."""
    results_dir = os.path.join(root, name, "results")
    os.makedirs(os.path.join(results_dir, "zeroshot_label_prompt"), exist_ok=True)
    results = {}
    for key, auc in aucs.items():
        results[key] = {
            "zeroshot_label_prompt": {
                f"{key} prompt A": {"auc": auc, "accuracy": 0.8},
                f"{key} prompt B": {"auc": auc, "accuracy": 0.8},
                "mean_auc": auc,
                "auc_ci_mean": auc,
                "auc_ci_lower": auc - 0.05,
                "auc_ci_higher": min(1.0, auc + 0.05),
                "accuracy": 0.8,
                "f1score": 0.75,
            },
            "confusion_matrix": [[3, 1], [1, 3]],
        }
        if with_curves:
            fpr = np.linspace(0, 1, 8)
            tpr = np.clip(fpr ** (1 - auc), 0, 1)
            curves = [
                {"name": f"{key} prompt {suffix}", "auc": auc,
                 "fpr": fpr.tolist(), "tpr": tpr.tolist()}
                for suffix in ("A", "B")
            ]
            with open(os.path.join(results_dir, "zeroshot_label_prompt",
                                   f"model_{key}_roc_curves.json"), "w") as fh:
                json.dump(curves, fh)
    with open(os.path.join(results_dir, "results.json"), "w") as fh:
        json.dump(results, fh)
    return os.path.join(root, name)


def test_two_run_comparison_table_and_overlays(tmp_path):
    run_a = _fake_run(str(tmp_path), "image_prompts",
                      {"BenignMalignantDatasetLabels": 0.93, "MassShapeLabels": 0.72})
    run_b = _fake_run(str(tmp_path), "exam_reports",
                      {"BenignMalignantDatasetLabels": 0.83, "MassShapeLabels": 0.60})
    out = str(tmp_path / "cmp")
    result = compare_runs([run_a, run_b], out_dir=out)

    assert result["labels"] == ["image_prompts", "exam_reports"]
    md = open(os.path.join(out, "comparison.md")).read()
    assert "0.9300" in md and "0.8300" in md  # attribute x config AUROC cells
    assert "BenignMalignantDatasetLabels" in md
    csv = open(os.path.join(out, "comparison.csv")).read()
    assert csv.splitlines()[0] == "metric,attribute,image_prompts,exam_reports"
    assert any("f1score" in line for line in csv.splitlines())
    txt = open(os.path.join(out, "comparison.txt")).read()
    assert "MassShapeLabels" in txt
    # overlaid ROC per attribute, one curve per run
    for key in ("BenignMalignantDatasetLabels", "MassShapeLabels"):
        assert os.path.isfile(os.path.join(out, f"roc_overlay_{key}.png"))


def test_run_resolution_and_missing_attribute(tmp_path):
    run_a = _fake_run(str(tmp_path), "a", {"BenignMalignantDatasetLabels": 0.9})
    run_b = _fake_run(str(tmp_path), "b",
                      {"BenignMalignantDatasetLabels": 0.8, "MassShapeLabels": 0.6})
    # accepts the results dir and the results.json path too
    loaded = load_run(os.path.join(run_a, "results"))
    assert loaded["metrics"]["BenignMalignantDatasetLabels"]["auc"] == 0.9
    loaded = load_run(os.path.join(run_a, "results", "results.json"))
    assert "BenignMalignantDatasetLabels" in loaded["curves"]

    out = str(tmp_path / "cmp")
    result = compare_runs([run_a, run_b], labels=["A", "B"], out_dir=out)
    auc_rows = {row[0]: row[1:] for row in result["tables"]["auc"].rows}
    assert np.isnan(auc_rows["MassShapeLabels"][0])  # absent in run A
    assert auc_rows["MassShapeLabels"][1] == 0.6


def test_cli_entry(tmp_path):
    run_a = _fake_run(str(tmp_path), "a", {"BenignMalignantDatasetLabels": 0.9},
                      with_curves=False)
    out = str(tmp_path / "cmp")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "compare_runs.py"), run_a,
         "--labels", "only", "--out", out],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    assert "only" in open(os.path.join(out, "comparison.txt")).read()


def test_radar_chart_for_three_plus_attributes(tmp_path):
    """>=3 attributes produce the thesis-style radar PNG; fewer skip it."""
    aucs = {"BenignMalignantDatasetLabels": 0.93, "MassShapeLabels": 0.72,
            "MassMarginLabels": 0.64, "HasCalcification": 0.68}
    run_a = _fake_run(str(tmp_path), "a", aucs)
    run_b = _fake_run(str(tmp_path), "b", {k: v - 0.1 for k, v in aucs.items()})
    out = str(tmp_path / "cmp")
    result = compare_runs([run_a, run_b], out_dir=out)
    assert result["radar"] is not None
    assert os.path.isfile(os.path.join(out, "radar_auroc.png"))

    out2 = str(tmp_path / "cmp2")
    run_c = _fake_run(str(tmp_path), "c", {"BenignMalignantDatasetLabels": 0.9})
    result2 = compare_runs([run_c], out_dir=out2)
    assert result2["radar"] is None  # <3 axes: no radar


def test_mean_curve_binary_picks_positive_class_by_name():
    """Binary tasks must plot the POSITIVE class's ROC regardless of entry
    order, and must SKIP the run (None) when only the negated-class curve
    survived a degenerate split — not silently present 'No X' as the result
    (advisor r3)."""
    from compare_runs import _mean_curve

    fpr = np.linspace(0, 1, 8).tolist()
    pos = {"name": "mass", "auc": 0.9, "fpr": fpr, "tpr": fpr}
    neg = {"name": "No mass", "auc": 0.6, "fpr": fpr, "tpr": fpr}

    # positive class picked by name even when the negated entry comes last
    for entries in ([neg, pos], [pos, neg]):
        curve = _mean_curve(entries)
        assert curve is not None
        assert curve[2] == 0.9

    # positive degenerate, negated survived -> skip, don't mislabel
    degenerate_pos = {"name": "mass", "auc": 0.5, "fpr": [0.0], "tpr": [0.0]}
    assert _mean_curve([neg, degenerate_pos]) is None
    assert _mean_curve([degenerate_pos, neg]) is None
