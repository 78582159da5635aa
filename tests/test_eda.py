"""EDA tool (reference: notebooks/EDA.ipynb as a CLI): statistics over the
annotated dataframe, inconsistency detection, report + histogram artifacts."""

import os
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from eda import analyse, format_report  # noqa: E402

from fixtures import build_image_label_tree  # noqa: E402


def _frame():
    return pd.DataFrame(
        {
            "image_id": ["a", "b", "c", "d"],
            "image_label": [0, 1, 2, 0],
            "mass_margin": [[-1], ["spiculated"], ["obscured", "circumscribed"], [-1]],
            "mass_shape": [["oval"], ["irregular"], ["round", "oval"], [-1]],
            "has_mass": [True, True, True, False],
            "has_architectural_distortion": [False, True, False, False],
            "has_calc": [False, False, True, False],
            "image_path": ["p1", "p2", "p3", "p4"],
        }
    )


def test_analyse_statistics():
    stats = analyse(_frame())
    assert stats["n_images"] == 4
    assert stats["image_label_counts"] == {0: 2, 1: 1, 2: 1}
    assert stats["flag_counts"] == {
        "has_mass": 3, "has_calc": 1, "has_architectural_distortion": 1,
    }
    assert stats["n_has_mass_margin"] == 2
    assert stats["n_has_mass_shape"] == 3
    assert stats["n_multiple_margins"] == 1
    assert stats["n_multiple_shapes"] == 1
    # image "a" has a shape but no margin — the EDA.ipynb inconsistency check
    assert stats["shape_without_margin"] == ["a"]
    assert stats["margin_without_shape"] == []
    assert stats["margin_label_counts"] == {
        "spiculated": 1, "obscured": 1, "circumscribed": 1,
    }
    assert stats["combined_margin_counts"] == {
        "spiculated": 1, "circumscribed / obscured": 1,
    }


def test_format_report_contains_key_lines():
    text = format_report(analyse(_frame()))
    assert "images: 4" in text
    assert "views with multiple margins: 1" in text
    assert "shape without margin" in text
    assert "spiculated: 1" in text


def test_eda_cli_end_to_end(tmp_path):
    base, annotated, lists_dir, _ = build_image_label_tree(
        str(tmp_path), n_benign=4, n_malignant=4, image_size=16, feature_store=False
    )
    out = tmp_path / "eda_out"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "eda.py"),
            "--config-name", "train_binary_class_clf",
            "--out", str(out),
            f"dataset.config.base_dataset_path={base}",
            f"dataset.config.annotated_dataset_path={annotated}",
            f"dataset.config.lists_dataset_path={lists_dir}",
        ],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "images: 8" in proc.stdout
    assert (out / "eda.txt").exists()
    assert (out / "margin_label_counts.png").exists()
    assert (out / "shape_label_counts.png").exists()
