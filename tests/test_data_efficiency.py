"""Data-efficiency sweep tool: trains at multiple fractions, collects AUCs
(reference ships the percentage knob but sweeps by hand)."""

import csv
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from data_efficiency import run_sweep, write_outputs  # noqa: E402

from fixtures import build_image_label_tree  # noqa: E402

pytestmark = pytest.mark.slow


def test_sweep_two_fractions(tmp_path):
    base, annotated, lists_dir, features_dir = build_image_label_tree(
        str(tmp_path), n_benign=10, n_malignant=10, separable=True
    )
    overrides = [
        f"dataset.config.base_dataset_path={base}",
        f"dataset.config.annotated_dataset_path={annotated}",
        f"dataset.config.lists_dataset_path={lists_dir}",
        f"base.features_export_dir={features_dir}",
        "tokenizer.config.sequence_length=32",
        "scheduler.config.epochs=2",
        "dataloader.train.batch_size=4",
        "dataloader.valid.batch_size=2",
        "dataloader.test.batch_size=2",
        "networks.text_encoder.config.vocab_size=4096",
        "networks.text_encoder.config.hidden_size=64",
        "networks.text_encoder.config.num_hidden_layers=2",
        "networks.text_encoder.config.num_attention_heads=4",
        "networks.text_encoder.config.intermediate_size=128",
        "networks.text_encoder.config.max_position_embeddings=64",
    ]
    out = str(tmp_path / "sweep")
    rows = run_sweep("train_binary_class_clf", [0.5, 1.0], out, overrides)

    fractions = sorted({row["fraction"] for row in rows})
    assert fractions == [0.5, 1.0]
    assert all(0.0 <= row["mean_auc"] <= 1.0 for row in rows)

    csv_path = write_outputs(rows, out)
    with open(csv_path) as fh:
        read_back = list(csv.DictReader(fh))
    assert len(read_back) == len(rows)
    assert os.path.isfile(os.path.join(out, "data_efficiency.png"))
    # each fraction produced a full run dir with a results artifact
    for tag in ("p50", "p100"):
        assert os.path.isfile(os.path.join(out, tag, "results", "results.json"))
        assert os.path.isfile(os.path.join(out, tag, ".hydra", "config.yaml"))
