"""Exam-report training path: MMGCLIPLoss (T2T impression term) end-to-end,
and study-level feature extraction."""

import os

import numpy as np
import pytest

from mmgclip_tpu.config import Config, compose, save_snapshot
from mmgclip_tpu.data import DataLoaders, get_dataset
from mmgclip_tpu.training import create_experiment
from fixtures import build_image_label_tree, build_study_report_fixture

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")

TINY_TEXT = {
    "config": {
        "vocab_size": 4096,
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "intermediate_size": 128,
        "max_position_embeddings": 64,
    }
}


def _exam_config(tmp_path, loss="MMGCLIPLoss"):
    reports_csv, gtr_csv, features_dir = build_study_report_fixture(str(tmp_path), n_studies=12)
    run_dir = tmp_path / "run"
    run_dir.mkdir(exist_ok=True)
    cfg = compose(CONFIG_DIR, "train_exam_reports_clf", run_dir=str(run_dir))
    cfg.dataset.config.final_reports_dataset_path = reports_csv
    cfg.dataset.config.gt_path = gtr_csv
    cfg.base.features_export_dir = features_dir
    cfg.base.export_dir = str(run_dir)
    cfg.base.results_export_dir = str(run_dir / "results")
    cfg.base.tensorboard_export_dir = str(run_dir / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(run_dir / "ckpt")
    cfg.tokenizer.config.sequence_length = 32
    cfg.networks.text_encoder = Config({"name": "BertEncoder", **TINY_TEXT})
    cfg.scheduler.config.epochs = 2
    cfg.dataloader.train.batch_size = 2
    cfg.dataloader.valid.batch_size = 2
    cfg.loss.config.loss_name = loss
    cfg.dataset.eval.enum_classes = []
    # reports-only mode keeps all rows (use_gtr_prompts_only drops no-gtr rows)
    cfg.dataset.config.gtr_prompt_generation = True
    cfg.dataset.config.use_gtr_prompts_only = False
    return cfg


def test_mmgclip_loss_training_with_impressions(tmp_path):
    cfg = _exam_config(tmp_path, loss="MMGCLIPLoss")
    ds = get_dataset(cfg.dataset.name)(config=cfg)
    train_split, val_split = ds.random_split(ds, "train")
    train_loader = DataLoaders(cfg, train_split).get_dataloader(
        batch_size=2, shuffle=True, drop_last=True, collate_fn=ds.collate_fn
    )
    val_loader = DataLoaders(cfg, val_split).get_dataloader(
        batch_size=2, shuffle=False, drop_last=True, collate_fn=ds.collate_fn
    )
    exp = create_experiment("classification")(
        config=cfg, train_dataloader=train_loader, valid_dataloader=val_loader,
        test_dataloader=None, tokenizer=ds.tokenizer,
    )
    # the impression bank must be cached for the T2T term
    assert exp._impression_bank is not None
    exp.run()
    import json

    scalars = [
        json.loads(l)
        for l in open(os.path.join(cfg.base.tensorboard_export_dir, "scalars.jsonl"))
    ]
    train_losses = [s["value"] for s in scalars if s["tag"] == "loss/train"]
    assert len(train_losses) == 2 and all(np.isfinite(v) for v in train_losses)


def test_gtr_prompt_modes(tmp_path):
    # prompts-only mode drops rows without gtr labels
    cfg_only = _exam_config(tmp_path)
    cfg_only.dataset.config.use_gtr_prompts_only = True
    ds_only = get_dataset(cfg_only.dataset.name)(config=cfg_only)

    cfg_mixed = _exam_config(tmp_path)
    cfg_mixed.dataset.config.use_gtr_prompts_only = False
    ds_mixed = get_dataset(cfg_mixed.dataset.name)(config=cfg_mixed)

    assert len(ds_mixed) >= len(ds_only)
    # mixed mode concatenates prompt + report text
    row = ds_mixed.final_reports_dataset.iloc[0]
    assert row["prompt_generated"] in row["image_description"]


def test_study_feature_extractor(tmp_path):
    """StudyFeatureExtractor fuses up to n views per study directory."""
    import pandas as pd

    from mmgclip_tpu.ingest import StudyFeatureExtractor

    base, _annotated, _lists, _feat = build_image_label_tree(
        str(tmp_path), n_benign=4, n_malignant=0, image_size=32, feature_store=False
    )
    # build a study df pointing at the png study dirs
    study_dirs = []
    for pid_dir in sorted(os.listdir(base)):
        for pid in sorted(os.listdir(os.path.join(base, pid_dir))):
            study_dirs.append(os.path.join(base, pid_dir, pid, "st02"))
    df = pd.DataFrame({"study_path": study_dirs})

    cfg = compose(CONFIG_DIR, "train_exam_reports_clf", run_dir=str(tmp_path / "r"))
    cfg.base.features_export_dir = str(tmp_path / "study_feats")
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.dataset.config.concatenate_features_method = "avgpool"
    cfg.dataset.config.n_images_per_study = 4

    count = StudyFeatureExtractor(config=cfg, dataset=df).extract()
    assert count == len(study_dirs)
    npys = [f for _r, _d, fs in os.walk(cfg.base.features_export_dir) for f in fs if f.endswith(".npy")]
    assert len(npys) == len(study_dirs)
    sample = np.load(
        next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(cfg.base.features_export_dir)
            for f in fs if f.endswith(".npy")
        )
    )
    assert sample.shape == (768,)
