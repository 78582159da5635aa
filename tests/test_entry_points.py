"""End-to-end tests of the six CLI entry points on synthetic fixtures.

This is the reference's default workflow (SURVEY §7 minimum slice):
encode_images -> train (binary CLIP) -> evaluate_clip -> generate_report,
plus evaluate_cnn and encode_studies.
"""

import os
import runpy
import sys

import numpy as np
import pytest

import mmgclip_tpu
from mmgclip_tpu.config import Config, compose, save_snapshot
from fixtures import build_image_label_tree, make_image_id

pytestmark = pytest.mark.slow  # heavy jit/e2e tier; fast tier: -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")

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
TINY_CNN = {"micro": True, "in_channels": 1}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    base, annotated, lists_dir, _features = build_image_label_tree(
        str(root), n_benign=8, n_malignant=8, image_size=32, feature_store=False
    )
    return {"root": root, "base": base, "annotated": annotated, "lists": lists_dir}


def _configure(ws, run_dir, epochs=2):
    cfg = compose(CONFIG_DIR, "train_binary_class_clf", run_dir=str(run_dir))
    cfg.dataset.config.base_dataset_path = ws["base"]
    cfg.dataset.config.annotated_dataset_path = ws["annotated"]
    cfg.dataset.config.lists_dataset_path = ws["lists"]
    cfg.base.features_export_dir = str(ws["root"] / "encoded")
    cfg.base.export_dir = str(run_dir)
    cfg.base.results_export_dir = str(run_dir / "results")
    cfg.base.tensorboard_export_dir = str(run_dir / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(run_dir / "checkpoints")
    cfg.tokenizer.config.sequence_length = 32
    cfg.networks.text_encoder = Config({"name": "BertEncoder", **TINY_TEXT})
    cfg.networks.image_encoder.config = Config(TINY_CNN)
    cfg.scheduler.config.epochs = epochs
    cfg.dataloader.train.batch_size = 4
    cfg.dataloader.valid.batch_size = 2
    cfg.dataloader.test.batch_size = 2
    return cfg


def test_01_encode_images(workspace):
    import encode_images

    run_dir = workspace["root"] / "encode_run"
    run_dir.mkdir(exist_ok=True)
    cfg = _configure(workspace, run_dir)
    encode_images.extract(cfg)
    store = cfg.base.features_export_dir
    files = [f for _r, _d, fs in os.walk(store) for f in fs if f.endswith(".npy")]
    assert len(files) == 16
    # features have the reference layout [1, 768, 1, 1]
    sample = np.load(
        next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(store)
            for f in fs
            if f.endswith(".npy")
        )
    )
    assert sample.shape == (1, 768, 1, 1)
    assert np.isfinite(sample).all()


def test_02_train(workspace):
    import train

    run_dir = workspace["root"] / "train_run"
    run_dir.mkdir(exist_ok=True)
    cfg = _configure(workspace, run_dir)
    # the image-label store written by encode_images nests under <root>/encoded
    cfg.base.features_export_dir = str(workspace["root"] / "encoded")
    save_snapshot(cfg, str(run_dir))
    train.run(cfg)
    assert os.path.isfile(os.path.join(cfg.checkpoints.checkpoints_export_dir, "model.msgpack"))
    assert os.path.isfile(os.path.join(cfg.base.results_export_dir, "results.txt"))
    results = open(os.path.join(cfg.base.results_export_dir, "results.txt")).read()
    assert "auc" in results or "Finding suggesting" in results


def test_03_evaluator_standalone(workspace):
    """Evaluator reloads the checkpoint from disk (evaluate_clip path)."""
    run_dir = workspace["root"] / "train_run"
    cfg = _configure(workspace, run_dir)
    cfg.base.features_export_dir = str(workspace["root"] / "encoded")
    cfg.base.results_export_dir = str(run_dir / "results_replay")

    mmgclip_tpu.seeding(int(cfg.base.seed))
    dataset = mmgclip_tpu.get_dataset(cfg.dataset.eval.dataset.name)(config=cfg)
    _, val_split = dataset.random_split(dataset=dataset, split="train")
    _, test_split = dataset.random_split(dataset=val_split, split="test")
    loader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=test_split).get_dataloader(
        batch_size=2, shuffle=False, drop_last=True, collate_fn=dataset.collate_fn
    )
    evaluator = mmgclip_tpu.Evaluator(config=cfg, test_dataloader=loader, tokenizer=dataset.tokenizer)
    results = evaluator.evaluate_experiment()
    assert results
    assert os.path.isfile(os.path.join(cfg.base.results_export_dir, "results.txt"))


def test_04_generate_report(workspace):
    import generate_report as gr
    from mmgclip_tpu.training.checkpoint import load_checkpoint

    run_dir = workspace["root"] / "train_run"
    cfg = _configure(workspace, run_dir)
    cfg.base.features_export_dir = str(workspace["root"] / "encoded")

    from mmgclip_tpu.evaluation.report_cascade import BANKS, decide

    rngs = mmgclip_tpu.seeding(42)
    tokenizer = mmgclip_tpu.Tokenizer.from_pretrained("x", sequence_length=32)
    model = mmgclip_tpu.MMGCLIP(cfg, seed=42, vocab_size=tokenizer.vocab_size)
    ckp = os.path.join(cfg.checkpoints.checkpoints_export_dir, "model.msgpack")
    state = load_checkpoint(ckp, model.trainable_params)

    image_id = make_image_id(2000000, 2, "cl")
    embeddings = gr.encode_inputs(cfg, image_id=image_id)
    assert embeddings.shape == (1, 768)

    # one-device-call cascade decisions
    decisions = decide(model, state["params"], tokenizer, embeddings)
    assert set(decisions) == set(BANKS)
    for name, idx in decisions.items():
        assert 0 <= idx < len(BANKS[name])

    # cascade argmax must match the step-by-step PromptClassifier path
    clf = mmgclip_tpu.PromptClassifier(model, tokenizer, params=state["params"])
    stepwise = clf(embeddings, BANKS["mass_type"])
    assert decisions["mass_type"] == stepwise["similarities_argmax"]

    text, report = gr.generate_report(decisions, rng=rngs.host)
    assert isinstance(text, str) and len(text) > 10
    assert "{" not in text
    assert report["mass_type"] is not None
    # determinism: same seed -> same report
    text2, _ = gr.generate_report(decisions, rng=mmgclip_tpu.seeding(42).host)
    assert text == text2

    # exam-level path with view fusion: pid 02000000, study 02
    cfg.dataset.config.concatenate_features_method = "avgpool"
    exam_embeddings = gr.encode_inputs(cfg, exam_id="0200000002")
    assert exam_embeddings.shape == (1, 768)


def test_05_evaluate_cnn(workspace):
    import evaluate_cnn

    run_dir = workspace["root"] / "cnn_run"
    run_dir.mkdir(exist_ok=True)
    cfg = _configure(workspace, run_dir)
    cfg.base.features_export_dir = str(workspace["root"] / "encoded")
    evaluate_cnn.run(cfg)
    assert os.path.isdir(os.path.join(cfg.base.results_export_dir, "ova"))


def test_06_encode_studies_and_exam_training(workspace, tmp_path):
    """Study pipeline: extract study features -> exam-report training config."""
    from fixtures import build_study_report_fixture
    import train

    reports_csv, gtr_csv, features_dir = build_study_report_fixture(str(tmp_path), n_studies=12)
    run_dir = tmp_path / "exam_run"
    run_dir.mkdir()
    cfg = compose(CONFIG_DIR, "train_exam_reports_clf", run_dir=str(run_dir))
    cfg.dataset.config.final_reports_dataset_path = reports_csv
    cfg.dataset.config.gt_path = gtr_csv
    cfg.base.features_export_dir = features_dir
    cfg.base.export_dir = str(run_dir)
    cfg.base.results_export_dir = str(run_dir / "results")
    cfg.base.tensorboard_export_dir = str(run_dir / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(run_dir / "checkpoints")
    cfg.tokenizer.config.sequence_length = 32
    cfg.networks.text_encoder = Config({"name": "BertEncoder", **TINY_TEXT})
    cfg.networks.image_encoder.config = Config(TINY_CNN)
    cfg.scheduler.config.epochs = 2
    cfg.dataloader.train.batch_size = 2
    cfg.dataloader.valid.batch_size = 2
    cfg.dataset.eval.enum_classes = []  # eval dataset (image-label) not present here
    save_snapshot(cfg, str(run_dir))

    train.run(cfg)
    assert os.path.isfile(os.path.join(cfg.checkpoints.checkpoints_export_dir, "model.msgpack"))
