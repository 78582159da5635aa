"""Exam-family (StudyReportDataset + MMGCLIPLoss/T2T) live-vs-live parity.

Complements tests/test_e2e_parity.py (image family) and
tests/test_exam_supervision_parity.py (supervision byte-parity): the LIVE
reference exam stack — StudyReportDataset, its collate (description AND
impression tokens), MMGCLIP forward with the second text pass, MMGCLIPLoss —
runs against ours on the same fixture CSVs, the same local HF BertModel,
and the same study features.

Gates:
1. token parity — identical input_ids/attention_mask for BOTH text columns;
2. numeric parity — reference-trained-shape weights transplanted into our
   model reproduce logits AND the T2T impression embeddings;
3. loss parity — each stack's own MMGCLIPLoss on its own forward outputs
   produces the same value.
"""

import os
import sys

import numpy as np
import pytest

import mmgclip_tpu
from mmgclip_tpu.config import Config
from fixtures import build_study_report_fixture
from test_e2e_parity import _install_reference_shims

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "vocab_fixture.txt")

pytestmark = pytest.mark.slow

SEED = 7
HIDDEN = 64
SEQ = 32


def _config(reports_csv, gtr_csv, export_dir, hf_dir):
    return Config(
        {
            "base": {
                "seed": SEED,
                "features_export_dir": os.path.dirname(reports_csv),
                "export_dir": str(export_dir),
            },
            "dataset": {
                "name": "StudyReportDataset",
                "config": {
                    "final_reports_dataset_path": reports_csv,
                    "gt_path": gtr_csv,
                    "gtr_prompt_generation": False,
                    "use_gtr_prompts_only": False,
                    "post_translation_fileid": "fixture",
                },
                "split": {"train_split_ratio": 0.7, "test_split_ratio": 0.5},
            },
            "tokenizer": {"config": {"tokenizer_name": hf_dir, "sequence_length": SEQ}},
            "networks": {
                "logit_temperature": 0.07,
                "image_encoder": {
                    "name": "ConvNextTiny",
                    "convnext_tiny_clf_path": "",
                    "image_features_dimension": 768,
                },
                "text_encoder": {"name": "BertEncoder"},
                "dropout": {"config": {"dropout": 0.0}},
            },
            "projection": {
                "config": {"projection_name": "LinearProjectionLayer",
                           "output_projection_dimension": 64}
            },
            "loss": {"config": {"loss_name": "MMGCLIPLoss"}},
        }
    )


def _make_workspace(tmp_path_factory, name, n_studies, separable=False):
    import runpy

    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    root = tmp_path_factory.mktemp(name)
    reports_csv, gtr_csv, _features = build_study_report_fixture(
        str(root), n_studies=n_studies, separable=separable
    )

    # the reference __getitem__ torch.load()s study features: mirror the
    # .npy store as .pth with identical values and a path-swapped CSV
    import pandas as pd

    df = pd.read_csv(reports_csv, index_col=0, dtype=str)
    torch_paths = []
    for path in df["study_path"]:
        tpath = path.replace(".npy", ".pth")
        torch.save(torch.tensor(np.load(path)), tpath)
        torch_paths.append(tpath)
    df["study_path"] = torch_paths
    reports_torch_csv = os.path.join(str(root), "final_reports_dataset_torch.csv")
    df.to_csv(reports_torch_csv)

    # one local HF checkpoint for both stacks
    hf_dir = str(root / "hf_bert")
    with open(VOCAB, encoding="utf-8") as fh:
        vocab_size = sum(1 for line in fh if line.strip())
    torch.manual_seed(0)
    bert = BertModel(
        BertConfig(
            vocab_size=vocab_size, hidden_size=HIDDEN, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
    )
    bert.eval()
    bert.save_pretrained(hf_dir)
    BertTokenizer(vocab_file=VOCAB).save_pretrained(hf_dir)

    msgpack = str(root / "bert_converted.msgpack")
    argv = sys.argv
    sys.argv = ["convert_bert.py", "--input", hf_dir, "--output", msgpack]
    try:
        runpy.run_path(os.path.join(REPO, "tools", "convert_bert.py"), run_name="__main__")
    finally:
        sys.argv = argv

    _install_reference_shims()
    return {
        "root": root, "reports": reports_csv, "reports_torch": reports_torch_csv,
        "gtr": gtr_csv, "hf_dir": hf_dir, "msgpack": msgpack, "vocab_size": vocab_size,
    }


@pytest.fixture(scope="module")
def exam_ws(tmp_path_factory):
    return _make_workspace(tmp_path_factory, "exam_e2e", n_studies=8)


@pytest.fixture(scope="module")
def stacks(exam_ws, tmp_path_factory):
    import torch

    from mmgclip.dataset.dataset import StudyReportDataset as RefStudyReportDataset
    from mmgclip.networks.mmgclip_model import MMGCLIP as RefMMGCLIP

    ref_dir = tmp_path_factory.mktemp("ref")
    our_dir = tmp_path_factory.mktemp("ours")

    ref_cfg = _config(exam_ws["reports_torch"], exam_ws["gtr"], ref_dir, exam_ws["hf_dir"])
    ref_ds = RefStudyReportDataset(config=ref_cfg)
    ref_batch = ref_ds.collate_fn([ref_ds[i] for i in range(len(ref_ds))])
    torch.manual_seed(SEED)
    ref_model = RefMMGCLIP(config=ref_cfg)
    ref_model.eval()

    our_cfg = _config(exam_ws["reports"], exam_ws["gtr"], our_dir, exam_ws["hf_dir"])
    our_cfg.networks.text_encoder = Config(
        {
            "name": "BertEncoder",
            "weights_path": exam_ws["msgpack"],
            "config": {
                "vocab_size": exam_ws["vocab_size"], "hidden_size": HIDDEN,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "intermediate_size": 128, "max_position_embeddings": 64,
            },
        }
    )
    our_ds = mmgclip_tpu.get_dataset("StudyReportDataset")(config=our_cfg)
    our_batch = our_ds.collate_fn([our_ds[i] for i in range(len(our_ds))])
    our_model = mmgclip_tpu.MMGCLIP(our_cfg, seed=0, vocab_size=exam_ws["vocab_size"])

    return {
        "ref_cfg": ref_cfg, "ref_ds": ref_ds, "ref_batch": ref_batch, "ref_model": ref_model,
        "our_cfg": our_cfg, "our_ds": our_ds, "our_batch": our_batch, "our_model": our_model,
    }


def test_01_both_text_columns_tokenize_identically(stacks):
    ref_batch, our_batch = stacks["ref_batch"], stacks["our_batch"]
    for ref_key, our_key in (
        ("text_tokens", "text_tokens"),
        ("image_impression_tokens", "image_impression_tokens"),
    ):
        for field in ("input_ids", "attention_mask"):
            np.testing.assert_array_equal(
                np.asarray(our_batch[our_key][field]),
                ref_batch[ref_key][field].numpy(),
                err_msg=f"{ref_key}.{field}",
            )
    np.testing.assert_allclose(
        np.asarray(our_batch["image_features"]),
        ref_batch["image_features"].numpy(),
        rtol=1e-6,
    )


def test_02_transplanted_forward_matches_incl_t2t(stacks):
    import jax.numpy as jnp
    import torch

    ref_model, ref_batch = stacks["ref_model"], stacks["ref_batch"]
    with torch.no_grad():
        ref_out = ref_model(ref_batch, validation=False)
    assert "text_embeddings2" in ref_out, "reference T2T branch did not fire"

    our_model = stacks["our_model"]
    params = dict(our_model.trainable_params)
    params["image_projection"] = {
        "layer": {"kernel": ref_model.image_projection_layer.layer.weight.detach().numpy().T}
    }
    params["text_projection"] = {
        "layer": {"kernel": ref_model.text_projection_layer.layer.weight.detach().numpy().T}
    }
    params["logit_scale"] = np.float32(ref_model.logit_scale.detach().numpy())

    our_batch = stacks["our_batch"]
    batch = {
        "image_features": jnp.asarray(np.asarray(our_batch["image_features"])),
        "text_tokens": {k: jnp.asarray(np.asarray(v)) for k, v in our_batch["text_tokens"].items()},
        "image_impression_tokens": {
            k: jnp.asarray(np.asarray(v)) for k, v in our_batch["image_impression_tokens"].items()
        },
    }
    our_out = stacks["our_model"].forward(params, batch, train=False)
    assert "text_embeddings2" in our_out

    np.testing.assert_allclose(
        np.asarray(our_out["logits_per_image"]),
        ref_out["logits_per_image"].detach().numpy(),
        atol=5e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(our_out["text_embeddings2"]),
        ref_out["text_embeddings2"].detach().numpy(),
        atol=2e-3, rtol=1e-3,
    )

    # gate 3: each stack's own MMGCLIPLoss on its own outputs
    from mmgclip.loss.losses import MMGCLIPLoss as RefMMGCLIPLoss

    from mmgclip_tpu.losses import mmgclip_loss

    ref_loss, _ = RefMMGCLIPLoss()(**{k: v for k, v in ref_out.items()})
    our_loss, _ = mmgclip_loss(
        image_embeddings=our_out["image_embeddings"],
        text_embeddings=our_out["text_embeddings"],
        text_embeddings2=our_out["text_embeddings2"],
        logit_scale=our_out["logit_scale"],
    )
    np.testing.assert_allclose(float(our_loss), float(ref_loss), atol=5e-3, rtol=1e-3)


# ----------------------------------------------------------------------
# Full-dress TRAINING rehearsal (VERDICT r2 #4): the LIVE reference
# StudyReportDataset + ClassifierExperiment (MMGCLIPLoss, impression T2T,
# the thesis' "Exam-Reports+Prompts" supervision) trains against our
# train.run on the same fixtures — the same statement the image family has
# in tests/test_e2e_parity.py.
# ----------------------------------------------------------------------

TRAIN_SEED = 42
TRAIN_EPOCHS = 10


@pytest.fixture(scope="module")
def train_ws(tmp_path_factory):
    return _make_workspace(tmp_path_factory, "exam_train", n_studies=32, separable=True)


def _ref_train_config(ws, run_dir):
    return Config(
        {
            "base": {
                "seed": TRAIN_SEED, "patience": TRAIN_EPOCHS,
                "features_export_dir": os.path.dirname(ws["reports_torch"]),
                "export_dir": str(run_dir),
                "results_export_dir": str(run_dir / "results"),
                "tensorboard_export_dir": str(run_dir / "runs"),
            },
            "checkpoints": {
                "checkpoints_export_dir": str(run_dir / "checkpoints"),
                "checkpoints_file_name": "model.pth",
            },
            "dataset": {
                "name": "StudyReportDataset",
                "config": {
                    "final_reports_dataset_path": ws["reports_torch"],
                    "gt_path": ws["gtr"],
                    "gtr_prompt_generation": True,   # Exam-Reports+Prompts
                    "use_gtr_prompts_only": False,
                    "post_translation_fileid": "fixture",
                },
                "eval": {"enum_classes": [], "method": [],
                         "dataset": {"name": "ImageLabelDataset"}},
                "split": {"train_split_ratio": 0.7, "test_split_ratio": 0.5},
            },
            "tokenizer": {"config": {"tokenizer_name": ws["hf_dir"], "sequence_length": SEQ}},
            "networks": {
                "logit_temperature": 0.07,
                "image_encoder": {
                    "name": "ConvNextTiny",
                    "convnext_tiny_clf_path": "",
                    "image_features_dimension": 768,
                },
                "text_encoder": {"name": "BertEncoder"},
                "dropout": {"config": {"dropout": 0.0}},
            },
            "projection": {
                "config": {"projection_name": "LinearProjectionLayer",
                           "output_projection_dimension": 64}
            },
            "loss": {"config": {"loss_name": "MMGCLIPLoss"}},
            "optimizer": {"config": {"learning_rate": 5e-3, "weight_decay": 1e-4}},
            "scheduler": {"name": "cosine",
                          "config": {"warmup_epochs": 0.1, "epochs": TRAIN_EPOCHS}},
            "experiments": {"config": {"experiment_name": "classification", "metrics": []}},
        }
    )


@pytest.fixture(scope="module")
def exam_ref_train(train_ws, tmp_path_factory):
    """Train the LIVE reference exam stack; capture the loss trajectory."""
    _install_reference_shims()
    run_dir = tmp_path_factory.mktemp("exam_ref_train")
    cfg = _ref_train_config(train_ws, run_dir)

    from mmgclip.dataset.dataset import get_dataset as ref_get_dataset
    from mmgclip.dataset.dataloaders import DataLoaders as RefDataLoaders
    from mmgclip.experiments.experiments_controller import create_experiment as ref_create
    from mmgclip.utils.global_utils import seeding as ref_seeding

    ref_seeding(TRAIN_SEED)
    dataset = ref_get_dataset(cfg.dataset.name)(config=cfg)
    train_split, val_split = dataset.random_split(dataset, "train")

    def loader(split, shuffle, drop_last, batch_size=8):
        return RefDataLoaders(config=cfg, dataset_split=split).get_dataloader(
            shuffle=shuffle, batch_size=batch_size, drop_last=drop_last,
            pin_memory=False, collate_fn=dataset.collate_fn,
            num_workers=1, prefetch_factor=2,
        )

    experiment = ref_create("classification")(
        config=cfg,
        train_dataloader=loader(train_split, shuffle=True, drop_last=True),
        valid_dataloader=loader(val_split, shuffle=False, drop_last=False),
        test_dataloader=None,
        tokenizer=dataset.tokenizer,
    )
    train_losses, val_losses = [], []
    for epoch in range(TRAIN_EPOCHS):
        experiment.current_epoch = epoch
        train_losses.append(float(experiment.train()))
        val_losses.append(float(experiment.validate()[0]))

    full_loader = loader(dataset, shuffle=False, drop_last=False)
    return {
        "cfg": cfg, "dataset": dataset, "experiment": experiment,
        "train_losses": train_losses, "val_losses": val_losses,
        "full_loader": full_loader,
    }


@pytest.fixture(scope="module")
def exam_our_train(train_ws, tmp_path_factory):
    """Train our stack through the standard train.run entry-point flow."""
    import json as _json

    import train

    run_dir = tmp_path_factory.mktemp("exam_our_train")
    cfg = mmgclip_tpu.config.compose(
        os.path.join(REPO, "configs"), "train_exam_reports_clf", run_dir=str(run_dir)
    )
    cfg.dataset.config.final_reports_dataset_path = train_ws["reports"]
    cfg.dataset.config.gt_path = train_ws["gtr"]
    cfg.dataset.config.gtr_prompt_generation = True
    cfg.dataset.config.use_gtr_prompts_only = False
    cfg.dataset.config.post_translation_fileid = "fixture"
    cfg.dataset.eval.enum_classes = []
    cfg.base.seed = TRAIN_SEED
    cfg.base.patience = TRAIN_EPOCHS
    cfg.base.features_export_dir = os.path.dirname(train_ws["reports"])
    cfg.base.export_dir = str(run_dir)
    cfg.base.results_export_dir = str(run_dir / "results")
    cfg.base.tensorboard_export_dir = str(run_dir / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(run_dir / "checkpoints")
    cfg.tokenizer.config.tokenizer_name = train_ws["hf_dir"]
    cfg.tokenizer.config.sequence_length = SEQ
    cfg.networks.text_encoder = Config(
        {
            "name": "BertEncoder",
            "weights_path": train_ws["msgpack"],
            "config": {
                "vocab_size": train_ws["vocab_size"], "hidden_size": HIDDEN,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "intermediate_size": 128, "max_position_embeddings": 64,
            },
        }
    )
    cfg.networks.dropout.config.dropout = 0.0
    cfg.projection.config.projection_name = "LinearProjectionLayer"
    cfg.projection.config.output_projection_dimension = 64
    cfg.loss.config.loss_name = "MMGCLIPLoss"
    cfg.optimizer.config.learning_rate = 5e-3
    cfg.scheduler.config.epochs = TRAIN_EPOCHS
    cfg.experiments.config.metrics = []
    cfg.dataloader.train.batch_size = 8
    cfg.dataloader.valid.batch_size = 2
    cfg.dataloader.test.batch_size = 2

    train.run(cfg)
    lines = [
        _json.loads(line)
        for line in open(os.path.join(str(run_dir), "runs", "scalars.jsonl"))
    ]
    return {
        "cfg": cfg, "run_dir": run_dir,
        "train_losses": [l["value"] for l in lines if l["tag"] == "loss/train"],
        "val_losses": [l["value"] for l in lines if l["tag"] == "loss/val"],
    }


def test_03_live_training_val_loss_trajectories(exam_ref_train, exam_our_train):
    """Gate: both live stacks TRAIN on Exam-Reports+Prompts with MMGCLIPLoss
    (T2T active) — finite, decreasing val-loss trajectories of equal length."""
    for name, run in (("reference", exam_ref_train), ("ours", exam_our_train)):
        assert len(run["val_losses"]) == TRAIN_EPOCHS, name
        assert all(np.isfinite(v) for v in run["train_losses"] + run["val_losses"]), name
        # epoch 0 trains at lr=0 under the warmup schedule; the contrastive
        # objective must then actually move
        assert min(run["val_losses"][1:]) < run["val_losses"][0], (
            f"{name} val loss did not decrease: {run['val_losses']}"
        )


def _ref_full_malig_auc(ref):
    import torch

    from mmgclip_tpu.evaluation import metrics as M

    model = ref["experiment"].model
    model.eval()
    tokens = ref["dataset"].tokenizer(
        ["Finding suggesting malignant."], padding="max_length", truncation=True,
        return_tensors="pt", max_length=SEQ,
    )
    sims, y_true = [], []
    with torch.no_grad():
        for batch in ref["full_loader"]:
            # validation=True skips the T2T branch (which would KeyError on
            # a probe batch without impression tokens — mmgclip_model.py:154-160)
            out = model({"image_features": batch["image_features"], "text_tokens": tokens},
                        validation=True)
            sims.extend(out["logits_per_image"].numpy()[:, 0])
            y_true.extend(int(pl["BenignMalignantDatasetLabels"]) for pl in batch["prompt_labels"])
    fpr, tpr, _ = M.roc_curve(y_true, sims)
    return M.auc(fpr, tpr)


def _our_full_malig_auc(ours, train_ws):
    import jax.numpy as jnp

    from mmgclip_tpu.evaluation import metrics as M
    from mmgclip_tpu.models.clip import l2_normalize
    from mmgclip_tpu.training.checkpoint import load_checkpoint

    cfg = ours["cfg"]
    tokenizer = mmgclip_tpu.Tokenizer.from_pretrained(train_ws["hf_dir"], sequence_length=SEQ)
    model = mmgclip_tpu.MMGCLIP(cfg, seed=0, vocab_size=train_ws["vocab_size"])
    state = load_checkpoint(
        os.path.join(str(ours["run_dir"]), "checkpoints", "model.msgpack"),
        model.trainable_params,
    )
    params = state["params"]

    dataset = mmgclip_tpu.get_dataset("StudyReportDataset")(config=cfg)
    loader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=dataset).get_dataloader(
        batch_size=8, shuffle=False, drop_last=False, collate_fn=dataset.collate_fn
    )
    tokens = {k: jnp.asarray(v) for k, v in tokenizer(["Finding suggesting malignant."]).items()}
    text_emb = l2_normalize(model.project_text(params, model.apply_text_tower(tokens)))
    scale = float(jnp.exp(params["logit_scale"]))
    sims, y_true = [], []
    for batch in loader:
        feats = jnp.asarray(np.asarray(batch["image_features"]), jnp.float32)
        img = l2_normalize(model.project_image(params, model.apply_image_tower(params, feats)))
        sims.extend(np.asarray(scale * img @ text_emb.T)[:, 0])
        y_true.extend(int(pl["BenignMalignantDatasetLabels"]) for pl in batch["prompt_labels"])
    fpr, tpr, _ = M.roc_curve(y_true, sims)
    return M.auc(fpr, tpr)


def test_04_full_dataset_zeroshot_auc_delta(exam_ref_train, exam_our_train, train_ws):
    """Gate: full-dataset zero-shot malignancy AUC delta <= 0.5%
    (BASELINE.json gate), with the reference actually learning the planted
    signal — the exam-family counterpart of image test_02."""
    ref_auc = _ref_full_malig_auc(exam_ref_train)
    our_auc = _our_full_malig_auc(exam_our_train, train_ws)
    assert ref_auc >= 0.95, f"reference failed to learn the planted signal: {ref_auc}"
    assert abs(ref_auc - our_auc) <= 0.005, f"ref {ref_auc:.4f} vs ours {our_auc:.4f}"
