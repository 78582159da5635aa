"""End-to-end learnability: with class-separable image features, contrastive
training must produce a zero-shot classifier with high AUC on held-out data.

This is the framework's strongest correctness signal — it exercises ingest,
text generation, tokenization, frozen-tower caching, the fused-epoch train
step, checkpointing, and zero-shot evaluation all at once, and fails if any
link stops carrying gradient/signal.
"""

import os
import pytest

import jax.numpy as jnp
import numpy as np

import mmgclip_tpu
from mmgclip_tpu.config import Config, compose
from mmgclip_tpu.data import DataLoaders, get_dataset
from mmgclip_tpu.evaluation import metrics as M
from mmgclip_tpu.models.clip import l2_normalize
from mmgclip_tpu.training import create_experiment
from fixtures import build_image_label_tree

pytestmark = pytest.mark.slow  # heavy jit/e2e tier; fast tier: -m 'not slow'

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")

TINY_TEXT = {
    "config": {
        "vocab_size": 4096, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 128, "max_position_embeddings": 64,
    }
}


def test_contrastive_training_learns_separable_classes(tmp_path):
    base, annotated, lists_dir, features_dir = build_image_label_tree(
        str(tmp_path), n_benign=24, n_malignant=24, image_size=32, separable=True
    )
    cfg = compose(CONFIG_DIR, "train_binary_class_clf", run_dir=str(tmp_path / "run"))
    cfg.dataset.config.base_dataset_path = base
    cfg.dataset.config.annotated_dataset_path = annotated
    cfg.dataset.config.lists_dataset_path = lists_dir
    cfg.base.features_export_dir = features_dir
    cfg.base.export_dir = str(tmp_path / "out")
    cfg.base.tensorboard_export_dir = str(tmp_path / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(tmp_path / "ckpt")
    cfg.tokenizer.config.sequence_length = 32
    cfg.networks.text_encoder = Config({"name": "BertEncoder", **TINY_TEXT})
    cfg.networks.dropout.config.dropout = 0.0
    cfg.scheduler.config.epochs = 25
    cfg.dataset.eval.enum_classes = []

    ds = get_dataset(cfg.dataset.name)(config=cfg, data_folder="0/02")
    train_split, val_split = ds.random_split(ds, "train")
    val_split, test_split = ds.random_split(val_split, "test")

    exp = create_experiment("classification")(
        config=cfg,
        train_dataloader=DataLoaders(cfg, train_split).get_dataloader(
            batch_size=8, shuffle=True, drop_last=True, collate_fn=ds.collate_fn
        ),
        valid_dataloader=DataLoaders(cfg, val_split).get_dataloader(
            batch_size=4, shuffle=False, drop_last=True, collate_fn=ds.collate_fn
        ),
        test_dataloader=None,
        tokenizer=ds.tokenizer,
    )
    exp.run()

    # zero-shot eval on the held-out test split with the TRAIN prompt texts
    feats = np.stack([test_split[i]["image_features"] for i in range(len(test_split))])
    labels = np.array([int(test_split[i]["image_label"][0]) for i in range(len(test_split))])
    image_emb = np.asarray(
        l2_normalize(exp.model.project_image(exp.params, jnp.asarray(feats.reshape(len(labels), -1))))
    )
    tokens = ds.tokenizer(["benign", "malignant"], max_length=32)
    pooled = exp.model.apply_text_tower({k: jnp.asarray(v) for k, v in tokens.items()})
    text_emb = np.asarray(l2_normalize(exp.model.project_text(exp.params, pooled)))

    scores = image_emb @ text_emb.T  # [n, 2]
    if len(np.unique(labels)) < 2:
        return  # degenerate split; nothing to assert
    auc = M.roc_auc_score(labels == 1, scores[:, 1] - scores[:, 0])
    assert auc >= 0.9, f"zero-shot AUC {auc:.3f} — training failed to learn separable classes"
