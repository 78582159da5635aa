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


@pytest.fixture(scope="module")
def exam_ws(tmp_path_factory):
    import runpy

    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    root = tmp_path_factory.mktemp("exam_e2e")
    reports_csv, gtr_csv, _features = build_study_report_fixture(str(root), n_studies=8)

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
