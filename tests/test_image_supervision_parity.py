"""Image-level supervision parity against the LIVE reference ImageLabelDataset.

Covers the two supervision modes the reference actually ships configs for:

* enum-cast (train_binary_class_clf / train_multi_class_clf families) —
  label-to-text casting must be identical;
* GTR pseudo-report generation (train_prompt_clf — the thesis' best
  "Image-Prompts" configuration, reference: dataset.py:196-241) — byte-equal
  generated text under the same RNG seed, which also pins our per-row draw
  structure to the reference's (reference draws via global `random.sample`,
  we thread `random.Random(seed)`; same seed -> same Mersenne stream).

The reference's THIRD mode (generate_label_prompt_sentence) is dead code: no
shipped config enables it, and enabling it crashes on the placeholder
`dataset["search_col"]` lookup (reference: dataset.py:31-33 + :243).  Our
implementation makes it functional (falls back to image_label) — a
documented improvement, not a parity target.
"""

import os
import random

import pytest

from mmgclip_tpu.config import Config
from fixtures import build_image_label_tree
from test_e2e_parity import _install_reference_shims

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "vocab_fixture.txt")

pytestmark = pytest.mark.slow

SEED = 77


def _config(ws, export_dir, features_dir, *, report_mode):
    return Config(
        {
            "base": {
                "seed": SEED,
                "features_export_dir": features_dir,
                "export_dir": str(export_dir),
            },
            "dataset": {
                "name": "ImageLabelDataset",
                "config": {
                    "enums_class": "" if report_mode else "BenignMalignantDatasetLabels",
                    "search_col": "" if report_mode else "image_label",
                    "generate_label_prompt_sentence": False,
                    "generate_label_prompt_report": report_mode,
                    "base_dataset_path": ws["base"],
                    "annotated_dataset_path": ws["annotated"],
                    "lists_dataset_path": ws["lists"],
                },
                "split": {"train_split_ratio": 0.7, "test_split_ratio": 0.5},
                "template": {"prompt_template": "", "label": [], "template_keys": []},
            },
            "tokenizer": {"config": {"tokenizer_name": ws["tok"], "sequence_length": 32}},
        }
    )


@pytest.fixture(scope="module")
def shared(tmp_path_factory):
    from transformers import BertTokenizer

    root = tmp_path_factory.mktemp("img_parity")
    base, annotated, lists_dir, features = build_image_label_tree(
        str(root), n_benign=12, n_malignant=12, image_size=16,
        feature_store=True, torch_feature_store=True,
    )
    tok = str(root / "tok")
    BertTokenizer(vocab_file=VOCAB).save_pretrained(tok)
    _install_reference_shims()
    return {
        "root": root, "base": base, "annotated": annotated, "lists": lists_dir,
        "features": features, "torch_features": os.path.join(str(root), "features_torch"),
        "tok": tok,
    }


@pytest.mark.parametrize("report_mode", [False, True], ids=["enum-cast", "gtr-report"])
def test_image_supervision_byte_identical(shared, tmp_path, report_mode):
    from mmgclip.dataset.dataset import ImageLabelDataset as ReferenceImageLabelDataset

    from mmgclip_tpu.data.datasets import ImageLabelDataset

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()

    random.seed(SEED)  # the reference draws via the global random module
    ref_ds = ReferenceImageLabelDataset(
        config=_config(shared, ref_dir, shared["torch_features"], report_mode=report_mode)
    )
    ref_map = dict(zip(ref_ds.dataset_pth["image_id"], ref_ds.dataset_pth[ref_ds.new_col]))

    our_ds = ImageLabelDataset(
        config=_config(shared, our_dir, shared["features"], report_mode=report_mode)
    )
    our_map = dict(zip(our_ds.dataset_pth["image_id"], our_ds.dataset_pth[our_ds.new_col]))

    assert our_map == ref_map
    if report_mode:
        # the draw streams stayed aligned across every row: the generated
        # text must be non-trivial (mass/calc/distortion sentences fired)
        joined = " ".join(our_map.values())
        assert "mass" in joined.lower()
        assert any(text == "" for text in our_map.values()) or "calc" in joined.lower()
