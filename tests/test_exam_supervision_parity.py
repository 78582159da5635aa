"""Exam-level supervision parity against the LIVE reference StudyReportDataset.

The exam family's entire training signal is the `image_description` column
the dataset constructor produces (translated report text, optionally mixed
with GTR-generated prompts — reference: mmgclip/dataset/dataset.py:380-497).
This test runs the reference class and ours on the SAME fixture CSVs with the
SAME seed and asserts byte-identical supervision in all three GTR modes.

RNG parity: the reference draws through the global `random.sample`
(reference: generator.py:222-293, one draw per generate call); ours threads an
explicit `random.Random(seed)`.  Python guarantees `random.seed(s)` and
`random.Random(s)` produce the same Mersenne stream, so equal draw sequences
imply equal text — which also re-verifies that our per-row draw structure
matches the reference's exactly (any extra/missing draw desynchronizes every
subsequent row).
"""

import os
import random

import pytest

from mmgclip_tpu.config import Config
from fixtures import build_study_report_fixture
from test_e2e_parity import _install_reference_shims

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "vocab_fixture.txt")

pytestmark = pytest.mark.slow

SEED = 1234


def _config(reports_csv, gtr_csv, export_dir, tokenizer_dir, gtr_generation, prompts_only):
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
                    "gtr_prompt_generation": gtr_generation,
                    "use_gtr_prompts_only": prompts_only,
                    "post_translation_fileid": "fixture",
                },
                "split": {"train_split_ratio": 0.7, "test_split_ratio": 0.5},
            },
            "tokenizer": {"config": {"tokenizer_name": tokenizer_dir, "sequence_length": 32}},
        }
    )


@pytest.fixture(scope="module")
def shared(tmp_path_factory):
    from transformers import BertTokenizer

    root = tmp_path_factory.mktemp("exam_parity")
    reports_csv, gtr_csv, _features = build_study_report_fixture(str(root), n_studies=10)
    tokenizer_dir = str(root / "tok")
    BertTokenizer(vocab_file=VOCAB).save_pretrained(tokenizer_dir)
    _install_reference_shims()
    return {"root": root, "reports": reports_csv, "gtr": gtr_csv, "tok": tokenizer_dir}


@pytest.mark.parametrize(
    "gtr_generation,prompts_only",
    [(False, False), (True, False), (True, True)],
    ids=["reports-only", "reports+prompts", "prompts-only"],
)
def test_supervision_byte_identical(shared, tmp_path, gtr_generation, prompts_only):
    from mmgclip.dataset.dataset import StudyReportDataset as ReferenceStudyReportDataset

    from mmgclip_tpu.data.datasets import StudyReportDataset

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()

    cfg_ref = _config(shared["reports"], shared["gtr"], ref_dir, shared["tok"],
                      gtr_generation, prompts_only)
    random.seed(SEED)  # the reference draws via the global random module
    ref_ds = ReferenceStudyReportDataset(config=cfg_ref)
    ref_text = ref_ds.final_reports_dataset["image_description"].tolist()

    cfg_ours = _config(shared["reports"], shared["gtr"], our_dir, shared["tok"],
                       gtr_generation, prompts_only)
    our_ds = StudyReportDataset(config=cfg_ours)
    our_text = our_ds.final_reports_dataset["image_description"].tolist()

    assert our_text == ref_text
    if gtr_generation:
        # the fixture has a GTR row with arch distortion "True" — prove the
        # reference's always-False check (dataset.py:455) kept the prompt out
        # on both stacks
        assert not any("distortion" in t for t in our_text)

    # impressions feed the MMGCLIPLoss T2T term — same column on both stacks
    assert (
        our_ds.final_reports_dataset["image_impression"].tolist()
        == ref_ds.final_reports_dataset["image_impression"].tolist()
    )


def test_semantic_mode_restores_arch_prompt(shared, tmp_path):
    """gtr_bug_compat=false emits the architectural-distortion prompt the
    reference's buggy check silently drops."""
    from mmgclip_tpu.data.datasets import StudyReportDataset

    out = tmp_path / "sem"
    out.mkdir()
    cfg = _config(shared["reports"], shared["gtr"], out, shared["tok"], True, True)
    cfg.dataset.config.gtr_bug_compat = False
    ds = StudyReportDataset(config=cfg)
    text = " ".join(ds.final_reports_dataset["image_description"].tolist())
    assert "distortion" in text
