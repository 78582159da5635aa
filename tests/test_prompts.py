import random

import pandas as pd
import pytest

from mmgclip_tpu.prompts import (
    BenignMalignantDatasetLabels,
    MassMarginLabels,
    MassShapeLabels,
    generate_gtr_prompt_sentence,
    generate_label_prompt_report,
    generate_label_prompt_sentence,
    get_key_from_value,
    gtr_Histology,
    gtr_MassMargin,
    report_bank,
    template_bank,
)


def test_enum_values_match_reference_vocabulary():
    assert BenignMalignantDatasetLabels.benign.value == 0
    assert BenignMalignantDatasetLabels.malignant.value == 1
    assert MassShapeLabels.unknown.value == 0
    assert MassShapeLabels.irregular.value == 3
    assert MassMarginLabels.illdefined.value == 4
    assert get_key_from_value(gtr_MassMargin, 2) == "illdefined"
    assert get_key_from_value(gtr_MassMargin, 42) == "unknown"
    assert gtr_Histology[2] == "invasive ductal carcinoma (IDC)"
    assert gtr_Histology[99] == "invasive carcinoma"


def test_bank_sizes_match_reference():
    # reference: mmgclip/prompts/generator.py:108-216
    assert len(report_bank("gtr_mass:True")) == 19
    assert len(report_bank("gtr_calc:True")) == 10
    assert len(report_bank("gtr_mass:True&gtr_calc:True")) == 7
    assert len(report_bank("no_gtr")) == 7
    assert len(report_bank("row.labels['birads']:True")) == 9
    assert len(report_bank("gtr_histology>0")) == 7
    assert len(report_bank("gtr_is_architectural_distortion:True")) == 15
    assert len(report_bank("gtr_is_architectural_distortion:False")) == 10
    assert len(template_bank("BENIGN_MALIG")["benign"]) == 8
    assert len(template_bank("HAS_MASS")["negative"]) == 8


def test_mass_prompt_slot_filling_all_known():
    rng = random.Random(0)
    out = generate_gtr_prompt_sentence(
        "gtr_mass:True", n=1, rng=rng, M_MALIG="malignant", M_MARG="spiculated", M_SHAPE="irregular"
    )
    assert "spiculated margins" in out
    assert "and irregular shape" in out
    assert "malignant" in out
    assert "{" not in out


def test_mass_prompt_unknown_margin_elision():
    rng = random.Random(1)
    out = generate_gtr_prompt_sentence(
        "gtr_mass:True", n=1, rng=rng, M_MALIG="benign", M_MARG="unknown", M_SHAPE="oval"
    )
    assert "margins" not in out
    assert "oval shape" in out
    assert " and " not in out.split("oval")[0][-6:]
    assert "{" not in out


def test_mass_prompt_both_unknown_truncates_to_last_clause():
    # reference behavior (generator.py:247-249): keep only the clause after the
    # comma and capitalize it
    rng = random.Random(2)
    out = generate_gtr_prompt_sentence(
        "gtr_mass:True", n=1, rng=rng, M_MALIG="malignant", M_MARG="unknown", M_SHAPE="unknown"
    )
    assert out[0].isupper()
    assert "mass" not in out.split()[0].lower() or len(out.split(",")) == 1
    assert "malignant" in out
    assert "{" not in out


def test_calc_prompt_distribution_elision():
    rng = random.Random(3)
    with_dist = generate_gtr_prompt_sentence(
        "gtr_calc:True", n=1, rng=rng, C_MALIG="malignant", C_DIST="linear"
    )
    assert "with linear distribution" in with_dist
    rng = random.Random(3)
    without = generate_gtr_prompt_sentence(
        "gtr_calc:True", n=1, rng=rng, C_MALIG="malignant", C_DIST="unknown"
    )
    assert "distribution" not in without
    assert "{" not in with_dist + without


def test_birads_and_histology_slots():
    rng = random.Random(4)
    out = generate_gtr_prompt_sentence("row.labels['birads']:True", n=1, rng=rng, B_SCORE="4")
    assert "4" in out and "{B_SCORE}" not in out
    out = generate_gtr_prompt_sentence("gtr_histology>0", n=1, rng=rng, HISTOLOGY="fibroadenoma")
    assert "fibroadenoma" in out


def test_generation_is_deterministic_given_seed():
    a = generate_gtr_prompt_sentence("no_gtr", n=1, rng=random.Random(7))
    b = generate_gtr_prompt_sentence("no_gtr", n=1, rng=random.Random(7))
    c = generate_gtr_prompt_sentence("no_gtr", n=1, rng=random.Random(8))
    assert a == b
    assert isinstance(c, str)


def test_label_prompt_sentence_fills_expression_and_adverbs():
    rng = random.Random(0)
    outs = generate_label_prompt_sentence("mass", "positive", n=6, template="HAS_MASS", rng=rng)
    assert len(outs) == 6
    for s in outs:
        assert "{E}" not in s and "{R}" not in s
        assert "mass" in s
    # list-valued expression joins with commas
    outs = generate_label_prompt_sentence(
        ["oval", "round"], "has_many_shapes", n=1, template="MASS_SHAPE", rng=rng
    )
    assert "oval, round" in outs[0]


def test_label_prompt_report_builds_four_sentences():
    df = pd.DataFrame(
        [
            {
                "image_id": "p0200000101cl",
                "image_label": 1,
                "has_mass": True,
                "mass_shape": ["Oval", -1],
                "mass_margin": ["Spiculated", -1],
            },
            {
                "image_id": "p0200000202cr",
                "image_label": 0,
                "has_mass": False,
                "mass_shape": [-1],
                "mass_margin": [-1],
            },
        ]
    )
    out = generate_label_prompt_report(df, new_col="text", rng=random.Random(0))
    for text in out["text"]:
        assert isinstance(text, str) and len(text) > 20
        assert "{" not in text
    assert "malignant" in out.iloc[0]["text"].lower() or "Malignant" in out.iloc[0]["text"]


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        generate_gtr_prompt_sentence("not_a_key", n=1, rng=random.Random(0))
