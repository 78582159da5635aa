"""Bug-compat report assembly: quirk-for-quirk equality with the reference.

The reference cascade (reference: generate_report.py:204-372) contains two
real bugs the semantic mode fixes:

1. calc-distribution sentence indexed with the MASS-TYPE argmax, always 1
   ("regional") on the calc branch (reference: generate_report.py:315).
2. arch-distortion gtr bank keyed inverted — argmax 1 ("no evidence") pulls
   the distortion-PRESENT bank (reference: generate_report.py:366-367).

These tests build an independent oracle that follows the reference's
selection/keying logic verbatim (template text comes from the shared,
byte-identical banks) and assert generate_report(bug_compat=True) matches it
byte-for-byte across every decision combination, while bug_compat=False uses
the semantically correct mappings.
"""

import random
import re

import pytest

import mmgclip_tpu
from generate_report import generate_report
from mmgclip_tpu.evaluation.report_cascade import BANKS


def _reference_assembly(decisions, rng):
    """The reference's host-side assembly, quirks included
    (reference: generate_report.py:204-372)."""
    report = {k: None for k in
              ["no_findings_report", "mass_report", "calc_report", "arch_dist_report"]}
    top = decisions["mass_type"]

    if top == 2:
        arch = "Mammography showed no evidence of architectural distortion."
        report["no_findings_report"] = (
            BANKS["mass_type"][top] + " " + arch + " " + "BI-RADS score 1."
        )
    else:
        if top == 0:
            malig = BANKS["mass_malignancy"][decisions["mass_malignancy"]]
            shape = BANKS["mass_shape"][decisions["mass_shape"]]
            margin = BANKS["mass_margin"][decisions["mass_margin"]]
            bank = "birads_benign" if decisions["mass_malignancy"] == 0 else "birads_malignant"
            birads = BANKS[bank][decisions[bank]]
            m = lambda pat, s: (re.search(pat, s, re.IGNORECASE) or type("m", (), {"group": lambda self: "unknown"})()).group()
            report["mass_report"] = mmgclip_tpu.generate_gtr_prompt_sentence(
                "gtr_mass:True", n=1, rng=rng,
                M_MALIG=m(r"\b(benign|malignant)\b", malig),
                M_MARG=m(r"\b(circumscribed|obscured|spiculated|ill defined)\b", margin),
                M_SHAPE=m(r"\b(oval|round|irregular)\b", shape),
            )
            report["mass_report"] = report["mass_report"][:-1] + ", " + \
                mmgclip_tpu.generate_gtr_prompt_sentence(
                    "row.labels['birads']:True", n=1, rng=rng,
                    B_SCORE=m(r"\b(0|1|2|3|4|5|6)\b", birads),
                )
        if top == 1:
            malig = BANKS["calc_malignancy"][decisions["calc_malignancy"]]
            # THE QUIRK: indexed with the mass-type argmax (== 1 here)
            dist = BANKS["calc_distribution"][top]
            bank = "birads_benign" if decisions["calc_malignancy"] == 0 else "birads_malignant"
            birads = BANKS[bank][decisions[bank]]
            m = lambda pat, s: (re.search(pat, s, re.IGNORECASE) or type("m", (), {"group": lambda self: "unknown"})()).group()
            report["calc_report"] = mmgclip_tpu.generate_gtr_prompt_sentence(
                "gtr_calc:True", n=1, rng=rng,
                C_MALIG=m(r"\b(benign|malignant)\b", malig),
                C_DIST=m(r"\b(diffuse|regional|grouped|linear|segmental)\b", dist),
            )
            report["calc_report"] = report["calc_report"][:-1] + ", " + \
                mmgclip_tpu.generate_gtr_prompt_sentence(
                    "row.labels['birads']:True", n=1, rng=rng,
                    B_SCORE=m(r"\b(0|1|2|3|4|5|6)\b", birads),
                )
        # THE QUIRK: argmax 1 ("no evidence") keys the True (present) bank
        key = ("gtr_is_architectural_distortion:True"
               if decisions["arch_distortion"] == 1
               else "gtr_is_architectural_distortion:False")
        report["arch_dist_report"] = mmgclip_tpu.generate_gtr_prompt_sentence(key, n=1, rng=rng)

    keys = ["no_findings_report", "mass_report", "calc_report", "arch_dist_report"]
    return " ".join(report[k] for k in keys if report[k] is not None)


def _all_decisions():
    """Every reachable decision combination for both finding branches."""
    combos = [{"mass_type": 2, "mass_malignancy": 0, "mass_shape": 0, "mass_margin": 0,
               "calc_malignancy": 0, "calc_distribution": 0, "birads_benign": 0,
               "birads_malignant": 0, "arch_distortion": 0}]
    for malig in range(2):
        for shape in range(3):
            for margin in range(4):
                for arch in range(2):
                    combos.append({"mass_type": 0, "mass_malignancy": malig,
                                   "mass_shape": shape, "mass_margin": margin,
                                   "calc_malignancy": 0, "calc_distribution": 0,
                                   "birads_benign": 1, "birads_malignant": 2,
                                   "arch_distortion": arch})
    for malig in range(2):
        for dist in range(5):
            for arch in range(2):
                combos.append({"mass_type": 1, "mass_malignancy": 0, "mass_shape": 0,
                               "mass_margin": 0, "calc_malignancy": malig,
                               "calc_distribution": dist, "birads_benign": 2,
                               "birads_malignant": 0, "arch_distortion": arch})
    return combos


@pytest.mark.parametrize("seed", [0, 42])
def test_bug_compat_matches_reference_assembly(seed):
    for decisions in _all_decisions():
        expected = _reference_assembly(decisions, random.Random(seed))
        text, _ = generate_report(decisions, rng=random.Random(seed), bug_compat=True)
        assert text == expected, decisions


def test_compat_calc_distribution_is_always_regional():
    decisions = {"mass_type": 1, "mass_malignancy": 0, "mass_shape": 0, "mass_margin": 0,
                 "calc_malignancy": 0, "calc_distribution": 3, "birads_benign": 0,
                 "birads_malignant": 0, "arch_distortion": 0}
    _, report = generate_report(decisions, rng=random.Random(0), bug_compat=True)
    assert "regional" in report["calc_distribution"]
    _, report = generate_report(decisions, rng=random.Random(0), bug_compat=False)
    assert "linear" in report["calc_distribution"]


def test_compat_arch_distortion_key_inverted():
    base = {"mass_type": 0, "mass_malignancy": 0, "mass_shape": 0, "mass_margin": 0,
            "calc_malignancy": 0, "calc_distribution": 0, "birads_benign": 0,
            "birads_malignant": 0}
    # argmax 1 = "no evidence": compat pulls the PRESENT bank, semantic the absent bank
    from_true = mmgclip_tpu.generate_gtr_prompt_sentence(
        "gtr_is_architectural_distortion:True", n=1, rng=random.Random(5))
    from_false = mmgclip_tpu.generate_gtr_prompt_sentence(
        "gtr_is_architectural_distortion:False", n=1, rng=random.Random(5))
    assert from_true != from_false

    def arch_report(bug_compat, arch_idx):
        # isolate the arch sentence: mass branch consumes two generator draws
        # first, so replay them on a fresh rng before diffing
        rng = random.Random(5)
        _, report = generate_report({**base, "arch_distortion": arch_idx},
                                    rng=rng, bug_compat=bug_compat)
        return report["arch_dist_report"]

    # can't compare directly to from_true/from_false (rng consumed by the mass
    # branch), so compare compat vs semantic behavior: flipping bug_compat at
    # fixed argmax must flip the bank, and flipping argmax must too
    assert arch_report(True, 1) == arch_report(False, 0)
    assert arch_report(True, 0) == arch_report(False, 1)
    assert arch_report(True, 1) != arch_report(True, 0)


def test_semantic_mode_still_available_and_differs():
    decisions = {"mass_type": 1, "mass_malignancy": 0, "mass_shape": 0, "mass_margin": 0,
                 "calc_malignancy": 1, "calc_distribution": 4, "birads_benign": 0,
                 "birads_malignant": 1, "arch_distortion": 1}
    compat, _ = generate_report(decisions, rng=random.Random(3), bug_compat=True)
    semantic, _ = generate_report(decisions, rng=random.Random(3), bug_compat=False)
    assert compat != semantic
