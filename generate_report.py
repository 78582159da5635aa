"""Structured report generation by cascaded zero-shot ranking
(reference: generate_report.py:1-372).

Loads a trained checkpoint, encodes one image or one exam on device, then
walks the BI-RADS decision cascade — mass/calc/no-finding, attributes,
BI-RADS score — with every step a softmax over cached prompt-bank
embeddings, and assembles the final report from the template banks.

TPU-first: all prompt lists are embedded once through the frozen text tower
(PromptClassifier caches them), so the whole cascade costs a handful of
[1, d] x [d, k] matmuls after the single image encode.

Usage:
  python generate_report.py --experiment_path yyyy-mm-dd/XX-XX-XX --image_id p0200000102cl
  python generate_report.py --experiment_path yyyy-mm-dd/XX-XX-XX --exam_id 2000000102
"""

import argparse
import os
import re

import jax.numpy as jnp
import numpy as np

import mmgclip_tpu
from mmgclip_tpu.config import recompose
from mmgclip_tpu.ingest.encode import load_convnext_tower
from mmgclip_tpu.ingest.png_reader import decode_png
from mmgclip_tpu.ops import fuse_views, intensity_transform
from mmgclip_tpu.training.checkpoint import load_checkpoint

def encode_inputs(cfg, image_id=None, exam_id=None):
    """Single image / fused exam -> [1, 768] features on device
    (reference: generate_report.py:77-163)."""
    module, params, cn_config = load_convnext_tower(cfg)

    def encode_one(path):
        pixels = decode_png(path)
        x = intensity_transform(jnp.asarray(pixels))[None, ..., None]
        if cn_config.in_channels > 1:
            x = jnp.repeat(x, cn_config.in_channels, axis=-1)
        return module.apply(params, x)[0]  # [768]

    if image_id:
        if not (len(image_id) == 13 and image_id[0] == "p" and image_id[-2:] in ["cl", "cr", "ml", "mr"]):
            raise ValueError(f"Wrong value passed to image_id: {image_id}.")
        path = mmgclip_tpu.create_path(image_id, base_dataset_path=cfg.dataset.config.base_dataset_path)
        assert os.path.isfile(path), f"No image found at `{path}`."
        return encode_one(path)[None, :]

    if not exam_id or len(exam_id) != 10:
        raise ValueError(f"Wrong value passed to exam_id {exam_id}.")
    path = mmgclip_tpu.create_exam_path(exam_id, base_dataset_path=cfg.dataset.config.base_dataset_path)
    assert os.path.isdir(path) and os.listdir(path), f"No exam found inside `{path}`."
    views = jnp.stack([encode_one(os.path.join(path, v)) for v in sorted(os.listdir(path))])
    method = cfg.dataset.config.concatenate_features_method
    fused = fuse_views(views, method)
    if fused.ndim == 1:
        fused = fused[None, :]
    return fused


def generate_report(decisions, rng=None, bug_compat=True):
    """Assemble the report from cascade decision indices
    (reference: generate_report.py:181-372).  Returns (text, report_dict).

    ``decisions`` comes from mmgclip_tpu.evaluation.report_cascade.decide —
    the whole decision tree is evaluated in ONE jitted device call; this
    function only does host-side template assembly on integer indices.

    ``bug_compat`` (default ON — the parity gate is *identical* generated
    reports) reproduces two quirks of the reference cascade verbatim:

    1. The calc-distribution sentence is selected with the MASS-TYPE argmax,
       not the distribution argmax (reference: generate_report.py:315
       ``class_list[int(clf_mass_type['similarities_argmax'])]``), which on
       the calc branch is always index 1 -> "regional".
    2. The architectural-distortion template key is inverted: argmax==1
       ("no evidence") keys the distortion-PRESENT gtr bank and vice versa
       (reference: generate_report.py:366-367).

    ``bug_compat=False`` uses the semantically correct mappings."""
    report = {
        "mass_type": None, "mass_malignancy": None, "mass_shape": None, "mass_margin": None,
        "calc_malignancy": None, "calc_distribution": None, "arch_distortion": None, "birads": None,
        "no_findings_report": None, "mass_report": None, "calc_report": None, "arch_dist_report": None,
    }
    from mmgclip_tpu.evaluation.report_cascade import BANKS

    top_idx = decisions["mass_type"]
    report["mass_type"] = BANKS["mass_type"][top_idx]

    if top_idx == 2:  # no findings
        report["arch_distortion"] = "Mammography showed no evidence of architectural distortion."
        report["birads"] = "BI-RADS score 1."
        report["no_findings_report"] = (
            report["mass_type"] + " " + report["arch_distortion"] + " " + report["birads"]
        )
    else:
        if top_idx == 0:  # mass branch
            malig_idx = decisions["mass_malignancy"]
            report["mass_malignancy"] = BANKS["mass_malignancy"][malig_idx]
            report["mass_shape"] = BANKS["mass_shape"][decisions["mass_shape"]]
            report["mass_margin"] = BANKS["mass_margin"][decisions["mass_margin"]]
            birads_bank = "birads_benign" if malig_idx == 0 else "birads_malignant"
            report["birads"] = BANKS[birads_bank][decisions[birads_bank]]

            m_malig = re.search(r"\b(benign|malignant)\b", report["mass_malignancy"], re.IGNORECASE)
            m_marg = re.search(r"\b(circumscribed|obscured|spiculated|ill defined)\b", report["mass_margin"], re.IGNORECASE)
            m_shape = re.search(r"\b(oval|round|irregular)\b", report["mass_shape"], re.IGNORECASE)
            b_score = re.search(r"\b(0|1|2|3|4|5|6)\b", report["birads"], re.IGNORECASE)

            report["mass_report"] = mmgclip_tpu.generate_gtr_prompt_sentence(
                "gtr_mass:True", n=1, rng=rng,
                M_MALIG=m_malig.group() if m_malig else "unknown",
                M_MARG=m_marg.group() if m_marg else "unknown",
                M_SHAPE=m_shape.group() if m_shape else "unknown",
            )
            report["mass_report"] = report["mass_report"][:-1] + ", " + mmgclip_tpu.generate_gtr_prompt_sentence(
                "row.labels['birads']:True", n=1, rng=rng,
                B_SCORE=b_score.group() if b_score else "unknown",
            )

        if top_idx == 1:  # calcification branch
            malig_idx = decisions["calc_malignancy"]
            report["calc_malignancy"] = BANKS["calc_malignancy"][malig_idx]
            # bug-compat: reference indexes the distribution bank with the
            # mass-type argmax (always 1 on this branch -> "regional")
            dist_idx = top_idx if bug_compat else decisions["calc_distribution"]
            report["calc_distribution"] = BANKS["calc_distribution"][dist_idx]
            birads_bank = "birads_benign" if malig_idx == 0 else "birads_malignant"
            report["birads"] = BANKS[birads_bank][decisions[birads_bank]]

            c_malig = re.search(r"\b(benign|malignant)\b", report["calc_malignancy"], re.IGNORECASE)
            c_dist = re.search(r"\b(diffuse|regional|grouped|linear|segmental)\b", report["calc_distribution"], re.IGNORECASE)
            b_score = re.search(r"\b(0|1|2|3|4|5|6)\b", report["birads"], re.IGNORECASE)

            report["calc_report"] = mmgclip_tpu.generate_gtr_prompt_sentence(
                "gtr_calc:True", n=1, rng=rng,
                C_MALIG=c_malig.group() if c_malig else "unknown",
                C_DIST=c_dist.group() if c_dist else "unknown",
            )
            report["calc_report"] = report["calc_report"][:-1] + ", " + mmgclip_tpu.generate_gtr_prompt_sentence(
                "row.labels['birads']:True", n=1, rng=rng,
                B_SCORE=b_score.group() if b_score else "unknown",
            )

        arch_idx = decisions["arch_distortion"]
        report["arch_distortion"] = BANKS["arch_distortion"][arch_idx]
        # index 0 is "displayed architectural distortion"; bug-compat keys the
        # banks inverted, exactly like the reference
        key_true = (arch_idx == 1) if bug_compat else (arch_idx == 0)
        report["arch_dist_report"] = mmgclip_tpu.generate_gtr_prompt_sentence(
            "gtr_is_architectural_distortion:True" if key_true else "gtr_is_architectural_distortion:False",
            n=1, rng=rng,
        )

    report_keys = ["no_findings_report", "mass_report", "calc_report", "arch_dist_report"]
    text = " ".join(report[key] for key in report_keys if report[key] is not None)
    return text, report


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment_path", type=str, required=True,
                        help="Run folder inside outputs/ ('yyyy-mm-dd/XX-XX-XX').")
    parser.add_argument("--image_id", type=str, default=None,
                        help="Image id `p{10 digits}{cl|cr|ml|mr}`.")
    parser.add_argument("--exam_id", type=str, default=None, help="Exam id (10 digits).")
    parser.add_argument("--seed", type=int, default=None,
                        help="Seed for template sampling (default: config seed).")
    args = parser.parse_args()

    experiment_path = os.path.join("outputs", args.experiment_path)
    cfg = recompose(experiment_path)
    cfg.base.export_dir = experiment_path
    cfg.base.results_export_dir = os.path.join(experiment_path, "results")
    cfg.checkpoints.checkpoints_export_dir = os.path.join(experiment_path, "checkpoints")

    rngs = mmgclip_tpu.seeding(int(args.seed if args.seed is not None else cfg.base.seed))

    tokenizer = mmgclip_tpu.Tokenizer.from_pretrained(
        cfg.tokenizer.config.tokenizer_name,
        sequence_length=int(cfg.tokenizer.config.sequence_length),
    )
    model = mmgclip_tpu.MMGCLIP(cfg, seed=int(cfg.base.seed), vocab_size=tokenizer.vocab_size)
    ckp_path = os.path.join(cfg.checkpoints.checkpoints_export_dir, cfg.checkpoints.checkpoints_file_name)
    state = load_checkpoint(ckp_path, model.trainable_params)

    try:
        image_embeddings = encode_inputs(cfg, image_id=args.image_id, exam_id=args.exam_id)
    except Exception as exc:
        failed = os.path.join(experiment_path, "failed_inference.txt")
        with open(failed, "a") as fh:
            fh.write(f"{args.image_id or args.exam_id}\n{exc}\n\n")
        raise

    from mmgclip_tpu.evaluation.report_cascade import decide

    decisions = decide(model, state["params"], tokenizer, image_embeddings)
    bug_compat = bool(cfg.get_path("generate_report.bug_compat", True))
    text, _report = generate_report(decisions, rng=rngs.host, bug_compat=bug_compat)
    print("Generated Report: ", text)


if __name__ == "__main__":
    main()
