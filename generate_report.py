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

import jax.numpy as jnp
import numpy as np

import mmgclip_tpu
from mmgclip_tpu.config import recompose
from mmgclip_tpu.ingest.encode import (
    build_encode_program,
    load_convnext_tower,
    parse_ingest_knobs,
)
from mmgclip_tpu.ingest.png_reader import decode_png
from mmgclip_tpu.ops import fuse_views
from mmgclip_tpu.training.checkpoint import load_checkpoint

def encode_inputs(cfg, image_id=None, exam_id=None):
    """Single image / fused exam -> [1, 768] features on device
    (reference: generate_report.py:77-163).

    Rides the SAME jitted ingest program the feature store uses
    (build_encode_program): a run trained with encode_resize/encode_window
    must see identically-prepared pixels here, or the cascade ranks features
    from a shifted input distribution."""
    module, params, cn_config = load_convnext_tower(cfg)
    resize_hw, resize_method, resize_precision, window, prepool = parse_ingest_knobs(cfg)
    program = build_encode_program(
        module, params, cn_config.in_channels,
        window=window, resize_hw=resize_hw, resize_method=resize_method,
        resize_precision=resize_precision, prepool=prepool,
    )

    def encode_one(path):
        pixels = decode_png(path)
        if prepool:
            from mmgclip_tpu.ops.resize import host_block_sum

            sums = host_block_sum(pixels[None], prepool)
            return program(jnp.asarray(sums), native_hw=pixels.shape[:2])[0]
        return program(jnp.asarray(pixels)[None])[0]  # [768]

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
    # reference parity: EVERY file in the exam dir is encoded, unfiltered and
    # uncapped (reference: generate_report.py:110-126 iterates os.listdir);
    # a sidecar file fails the exam into failed_inference.txt, exactly like
    # the reference.  The serving engine deliberately diverges (PNG filter +
    # n_views cap, serving.py::encode_exam) — it has no reference counterpart
    # and must survive arbitrary exam dirs.
    views = jnp.stack([encode_one(os.path.join(path, v)) for v in sorted(os.listdir(path))])
    method = cfg.dataset.config.concatenate_features_method
    fused = fuse_views(views, method)
    if fused.ndim == 1:
        fused = fused[None, :]
    return fused


# template assembly lives in the package so serving / installed consumers
# can generate reports without the repo checkout
from mmgclip_tpu.evaluation.report_text import generate_report  # noqa: E402,F401


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

    # accept the run folder inside outputs/ OR an existing/absolute run dir —
    # same resolution as evaluate_clip.py/serve.py, so the copy-paste form
    # '--experiment_path outputs/yyyy-mm-dd/...' doesn't resolve to
    # outputs/outputs/... and fail with a confusing missing-snapshot error
    experiment_path = args.experiment_path
    if not os.path.isabs(experiment_path) and not os.path.isdir(experiment_path):
        experiment_path = os.path.join("outputs", experiment_path)
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
