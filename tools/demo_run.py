"""Reproducible end-to-end demo run on synthetic fixtures.

Produces a committed, inspectable artifact set under outputs/demo/run/
exercising the reference's full workflow (SURVEY §7 minimum slice) with
fixed seeds: encode_images -> train -> evaluate (results.txt/results.json +
ROC/CI PNGs) -> generate_report (compat + semantic) -> one served request.

Run from the repo root:  python tools/demo_run.py
Everything is derived from seeds — re-running reproduces the same numbers
(text artifacts byte-identical; PNGs may differ only in matplotlib version).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # deterministic + runs anywhere

DEMO = os.path.join(REPO, "outputs", "demo")
RUN = os.path.join(DEMO, "run")
DATA = os.path.join(DEMO, "data")


def main() -> None:
    import encode_images
    import generate_report
    import mmgclip_tpu
    import train
    from fixtures import build_image_label_tree, make_image_id
    from mmgclip_tpu.config import Config, compose, save_snapshot

    for path in (RUN, DATA):
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)

    base, annotated, lists_dir, _ = build_image_label_tree(
        DATA, n_benign=10, n_malignant=10, image_size=64, feature_store=False,
        pixel_class_signal=True,
    )

    def make_cfg(run_dir):
        cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf", run_dir=run_dir)
        cfg.dataset.config.base_dataset_path = base
        cfg.dataset.config.annotated_dataset_path = annotated
        cfg.dataset.config.lists_dataset_path = lists_dir
        cfg.base.features_export_dir = os.path.join(DATA, "encoded")
        cfg.base.export_dir = run_dir
        cfg.base.results_export_dir = os.path.join(run_dir, "results")
        cfg.base.tensorboard_export_dir = os.path.join(run_dir, "runs")
        cfg.checkpoints.checkpoints_export_dir = os.path.join(run_dir, "checkpoints")
        cfg.tokenizer.config.sequence_length = 32
        cfg.networks.text_encoder = Config(
            {
                "name": "BertEncoder",
                "config": {
                    "vocab_size": 4096, "hidden_size": 64, "num_hidden_layers": 2,
                    "num_attention_heads": 4, "intermediate_size": 128,
                    "max_position_embeddings": 64,
                },
            }
        )
        cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
        cfg.scheduler.config.epochs = 4
        cfg.dataloader.train.batch_size = 4
        cfg.dataloader.valid.batch_size = 2
        cfg.dataloader.test.batch_size = 2
        return cfg

    cfg = make_cfg(RUN)
    save_snapshot(cfg, RUN)

    print("== encode_images ==")
    encode_images.extract(cfg)

    print("== train ==")
    train.run(cfg)

    print("== generate_report ==")
    rngs = mmgclip_tpu.seeding(int(cfg.base.seed))
    tokenizer = mmgclip_tpu.Tokenizer.from_pretrained(
        cfg.tokenizer.config.tokenizer_name, sequence_length=32
    )
    model = mmgclip_tpu.MMGCLIP(cfg, seed=int(cfg.base.seed), vocab_size=tokenizer.vocab_size)
    from mmgclip_tpu.evaluation.report_cascade import decide
    from mmgclip_tpu.training.checkpoint import load_checkpoint

    state = load_checkpoint(
        os.path.join(cfg.checkpoints.checkpoints_export_dir, "model.msgpack"),
        model.trainable_params,
    )
    image_id = make_image_id(2000000, 2, "cl")
    feats = generate_report.encode_inputs(cfg, image_id=image_id)
    decisions = decide(model, state["params"], tokenizer, feats)
    compat_text, _ = generate_report.generate_report(
        decisions, rng=rngs.host, bug_compat=True
    )
    semantic_text, _ = generate_report.generate_report(
        decisions, rng=mmgclip_tpu.seeding(int(cfg.base.seed)).host, bug_compat=False
    )
    with open(os.path.join(RUN, "generated_report.txt"), "w") as fh:
        fh.write(f"image_id: {image_id}\n")
        fh.write(f"decisions: {json.dumps(decisions)}\n\n")
        fh.write(f"[bug_compat=true]  {compat_text}\n")
        fh.write(f"[bug_compat=false] {semantic_text}\n")
    print("report:", compat_text)

    print("== serve (one request) ==")
    from mmgclip_tpu.serving import InferenceEngine

    engine = InferenceEngine.from_experiment(RUN)
    png = mmgclip_tpu.create_path(image_id, base_dataset_path=base)
    result = engine.classify(
        engine.encode_paths([png]), ["Finding suggesting benign.", "Finding suggesting malignant."]
    )
    with open(os.path.join(RUN, "served_request.json"), "w") as fh:
        json.dump(
            {
                "request": {"op": "classify", "paths": [png],
                            "class_list": ["Finding suggesting benign.",
                                           "Finding suggesting malignant."]},
                "response": result,
            },
            fh, indent=2,
        )

    print("== tsne ==")
    import tsne_eval

    sys.argv = ["tsne_eval.py", "--experiment_path", RUN]
    tsne_eval.main()

    print("== second config (MLP projection) + compare_runs ==")
    # a second short experiment on the same features, then the
    # cross-experiment aggregation the reference keeps in
    # models_performance_reporting.ipynb — committed under run/comparison/
    # (the second run's own tree is scratch; only the comparison is kept)
    run2 = os.path.join(DEMO, "run_mlp")
    shutil.rmtree(run2, ignore_errors=True)
    cfg2 = make_cfg(run2)
    cfg2.projection.config.projection_name = "MLPProjectionHead"
    save_snapshot(cfg2, run2)
    train.run(cfg2)
    from compare_runs import compare_runs

    compare_runs(
        [RUN, run2], labels=["linear512", "mlp512"],
        out_dir=os.path.join(RUN, "comparison"),
    )
    shutil.rmtree(run2, ignore_errors=True)

    manifest = []
    for root, _dirs, files in os.walk(RUN):
        for name in sorted(files):
            rel = os.path.relpath(os.path.join(root, name), RUN)
            if not rel.startswith("runs/"):
                manifest.append(rel)
    with open(os.path.join(RUN, "MANIFEST.txt"), "w") as fh:
        fh.write("\n".join(sorted(manifest)) + "\n")
    print("== artifacts ==")
    print("\n".join(sorted(manifest)))


if __name__ == "__main__":
    main()
