"""One-command thesis-reproduction rehearsal: convert -> encode -> train ->
evaluate -> report from REAL artifacts (VERDICT r3 missing #3).

The reference's product path starts from a TorchScript ConvNeXt classifier
(reference: mmgclip/networks/image_features.py:23) and an HF BERT snapshot
(reference: mmgclip/networks/encoder.py:121-144).  Given those files on
disk, this runs the complete flow a thesis-reproduction user needs:

  python tools/reproduce.py \
      --convnext /path/to/classifier_convnext_tiny.pt \
      --bert /path/to/hf_bert_snapshot \
      --base-data /path/to/base --annotated-data /path/to/annotated \
      --lists-data /path/to/lists [--out outputs/reproduce]

Offline rehearsal (no real artifacts; synthesizes torch-format fixtures
with the same file layouts, then runs the identical orchestration):

  python tools/reproduce.py --fixtures

Steps:
  1. tools/convert_convnext.py  (TorchScript/.pt -> flax .npz, --verify)
  2. tools/convert_bert.py      (HF dir -> flax .msgpack)
  3. encode_images.extract      (bucketed, double-buffered feature store)
  4. train.run                  (frozen towers + projection training,
                                 includes the Evaluator when configured)
  5. generate_report            (the jitted cascade, bug-compat default)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _convert(script: str, in_path: str, out_path: str, verify: bool = False) -> None:
    cmd = [sys.executable, os.path.join(REPO, "tools", script),
           "--input", in_path, "--output", out_path]
    if verify:
        cmd.append("--verify")
    print(f"== {script} ==")
    # conversion is pure weight reshaping — run it on CPU so it never pays
    # (or contends for) the TPU link
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(cmd, check=True, cwd=REPO, env=env)


def _make_torch_fixtures(root: str) -> tuple:
    """Synthesize reference-layout torch artifacts: a ConvNeXt-Tiny
    classifier state dict (.pt) and a tiny HF-format BERT snapshot dir."""
    import numpy as np
    import torch

    rng = np.random.default_rng(0)

    def t(*shape, scale=0.05):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32) * scale)

    # --- ConvNeXt-Tiny classifier state dict (torchvision naming, the
    # shape convert_convnext.py expects; 1-channel stem like the
    # reference's grayscale artifact)
    dims, depths = (96, 192, 384, 768), (3, 3, 9, 3)
    sd = {
        "features.0.0.weight": t(dims[0], 1, 4, 4),
        "features.0.0.bias": t(dims[0]),
        "features.0.1.weight": torch.ones(dims[0]),
        "features.0.1.bias": t(dims[0]),
    }
    stage_idx, down_idx = [1, 3, 5, 7], [None, 2, 4, 6]
    for s, (c, depth) in enumerate(zip(dims, depths)):
        if s > 0:
            di, prev = down_idx[s], dims[s - 1]
            sd[f"features.{di}.0.weight"] = torch.ones(prev)
            sd[f"features.{di}.0.bias"] = t(prev)
            sd[f"features.{di}.1.weight"] = t(c, prev, 2, 2)
            sd[f"features.{di}.1.bias"] = t(c)
        for b in range(depth):
            pre = f"features.{stage_idx[s]}.{b}.block"
            sd[f"{pre}.0.weight"] = t(c, 1, 7, 7)
            sd[f"{pre}.0.bias"] = t(c)
            sd[f"{pre}.2.weight"] = torch.ones(c)
            sd[f"{pre}.2.bias"] = t(c)
            sd[f"{pre}.3.weight"] = t(4 * c, c)
            sd[f"{pre}.3.bias"] = t(4 * c)
            sd[f"{pre}.5.weight"] = t(c, 4 * c)
            sd[f"{pre}.5.bias"] = t(c)
            sd[f"features.{stage_idx[s]}.{b}.layer_scale"] = torch.full((c,), 1e-2)
    sd["classifier.0.weight"] = torch.ones(dims[-1])
    sd["classifier.0.bias"] = t(dims[-1])
    sd["classifier.2.weight"] = t(2, dims[-1])
    sd["classifier.2.bias"] = t(2)
    pt_path = os.path.join(root, "classifier_convnext_tiny.pt")
    torch.save(sd, pt_path)

    # --- tiny HF-format BERT snapshot (config.json + pytorch_model.bin)
    bert_dir = os.path.join(root, "hf_bert")
    os.makedirs(bert_dir, exist_ok=True)
    hf_config = {
        "vocab_size": 4096, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 128,
        "max_position_embeddings": 64, "type_vocab_size": 2,
    }
    with open(os.path.join(bert_dir, "config.json"), "w") as fh:
        json.dump(hf_config, fh)
    h, i, v, p = (hf_config[k] for k in
                  ("hidden_size", "intermediate_size", "vocab_size", "max_position_embeddings"))
    bert_sd = {
        "embeddings.word_embeddings.weight": t(v, h),
        "embeddings.position_embeddings.weight": t(p, h),
        "embeddings.token_type_embeddings.weight": t(2, h),
        "embeddings.LayerNorm.weight": torch.ones(h),
        "embeddings.LayerNorm.bias": t(h),
    }
    for l in range(hf_config["num_hidden_layers"]):
        pre = f"encoder.layer.{l}."
        for name, shape in (
            ("attention.self.query", (h, h)), ("attention.self.key", (h, h)),
            ("attention.self.value", (h, h)), ("attention.output.dense", (h, h)),
            ("intermediate.dense", (i, h)), ("output.dense", (h, i)),
        ):
            bert_sd[pre + name + ".weight"] = t(*shape)
            bert_sd[pre + name + ".bias"] = t(shape[0])
        for name in ("attention.output.LayerNorm", "output.LayerNorm"):
            bert_sd[pre + name + ".weight"] = torch.ones(h)
            bert_sd[pre + name + ".bias"] = t(h)
    torch.save(bert_sd, os.path.join(bert_dir, "pytorch_model.bin"))
    return pt_path, bert_dir, hf_config


def main(argv=None) -> str:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--convnext", help="TorchScript/.pt ConvNeXt classifier")
    parser.add_argument("--bert", help="Local HF BERT snapshot dir")
    parser.add_argument("--base-data", help="base dataset root (reference layout)")
    parser.add_argument("--annotated-data", help="annotated dataset root")
    parser.add_argument("--lists-data", help="lists dir")
    parser.add_argument("--out", default=os.path.join(REPO, "outputs", "reproduce"))
    parser.add_argument("--config-name", default="train_binary_class_clf")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--fixtures", action="store_true",
                        help="synthesize torch artifacts + data tree and rehearse offline")
    parser.add_argument("--verify-convert", action="store_true",
                        help="run the converters' torch-oracle checks")
    args = parser.parse_args(argv)

    import jax

    if args.fixtures:
        jax.config.update("jax_platforms", "cpu")

    import shutil

    run = os.path.abspath(args.out)
    marker = os.path.join(run, ".mmgclip_reproduce_run")
    if os.path.exists(run):
        # only clear a directory THIS tool created (marker file) or an empty
        # one — never an arbitrary user path (`--out .` must not delete cwd)
        if os.path.isfile(marker):
            shutil.rmtree(run)
        elif os.path.isdir(run) and not os.listdir(run):
            pass
        else:
            raise SystemExit(
                f"refusing to clear --out {run}: it exists, is non-empty, and "
                "was not created by tools/reproduce.py (no "
                ".mmgclip_reproduce_run marker). Pick a fresh directory or "
                "delete it yourself."
            )
    os.makedirs(run, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write("created by tools/reproduce.py; safe to delete\n")
    hf_config = None

    if args.fixtures:
        from fixtures import build_image_label_tree

        fixture_root = os.path.join(run, "artifacts")
        os.makedirs(fixture_root, exist_ok=True)
        args.convnext, args.bert, hf_config = _make_torch_fixtures(fixture_root)
        base, annotated, lists_dir, _ = build_image_label_tree(
            os.path.join(run, "data"), n_benign=10, n_malignant=10,
            image_size=64, feature_store=False, pixel_class_signal=True,
        )
        args.base_data, args.annotated_data, args.lists_data = base, annotated, lists_dir
    elif not (args.convnext and args.bert):
        parser.error("--convnext and --bert are required (or use --fixtures)")

    # ---- 1+2: convert the torch artifacts to flax trees
    convnext_npz = os.path.join(run, "converted", "convnext_tiny_clf.npz")
    bert_msgpack = os.path.join(run, "converted", "bert.msgpack")
    _convert("convert_convnext.py", args.convnext, convnext_npz, verify=args.verify_convert)
    _convert("convert_bert.py", args.bert, bert_msgpack)

    # ---- compose the run config around the converted weights
    from mmgclip_tpu.config import Config, compose, save_snapshot

    cfg = compose(os.path.join(REPO, "configs"), args.config_name, run_dir=run)
    cfg.networks.image_encoder.convnext_tiny_clf_path = convnext_npz
    cfg.networks.text_encoder.weights_path = bert_msgpack
    if hf_config is not None:  # fixture towers are tiny; mirror their shapes
        cfg.networks.text_encoder.config = Config(dict(hf_config))
        cfg.tokenizer.config.sequence_length = 32
        cfg.dataloader.train.batch_size = 4
        cfg.dataloader.valid.batch_size = 2
        cfg.dataloader.test.batch_size = 2
        cfg.scheduler.config.epochs = args.epochs or 2
    elif args.epochs:
        cfg.scheduler.config.epochs = args.epochs
    if args.base_data:
        cfg.dataset.config.base_dataset_path = args.base_data
    if args.annotated_data:
        cfg.dataset.config.annotated_dataset_path = args.annotated_data
    if args.lists_data:
        cfg.dataset.config.lists_dataset_path = args.lists_data
    cfg.base.features_export_dir = os.path.join(run, "encoded")
    cfg.base.export_dir = run
    cfg.base.results_export_dir = os.path.join(run, "results")
    cfg.base.tensorboard_export_dir = os.path.join(run, "runs")
    cfg.checkpoints.checkpoints_export_dir = os.path.join(run, "checkpoints")
    save_snapshot(cfg, run)

    # ---- 3: encode the dataset with the CONVERTED image tower
    import encode_images

    print("== encode_images ==")
    encode_images.extract(cfg)

    # ---- 4: train (+ Evaluator per config)
    import train

    print("== train ==")
    train.run(cfg)

    # ---- 5: one generated report from the trained run
    import generate_report
    import mmgclip_tpu
    from mmgclip_tpu.evaluation.report_cascade import decide
    from mmgclip_tpu.training.checkpoint import load_checkpoint

    print("== generate_report ==")
    tokenizer = mmgclip_tpu.Tokenizer.from_pretrained(
        cfg.tokenizer.config.tokenizer_name,
        sequence_length=int(cfg.tokenizer.config.sequence_length),
    )
    model = mmgclip_tpu.MMGCLIP(cfg, seed=int(cfg.base.seed), vocab_size=tokenizer.vocab_size)
    state = load_checkpoint(
        os.path.join(cfg.checkpoints.checkpoints_export_dir,
                     cfg.checkpoints.checkpoints_file_name),
        model.trainable_params,
    )
    import numpy as np

    feats_dir = cfg.base.features_export_dir
    first = sorted(
        os.path.join(dp, f) for dp, _dn, fn in os.walk(feats_dir) for f in fn if f.endswith(".npy")
    )[0]
    feats = np.load(first).reshape(1, -1).astype(np.float32)
    decisions = decide(model, state["params"], tokenizer, feats)
    text, _ = generate_report.generate_report(
        decisions, rng=mmgclip_tpu.seeding(int(cfg.base.seed)).host, bug_compat=True
    )
    report_path = os.path.join(run, "generated_report.txt")
    with open(report_path, "w") as fh:
        fh.write(f"source features: {first}\ndecisions: {json.dumps(decisions)}\n\n{text}\n")
    print("report:", text)
    print(f"reproduce: complete run under {run}")
    return run


if __name__ == "__main__":
    main()
