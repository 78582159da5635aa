"""Fast-path presets carry the PRODUCT's quality gates, not just feature
cosine (VERDICT r4 weak #6): encode the same images with the default tower
and with the shipped speed presets (fused, fused+tanh, fused+int8+tanh —
the real Pallas kernels, interpret-forced on CPU), evaluate the SAME
trained checkpoint on each feature store, and assert

  * zero-shot malignancy AUC delta <= 0.5% (the BASELINE.md gate), and
  * byte-identical generated reports (cascade decisions unmoved).

This is the same evidence chain the defaults carry in
tests/test_e2e_parity.py, applied to every speed knob a user can flip."""

import os

import numpy as np
import pytest

import mmgclip_tpu
from mmgclip_tpu.config import Config, compose
from fixtures import build_image_label_tree, make_image_id

pytestmark = pytest.mark.slow  # heavy jit/e2e tier; fast tier: -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")

TINY_TEXT = {
    "config": {
        "vocab_size": 4096,
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "intermediate_size": 128,
        "max_position_embeddings": 64,
    }
}

VARIANTS = {
    "fused": {"use_fused_blocks": True},
    "fused_tanh": {"use_fused_blocks": True, "gelu": "tanh"},
    "fused_int8_tanh": {"use_fused_blocks": True, "gelu": "tanh", "quant": "int8"},
    # the opt-in glue kernels (ops/fused_stem.py, ops/fused_downsample.py)
    # are user-flippable speed knobs too — they carry the same product gates
    # (CLAUDE.md invariant), one combined variant covering both
    "fused_tanh_glue": {
        "use_fused_blocks": True, "gelu": "tanh",
        "fuse_stem": True, "fuse_downsample": True,
    },
}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("fastpath")
    # pixel_class_signal: classes separate in PIXEL space so encode->train
    # actually learns, making the AUC gate meaningful
    base, annotated, lists_dir, _ = build_image_label_tree(
        str(root), n_benign=16, n_malignant=16, image_size=32,
        feature_store=False, pixel_class_signal=True,
    )
    return {"root": root, "base": base, "annotated": annotated, "lists": lists_dir}


def _cfg(ws, run_dir, encoder_overrides=None):
    cfg = compose(CONFIG_DIR, "train_binary_class_clf", run_dir=str(run_dir))
    cfg.dataset.config.base_dataset_path = ws["base"]
    cfg.dataset.config.annotated_dataset_path = ws["annotated"]
    cfg.dataset.config.lists_dataset_path = ws["lists"]
    cfg.base.export_dir = str(run_dir)
    cfg.base.results_export_dir = str(run_dir / "results")
    cfg.base.tensorboard_export_dir = str(run_dir / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(ws["root"] / "checkpoints")
    cfg.tokenizer.config.sequence_length = 32
    cfg.networks.text_encoder = Config({"name": "BertEncoder", **TINY_TEXT})
    cfg.networks.image_encoder.config = Config(
        {"micro": True, "in_channels": 1, **(encoder_overrides or {})})
    # the learnable-fixture recipe test_e2e_parity.py reaches AUC >= 0.95
    # with: 10 epochs, lr 5e-3, batch 8, no early stop
    cfg.scheduler.config.epochs = 10
    cfg.base.patience = 10
    cfg.optimizer.config.learning_rate = 5e-3
    cfg.dataloader.train.batch_size = 8
    cfg.dataloader.valid.batch_size = 2
    cfg.dataloader.test.batch_size = 2
    return cfg


def _encode(ws, tag, overrides):
    """Encode the fixture images with the given tower knobs, driving the
    REAL Pallas kernels (interpret mode) through ImageFeatureExtractor."""
    import encode_images
    from mmgclip_tpu.ops import fused_block as fb
    from mmgclip_tpu.ops import fused_downsample as fd
    from mmgclip_tpu.ops import fused_stem as fs

    run_dir = ws["root"] / f"enc_{tag}"
    run_dir.mkdir(exist_ok=True)
    cfg = _cfg(ws, run_dir, overrides)
    cfg.base.features_export_dir = str(ws["root"] / f"features_{tag}")
    mods = (fb, fd, fs)  # interpret-force every kernel the knobs can route to
    old = [m.FORCE_INTERPRET for m in mods]
    for m in mods:
        m.FORCE_INTERPRET = bool(overrides)
    try:
        encode_images.extract(cfg)
    finally:
        for m, o in zip(mods, old):
            m.FORCE_INTERPRET = o
    return cfg.base.features_export_dir


def _evaluate(ws, tag, features_dir, ckpt_dir=None):
    """Zero-shot eval of the SHARED checkpoint over a feature store."""
    run_dir = ws["root"] / f"eval_{tag}"
    run_dir.mkdir(exist_ok=True)
    cfg = _cfg(ws, run_dir)
    cfg.base.features_export_dir = features_dir
    if ckpt_dir:
        cfg.checkpoints.checkpoints_export_dir = str(ckpt_dir)
    mmgclip_tpu.seeding(int(cfg.base.seed))
    dataset = mmgclip_tpu.get_dataset(cfg.dataset.eval.dataset.name)(config=cfg)
    loader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=dataset).get_dataloader(
        batch_size=4, shuffle=False, drop_last=False, collate_fn=dataset.collate_fn
    )
    evaluator = mmgclip_tpu.Evaluator(config=cfg, test_dataloader=loader,
                                      tokenizer=dataset.tokenizer)
    results = evaluator.evaluate_experiment()
    for block in results:
        aucs = {k: v["auc"] for k, v in block.items()
                if isinstance(v, dict) and "auc" in v}
        if aucs:
            return aucs
    raise AssertionError(f"no AUC block in {results!r}")


def _reports(ws, features_dir, ckpt_dir=None):
    """Generated report text for every fixture patient from a feature store."""
    import generate_report as gr
    from mmgclip_tpu.evaluation.report_cascade import decide
    from mmgclip_tpu.training.checkpoint import load_checkpoint

    cfg = _cfg(ws, ws["root"] / "report_run")
    cfg.base.features_export_dir = features_dir
    tokenizer = mmgclip_tpu.Tokenizer.from_pretrained("x", sequence_length=32)
    model = mmgclip_tpu.MMGCLIP(cfg, seed=42, vocab_size=tokenizer.vocab_size)
    ckp = os.path.join(str(ckpt_dir) if ckpt_dir
                       else cfg.checkpoints.checkpoints_export_dir, "model.msgpack")
    state = load_checkpoint(ckp, model.trainable_params)

    texts = {}
    for i, prefix in [(0, 2000000), (1, 2000001), (0, 2100000), (1, 2100001)]:
        image_id = make_image_id(prefix, 2, ["cl", "cr", "ml", "mr"][(prefix + i) % 4])
        # resolve the actual stored view for this patient
        pid = f"{prefix:08d}"
        stored = []
        for r, _d, fs in os.walk(os.path.join(features_dir)):
            stored.extend(os.path.join(r, f) for f in fs
                          if pid in r and f.endswith(".npy"))
        if not stored:
            continue
        emb = np.load(sorted(stored)[0]).reshape(1, -1).astype(np.float32)
        decisions = decide(model, state["params"], tokenizer, emb)
        text, _ = gr.generate_report(decisions, rng=mmgclip_tpu.seeding(42).host)
        texts[pid] = text
    assert texts, "no stored features found for report generation"
    return texts


@pytest.fixture(scope="module")
def default_run(workspace):
    """Encode with the default tower, train once (shared checkpoint),
    evaluate + generate reports on the default feature store."""
    import train

    features = _encode(workspace, "default", None)
    run_dir = workspace["root"] / "train_run"
    run_dir.mkdir(exist_ok=True)
    cfg = _cfg(workspace, run_dir)
    cfg.base.features_export_dir = features
    train.run(cfg)
    aucs = _evaluate(workspace, "default", features)
    reports = _reports(workspace, features)
    return {"features": features, "aucs": aucs, "reports": reports}


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_fastpath_preset_meets_product_quality_gates(workspace, default_run, variant):
    features = _encode(workspace, variant, VARIANTS[variant])
    aucs = _evaluate(workspace, variant, features)
    assert set(aucs) == set(default_run["aucs"])
    for prompt, base_auc in default_run["aucs"].items():
        delta = abs(base_auc - aucs[prompt])
        assert delta <= 0.005, (
            f"{variant}/{prompt}: default AUC {base_auc:.4f} vs "
            f"{aucs[prompt]:.4f} (delta {delta:.4f} > 0.5%)")
    # the training must have actually learned the planted pixel signal,
    # otherwise the AUC gate is vacuous
    assert max(default_run["aucs"].values()) >= 0.9

    reports = _reports(workspace, features)
    assert reports == default_run["reports"], (
        f"{variant}: generated reports moved vs the default tower")

# ---------------------------------------------------------------------------
# encode_host_prepool is a speed knob of the RESIZE chain, so its product
# gate compares resize-without-prepool (the baseline it approximates)
# against resize-with-prepool on a checkpoint trained on the former —
# same evidence chain as the tower presets above.


def _encode_ingest(ws, tag, resize, prepool):
    import encode_images

    run_dir = ws["root"] / f"enc_{tag}"
    run_dir.mkdir(exist_ok=True)
    cfg = _cfg(ws, run_dir)
    cfg.base.features_export_dir = str(ws["root"] / f"features_{tag}")
    cfg.dataset.config.encode_resize = resize
    if prepool:
        cfg.dataset.config.encode_host_prepool = prepool
    encode_images.extract(cfg)
    return cfg.base.features_export_dir


@pytest.fixture(scope="module")
def resize_run(workspace):
    """Encode with the resize chain (no prepool), train once on that store,
    evaluate + generate reports — the prepool gate's baseline."""
    import train

    features = _encode_ingest(workspace, "resize16", [16, 16], 0)
    run_dir = workspace["root"] / "train_run_resize"
    run_dir.mkdir(exist_ok=True)
    cfg = _cfg(workspace, run_dir)
    cfg.base.features_export_dir = features
    ckpt = str(workspace["root"] / "checkpoints_resize")
    cfg.checkpoints.checkpoints_export_dir = ckpt
    train.run(cfg)
    aucs = _evaluate(workspace, "resize16", features, ckpt_dir=ckpt)
    reports = _reports(workspace, features, ckpt_dir=ckpt)
    return {"aucs": aucs, "reports": reports, "ckpt": ckpt}


def test_prepool_meets_product_quality_gates(workspace, resize_run):
    """The 32px fixtures downscale 2x onto the 16^2 canvas, so k=2 sits at
    the knob's supported boundary (k <= downscale factor)."""
    features = _encode_ingest(workspace, "resize16_pp2", [16, 16], 2)
    aucs = _evaluate(workspace, "resize16_pp2", features,
                     ckpt_dir=resize_run["ckpt"])
    assert set(aucs) == set(resize_run["aucs"])
    for prompt, base_auc in resize_run["aucs"].items():
        delta = abs(base_auc - aucs[prompt])
        assert delta <= 0.005, (
            f"prepool/{prompt}: resize AUC {base_auc:.4f} vs "
            f"{aucs[prompt]:.4f} (delta {delta:.4f} > 0.5%)")
    assert max(resize_run["aucs"].values()) >= 0.9  # non-vacuous gate

    reports = _reports(workspace, features, ckpt_dir=resize_run["ckpt"])
    assert reports == resize_run["reports"], \
        "prepool: generated reports moved vs the resize-chain baseline"
