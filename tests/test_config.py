import os

from mmgclip_tpu.config import Config, compose, recompose, save_snapshot

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def test_compose_binary_train_config():
    cfg = compose(CONFIG_DIR, "train_binary_class_clf")
    assert cfg.optimizer.name == "adamw"
    assert cfg.optimizer.config.learning_rate == 5e-5
    assert cfg.scheduler.name == "cosine"
    assert cfg.scheduler.config.epochs == 30
    assert cfg.dataset.name == "ImageLabelDataset"
    assert cfg.dataset.config.enums_class == "BenignMalignantDatasetLabels"
    assert cfg.dataset.percentage.name == "100percent"
    assert cfg.tokenizer.config.sequence_length == 256
    assert cfg.dataloader.train.batch_size == 32
    assert cfg.loss.config.loss_name == "CLIPLoss"
    assert cfg.projection.config.projection_name == "LinearProjectionLayer"
    assert cfg.projection.config.output_projection_dimension == 512
    assert cfg.networks.logit_temperature == 0.07
    assert cfg.networks.dropout.config.dropout == 0.5
    assert cfg.base.seed == 42


def test_interpolation_resolves_metrics_and_run_dir():
    cfg = compose(CONFIG_DIR, "train_binary_class_clf")
    # ${dataset.config.enums_class} interpolation inside the metrics list
    assert cfg.experiments.config.metrics == ["BenignMalignantDatasetLabels"]
    # ${hydra:run.dir} resolved into checkpoint dir
    assert cfg.checkpoints.checkpoints_export_dir.endswith("/checkpoints")
    assert cfg.checkpoints.checkpoints_export_dir.startswith("outputs/")
    assert "${" not in str(cfg.to_dict())


def test_exam_reports_config_derived_paths():
    cfg = compose(CONFIG_DIR, "train_exam_reports_clf")
    assert cfg.dataset.name == "StudyReportDataset"
    assert cfg.dataset.config.n_images_per_study == 4
    assert cfg.base.features_export_dir == "outputs/dataset/reports_studies/4_avgpool"
    assert cfg.experiments.config.metrics == [
        "BenignMalignantDatasetLabels",
        "MassShapeLabels",
        "birads",
    ]


def test_overrides_value_and_group():
    cfg = compose(
        CONFIG_DIR,
        "train_binary_class_clf",
        overrides=["base.seed=7", "projection=2xLinear512", "dataloader.train.batch_size=64"],
    )
    assert cfg.base.seed == 7
    assert cfg.projection.config.projection_name == "MultiLinearHead"
    assert cfg.projection.config.output_projection_dimension == [768, 512]
    assert cfg.dataloader.train.batch_size == 64


def test_snapshot_roundtrip(tmp_path):
    cfg = compose(CONFIG_DIR, "train_binary_class_clf")
    run_dir = str(tmp_path / "run")
    save_snapshot(cfg, run_dir)
    loaded = recompose(run_dir)
    assert loaded.dataset.name == cfg.dataset.name
    assert loaded.base.seed == cfg.base.seed


def test_config_attr_access_and_paths():
    cfg = Config({"a": {"b": {"c": 1}}})
    assert cfg.a.b.c == 1
    assert cfg.get_path("a.b.c") == 1
    cfg.set_path("a.b.d", 2)
    assert cfg.a.b.d == 2
    assert cfg.get_path("missing.key", "fallback") == "fallback"


def test_group_override_preserves_sibling_groups():
    """dataset=multi-label must swap the dataset group's content while the
    separately-composed dataset/percentage and networks/dropout nodes stay."""
    cfg = compose(CONFIG_DIR, "train_binary_class_clf", overrides=["dataset=multi-label"])
    assert cfg.dataset.config.search_col == "mass_shape"  # swapped
    assert cfg.dataset.percentage.name == "100percent"  # preserved
    assert "dropout" in cfg.networks  # untouched sibling group


def test_fused_network_preset_reaches_tower_config():
    """`networks=clip_convnext_fused_bert` must flow through
    load_convnext_tower into a ConvNeXtConfig with the fused-block Pallas
    path + bf16 enabled (the measured 1.27x encode preset)."""
    cfg = compose(
        CONFIG_DIR, "train_binary_class_clf",
        overrides=["networks=clip_convnext_fused_bert",
                   "networks.image_encoder.config.micro=true",
                   "networks.image_encoder.convnext_tiny_clf_path="],
    )
    import jax.numpy as jnp

    from mmgclip_tpu.ingest.encode import load_convnext_tower

    _module, _params, cn_config = load_convnext_tower(cfg)
    assert cn_config.use_fused_blocks is True
    assert cn_config.dtype == jnp.bfloat16


def test_fused_tanh_network_preset_reaches_tower_config():
    """`networks=clip_convnext_fused_tanh_bert` (the fastest measured
    tower: 1.52x compute-only on a real v5e) must flow through
    load_convnext_tower with fused blocks + the tanh GELU, while the
    sibling presets keep the torch-parity exact GELU."""
    cfg = compose(
        CONFIG_DIR, "train_binary_class_clf",
        overrides=["networks=clip_convnext_fused_tanh_bert",
                   "networks.image_encoder.config.micro=true",
                   "networks.image_encoder.convnext_tiny_clf_path="],
    )
    from mmgclip_tpu.ingest.encode import load_convnext_tower

    _module, _params, cn_config = load_convnext_tower(cfg)
    assert cn_config.use_fused_blocks is True
    assert cn_config.gelu == "tanh"

    base = compose(
        CONFIG_DIR, "train_binary_class_clf",
        overrides=["networks=clip_convnext_fused_bert",
                   "networks.image_encoder.config.micro=true",
                   "networks.image_encoder.convnext_tiny_clf_path="],
    )
    assert load_convnext_tower(base)[2].gelu == "exact"


def test_gelu_knob_validates_loudly():
    """A typo'd gelu value must raise, not silently run the exact path."""
    import numpy as np
    import pytest

    from mmgclip_tpu.config import Config
    from mmgclip_tpu.ingest.encode import load_convnext_tower
    from mmgclip_tpu.models.convnext import ConvNeXt, ConvNeXtConfig, init_convnext

    cfg = compose(
        CONFIG_DIR, "train_binary_class_clf",
        overrides=["networks=clip_convnext_fused_tanh_bert",
                   "networks.image_encoder.config.micro=true",
                   "networks.image_encoder.convnext_tiny_clf_path=",
                   "networks.image_encoder.config.gelu=Tanh"],
    )
    with pytest.raises(ValueError, match="gelu"):
        load_convnext_tower(cfg)

    mcfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                          in_channels=1, gelu="approx")
    module, params = init_convnext(
        ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64), in_channels=1),
        seed=0, image_size=16)
    import jax.numpy as jnp
    x = jnp.asarray(np.zeros((1, 16, 16, 1), np.float32))
    with pytest.raises(ValueError, match="gelu"):
        ConvNeXt(mcfg).apply(params, x)
