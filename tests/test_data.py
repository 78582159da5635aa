import os

import numpy as np
import pandas as pd
import pytest

from mmgclip_tpu.config import Config, compose
from mmgclip_tpu.data import (
    DataLoaders,
    Subset,
    cast_label,
    create_dataset_df,
    create_dataset_path,
    create_exam_path,
    create_path,
    dataloader_percentage,
    get_dataset,
    load_features,
    prepare_prompt_labels,
    process_class_list,
    remove_duplicate_sentences,
    save_features,
    seeded_split,
)
from fixtures import build_image_label_tree, build_study_report_fixture, make_image_id

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def _image_label_config(tmp_path, **over):
    base, annotated, lists_dir, features_dir = build_image_label_tree(str(tmp_path))
    cfg = compose(CONFIG_DIR, "train_binary_class_clf")
    cfg.dataset.config.base_dataset_path = base
    cfg.dataset.config.annotated_dataset_path = annotated
    cfg.dataset.config.lists_dataset_path = lists_dir
    cfg.base.features_export_dir = features_dir
    cfg.base.export_dir = str(tmp_path / "out")
    cfg.tokenizer.config.sequence_length = 32
    for k, v in over.items():
        cfg.set_path(k, v)
    return cfg


def test_create_path_formats():
    image_id = make_image_id(20000001, 2, "cl")
    path = create_path(image_id, base_dataset_path="/base")
    assert path == "/base/20/20000001/st02/p2000000102cl.png"
    exam = create_exam_path("2000000102", base_dataset_path="/base")
    assert exam == "/base/20/20000001/st02"


def test_feature_store_roundtrip(tmp_path):
    arr = np.random.default_rng(0).normal(size=(1, 768, 1, 1)).astype(np.float32)
    path = save_features(str(tmp_path / "a" / "feat"), arr)
    loaded = load_features(path)
    np.testing.assert_array_equal(arr, loaded)


def test_create_dataset_df_schema_and_label_policy(tmp_path):
    cfg = _image_label_config(tmp_path)
    df = create_dataset_df(cfg)
    assert set(df.columns) == {
        "image_id", "image_label", "mass_margin", "mass_shape",
        "has_mass", "has_architectural_distortion", "has_calc", "image_path",
    }
    assert len(df) == 12
    # benign folder -> 0; malignant folder with is_malign -> 1
    assert set(df["image_label"].unique()) <= {0, 1, 2}
    benign = df[df["image_id"].str.startswith("p020000")]
    assert (benign["image_label"] == 0).all()


def test_cast_label_rules():
    assert cast_label(0, "BenignMalignantDatasetLabels") == "benign"
    assert cast_label(1, "BenignMalignantDatasetLabels") == "malignant"
    assert cast_label([-1], "MassShapeLabels") == "unknown"
    assert cast_label(["Lobular"], "MassShapeLabels") == "oval"
    assert cast_label(["Irregular", -1], "MassShapeLabels") == "irregular"
    assert cast_label([-1], "MassMarginLabels") == "unknown"
    assert cast_label(["Spiculated"], "MassMarginLabels") == "spiculated"
    assert cast_label(True, "HasMassLabels") == "mass"
    assert cast_label(False, "HasMassLabels") == "no mass"
    assert cast_label(True, "HasArchDistortion") == "displayed architectural distortion"
    assert cast_label(False, "HasCalcification") == "negative"
    assert cast_label(True, "HasCalcification") == "has calcification"


def test_process_class_list():
    assert process_class_list(["illdefined", "oval"]) == ["ill defined", "oval"]
    assert process_class_list(["nomass"]) == ["no mass"]
    with pytest.raises(ValueError):
        process_class_list("not a list")


def test_seeded_split_replay():
    a1, b1 = seeded_split(100, 0.7, seed=42)
    a2, b2 = seeded_split(100, 0.7, seed=42)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    assert len(a1) == 70 and len(b1) == 30
    a3, _ = seeded_split(100, 0.7, seed=43)
    assert not np.array_equal(a1, a3)


def test_image_label_dataset_end_to_end(tmp_path):
    cfg = _image_label_config(tmp_path)
    ds = get_dataset(cfg.dataset.name)(config=cfg, data_folder="0/02")
    assert len(ds) > 0
    item = ds[0]
    assert item["image_features"].shape == (1, 768, 1, 1)
    assert item["image_description"] in ("benign", "malignant")
    assert set(item["prompt_labels"].keys()) == {
        "HasMassLabels", "MassShapeLabels", "MassMarginLabels",
        "BenignMalignantDatasetLabels", "HasArchDistortion", "HasCalcification",
    }
    # image_description.txt export exists
    assert os.path.isfile(os.path.join(cfg.base.export_dir, "image_description.txt"))

    # splits replay deterministically
    train1, val1 = ds.random_split(ds, "train")
    train2, val2 = ds.random_split(ds, "train")
    np.testing.assert_array_equal(train1.indices, train2.indices)
    val_split, test_split = ds.random_split(val1, "test")
    assert len(val_split) + len(test_split) == len(val1)

    # dataloader batches
    loader = DataLoaders(config=cfg, dataset_split=train1).get_dataloader(
        batch_size=4, shuffle=True, drop_last=True, collate_fn=ds.collate_fn
    )
    batch = next(iter(loader))
    assert batch["image_features"].shape == (4, 1, 768, 1, 1)
    assert batch["text_tokens"]["input_ids"].shape == (4, 32)
    assert batch["image_label"].shape == (4, 1)
    assert len(batch["image_description"]) == 4


def test_image_label_dataset_gtr_report_generation(tmp_path):
    cfg = _image_label_config(
        tmp_path,
        **{
            "dataset.config.generate_label_prompt_report": True,
            "dataset.config.enums_class": "",
            "dataset.config.search_col": "",
        },
    )
    ds = get_dataset(cfg.dataset.name)(config=cfg, data_folder="0/02")
    texts = ds.dataset_pth[ds.new_col].tolist()
    # malignant rows with mass must mention the mass; benign no-finding rows are empty
    assert any("mass" in t.lower() for t in texts)
    assert all("{" not in t for t in texts)


def test_dataloader_percentage(tmp_path):
    cfg = _image_label_config(tmp_path)
    ds = get_dataset(cfg.dataset.name)(config=cfg, data_folder="0/02")
    loader = DataLoaders(config=cfg, dataset_split=ds).get_dataloader(
        batch_size=2, collate_fn=ds.collate_fn
    )
    cfg.dataset.percentage = Config({"name": "50percent", "config": {"percentage": 0.5}})
    smaller = dataloader_percentage(loader, cfg, collate_fn=ds.collate_fn)
    assert len(smaller.dataset) == len(ds) // 2


def test_study_report_dataset(tmp_path):
    reports_csv, gtr_csv, features_dir = build_study_report_fixture(str(tmp_path))
    cfg = compose(CONFIG_DIR, "train_exam_reports_clf")
    cfg.dataset.config.final_reports_dataset_path = reports_csv
    cfg.dataset.config.gt_path = gtr_csv
    cfg.base.features_export_dir = features_dir
    cfg.base.export_dir = str(tmp_path / "out")
    cfg.tokenizer.config.sequence_length = 32
    cfg.dataset.config.gtr_prompt_generation = True
    cfg.dataset.config.use_gtr_prompts_only = True

    ds = get_dataset(cfg.dataset.name)(config=cfg)
    assert len(ds) > 0
    item = ds[0]
    assert item["image_features"].shape == (768,)
    assert isinstance(item["image_description"], str) and item["image_description"]
    assert "BenignMalignantDatasetLabels" in item["prompt_labels"]

    batch = ds.collate_fn([ds[i] for i in range(min(4, len(ds)))])
    assert "image_impression_tokens" in batch
    assert batch["text_tokens"]["input_ids"].shape[1] == 32


def test_remove_duplicate_sentences():
    text = "One sentence. Two sentence. One sentence. Three."
    out = remove_duplicate_sentences(text)
    assert out.count("One sentence.") == 1
    assert "Two sentence." in out and "Three." in out


def test_create_dataset_path_finds_npy(tmp_path):
    build_image_label_tree(str(tmp_path))
    df = create_dataset_path(os.path.join(str(tmp_path), "features", "0/02"))
    assert len(df) == 12
    assert df["image_path"].str.endswith(".npy").all()


@pytest.mark.parametrize(
    "enums_class,search_col,expected_values",
    [
        ("HasMassLabels", "has_mass", {"mass", "no mass"}),
        ("HasCalcification", "has_calc", {"has calcification", "negative"}),
        ("HasArchDistortion", "has_architectural_distortion",
         {"displayed architectural distortion", "no architectural distortion"}),
        ("MassShapeLabels", "mass_shape", {"unknown", "oval", "irregular"}),
        ("MassMarginLabels", "mass_margin", {"unknown", "circumscribed", "spiculated"}),
    ],
)
def test_image_label_dataset_all_enum_configs(tmp_path, enums_class, search_col, expected_values):
    """Every label-family configuration builds a valid supervision column
    (reference configs: dataset/binary-label.yaml, dataset/multi-label.yaml)."""
    cfg = _image_label_config(
        tmp_path,
        **{
            "dataset.config.enums_class": enums_class,
            "dataset.config.search_col": search_col,
        },
    )
    ds = get_dataset(cfg.dataset.name)(config=cfg, data_folder="0/02")
    values = set(ds.dataset_pth[ds.new_col])
    assert values <= expected_values, values
    assert len(values) >= 1
