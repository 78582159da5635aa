"""Dutch report-preprocessing pipeline (reference: data_utils.py:295-919)."""

import os

import numpy as np
import pandas as pd
import pytest

from mmgclip_tpu.config import Config
from mmgclip_tpu.data.reports import (
    extract_labels,
    extract_report,
    find_sentences_with_keyword,
    find_similar_words,
    map_path_to_features,
    post_process_translated_report,
    preprocess_reports_csv,
    remove_duplicate_sentences,
    replace_dutch_numbers,
    roman_to_int,
    translate_labels,
)


def test_roman_to_int():
    assert roman_to_int("BIRADS IV category") == "BIRADS 4 category"
    assert roman_to_int("stage III and II") == "stage 3 and 2"
    assert roman_to_int("no numerals here") == "no numerals here"


def test_replace_dutch_numbers():
    assert replace_dutch_numbers("BI-RADS twee.") == "BI-RADS 2"
    assert replace_dutch_numbers("score vier") == "score 4"


def test_birads_extraction_variants():
    for text, expected in [
        ("Conclusie BI-RADS 4", "4"),
        ("birads twee", "2"),
        ("BIRADS classificatie 5", "5"),
        ("geen classificatie", "unknown"),
    ]:
        labels = extract_labels(birads=text, malig=1, report="")
        assert labels["birads"] == expected, text


def test_fuzzy_dutch_keyword_mining_and_translation():
    report = "Er is een ovaalvormige massa met gegroepeerde kalk zichtbaar."
    labels = extract_labels(birads="BI-RADS 3", malig=0, report=report)
    labels = translate_labels(labels)
    assert labels["masses"]["shapes"] == "oval"  # ovaalvormige -> ovaal -> oval
    assert labels["calcifications"]["distribution"] == "grouped"
    assert labels["birads"] == "3"


def test_find_similar_words_unknown_fallback():
    assert find_similar_words("nothing matches here", ["hyperdens"], 0.7)[-1] == "unknown"


def test_extract_report_strips_headers():
    raw = (
        "Report MG 2020-01-01 1.2.3 2020-01-01 10:00:00.0000000+01:00 READ Finalized "
        "Mammografie beiderzijds. Conclusie BI-RADS 2."
    )
    cleaned = extract_report(raw)
    assert "Finalized" not in cleaned
    assert "Mammografie beiderzijds" in cleaned


def test_find_sentences_with_keyword():
    text = "Eerste zin. Er is maligniteit aanwezig. Laatste zin."
    hits = find_sentences_with_keyword(text, ["maligniteit"])
    assert len(hits) == 1 and "maligniteit" in hits[0]
    assert find_sentences_with_keyword(text, ["afwezig-term"]) == ["Unknown"]


def _raw_reports_df():
    header = "Report MG 2020-01-01 1.2.3 2020-01-01 10:00:00.0000000+01:00 READ Finalized "
    return pd.DataFrame(
        [
            {
                "raw_id": "T20-001",
                "patient_id": "02000001",
                "report_date": "2020-01-01",
                "exam_date": "2020-01-01",
                "modality": "MG",
                "is_malig": "malignant",
                "pathology": "<st0>DCIS</st0>",
                "impression": "verdacht*gebied",
                "report": header + "Er is een irregulaire massa. Conclusie maligniteit. BI-RADS V.",
            },
            {
                "raw_id": "T20-002",
                "patient_id": "02000002",
                "report_date": "2020-01-02",
                "exam_date": "2020-01-02",
                "modality": "MG",
                "is_malig": "NotMalignant",
                "pathology": "geen",
                "impression": "normaal",
                "report": header + "Mammogram zonder afwijkingen. Conclusie benigne. BI-RADS twee.",
            },
            {  # non-MG row must be dropped
                "raw_id": "T20-003",
                "patient_id": "02000001",
                "report_date": "2020-01-03",
                "exam_date": "2020-01-03",
                "modality": "US",
                "is_malig": "NotMalignant",
                "pathology": "-",
                "impression": "-",
                "report": header + "Echografie.",
            },
        ]
    )


def _pipeline_config(tmp_path):
    lists_dir = tmp_path / "lists"
    lists_dir.mkdir()
    (lists_dir / "normal_patients.txt").write_text("patient_id\n02000002\n")
    (lists_dir / "malignant_patients.txt").write_text("patient_id\n02000001\n")
    eliminate = tmp_path / "eliminate.csv"
    eliminate.write_text("T99-999,09999999,2019-01-01\n")
    return Config(
        {
            "dataset": {
                "config": {
                    "lists_dataset_path": str(lists_dir),
                    "eliminated_reports_path": str(eliminate),
                    "base_dataset_path": str(tmp_path / "base"),
                }
            },
            "base": {"features_export_dir": str(tmp_path / "features")},
        }
    )


def test_preprocess_reports_csv_end_to_end(tmp_path):
    cfg = _pipeline_config(tmp_path)
    out = preprocess_reports_csv(_raw_reports_df(), cfg)

    assert len(out) == 2  # US row dropped
    assert set(out["is_malig"]) == {0, 1}
    malig_row = out[out["patient_id"] == "02000001"].iloc[0]
    assert "Finalized" not in malig_row["report_preprocessed"]
    assert malig_row["labels"]["birads"] == "5"  # Roman V -> 5
    assert malig_row["labels"]["masses"]["shapes"] == "irregular"
    assert malig_row["has_report_MG"]
    benign_row = out[out["patient_id"] == "02000002"].iloc[0]
    assert benign_row["labels"]["birads"] == "2"  # Dutch "twee" -> 2
    # pathology tags stripped, impression '*' replaced
    assert "<st0>" not in malig_row["pathology"]
    assert "*" not in malig_row["impression"]


def test_post_process_and_map_features(tmp_path):
    cfg = _pipeline_config(tmp_path)
    df = pd.DataFrame(
        {
            "patient_id": ["2000001"],  # leading zero lost in translation
            "study_id": ["st02"],
            "impression_en": ["The lesion. The lesion."],
            "report_en": ["Report shows malignancy. Report shows malignancy. BI-RADS 4 één"],
        }
    )
    out = post_process_translated_report(df, cfg)
    row = out.iloc[0]
    assert row["patient_id"] == "02000001"  # zero-filled to 8 digits
    assert row["image_description"].count("malignant") == 1  # dedup + cast
    assert "BIRADS" in row["image_description"]
    assert "é" not in row["image_description"]  # non-ASCII stripped

    # map to an existing feature store
    feat = tmp_path / "features" / "02" / "02000001" / "st02" / "02000001.npy"
    feat.parent.mkdir(parents=True)
    np.save(feat, np.zeros(4, np.float32))
    out["study_path"] = [str(tmp_path / "base" / "2D_100micron" / "02" / "02000001" / "st02")]
    mapped = map_path_to_features(out, cfg)
    assert len(mapped) == 1
    assert mapped.iloc[0]["study_path"].endswith("02000001.npy")


def test_remove_duplicate_sentences_order_preserved():
    text = "B comes first. A second. B comes first. C third."
    out = remove_duplicate_sentences(text)
    assert out.index("B comes first") < out.index("A second") < out.index("C third")
