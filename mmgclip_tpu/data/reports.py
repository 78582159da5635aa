"""Dutch radiology-report preprocessing pipeline.

Behavioral rebuild of the reference's report ingest
(reference: mmgclip/utils/data_utils.py:295-919): section extraction,
keyword sentence mining, Dutch-number and Roman-numeral normalization, fuzzy
Dutch keyword -> BI-RADS label extraction, NL->EN label casting,
PHI/boilerplate removal, duplicate-sentence removal, post-translation cleanup
and feature-path mapping.  Differences: fuzzywuzzy -> difflib, and sentence
tokenization degrades to a regex splitter when nltk's punkt data is absent
(offline environment).
"""

from __future__ import annotations

import difflib
import os
import re
import time
from typing import Dict, List

import pandas as pd

from ..utils.seeding import create_directory_if_not_exists

# ----------------------------------------------------------------------
# sentence utilities
# ----------------------------------------------------------------------

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def _sent_tokenize(text: str) -> List[str]:
    try:
        import nltk

        return nltk.sent_tokenize(text)
    except Exception:
        return [s for s in _SENT_RE.split(text) if s]


def remove_duplicate_sentences(text: str) -> str:
    """Order-preserving sentence dedup (reference: data_utils.py:788-812)."""
    seen = set()
    unique: List[str] = []
    for sentence in _sent_tokenize(text):
        if sentence not in seen:
            unique.append(sentence)
            seen.add(sentence)
    return " ".join(unique)


# ----------------------------------------------------------------------
# NL normalization helpers (reference: data_utils.py:360-466)
# ----------------------------------------------------------------------

_DUTCH_NUMBERS = {"nul": 0, "een": 1, "twee": 2, "drie": 3, "vier": 4, "vijf": 5, "zes": 6}
_ROMAN_VALUES = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500, "M": 1000}
_BIRADS_RE = re.compile(
    r"\b(?:birads|bi[-\s]rads)[-a-zA-Z]*\b(?:\s+\w+)*?[-\s]*(\d+)(?:\s*([A-Z])\b)?",
    re.IGNORECASE,
)


def replace_dutch_numbers(sentence: str) -> str:
    words = sentence.replace(".", "").split()
    return " ".join(str(_DUTCH_NUMBERS.get(w.lower(), w)) for w in words)


def roman_to_int(text: str) -> str:
    def repl(match):
        result, prev = 0, 0
        for ch in match.group(0):
            value = _ROMAN_VALUES[ch.upper()]
            result += value - 2 * prev if value > prev else value
            prev = value
        return str(result)

    return re.sub(r"\b([IVXLCDM]+)\b", repl, text)


def remove_extra_spaces(text: str) -> str:
    return re.sub(r"\s+", " ", text)


def remove_text_before_word(sentence: str, word: str) -> str:
    index = sentence.find(word)
    return sentence[index + len(word) + 1 :] if index != -1 else sentence


def find_sentences_with_keyword(text: str, keywords: List[str], return_str: bool = False):
    sentences = text.split(".")
    matched: List[str] = []
    for keyword in keywords:
        for sentence in sentences:
            if keyword.lower() in sentence.lower() and sentence not in matched:
                matched.append(sentence)
    if return_str:
        return " ".join(matched) if matched else "Unknown"
    return matched if matched else ["Unknown"]


_SPECIAL_KEYWORD_CASTS = {
    "ovaalvormige": "ovaal",
    "diffuus verspreid": "verspreid",
    "grof heterogeen": "heterogeen",
    "heterogene": "heterogeen",
    "fine pleomorphic": "pleomorphic",
}


def find_similar_words(paragraph: str, keywords: List[str], threshold: float = 0.7):
    """Fuzzy keyword spotting (reference: data_utils.py:413-440)."""
    tokens = paragraph.split()
    for keyword in keywords:
        for token in tokens:
            similarity = difflib.SequenceMatcher(None, keyword, token).ratio()
            if similarity >= threshold:
                return (token, similarity, _SPECIAL_KEYWORD_CASTS.get(keyword, keyword))
    return ("", "", "unknown")


def extract_labels(birads: str, malig, report: str) -> Dict:
    match = _BIRADS_RE.search(replace_dutch_numbers(birads))
    labels: Dict = {
        "birads": match.group(1) if match else "unknown",
        "malignancy": malig,
        "masses": {
            "shapes": find_similar_words(report, ["ovaal", "ovaalvormige", "irregulair", "rond"], 0.7)[-1],
            "density": find_similar_words(report, ["hyperdens", "isodens", "hypodens", "lucent"], 0.7)[-1],
        },
        "calcifications": {
            "distribution": find_similar_words(
                report,
                ["diffuus", "diffuus verspreid", "regionaal", "gegroepeerd", "lineair", "segmenteel"],
                0.65,
            )[-1],
            "morphology": find_similar_words(
                report,
                ["amorf", "grof heterogeen", "heterogeen", "heterogene", "Fine pleomorphic",
                 "pleomorphic", "fijn lineair", "lineair vertakkend"],
                0.65,
            )[-1],
        },
    }
    return labels


_NL_EN = {
    "masses": {
        "shapes": {"ovaal": "oval", "rond": "round", "irregulair": "irregular", "unknown": "unknown"},
        "density": {
            "hyperdens": "high density", "isodens": "equal density",
            "hypodens": "low density", "lucent": "fat-containing", "unknown": "unknown",
        },
    },
    "calcifications": {
        "distribution": {
            "diffuus": "diffuse", "verspreid": "diffuse", "regionaal": "regional",
            "gegroepeerd": "grouped", "lineair": "linear", "segmenteel": "segmental",
            "unknown": "unknown",
        },
        "morphology": {
            "amorf": "amorphous", "heterogeen": "coarse heterogeneous",
            "pleomorphic": "fine pleomorphic", "fijn lineair": "fine linear",
            "lineair vertakkend": "fine-linear branching", "unknown": "unknown",
        },
    },
}


def translate_labels(labels: Dict) -> Dict:
    """NL -> BI-RADS EN wording (reference: data_utils.py:468-526)."""

    def replace(original: Dict, table: Dict) -> Dict:
        for key, value in original.items():
            if isinstance(value, dict):
                replace(value, table.get(key, {}))
            else:
                lookup = value.lower() if isinstance(value, str) else value
                original[key] = table.get(key, {}).get(lookup, value)
        return original

    return replace(labels, _NL_EN)


# ----------------------------------------------------------------------
# report extraction (reference: data_utils.py:308-331)
# ----------------------------------------------------------------------

_SECTION_REMOVE_RE = re.compile(
    r"Report\s(?:US|OTUS|MROT|MGOT)\s\d{4}-\d{2}-\d{2}(?::\s##)?\s[\d.]+\s"
    r"\d{4}-\d{2}-\d{2}\s\d{2}:\d{2}:\d{2}\.\d+\+\d{2}:\d{2}\s(?:READ|ARRIVED)?\s?Finalized\s(.+?)(?=##)",
    re.MULTILINE,
)
_HEADER_RE = re.compile(r"Report\s(.+?)Finalized\s", re.MULTILINE)


def extract_report(report: str) -> str:
    cleaned = _SECTION_REMOVE_RE.sub("", report)
    return _HEADER_RE.sub("", cleaned)


# NOTE: two adjacent string literals below concatenate ("## ##" "ADDENDUM" and
# the "...pathologie" pair) — reproducing the reference's own missing-comma
# artifacts (reference: data_utils.py:559-560, 613-614) so the removal set
# matches byte-for-byte.
_KEYWORDS_TO_REMOVE = [
    "Medische gegevens:", " Medische gegevens:", "Medische gegevens:   ",
    "-------------------------------------------------Addendum   start---------------------------------------------",
    "-------------------------------------------------Addendum   einde----------------------------------------",
    "   -------------------------------------------------Addendum   einde-------------------------------------------- ",
    "##", "## ##" "ADDENDUM", "ADDENDUM:", "----", "   /", "Addendum: ", "Addendum:   ",
    "ANON Klinische gegevens", "HITGE-BOETESC Medische gegevens:",
    "HITGE-BOETESC Medische gegevens:   ", "HITGE-BOETESC", "MRW ENGELBRECHT",
    "ANON Medische gegevens",
    "AARTS Medische gegevens Bij bevolkingsonderzoek afwijkingen links.",
    "AARTS Medische gegevens PatiÃ«nt overgekomen uit Veghel.",
    "AARTS Medische gegevens via bevolkingsonderzoek in verband met afwijking in de linkermamma.",
    "ANON ", "ANON Klinische gegevens ", "BOKHOVEN VSC Medische gegevens. ",
    "Medische gegevens", "Medische gegevens.", "Medische gegevens. ",
    "WILLIAMSVAN Klinische informatie ", "WILLIAMSVAN Klinische ",
    "WILLIAMSVAN Medische gegevens ", "WILLIAMSVAN ", "IMHOF-TASMW ", "MUSRDM ",
    "VELTMANJ ", "MEIJERFJA ", "HITGE-BOETESC ", "JAFARIK ",
    "This is a summary report. The complete report is available in the patient''s medical record. "
    "If you cannot access the medical record, please contact the sending organization for a detailed fax or copy. ",
    "FÃTTERERJJ", "PLOEGMAKERSM ", "FÜTTERERJJ Medische gegevens:", "FÃTTERERJJ",
    "DIE VCE", "false false Digital ", "IMHOF-TASMW",
    "Specimen   opnamen ten behoeve van pathologie.",
    "Specimen opnamen ten behoeve van pathologie.", "DIJK VANR", "IMHOF-TASMW",
    "Specimen opnamen ten behoeve van pathologie.",
    "Specimen opname ten behoeve van   pathologie", "Addendum start", "-Addendum start-",
    "STOUTJESDIJKMJ", "SPAARGARENGJ",
    "Specimen opnamen ten behoeve van de PA.", "Specimen opnamen ten behoeve van de   PA.",
    "Specimen opnamen ten behoeve van pathologie" "Specimen opnamen ten behoeve van   pathologie",
    "-- ", "--", " -- ", "Controle.", "Familieanamnese negatief.", "FEUTHL", "FA /",
]

_KEYWORDS_TO_REPLACE = ["   ", "  ", "    ", " . ", " .", ">>", "  >>  ", ": "]


def preprocess_reports_csv(df: pd.DataFrame, config, export: bool = False) -> pd.DataFrame:
    """Raw report CSV -> translation-ready table (reference: data_utils.py:295-786)."""
    eliminated = pd.read_csv(
        config.dataset.config.eliminated_reports_path,
        names=["raw_id", "patient_id", "report_date"], dtype=str,
    )
    common = df.merge(eliminated, on=["raw_id", "patient_id", "report_date"], how="inner")
    drop_idx = df.index[df.isin(common.to_dict("list")).all(axis=1)]
    df = df.drop(drop_idx)

    df = df[df["patient_id"].notna()]
    df = df[df["modality"] == "MG"].drop(columns=["modality"])

    lists_path = config.dataset.config.lists_dataset_path
    normal = pd.read_csv(lists_path + "/normal_patients.txt", sep=" ", dtype=str)["patient_id"].values
    malignant = pd.read_csv(lists_path + "/malignant_patients.txt", sep=" ", dtype=str)["patient_id"].values
    df = df[df["patient_id"].isin(normal) | df["patient_id"].isin(malignant)]
    df.reset_index(drop=True, inplace=True)

    df["is_malig"] = df["is_malig"].apply(lambda x: 1 if x == "malignant" else 0)
    df["pathology"] = df["pathology"].apply(
        lambda x: x.replace("<st0>", "").replace("</st0>", "").replace("<st>", "").replace("</st>", "")
    )
    df["impression"] = df["impression"].apply(lambda x: x.replace("*", " "))
    df["report_preprocessed"] = df["report"].apply(remove_extra_spaces)

    for broken, fixed in [
        ("READFinali zed", " READ Finalized "), ("READFinal ized", " READ Finalized "),
        ("READFinaliz ed", " READ Finalized "), ("ARRIVEDFi nalized", " ARRIVED Finalized "),
        ("00Finalized", "00 Finalized "), ("00Finaliz   ed", "00 Finalized "),
        ("00F   inalized", "00 Finalized "), ("00F inalized", "00 Finalized "),
        ("00Finaliz ed", "00 Finalized "),
    ]:
        df["report_preprocessed"] = df["report_preprocessed"].str.replace(broken, fixed, regex=False)

    df["report_preprocessed"] = df["report_preprocessed"].apply(extract_report)
    df["report_preprocessed"] = df["report_preprocessed"].str.replace(
        r"\d{4}-\d{2}-\d{2}\s\d{2}:\d{2}:\d{2}\.\d{7}\+\d{2}:\d{2}\s0", "", regex=True
    )
    for col in ("report_preprocessed", "pathology"):
        df[col] = df[col].str.replace(r"(?:Zie ook\s)?T\d{2}-\d{3}\s?\(?\w*\)?", "", regex=True)

    df["report_preprocessed"] = df["report_preprocessed"].apply(roman_to_int)

    df["malignancy_benign_section_nl"] = df.apply(
        lambda x: remove_text_before_word(
            find_sentences_with_keyword(x.report, ["maligniteit", "benigne"])[-1], "Finalized"
        ),
        axis=1,
    )
    df["birads_section_nl"] = df.apply(
        lambda x: remove_text_before_word(
            roman_to_int(find_sentences_with_keyword(x.report, ["BI-RADS", "BIRADS", "BIRAD"])[-1]),
            "Finalized",
        ),
        axis=1,
    )
    df["conclusion_nl"] = df.apply(
        lambda x: remove_text_before_word(
            find_sentences_with_keyword(x.report, ["Conclusie"])[-1], "Finalized"
        ),
        axis=1,
    )

    for column in (
        "report_preprocessed", "pathology", "impression",
        "malignancy_benign_section_nl", "birads_section_nl", "conclusion_nl",
    ):
        for keyword in _KEYWORDS_TO_REMOVE:
            df[column] = df[column].str.replace(keyword, "", regex=False)
        for keyword in _KEYWORDS_TO_REPLACE:
            df[column] = df[column].str.replace(keyword, " ", regex=False)

    df["report_preprocessed"] = df["report_preprocessed"].apply(lambda x: x.lstrip())
    df["report_preprocessed"] = df["report_preprocessed"].apply(
        lambda x: x.replace(". ", "", 1) if x.startswith(".") else x
    )
    df["malignancy_benign_section_nl"] = df["malignancy_benign_section_nl"].apply(lambda x: x.lstrip())
    df["birads_section_nl"] = df["birads_section_nl"].apply(lambda x: x.lstrip())

    df["labels"] = df.apply(
        lambda x: translate_labels(extract_labels(x.birads_section_nl, x.is_malig, x.report)), axis=1
    )

    def validate_report(row):
        """Append mined NL sections missing from the processed text
        (reference: data_utils.py:528-549)."""
        if row.malignancy_benign_section_nl.lower() != "unknown" and \
                row.malignancy_benign_section_nl.lower() not in row.report_preprocessed.lower():
            row.report_preprocessed += f" {row.malignancy_benign_section_nl}"
        if row.conclusion_nl.lower() != "unknown" and (
            row.conclusion_nl.lower() not in row.report_preprocessed.lower()
            and "conclusie" not in row.report_preprocessed.lower()
        ):
            row.report_preprocessed += f" {row.conclusion_nl}"
        if row.birads_section_nl.lower() != "unknown" and \
                row.birads_section_nl.lower() not in row.report_preprocessed.lower():
            row.report_preprocessed += f" {row.birads_section_nl}"
        if row.report_preprocessed == "":
            row.report_preprocessed = None
        return row

    df = df.apply(validate_report, axis=1)
    df["report_preprocessed"] = df["report_preprocessed"].apply(
        lambda x: remove_extra_spaces(x) if isinstance(x, str) else x
    )

    df["has_report_current"] = df["report"].apply(lambda x: "Report current " in x)
    df["has_report_US"] = df["report"].apply(lambda x: "Report US " in x)
    df["has_report_MG"] = df["report"].apply(lambda x: "Report MG " in x)
    df["has_report_MR"] = df["report"].apply(lambda x: "Report MR " in x)
    df["has_report_others"] = df["report"].apply(
        lambda x: any(t in x for t in ["OTUS", "MROT", "MGOT"])
    )

    df = df.sort_values(["patient_id", "exam_date"], ascending=[True, True]).reset_index(drop=True)

    if export:
        export_dir = os.path.join(os.getcwd(), "data", time.strftime("%Y-%m-%d/%H-%M-%S", time.gmtime()))
        create_directory_if_not_exists(export_dir)
        df.to_csv(os.path.join(export_dir, "processed_reports.csv"), encoding="latin1")
        df["report"].to_csv(
            os.path.join(export_dir, "nl_reports_only.txt"), index=False, header=False, sep=" ", mode="a"
        )
    return df


def post_process_translated_report(df: pd.DataFrame, config, export: bool = False, export_dir: str = None) -> pd.DataFrame:
    """Post-Google-translate cleanup (reference: data_utils.py:815-878)."""

    def create_study_path(patient_id, study_id):
        return os.path.join(config.dataset.config.base_dataset_path, patient_id[0:2], patient_id, study_id)

    last, second_last = df.columns[-1], df.columns[-2]
    df = df.rename(columns={second_last: "image_impression", last: "image_description"})

    df["patient_id"] = df["patient_id"].apply(lambda x: "{0:0>8}".format(x))
    df["study_path"] = df.apply(lambda x: create_study_path(x.patient_id, x.study_id), axis=1)
    df["image_description"] = df["image_description"].apply(lambda x: re.sub(r"[^\x00-\x7F]+", "", x))
    df["image_description"] = df["image_description"].apply(remove_duplicate_sentences)
    df = df[df["image_description"] != "#VALUE!"]
    df["image_description"] = df["image_description"].apply(lambda x: x.replace("malignancy", "malignant"))
    df["image_description"] = df["image_description"].apply(lambda x: x.replace("BI-RADS", "BIRADS"))
    df["image_description"] = df["image_description"].apply(
        lambda x: x.replace(":", " ").replace(",", " ").replace("-", " ").replace('""', "").replace("...", "")
    )

    if export:
        export_dir = os.path.join(os.getcwd(), export_dir)
        create_directory_if_not_exists(export_dir)
        df.to_csv(os.path.join(export_dir, "postprocessed_tr_dataset.csv"))
        df["image_description"].to_csv(
            os.path.join(export_dir, "en_reports_only.txt"), index=False, header=False, sep=" ", mode="a"
        )
        df["image_impression"].to_csv(
            os.path.join(export_dir, "en_impression_only.txt"), index=False, header=False, sep=" ", mode="a"
        )
    return df


def map_path_to_features(df: pd.DataFrame, config, export: bool = False, export_dir: str = None) -> pd.DataFrame:
    """Point study paths at the extracted feature store
    (reference: data_utils.py:880-919).  Accepts .npy or .pth stores."""

    def patient_id_of(path):
        match = re.search(r"\d{8}", path)
        return match.group() if match else None

    def modify(study_path):
        tail = study_path.split("2D_100micron/")[-1]
        base = os.path.join(config.base.features_export_dir, tail, str(patient_id_of(study_path)))
        for suffix in (".npy", ".pth"):
            if os.path.isfile(base + suffix):
                return base + suffix
        return base + ".npy"

    df = df.copy()
    df["study_path"] = df["study_path"].apply(modify)
    df = df[df["study_path"].apply(os.path.isfile)]
    df.reset_index(drop=True, inplace=True)

    if export:
        export_dir = os.path.join(os.getcwd(), export_dir)
        create_directory_if_not_exists(export_dir)
        df.to_csv(os.path.join(export_dir, "final_reports_dataset.csv"), encoding="latin1")
    return df
