"""Datasets: image-level labels and exam-level reports.

Host-side, pandas-backed rebuilds of the reference datasets
(reference: mmgclip/dataset/dataset.py:14-351 ImageLabelDataset,
:353-561 StudyReportDataset) with TPU-first data-path changes:

* all text is generated AND tokenized once at construction (the supervision
  text is fixed for a run; the reference re-tokenizes in every DataLoader
  worker collate);
* all feature vectors are loaded into one contiguous float32 array up front
  (a few MB — the towers are frozen, features are 768-d), so collate is pure
  numpy indexing and batches stream to HBM without per-item file IO;
* splits replay from the seed (see data.split).
"""

from __future__ import annotations

import ast
import os
import random
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from ..config.registry import DATASETS
from ..prompts.enums import MassShapeLabels, get_key_from_value, gtr_MassMargin
from ..prompts.generator import (
    generate_gtr_prompt_sentence,
    generate_label_prompt_sentence,
)
from ..utils.logging import logger
from ..utils.seeding import create_directory_if_not_exists
from .labels import cast_label, prepare_prompt_labels, process_class_list
from .ingest import create_dataset_df
from .paths import create_dataset_path
from .split import random_split
from .store import load_features
from .tokenizer import Tokenizer


def _study_gtr_report(row, rng: random.Random) -> str:
    """Per-image gtr-style pseudo report (reference: dataset.py:198-236)."""
    prompts: List[str] = []
    if row["has_mass"]:
        malign = "malignant" if row["image_label"] == 1 else "benign"
        margins = sorted({str(v).lower() for v in row["mass_margin"] if v != -1})
        margin = margins[0] if margins else "unknown"
        shapes = sorted({str(v).lower() for v in row["mass_shape"] if v != -1})
        shape = shapes[0] if shapes else "unknown"
        prompts.append(
            generate_gtr_prompt_sentence(
                "gtr_mass:True", n=1, rng=rng, M_MALIG=malign, M_MARG=margin, M_SHAPE=shape
            )
        )
    if row["has_calc"]:
        malign = "malignant" if row["image_label"] == 1 else "benign"
        prompts.append(
            generate_gtr_prompt_sentence("gtr_calc:True", n=1, rng=rng, C_MALIG=malign)
        )
    if row["has_architectural_distortion"]:
        prompts.append(
            generate_gtr_prompt_sentence("gtr_is_architectural_distortion:True", n=1, rng=rng)
        )
    return " ".join(prompts)


@DATASETS.register("ImageLabelDataset")
class ImageLabelDataset:
    def __init__(self, config, data_folder: str = "0/02", split: Optional[str] = None):
        self.config = config
        self.split = split
        self.data_path = os.path.join(config.base.features_export_dir, data_folder)
        self._rng = random.Random(int(config.base.seed))

        gen_sentence = bool(config.dataset.config.generate_label_prompt_sentence)
        gen_report = bool(config.dataset.config.generate_label_prompt_report)
        self.search_col = (
            config.dataset.config.search_col if not (gen_sentence or gen_report) else "search_col"
        )
        self.new_col = self.search_col + "_new"

        # annotation table + text column
        self.dataset_df = create_dataset_df(config).sort_values("image_id").reset_index(drop=True)
        self._build_text_column(gen_sentence, gen_report)

        # feature store index, joined on image_id (reference: dataset.py:52-59)
        self.dataset_pth = create_dataset_path(self.data_path).sort_values("image_id").reset_index(drop=True)
        keep = [
            "image_id", "image_label", "mass_shape", "mass_margin", "has_mass",
            "has_architectural_distortion", "has_calc", self.new_col,
        ]
        self.dataset_pth = pd.merge(self.dataset_pth, self.dataset_df[keep], on="image_id", how="inner")
        self.dataset_pth = self.dataset_pth[self.dataset_pth["image_label"] != 2].reset_index(drop=True)
        logger.info(f"Total dataset length: {len(self.dataset_pth)}.")

        # export text dump (reference: dataset.py:69)
        export_dir = create_directory_if_not_exists(config.base.export_dir)
        self.dataset_pth[self.new_col].to_csv(
            os.path.join(export_dir, "image_description.txt"),
            index=False, header=False, sep=" ", mode="a",
        )

        # tokenizer + one-shot tokenization of the full text column
        self.tokenizer = Tokenizer.from_pretrained(
            config.tokenizer.config.tokenizer_name,
            sequence_length=int(config.tokenizer.config.sequence_length),
        )
        self.sequence_length = int(config.tokenizer.config.sequence_length)
        texts = self.dataset_pth[self.new_col].astype(str).tolist()
        self._tokens = self.tokenizer(texts, max_length=self.sequence_length) if texts else None

        # contiguous feature bank
        self._features = (
            np.stack([np.asarray(load_features(p), np.float32) for p in self.dataset_pth["image_path"]])
            if len(self.dataset_pth)
            else np.zeros((0, 768), np.float32)
        )
        self._prompt_labels = [prepare_prompt_labels(row) for _, row in self.dataset_pth.iterrows()]

    # ------------------------------------------------------------------
    def _build_text_column(self, gen_sentence: bool, gen_report: bool) -> None:
        """Populate the supervision-text column
        (reference: dataset.py:90-244)."""
        df = self.dataset_df
        if gen_report:
            df[self.new_col] = df.apply(lambda row: _study_gtr_report(row, self._rng), axis=1)
            return
        if gen_sentence:
            template = self.config.dataset.template
            def sentence_for(value):
                side = 0 if value == 0 else 1
                return generate_label_prompt_sentence(
                    template.label[side], template.template_keys[side], n=1,
                    template=template.prompt_template or None, rng=self._rng,
                )[0]
            source_col = self.search_col if self.search_col in df.columns else "image_label"
            df[self.new_col] = df[source_col].apply(sentence_for)
            return
        enums_class = self.config.dataset.config.enums_class
        df[self.new_col] = df[self.search_col].apply(lambda v: cast_label(v, enums_class))

    # ------------------------------------------------------------------
    def random_split(self, dataset, split: str):
        ratio = (
            self.config.dataset.split.train_split_ratio
            if split == "train"
            else self.config.dataset.split.test_split_ratio
        )
        self.split = split
        return random_split(dataset, float(ratio), int(self.config.base.seed))

    def __len__(self) -> int:
        return len(self.dataset_pth)

    def __getitem__(self, index: int) -> Dict:
        row = self.dataset_pth.iloc[index]
        return {
            "index": index,
            "image_features": self._features[index],
            "image_description": row[self.new_col],
            "image_label": np.asarray([row["image_label"]], np.int32),
            "image_id": row["image_id"],
            "prompt_labels": self._prompt_labels[index],
        }

    def collate_fn(self, instances: List[Dict]) -> Dict:
        idx = np.asarray([ins["index"] for ins in instances], np.int64)
        return {
            "indices": idx,
            "image_features": self._features[idx],
            "text_tokens": {k: v[idx] for k, v in self._tokens.items()},
            "image_description": [ins["image_description"] for ins in instances],
            "image_label": np.stack([ins["image_label"] for ins in instances]),
            "image_id": [ins["image_id"] for ins in instances],
            "prompt_labels": [ins["prompt_labels"] for ins in instances],
        }


@DATASETS.register("StudyReportDataset")
class StudyReportDataset:
    def __init__(self, config, split: Optional[str] = None):
        self.config = config
        self.split = split
        self._rng = random.Random(int(config.base.seed))

        self.final_reports_dataset = pd.read_csv(
            config.dataset.config.final_reports_dataset_path,
            encoding="unicode_escape", index_col=0, dtype=str,
        )
        # empty report cells arrive as NaN (dtype=str does not rescue
        # missing values): left alone, NaN poisons the gtr prompt concat
        # (str + " " + NaN -> NaN) and then tokenizes as the literal text
        # 'nan'.  The reference crashes outright on such rows
        # (dataset.py:496 concatenates str + float) — empty-string is the
        # robust superset and byte-identical on NaN-free data (all parity
        # fixtures)
        for col in ("image_description", "image_impression"):
            if col in self.final_reports_dataset.columns:
                self.final_reports_dataset[col] = self.final_reports_dataset[col].fillna("")
        logger.info(f"Total dataset length: {len(self.final_reports_dataset)}.")

        if config.dataset.config.gtr_prompt_generation:
            self._generate_gtr_prompts()

        export_dir = create_directory_if_not_exists(config.base.export_dir)
        self.final_reports_dataset["image_description"].to_csv(
            os.path.join(export_dir, "image_description.txt"),
            index=False, header=False, sep=" ", mode="a",
        )

        self.tokenizer = Tokenizer.from_pretrained(
            config.tokenizer.config.tokenizer_name,
            sequence_length=int(config.tokenizer.config.sequence_length),
        )
        self.sequence_length = int(config.tokenizer.config.sequence_length)

        df = self.final_reports_dataset
        self._tokens = self.tokenizer(df["image_description"].astype(str).tolist(), max_length=self.sequence_length)
        self._impression_tokens = self.tokenizer(
            df["image_impression"].fillna("").astype(str).tolist(), max_length=self.sequence_length
        )
        self._features = np.stack(
            [np.asarray(load_features(p), np.float32) for p in df["study_path"]]
        ) if len(df) else np.zeros((0, 768), np.float32)
        # parse once at construction (the module contract: "all text is
        # generated AND tokenized once"), not per __getitem__ per epoch
        self._prompt_labels = [self._prepare_prompt_labels(i) for i in range(len(df))]

    # ------------------------------------------------------------------
    def _generate_gtr_prompts(self) -> None:
        """Mix generated prompts with/instead of translated reports
        (reference: dataset.py:380-497)."""
        cfg = self.config.dataset.config
        bug_compat = bool(cfg.get("gtr_bug_compat", True))
        gtr = pd.read_csv(cfg.gt_path, dtype=str)
        gtr["full_study_id"] = gtr["gtr_path"].apply(lambda x: x.split("/")[-1][:10])
        df = self.final_reports_dataset

        # one pass over gtr instead of a full scan per report row (the
        # elementwise `in .values` + boolean-mask re-scan made construction
        # quadratic); first occurrence wins, matching `.iloc[0]`
        gtr_keys = set(gtr["full_study_id"])
        gtr_first: Dict[str, pd.Series] = {}
        for _, g_row in gtr.iterrows():
            gtr_first.setdefault(g_row["full_study_id"], g_row)

        df["has_gtr_label"] = df.apply(
            lambda x: f"{x['patient_id']}{x['study_id'][2:]}" in gtr_keys, axis=1
        )

        def build(row) -> str:
            prompts: List[str] = []
            if row.has_gtr_label:
                labels = ast.literal_eval(row.labels)
                sample = gtr_first[f"{row['patient_id']}{row['study_id'][2:]}"]
                birads = str(labels.get("birads", "unknown"))

                if str(sample.gtr_mass) == "True":
                    malign = "malignant" if str(sample.gtr_malign) == "True" else "benign"
                    margin = get_key_from_value(gtr_MassMargin, int(sample.gtr_mass_margin))
                    margin = process_class_list([margin])[0]
                    prompt = generate_gtr_prompt_sentence(
                        "gtr_mass:True", n=1, rng=self._rng, M_MALIG=malign,
                        M_MARG=margin, M_SHAPE=labels["masses"]["shapes"],
                    )
                    if birads.lower() != "unknown":
                        prompt = prompt[:-1] + ", " + generate_gtr_prompt_sentence(
                            "row.labels['birads']:True", n=1, rng=self._rng, B_SCORE=birads
                        )
                    prompts.append(prompt)

                if str(sample.gtr_calc) == "True":
                    prompt = generate_gtr_prompt_sentence(
                        "gtr_calc:True", n=1, rng=self._rng, C_MALIG="malignant",
                        C_DIST=labels["calcifications"]["distribution"],
                    )
                    if birads.lower() != "unknown":
                        prompt = prompt[:-1] + ", " + generate_gtr_prompt_sentence(
                            "row.labels['birads']:True", n=1, rng=self._rng, B_SCORE=birads
                        )
                    prompts.append(prompt)

                # reference quirk: its check is `str(...) == True` — a str
                # never equals the bool, so the reference NEVER emits this
                # prompt (reference: dataset.py:455-456).  Supervision parity
                # (and RNG-stream parity for every later draw) requires the
                # same; `gtr_bug_compat: false` restores the intended prompt.
                if not bug_compat and str(sample.gtr_is_architectural_distortion) == "True":
                    prompts.append(
                        generate_gtr_prompt_sentence(
                            "gtr_is_architectural_distortion:True", n=1, rng=self._rng
                        )
                    )
            else:
                prompts.append(generate_gtr_prompt_sentence("no_gtr", n=1, rng=self._rng))
            return " ".join(prompts)

        df["prompt_generated"] = df.apply(build, axis=1)
        if cfg.use_gtr_prompts_only:
            df["image_description"] = df["prompt_generated"]
            self.final_reports_dataset = df[df["image_description"] != ""].reset_index(drop=True)
        else:
            df["image_description"] = df["prompt_generated"] + " " + df["image_description"]
            self.final_reports_dataset = df

    # ------------------------------------------------------------------
    def random_split(self, dataset, split: str):
        ratio = (
            self.config.dataset.split.train_split_ratio
            if split == "train"
            else self.config.dataset.split.test_split_ratio
        )
        self.split = split
        return random_split(dataset, float(ratio), int(self.config.base.seed))

    def __len__(self) -> int:
        return len(self.final_reports_dataset)

    def _prepare_prompt_labels(self, index: int) -> Dict:
        row = self.final_reports_dataset.iloc[index]
        labels = ast.literal_eval(row["labels"])
        labels["BenignMalignantDatasetLabels"] = int(row["is_malig"])
        labels["MassShapeLabels"] = MassShapeLabels[labels["masses"]["shapes"]].value
        labels["BIRADS"] = labels["birads"]
        return labels

    def __getitem__(self, index: int) -> Dict:
        row = self.final_reports_dataset.iloc[index]
        return {
            "index": index,
            "image_features": self._features[index],
            "image_description": row["image_description"],
            "image_impression": row["image_impression"],
            "image_label": np.asarray([int(row["is_malig"])], np.int32),
            "image_id": row["patient_id"],
            "prompt_labels": self._prompt_labels[index],
        }

    def collate_fn(self, instances: List[Dict]) -> Dict:
        idx = np.asarray([ins["index"] for ins in instances], np.int64)
        return {
            "indices": idx,
            "image_features": self._features[idx],
            "text_tokens": {k: v[idx] for k, v in self._tokens.items()},
            "image_impression_tokens": {k: v[idx] for k, v in self._impression_tokens.items()},
            "image_description": [ins["image_description"] for ins in instances],
            "image_label": np.stack([ins["image_label"] for ins in instances]),
            "image_id": [ins["image_id"] for ins in instances],
            "prompt_labels": [ins["prompt_labels"] for ins in instances],
        }


def get_dataset(dataset_name: str):
    """Name -> dataset class (reference: dataset.py:563-585)."""
    logger.info(f"Using {dataset_name} dataset.")
    return DATASETS.get(dataset_name)
