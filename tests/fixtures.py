"""Synthetic dataset fixtures replicating the reference's on-disk layout.

Creates the p{patient}{study}{view} PNG tree, JSON region annotations,
normal/malignant patient list files, a feature store, and (for the exam
pipeline) final_reports_dataset.csv + gtr label files — so every entry point
runs end-to-end without the private Radboud data.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

VIEWS = ["cl", "cr", "ml", "mr"]


def make_image_id(patient: int, study: int, view: str) -> str:
    return f"p{patient:08d}{study:02d}{view}"


def write_png(path: str, size: int = 64, seed: int = 0, intensity_range=(0, 256)) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(*intensity_range, size=(size, size), dtype=np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr, mode="L").save(path)


def make_region(is_malign=False, is_mass=False, arch=False, calc=False, margin=None, shape=None):
    properties = {}
    if margin is not None:
        properties["mass_margin"] = margin
    if shape is not None:
        properties["mass_shape"] = shape
    return {
        "is_mass": is_mass,
        "is_malign": is_malign,
        "is_architectural_distortion": arch,
        "is_calcification_cluster": calc,
        "is_individual_calcification": False,
        "properties": properties,
    }


def build_image_label_tree(
    root: str,
    n_benign: int = 6,
    n_malignant: int = 6,
    image_size: int = 32,
    features_dim: int = 768,
    feature_store: bool = True,
    separable: bool = False,
    torch_feature_store: bool = False,
    pixel_class_signal: bool = False,
) -> Tuple[str, str, str, str]:
    """Returns (base_dataset_path, annotated_path, lists_path, features_dir)."""
    # replicate the real store prefix: <...>/2D_100micron/0/<pid[:2]>/<pid>/st<study>
    base = os.path.join(root, "png_archive", "2D_100micron", "0")
    annotated = os.path.join(root, "02_data_T_regions")
    lists_dir = os.path.join(root, "lists")
    features_dir = os.path.join(root, "features")
    os.makedirs(os.path.join(annotated, "02_benign"), exist_ok=True)
    os.makedirs(os.path.join(annotated, "02_stl"), exist_ok=True)
    os.makedirs(lists_dir, exist_ok=True)

    rng = np.random.default_rng(0)
    benign_patients: List[str] = []
    malig_patients: List[str] = []

    def emit(i: int, benign: bool):
        patient = 2000000 + i if benign else 2100000 + i
        pid = f"{patient:08d}"
        (benign_patients if benign else malig_patients).append(pid)
        view = VIEWS[i % len(VIEWS)]
        image_id = make_image_id(patient, 2, view)
        png_path = os.path.join(base, pid[:2], pid, "st02", f"{image_id}.png")
        # pixel_class_signal: classes separate in PIXEL space (intensity
        # bands), so runs that encode from PNGs can actually learn
        intensity = (0, 256)
        if pixel_class_signal:
            intensity = (0, 128) if benign else (128, 256)
        write_png(png_path, size=image_size, seed=i, intensity_range=intensity)

        if benign:
            regions = {}
            if i % 2 == 0:
                regions["r0"] = make_region(is_mass=True, margin="Circumscribed", shape="Oval")
        else:
            regions = {
                "r0": make_region(
                    is_malign=True, is_mass=(i % 3 != 0), arch=(i % 4 == 0), calc=(i % 3 == 0),
                    margin="Spiculated" if i % 3 != 0 else None,
                    shape="Irregular" if i % 3 != 0 else None,
                )
            }
        annotation = {f"{image_id}_png": {"regions": regions}}
        folder = "02_benign" if benign else "02_stl"
        with open(os.path.join(annotated, folder, f"{image_id}.json"), "w") as fh:
            json.dump(annotation, fh)

        if feature_store:
            feat_path = os.path.join(features_dir, "0/02", pid[:2], pid, "st02", f"{image_id}.npy")
            os.makedirs(os.path.dirname(feat_path), exist_ok=True)
            feats = rng.normal(size=(1, features_dim, 1, 1)).astype(np.float32)
            if separable:
                # class signal: benign/malignant means differ along a subspace
                direction = np.sign(np.arange(features_dim) % 2 - 0.5).astype(np.float32)
                feats[0, :, 0, 0] += (3.0 if benign else -3.0) * direction
            np.save(feat_path, feats)
            if torch_feature_store:
                # identical values in the reference's on-disk format
                # (.pth tensors, reference: image_features.py:107-117)
                import torch

                # reference store layout: export/0/<pid[:2]>/<pid>/st<study>
                # (reference: image_features.py:107-109); the dataset walks
                # data_folder "0/02" where "02" IS the pid[:2] shard
                pth_path = os.path.join(
                    root, "features_torch", "0", pid[:2], pid, "st02", f"{image_id}.pth"
                )
                os.makedirs(os.path.dirname(pth_path), exist_ok=True)
                # torch.tensor (not from_numpy): numpy-backed tensors fail
                # torch.load's weights_only unpickling in torch >= 2.6
                torch.save(torch.tensor(feats), pth_path)

    for i in range(n_benign):
        emit(i, benign=True)
    for i in range(n_malignant):
        emit(i, benign=False)

    with open(os.path.join(lists_dir, "normal_patients.txt"), "w") as fh:
        fh.write("patient_id\n" + "\n".join(benign_patients) + "\n")
    with open(os.path.join(lists_dir, "malignant_patients.txt"), "w") as fh:
        fh.write("patient_id\n" + "\n".join(malig_patients) + "\n")

    return base, annotated, lists_dir, features_dir


def build_study_report_fixture(root: str, n_studies: int = 8, features_dim: int = 768,
                               separable: bool = False):
    """final_reports_dataset.csv + gtr csv + study feature store.

    ``separable=True`` plants a malignancy signal in the study features so
    training tests can gate on a learnable AUC (mirrors the image fixture's
    ``separable`` knob)."""
    import pandas as pd

    features_dir = os.path.join(root, "study_features")
    rows = []
    gtr_rows = []
    rng = np.random.default_rng(1)
    for i in range(n_studies):
        patient = 2200000 + i
        pid = f"{patient:08d}"
        study_id = "st02"
        feat_path = os.path.join(features_dir, pid[:2], pid, study_id, f"{pid}.npy")
        os.makedirs(os.path.dirname(feat_path), exist_ok=True)
        feat = rng.normal(size=(features_dim,)).astype(np.float32)
        if separable:
            feat[:64] += 3.0 if i % 2 else -3.0
        np.save(feat_path, feat)

        is_malig = i % 2
        labels = {
            "birads": str(2 + (i % 4)) if i % 3 else "unknown",
            "malignancy": is_malig,
            "masses": {"shapes": ["oval", "round", "irregular", "unknown"][i % 4], "density": "unknown"},
            "calcifications": {"distribution": ["diffuse", "unknown"][i % 2], "morphology": "unknown"},
        }
        rows.append(
            {
                "patient_id": pid,
                "study_id": study_id,
                "image_description": f"The report for study {i} shows findings. BIRADS {2 + (i % 4)}.",
                "image_impression": f"Impression text {i}.",
                "is_malig": str(is_malig),
                "labels": str(labels),
                "study_path": feat_path,
            }
        )
        if i % 2 == 0:  # half the studies have gtr labels
            gtr_rows.append(
                {
                    "gtr_path": f"/gtr/{pid}{study_id[2:]}xx.dcm",
                    "gtr_mass": str(i % 4 == 0),
                    "gtr_calc": str(i % 4 == 2),
                    "gtr_malign": str(is_malig == 1),
                    "gtr_mass_margin": str(1 + (i % 4)),
                    "gtr_is_architectural_distortion": str(i % 8 == 4),
                    "gtr_histology": str(i % 3),
                }
            )

    reports_csv = os.path.join(root, "final_reports_dataset.csv")
    gtr_csv = os.path.join(root, "gtr.csv")
    pd.DataFrame(rows).to_csv(reports_csv)
    pd.DataFrame(gtr_rows).to_csv(gtr_csv, index=False)
    return reports_csv, gtr_csv, features_dir
