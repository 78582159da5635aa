"""Exploratory data analysis over the annotated dataset, as a CLI.

The reference performs this analysis interactively
(reference: notebooks/EDA.ipynb): image-label balance, per-region
multiplicity, mass-margin/shape coverage, annotation inconsistencies
(margin-without-shape files), and label-distribution histograms.  This tool
produces the same statistics as a text report plus histogram PNGs over any
config-resolvable dataset tree.

Usage:
  python tools/eda.py --config-name train_binary_class_clf \\
      [dataset.config.annotated_dataset_path=...] [--out eda_report]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _flat(series):
    # stringify: annotation values may be None / ints (datasets.py:47 does
    # the same defensively)
    return [str(val) for sublist in series for val in sublist if val != -1]


def analyse(df):
    """Compute the EDA.ipynb statistics over a create_dataset_df frame.

    Returns a dict of named results (also used by tests/test_eda.py)."""
    has_margin = df["mass_margin"].apply(lambda lst: any(v != -1 for v in lst))
    has_shape = df["mass_shape"].apply(lambda lst: any(v != -1 for v in lst))
    multi_margin = df["mass_margin"].apply(lambda lst: sum(1 for v in lst if v != -1) > 1)
    multi_shape = df["mass_shape"].apply(lambda lst: sum(1 for v in lst if v != -1) > 1)
    margin_labels = _flat(df["mass_margin"])
    shape_labels = _flat(df["mass_shape"])
    combined_margins = [
        " / ".join(sorted({str(v) for v in lst if v != -1}))
        for lst in df["mass_margin"] if any(v != -1 for v in lst)
    ]
    combined_shapes = [
        " / ".join(sorted({str(v) for v in lst if v != -1}))
        for lst in df["mass_shape"] if any(v != -1 for v in lst)
    ]
    return {
        "n_images": len(df),
        "image_label_counts": df["image_label"].value_counts().to_dict(),
        "flag_counts": {
            col: int(df[col].sum())
            for col in ("has_mass", "has_calc", "has_architectural_distortion")
        },
        "n_has_mass_margin": int(has_margin.sum()),
        "n_has_mass_shape": int(has_shape.sum()),
        "n_multiple_margins": int(multi_margin.sum()),
        "n_multiple_shapes": int(multi_shape.sum()),
        # annotation inconsistencies: one attribute without the other
        # (EDA.ipynb cells 22-24 found 5 such files)
        "shape_without_margin": df.loc[has_shape & ~has_margin, "image_id"].tolist(),
        "margin_without_shape": df.loc[has_margin & ~has_shape, "image_id"].tolist(),
        "margin_label_counts": dict(Counter(margin_labels)),
        "shape_label_counts": dict(Counter(shape_labels)),
        "combined_margin_counts": dict(Counter(combined_margins)),
        "combined_shape_counts": dict(Counter(combined_shapes)),
    }


def format_report(stats) -> str:
    lines = ["# EDA report", "", f"images: {stats['n_images']}", ""]
    lines.append("image_label counts (0=benign, 1=malignant, 2=uncertain):")
    for label, count in sorted(stats["image_label_counts"].items()):
        lines.append(f"  {label}: {count}")
    lines.append("")
    for col, count in stats["flag_counts"].items():
        lines.append(f"{col}: {count}")
    lines += [
        "",
        f"views with >=1 mass_margin: {stats['n_has_mass_margin']}",
        f"views with >=1 mass_shape:  {stats['n_has_mass_shape']}",
        f"views with multiple margins: {stats['n_multiple_margins']}",
        f"views with multiple shapes:  {stats['n_multiple_shapes']}",
        "",
        f"inconsistent (shape without margin): {stats['shape_without_margin']}",
        f"inconsistent (margin without shape): {stats['margin_without_shape']}",
        "",
        "mass_margin label distribution:",
    ]
    for label, count in sorted(stats["margin_label_counts"].items()):
        lines.append(f"  {label}: {count}")
    lines.append("mass_shape label distribution:")
    for label, count in sorted(stats["shape_label_counts"].items()):
        lines.append(f"  {label}: {count}")
    lines.append("combined margin strings (multi-region views joined by ' / '):")
    for label, count in sorted(stats["combined_margin_counts"].items()):
        lines.append(f"  {label}: {count}")
    lines.append("combined shape strings:")
    for label, count in sorted(stats["combined_shape_counts"].items()):
        lines.append(f"  {label}: {count}")
    return "\n".join(lines) + "\n"


def save_histograms(stats, out_dir: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for name in ("margin_label_counts", "shape_label_counts"):
        counts = stats[name]
        if not counts:
            continue
        fig, ax = plt.subplots(figsize=(6, 4))
        keys = sorted(counts)
        ax.bar([str(k) for k in keys], [counts[k] for k in keys], edgecolor="black")
        ax.set_title(f"Histogram of {name.replace('_counts', '').replace('_', ' ')}s")
        ax.set_xlabel("Labels")
        ax.set_ylabel("Frequency")
        plt.setp(ax.get_xticklabels(), rotation=45, ha="right")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{name}.png"), dpi=100)
        plt.close(fig)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_binary_class_clf")
    parser.add_argument("--out", default="eda_report", help="Output directory.")
    parser.add_argument("overrides", nargs="*", help="key=value config overrides.")
    args = parser.parse_args()

    from mmgclip_tpu.config import compose
    from mmgclip_tpu.data.ingest import create_dataset_df

    cfg = compose(os.path.join(REPO, "configs"), args.config_name, overrides=args.overrides)
    df = create_dataset_df(cfg)
    stats = analyse(df)
    report = format_report(stats)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "eda.txt"), "w") as fh:
        fh.write(report)
    save_histograms(stats, args.out)
    print(report)
    print(f"Report + histograms written to {args.out}/")


if __name__ == "__main__":
    main()
