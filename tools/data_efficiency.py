"""Data-efficiency sweep: train at several training-set fractions, collect AUCs.

The reference ships the experiment knob (`configs/dataset/percentage/p{10,20,
50,70,100}.yaml` + `dataloader_percentage`, reference: dataloaders.py:42-57)
but runs each fraction by hand.  This tool sweeps the fractions in one
seeded command, writes `data_efficiency.csv` (fraction, enum class, mean AUC)
and an AUC-vs-fraction plot per evaluated label family.

Usage:
  python tools/data_efficiency.py --config-name train_binary_class_clf \\
      --fractions 0.1 0.5 1.0 --out sweep_dir [key=value overrides ...]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_sweep(config_name, fractions, out_dir, overrides):
    import train
    from mmgclip_tpu.config import Config, compose, save_snapshot

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for fraction in fractions:
        run_dir = os.path.join(out_dir, f"p{int(round(fraction * 100))}")
        cfg = compose(os.path.join(REPO, "configs"), config_name,
                      overrides=list(overrides), run_dir=run_dir)
        cfg.dataset.percentage = Config(
            {"name": f"{int(round(fraction * 100))}percent",
             "config": {"percentage": fraction}}
        )
        cfg.base.export_dir = run_dir
        cfg.base.results_export_dir = os.path.join(run_dir, "results")
        cfg.base.tensorboard_export_dir = os.path.join(run_dir, "runs")
        cfg.checkpoints.checkpoints_export_dir = os.path.join(run_dir, "checkpoints")
        save_snapshot(cfg, run_dir)

        print(f"== fraction {fraction} -> {run_dir} ==")
        train.run(cfg)

        results_path = os.path.join(run_dir, "results", "results.json")
        with open(results_path) as fh:
            results = json.load(fh)
        for enum_class, methods in results.items():
            for method, metrics in methods.items():
                if isinstance(metrics, dict) and "mean_auc" in metrics:
                    # non-finite values arrive as JSON null — map to nan
                    auc = metrics["mean_auc"]
                    rows.append(
                        {"fraction": fraction, "enum_class": enum_class,
                         "method": method,
                         "mean_auc": float("nan") if auc is None else auc}
                    )
    return rows


def write_outputs(rows, out_dir):
    csv_path = os.path.join(out_dir, "data_efficiency.csv")
    with open(csv_path, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=["fraction", "enum_class", "method", "mean_auc"])
        writer.writeheader()
        writer.writerows(rows)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    by_class = {}
    for row in rows:
        by_class.setdefault((row["enum_class"], row["method"]), []).append(
            (row["fraction"], row["mean_auc"])
        )
    fig, ax = plt.subplots(figsize=(6, 4))
    for (enum_class, method), points in sorted(by_class.items()):
        points.sort()
        ax.plot([p[0] for p in points], [p[1] for p in points],
                marker="o", label=f"{enum_class} ({method})")
    ax.set_xlabel("training-set fraction")
    ax.set_ylabel("mean zero-shot AUC")
    ax.set_title("Data efficiency")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "data_efficiency.png"), dpi=100)
    plt.close(fig)
    return csv_path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-name", default="train_binary_class_clf")
    parser.add_argument("--fractions", type=float, nargs="+", default=[0.1, 0.2, 0.5, 0.7, 1.0])
    parser.add_argument("--out", default="outputs/data_efficiency")
    parser.add_argument("overrides", nargs="*", help="key=value config overrides.")
    args = parser.parse_args()

    rows = run_sweep(args.config_name, args.fractions, args.out, args.overrides)
    csv_path = write_outputs(rows, args.out)
    print(f"Sweep complete: {csv_path}")
    for row in rows:
        print(row)


if __name__ == "__main__":
    main()
