"""t-SNE embedding-space analysis (reference: notebooks/tSNE_evaluation.ipynb).

Embeds the experiment's dataset through the trained projection head and
writes a 2-D t-SNE scatter colored by each label family, plus the raw
2-D coordinates as CSV — the reference's exploratory notebook as a CLI.

Usage:
  python tools/tsne_eval.py --experiment_path yyyy-mm-dd/XX-XX-XX
                            [--perplexity 30] [--out tsne]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment_path", required=True,
                        help="Run folder inside outputs/ ('yyyy-mm-dd/XX-XX-XX').")
    parser.add_argument("--perplexity", type=float, default=30.0)
    parser.add_argument("--out", default="tsne", help="Subdir of the run's results dir.")
    args = parser.parse_args()

    import numpy as np

    import mmgclip_tpu
    from mmgclip_tpu.config import recompose
    from mmgclip_tpu.serving import InferenceEngine

    experiment_path = args.experiment_path
    if not os.path.isdir(experiment_path):
        experiment_path = os.path.join("outputs", experiment_path)
    cfg = recompose(experiment_path)
    cfg.checkpoints.checkpoints_export_dir = os.path.join(experiment_path, "checkpoints")

    engine = InferenceEngine.from_experiment(experiment_path)
    dataset = mmgclip_tpu.get_dataset(cfg.dataset.eval.dataset.name)(config=cfg)

    loader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=dataset).get_dataloader(
        batch_size=32, shuffle=False, drop_last=False, collate_fn=dataset.collate_fn
    )
    embeddings, prompt_labels = [], []
    for batch in loader:
        # keep per-batch results ON DEVICE; one D2H fetch total below — a
        # fetch costs ~0.5 s on the tunnel regardless of size (the evaluator
        # uses the same single-fetch discipline, evaluator.py)
        embeddings.append(engine.image_embeddings(np.asarray(batch["image_features"])))
        prompt_labels.extend(batch["prompt_labels"])
    import jax.numpy as jnp

    embeddings = np.asarray(jnp.concatenate(embeddings, axis=0))

    from sklearn.manifold import TSNE

    perplexity = min(args.perplexity, max(2.0, (len(embeddings) - 1) / 3))
    coords = TSNE(
        n_components=2, perplexity=perplexity, random_state=int(cfg.base.seed), init="pca"
    ).fit_transform(embeddings)

    out_dir = os.path.join(experiment_path, "results", args.out)
    os.makedirs(out_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    label_families = sorted(prompt_labels[0].keys()) if prompt_labels else []
    with open(os.path.join(out_dir, "tsne_coords.csv"), "w") as fh:
        fh.write("x,y," + ",".join(label_families) + "\n")
        for (x, y), labels in zip(coords, prompt_labels):
            fh.write(f"{x},{y}," + ",".join(str(labels[k]) for k in label_families) + "\n")

    for family in label_families:
        values = [str(p[family]) for p in prompt_labels]
        plt.figure(figsize=(6, 5))
        for value in sorted(set(values)):
            idx = [i for i, v in enumerate(values) if v == value]
            plt.scatter(coords[idx, 0], coords[idx, 1], s=14, label=value, alpha=0.75)
        plt.legend(fontsize=7)
        plt.title(f"t-SNE of projected image embeddings — {family}")
        plt.tight_layout()
        path = os.path.join(out_dir, f"tsne_{family}.png")
        plt.savefig(path, dpi=120)
        plt.close()
        print("wrote", path)
    print("wrote", os.path.join(out_dir, "tsne_coords.csv"))


if __name__ == "__main__":
    main()
