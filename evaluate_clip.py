"""Zero-shot evaluation of a past experiment (reference: evaluate_clip.py:1-75).

Re-reads the saved run config, replays the seeded test split, runs the
Evaluator against the stored checkpoint.

Usage: python evaluate_clip.py --experiment_path yyyy-mm-dd/XX-XX-XX --run_name results_v2
"""

import argparse
import os

import mmgclip_tpu
from mmgclip_tpu.config import recompose, resolve


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--experiment_path", type=str, required=True,
        help="Run folder inside outputs/, e.g. 'yyyy-mm-dd/XX-XX-XX'.",
    )
    parser.add_argument(
        "--train_split",
        # argparse type=bool would accept ANY non-empty string as True
        type=lambda s: s.strip().lower() not in ("false", "0", "no", ""),
        default=True,
        help="Replay the training-time split (only True is supported).",
    )
    parser.add_argument(
        "--run_name", type=str, required=True,
        help="Folder name for the new results inside the experiment dir.",
    )
    args = parser.parse_args()

    # accept either the reference's relative form ('yyyy-mm-dd/XX-XX-XX'
    # inside outputs/) or an absolute run directory; all export paths derive
    # from the SAME resolved directory so results land inside the run
    experiment_path = args.experiment_path
    if not os.path.isabs(experiment_path):
        experiment_path = os.path.join("outputs", experiment_path)
    if not os.path.isdir(experiment_path) or "checkpoints" not in os.listdir(experiment_path):
        raise ValueError(
            "Wrong value for `experiment_path`. Pass the folder inside outputs/ "
            "('yyyy-mm-dd/XX-XX-XX', without the leading 'outputs/') or an "
            "absolute run directory."
        )
    assert args.train_split, "Only train_split=True is supported."

    cfg = recompose(experiment_path)
    cfg.base.export_dir = experiment_path
    cfg.base.features_export_dir = cfg.get_path("base.features_export_dir", "outputs/dataset")
    cfg.base.results_export_dir = os.path.join(experiment_path, args.run_name)
    cfg.checkpoints.checkpoints_export_dir = os.path.join(experiment_path, "checkpoints")

    mmgclip_tpu.seeding(int(cfg.base.seed))

    dataset = mmgclip_tpu.get_dataset(cfg.dataset.eval.dataset.name)(config=cfg)
    mmgclip_tpu.logger.info(f"Description Example: {dataset[0]['image_description']}")

    _, val_split = dataset.random_split(dataset=dataset, split="train")
    _, test_split = dataset.random_split(dataset=val_split, split="test")
    mmgclip_tpu.logger.info(f"Test split len ({len(test_split)})")

    test_dataloader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=test_split).get_dataloader(
        **cfg.dataloader.test, collate_fn=dataset.collate_fn
    )

    evaluator = mmgclip_tpu.Evaluator(
        config=cfg, test_dataloader=test_dataloader, tokenizer=dataset.tokenizer
    )
    evaluator.evaluate_experiment()


if __name__ == "__main__":
    main()
