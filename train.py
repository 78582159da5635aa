"""Training entry point (reference: train.py:1-93).

Usage: python train.py [--config-name train_binary_class_clf] [key=value ...]
"""

import mmgclip_tpu
from mmgclip_tpu.cli import compose_run


def run(cfg) -> None:
    mmgclip_tpu.seeding(int(cfg.base.seed))

    dataset = mmgclip_tpu.get_dataset(cfg.dataset.name)(config=cfg)
    mmgclip_tpu.logger.info(f"Description Example: {dataset[0]['image_description']}")
    mmgclip_tpu.logger.info(f"Features Shape: {dataset[0]['image_features'].shape}")

    # split train/val, then (when eval uses the same dataset type) val/test
    train_split, val_split = dataset.random_split(dataset=dataset, split="train")
    mmgclip_tpu.logger.info(
        f"Train split len: ({len(train_split)}), Valid split len ({len(val_split)})."
    )
    test_split = None
    if cfg.dataset.name == cfg.dataset.eval.dataset.name:
        val_split, test_split = dataset.random_split(dataset=val_split, split="test")
        mmgclip_tpu.logger.info(f"Test split len ({len(test_split)}).")
    else:
        mmgclip_tpu.logger.info("Using different dataset for testing, not splitting validation.")

    train_dataloader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=train_split).get_dataloader(
        **cfg.dataloader.train, collate_fn=dataset.collate_fn
    )
    val_dataloader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=val_split).get_dataloader(
        **cfg.dataloader.valid, collate_fn=dataset.collate_fn
    )
    test_dataloader = (
        mmgclip_tpu.DataLoaders(config=cfg, dataset_split=test_split).get_dataloader(
            **cfg.dataloader.test, collate_fn=dataset.collate_fn
        )
        if test_split is not None
        else None
    )

    if cfg.dataset.percentage.name != "100percent":
        mmgclip_tpu.logger.info(
            f"Using only {cfg.dataset.percentage.config.percentage} of training data."
        )
        train_dataloader = mmgclip_tpu.dataloader_percentage(
            train_dataloader, cfg, collate_fn=dataset.collate_fn
        )

    experiment_class = mmgclip_tpu.create_experiment(cfg.experiments.config.experiment_name)
    experiment = experiment_class(
        config=cfg,
        train_dataloader=train_dataloader,
        valid_dataloader=val_dataloader,
        test_dataloader=test_dataloader,
        tokenizer=dataset.tokenizer,
    )
    if getattr(cfg.base, "resume", False):
        experiment.resume()
    experiment.run()


if __name__ == "__main__":
    run(compose_run("train_binary_class_clf"))
