"""Supervised ConvNeXt-classifier baseline evaluation
(reference: evaluate_cnn.py:1-47).

Evaluates the binary ConvNeXt classifier head on the same seeded test split
the CLIP models use, for the supervised-vs-zero-shot comparison.

Usage: python evaluate_cnn.py [--config-name evaluate_cnn_clf] [key=value ...]
"""

import jax
import jax.numpy as jnp

import mmgclip_tpu
from mmgclip_tpu.cli import compose_run
from mmgclip_tpu.ingest.encode import load_convnext_tower


def run(cfg) -> None:
    mmgclip_tpu.seeding(int(cfg.base.seed))

    dataset = mmgclip_tpu.get_dataset(cfg.dataset.eval.dataset.name)(config=cfg)
    mmgclip_tpu.logger.info(f"Description Example: {dataset[0]['image_description']}")

    _, val_split = dataset.random_split(dataset=dataset, split="train")
    _, test_split = dataset.random_split(dataset=val_split, split="test")
    mmgclip_tpu.logger.info(f"Test split len ({len(test_split)})")

    test_dataloader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=test_split).get_dataloader(
        **cfg.dataloader.test, collate_fn=dataset.collate_fn
    )

    # classifier head over stored pooled features (reference: evaluator.py:676-688)
    module, params, _cn_config = load_convnext_tower(cfg)

    @jax.jit
    def classifier_fn(pooled):
        head = params["params"]
        h = (pooled - jnp.mean(pooled, -1, keepdims=True)) / jnp.sqrt(
            jnp.var(pooled, -1, keepdims=True) + 1e-6
        )
        h = h * head["head_norm"]["scale"] + head["head_norm"]["bias"]
        return h @ head["head_fc"]["kernel"] + head["head_fc"]["bias"]

    results = mmgclip_tpu.Evaluator(
        config=cfg, test_dataloader=test_dataloader, tokenizer=dataset.tokenizer, cnn_eval=True
    ).evaluate_cnn(classifier_fn)
    mmgclip_tpu.logger.info(f"Results:\n{results}")


if __name__ == "__main__":
    run(compose_run("evaluate_cnn_clf", snapshot=False))
