"""Offline image feature extraction entry point (reference: encode_images.py:1-23).

Usage: python encode_images.py [--config-name train_binary_class_clf] [key=value ...]
"""

import mmgclip_tpu
from mmgclip_tpu.cli import compose_run


def extract(cfg) -> None:
    mmgclip_tpu.seeding(int(cfg.base.seed))
    dataset_df = mmgclip_tpu.create_dataset_df(config=cfg)
    mmgclip_tpu.logger.info(f"Encoding {len(dataset_df)} annotated images.")
    mmgclip_tpu.image_feature_extractor(config=cfg, dataset=dataset_df).extract()


if __name__ == "__main__":
    extract(compose_run("train_binary_class_clf", snapshot=False))
