"""Study feature extraction + final dataset export
(reference: encode_studies.py:1-33).

Usage: python encode_studies.py [--config-name train_exam_reports_clf] [key=value ...]
Pass `extract_features=true` to (re)run the study feature extraction before
mapping paths (the reference ships with the extraction call commented out).
"""

import pandas as pd

import mmgclip_tpu
from mmgclip_tpu.cli import compose_run


def extract(cfg) -> None:
    mmgclip_tpu.seeding(int(cfg.base.seed))

    path = cfg.dataset.config.post_translation_dataset_path
    mmgclip_tpu.logger.info(f"Loading {path} file...")
    postprocessed = pd.read_csv(path, encoding="latin1", index_col=0, dtype=str)

    if getattr(cfg, "extract_features", False):
        mmgclip_tpu.study_feature_extractor(config=cfg, dataset=postprocessed).extract()

    processed = mmgclip_tpu.map_path_to_features(
        df=postprocessed,
        config=cfg,
        export_dir=f"data/{cfg.dataset.config.post_translation_fileid}/",
        export=True,
    )
    mmgclip_tpu.logger.info(f"Final dataset shape: {processed.shape}")


if __name__ == "__main__":
    extract(compose_run("train_exam_reports_clf", snapshot=False))
