"""mmgclip_tpu: TPU-native mammography vision-language framework.

Public facade mirroring the reference package surface
(reference: mmgclip/__init__.py:1-18) so reference users find every symbol
they relied on, plus the TPU-native additions (mesh/parallel layer, Pallas
ops, converters).
"""

from .config import Config, compose, load_config, recompose, save_snapshot
from .data import (
    DataLoaders,
    find_similar_item,
    ImbalancedDatasetSampler,
    Subset,
    Tokenizer,
    create_dataset_df,
    create_dataset_path,
    create_exam_path,
    create_path,
    dataloader_percentage,
    get_dataset,
    load_features,
    map_path_to_features,
    post_process_translated_report,
    preprocess_reports_csv,
    process_class_list,
    remove_duplicate_sentences,
    save_features,
)
from .evaluation import Evaluator, metrics
from .ingest import (
    ImageFeatureExtractor,
    StudyFeatureExtractor,
    image_feature_extractor,
    study_feature_extractor,
)
from .losses import create_loss
from .models import MMGCLIP as model  # facade alias (reference: __init__.py:7)
from .models import MMGCLIP, PromptClassifier
from .prompts import (
    generate_gtr_prompt_sentence,
    generate_label_prompt_report,
    generate_label_prompt_sentence,
    seed_prompt_rng,
)
from .training import ClassifierExperiment, create_experiment
from .utils import logger, seeding
from .utils.plot import plot_dataloader_batch, plot_cv2_image, pprint

__version__ = "0.1.0"

__all__ = [
    "Config",
    "compose",
    "load_config",
    "recompose",
    "save_snapshot",
    "DataLoaders",
    "ImbalancedDatasetSampler",
    "Subset",
    "Tokenizer",
    "create_dataset_df",
    "create_dataset_path",
    "create_exam_path",
    "create_path",
    "dataloader_percentage",
    "get_dataset",
    "load_features",
    "map_path_to_features",
    "post_process_translated_report",
    "preprocess_reports_csv",
    "process_class_list",
    "remove_duplicate_sentences",
    "save_features",
    "Evaluator",
    "metrics",
    "ImageFeatureExtractor",
    "StudyFeatureExtractor",
    "image_feature_extractor",
    "study_feature_extractor",
    "create_loss",
    "model",
    "MMGCLIP",
    "PromptClassifier",
    "generate_gtr_prompt_sentence",
    "generate_label_prompt_report",
    "generate_label_prompt_sentence",
    "seed_prompt_rng",
    "ClassifierExperiment",
    "create_experiment",
    "logger",
    "seeding",
    "find_similar_item",
    "plot_dataloader_batch",
    "plot_cv2_image",
    "pprint",
]
