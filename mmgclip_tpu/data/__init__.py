from .datasets import ImageLabelDataset, StudyReportDataset, get_dataset
from .ingest import create_dataset_df
from .labels import cast_label, prepare_prompt_labels, process_class_list
from .loader import DataLoader, DataLoaders, dataloader_percentage
from .paths import (
    create_dataset_path,
    create_exam_path,
    create_path,
    find_similar_item,
    get_project_root,
)
from .reports import (
    map_path_to_features,
    post_process_translated_report,
    preprocess_reports_csv,
    remove_duplicate_sentences,
)
from .sampler import ImbalancedDatasetSampler
from .split import Subset, random_split, seeded_split
from .store import load_features, load_features_batch, save_features
from .tokenizer import Tokenizer, WordPieceTokenizer

__all__ = [
    "ImageLabelDataset",
    "StudyReportDataset",
    "get_dataset",
    "create_dataset_df",
    "cast_label",
    "prepare_prompt_labels",
    "process_class_list",
    "DataLoader",
    "DataLoaders",
    "dataloader_percentage",
    "create_dataset_path",
    "create_exam_path",
    "create_path",
    "find_similar_item",
    "get_project_root",
    "map_path_to_features",
    "post_process_translated_report",
    "preprocess_reports_csv",
    "remove_duplicate_sentences",
    "ImbalancedDatasetSampler",
    "Subset",
    "random_split",
    "seeded_split",
    "load_features",
    "load_features_batch",
    "save_features",
    "Tokenizer",
    "WordPieceTokenizer",
]
