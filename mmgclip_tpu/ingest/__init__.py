from .encode import (
    ImageFeatureExtractor,
    StudyFeatureExtractor,
    image_feature_extractor,
    load_convnext_tower,
    shard_items_for_host,
    study_feature_extractor,
)
from .png_reader import decode_png

__all__ = [
    "ImageFeatureExtractor",
    "StudyFeatureExtractor",
    "image_feature_extractor",
    "study_feature_extractor",
    "load_convnext_tower",
    "shard_items_for_host",
    "decode_png",
]
