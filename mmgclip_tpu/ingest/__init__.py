from .encode import (
    ImageFeatureExtractor,
    StudyFeatureExtractor,
    image_feature_extractor,
    load_convnext_tower,
    study_feature_extractor,
)
from .png_reader import decode_png

__all__ = [
    "ImageFeatureExtractor",
    "StudyFeatureExtractor",
    "image_feature_extractor",
    "study_feature_extractor",
    "load_convnext_tower",
    "decode_png",
]
