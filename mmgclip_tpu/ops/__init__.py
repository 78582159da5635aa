from .flash_attention import attention_reference, flash_attention
from .fusion import FUSION_METHODS, fuse_views
from .preprocess import intensity_transform

__all__ = [
    "attention_reference",
    "flash_attention",
    "FUSION_METHODS",
    "fuse_views",
    "intensity_transform",
]
