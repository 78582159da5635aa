from .bert import BertConfig, BertEncoder, eos_pool, init_bert, load_hf_weights
from .clip import MMGCLIP, PromptClassifier, l2_normalize
from .gpt import CausalTextEncoder, GPTConfig, init_gpt, load_biogpt_weights
from .convnext import ConvNeXt, ConvNeXtConfig, init_convnext, load_torchvision_weights
from .projections import (
    LinearProjectionLayer,
    MLPProjectionHead,
    MultiLinearHead,
    ProjectionHead,
    get_projection_head,
)
from .resnet import ResNet50Encoder, ResNetConfig, init_resnet50

__all__ = [
    "BertConfig",
    "BertEncoder",
    "eos_pool",
    "init_bert",
    "load_hf_weights",
    "MMGCLIP",
    "PromptClassifier",
    "l2_normalize",
    "CausalTextEncoder",
    "GPTConfig",
    "init_gpt",
    "load_biogpt_weights",
    "ConvNeXt",
    "ConvNeXtConfig",
    "init_convnext",
    "load_torchvision_weights",
    "LinearProjectionLayer",
    "MLPProjectionHead",
    "MultiLinearHead",
    "ProjectionHead",
    "get_projection_head",
    "ResNet50Encoder",
    "ResNetConfig",
    "init_resnet50",
]
