"""ResNet-50 image encoder (ablation tower) in flax.linen.

Replaces the reference's torchvision ResNet-50 variant
(reference: mmgclip/networks/encoder.py:57-119): fc head removed, global
average pooled 2048-d features.  In the reference only ``layer4`` is
trainable; here the split is expressed functionally — the train step applies
gradients to the `layer4` subtree only (see training.experiment).
NHWC layout; BatchNorm in inference mode by default (the reference never
switches its frozen stages out of eval statistics either).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.float32
    # rematerialize bottleneck activations in the backward pass
    # (jax.checkpoint): trades recompute for memory when layer4 trains
    remat: bool = True

    @staticmethod
    def resnet50() -> "ResNetConfig":
        return ResNetConfig()

    @staticmethod
    def micro() -> "ResNetConfig":
        return ResNetConfig(stage_sizes=(1, 1, 1, 1), width=8)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1", dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides), padding=1, use_bias=False, name="conv2", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn3")(y)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(self.features * 4, (1, 1), strides=(self.strides, self.strides), use_bias=False, name="down_conv", dtype=self.dtype)(residual)
            residual = nn.BatchNorm(use_running_average=not train, name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Encoder(nn.Module):
    """Conv stem + 4 bottleneck stages; returns pooled [b, width*32] features."""

    config: ResNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        if x.ndim == 2:
            # 1D features arrive from the offline store; tile to a 3-channel
            # pseudo-image (reference: encoder.py:100-103)
            x = x[:, None, :, None]
            x = jnp.repeat(x, 3, axis=-1)
        x = nn.Conv(cfg.width, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1", dtype=cfg.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        block_cls = nn.remat(Bottleneck, static_argnums=(2,)) if cfg.remat else Bottleneck
        for stage, num_blocks in enumerate(cfg.stage_sizes):
            features = cfg.width * (2**stage)
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(features, strides, cfg.dtype, name=f"layer{stage + 1}_block{block}")(x, train)
        return jnp.mean(x, axis=(1, 2))


def init_resnet50(config: ResNetConfig, seed: int = 0, image_size: int = 64):
    module = ResNet50Encoder(config)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = jax.jit(module.init)(jax.random.key(seed), dummy)
    return module, variables
