"""ConvNeXt-Tiny image tower in flax.linen.

The reference ships an opaque TorchScript ConvNeXt-Tiny classifier and runs
``model.features(x)`` then ``model.avgpool`` (reference:
mmgclip/networks/encoder.py:40-55, mmgclip/networks/image_features.py:95-101).
This is a from-scratch JAX implementation of the torchvision ConvNeXt-Tiny
topology so those weights can be converted (tools/convert_convnext.py) and
bit-compatible 768-d features produced on TPU.

Layout is NHWC (TPU-native); the converter transposes torch's NCHW weights.
The 16-bit intensity transform lives in :mod:`mmgclip_tpu.ops.preprocess`,
fused into the same jit as the tower forward.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    num_classes: int = 2  # binary normal/abnormal classifier head
    layer_scale_init: float = 1e-6
    in_channels: int = 3
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(num_classes: int = 2) -> "ConvNeXtConfig":
        return ConvNeXtConfig(num_classes=num_classes)

    @staticmethod
    def micro(num_classes: int = 2) -> "ConvNeXtConfig":
        """Small test-size variant."""
        return ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(8, 16, 32, 768), num_classes=num_classes)


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        # 7x7 depthwise conv
        x = nn.Conv(
            self.dim,
            kernel_size=(7, 7),
            padding=3,
            feature_group_count=self.dim,
            name="dwconv",
            dtype=self.dtype,
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2", dtype=self.dtype)(x)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,))
        return residual + gamma * x


class ConvNeXt(nn.Module):
    """ConvNeXt backbone: `features` -> [b, H/32, W/32, dims[-1]]."""

    config: ConvNeXtConfig

    @nn.compact
    def __call__(self, x, pool: bool = True, classify: bool = False):
        cfg = self.config
        # stem: 4x4/4 conv + LN (channels-last)
        x = nn.Conv(cfg.dims[0], kernel_size=(4, 4), strides=(4, 4), name="stem_conv", dtype=cfg.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)

        for stage, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample_{stage}_norm")(x)
                x = nn.Conv(dim, kernel_size=(2, 2), strides=(2, 2), name=f"downsample_{stage}_conv", dtype=cfg.dtype)(x)
            for block in range(depth):
                x = ConvNeXtBlock(dim, cfg.layer_scale_init, cfg.dtype, name=f"stage_{stage}_block_{block}")(x)

        if not pool:
            return x
        pooled = jnp.mean(x, axis=(1, 2))  # global average pool -> [b, dims[-1]]
        if not classify:
            return pooled
        h = nn.LayerNorm(epsilon=1e-6, name="head_norm")(pooled)
        return nn.Dense(cfg.num_classes, name="head_fc")(h)


def init_convnext(config: ConvNeXtConfig, seed: int = 0, image_size: int = 64):
    module = ConvNeXt(config)
    dummy = jnp.zeros((1, image_size, image_size, config.in_channels), jnp.float32)
    # init with classify=True so the head params exist for all call modes;
    # jitted: eager init dispatches op-by-op (minutes over a remote TPU link)
    params = jax.jit(lambda k, x: module.init(k, x, classify=True))(jax.random.key(seed), dummy)
    return module, params


def load_torchvision_weights(params, torch_state_dict, config: ConvNeXtConfig):
    """Map a torchvision ``convnext_tiny`` state dict onto the param tree.

    Handles both raw torchvision names (``features.N...``) and the
    classifier variant (``classifier.2``) used by the reference's TorchScript
    artifact (reference: configs/networks/clip_convnext_bert.yaml:5-6).
    Conv kernels transpose NCHW->HWIO; linear kernels transpose.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}

    def conv(name):
        return jnp.asarray(sd[name]).transpose(2, 3, 1, 0)  # OIHW -> HWIO

    def dwconv(name):
        w = np.asarray(sd[name])  # [C, 1, kh, kw]
        return jnp.asarray(w.transpose(2, 3, 1, 0))  # -> [kh, kw, 1, C]

    def lin(name):
        return jnp.asarray(sd[name]).T

    def vec(name):
        return jnp.asarray(sd[name])

    p = params["params"]
    p["stem_conv"]["kernel"] = conv("features.0.0.weight")
    p["stem_conv"]["bias"] = vec("features.0.0.bias")
    p["stem_norm"]["scale"] = vec("features.0.1.weight")
    p["stem_norm"]["bias"] = vec("features.0.1.bias")

    # torchvision indexes: stages at features[1,3,5,7], downsamples at [2,4,6]
    stage_idx = [1, 3, 5, 7]
    down_idx = [None, 2, 4, 6]
    for stage, depth in enumerate(config.depths):
        if stage > 0:
            di = down_idx[stage]
            p[f"downsample_{stage}_norm"]["scale"] = vec(f"features.{di}.0.weight")
            p[f"downsample_{stage}_norm"]["bias"] = vec(f"features.{di}.0.bias")
            p[f"downsample_{stage}_conv"]["kernel"] = conv(f"features.{di}.1.weight")
            p[f"downsample_{stage}_conv"]["bias"] = vec(f"features.{di}.1.bias")
        si = stage_idx[stage]
        for b in range(depth):
            blk = p[f"stage_{stage}_block_{b}"]
            pre = f"features.{si}.{b}.block"
            blk["dwconv"]["kernel"] = dwconv(f"{pre}.0.weight")
            blk["dwconv"]["bias"] = vec(f"{pre}.0.bias")
            blk["norm"]["scale"] = vec(f"{pre}.2.weight")
            blk["norm"]["bias"] = vec(f"{pre}.2.bias")
            blk["pwconv1"]["kernel"] = lin(f"{pre}.3.weight")
            blk["pwconv1"]["bias"] = vec(f"{pre}.3.bias")
            blk["pwconv2"]["kernel"] = lin(f"{pre}.5.weight")
            blk["pwconv2"]["bias"] = vec(f"{pre}.5.bias")
            blk["gamma"] = vec(f"features.{si}.{b}.layer_scale")
    # classifier head (present on the reference's binary classifier artifact)
    if "classifier.0.weight" in sd:
        p["head_norm"]["scale"] = vec("classifier.0.weight")
        p["head_norm"]["bias"] = vec("classifier.0.bias")
        p["head_fc"]["kernel"] = lin("classifier.2.weight")
        p["head_fc"]["bias"] = vec("classifier.2.bias")
    return params
