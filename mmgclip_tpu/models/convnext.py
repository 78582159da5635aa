"""ConvNeXt-Tiny image tower in flax.linen, TPU-first.

The reference ships an opaque TorchScript ConvNeXt-Tiny classifier and runs
``model.features(x)`` then ``model.avgpool`` (reference:
mmgclip/networks/encoder.py:40-55, mmgclip/networks/image_features.py:95-101).
This is a from-scratch JAX implementation of the torchvision ConvNeXt-Tiny
topology so those weights can be converted (tools/convert_convnext.py) and
bit-compatible 768-d features produced on TPU.

TPU-first structure: each stage's residual blocks share one set of *stacked*
parameters ([depth, ...]) and run under ``jax.lax.scan`` — the compiled
program contains one block body per stage instead of 3+3+9+3 unrolled copies,
cutting XLA compile time ~4x with identical numerics.  Layout is NHWC; the
converter transposes torch's NCHW weights and stacks per-stage blocks.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Tuple

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
    # blocks run under lax.scan over stacked params; `unroll_blocks` trades
    # compile time for cross-block fusion (True = fully unrolled program)
    unroll_blocks: Any = 1
    # route the 7x7 depthwise conv through the Pallas kernel
    # (ops/depthwise_conv.py) instead of lax's grouped conv
    use_pallas_dwconv: bool = False
    # run each residual block as ONE fused Pallas kernel
    # (ops/fused_block.py): dwconv+LN+MLP+residual VMEM-resident, cutting
    # per-block HBM traffic ~12x vs the unfused lax path.  Composes with
    # quant="int8": the in-kernel int8 variant quantizes activations
    # per-chunk in VMEM (fused_convnext_block_int8)
    use_fused_blocks: bool = False
    # "int8": the pointwise (1x1) convs — ~92% of the tower's FLOPs — run as
    # dynamically-quantized int8 matmuls with int32 accumulation
    # (ops/quant.py; 2x MXU rate on v5e).  None = full-precision path.
    quant: Any = None
    # "exact" (default, torch-parity: the reference's nn.GELU) or "tanh":
    # the tanh approximation (~3e-4 max abs error) cuts the VPU cost of the
    # block's 4C-wide GELU — the largest elementwise pass once fusion makes
    # stages 0/1 VPU-bound (per-layer v5e roofline, bench.py)
    gelu: str = "exact"
    # run the stem (4x4/4 conv + LayerNorm) as one Pallas kernel
    # (ops/fused_stem.py): the conv output never touches HBM before the LN,
    # and the patch gather happens outside on the TINY pre-stem tensor (no
    # relayout-copy trap).  Still default OFF after the real-chip A/B:
    # 0.991x vs the fused-tanh tower (cosine 0.99998) — the fused stages
    # are VPU-bound on this chip, so the ~1.3 MB/image HBM saving doesn't
    # move the measured rate.  Opt-in for HBM-bound deployments.
    fuse_stem: bool = False
    # run the inter-stage LayerNorm+2x2/2 conv as one Pallas kernel
    # (ops/fused_downsample.py).  Default OFF after an honest real-chip A/B:
    # the dx-pair lane merge the kernel needs is NOT a free view on TPU
    # (lane-padded layouts force a real copy), and XLA's own bytes-accessed
    # shows the copy eating the LN round-trip saving (19.84 vs 18.87
    # MB/image at 256^2; measured throughput a wash-to--2.5%).  Kept as an
    # opt-in for layouts where the merge is free.
    fuse_downsample: bool = False

    @staticmethod
    def tiny(num_classes: int = 2) -> "ConvNeXtConfig":
        return ConvNeXtConfig(num_classes=num_classes)

    @staticmethod
    def micro(num_classes: int = 2) -> "ConvNeXtConfig":
        """Small test-size variant."""
        return ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(8, 16, 32, 768), num_classes=num_classes)


def _layer_norm(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + bias


def _valid_mask(x, valid_hw):
    """[n,1] broadcastable {0,1} mask of rows/cols < per-image valid (h, w)."""
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    mask = (rows < valid_hw[:, 0, None, None]) & (cols < valid_hw[:, 1, None, None])
    return mask[..., None].astype(x.dtype)


class ConvNeXtStage(nn.Module):
    """`depth` residual blocks with stacked params, scanned over depth."""

    dim: int
    depth: int
    layer_scale_init: float
    dtype: Any = jnp.float32
    unroll: Any = 1
    use_pallas_dwconv: bool = False
    use_fused_blocks: bool = False
    quant: Any = None
    gelu: str = "exact"

    @nn.compact
    def __call__(self, x, mask=None):
        d = self.dim
        # leading depth is a scan/stack axis — keep it out of fan_in; the
        # depthwise kernel's fan_in is its 7x7x1 receptive field (see bert.py)
        lecun = nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=0)
        lecun_dw = nn.initializers.lecun_normal(in_axis=3, out_axis=4, batch_axis=0)
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        stacked = {
            "dwconv_kernel": self.param("dwconv_kernel", lecun_dw, (self.depth, 7, 7, 1, d)),
            "dwconv_bias": self.param("dwconv_bias", zeros, (self.depth, d)),
            "norm_scale": self.param("norm_scale", ones, (self.depth, d)),
            "norm_bias": self.param("norm_bias", zeros, (self.depth, d)),
            "pwconv1_kernel": self.param("pwconv1_kernel", lecun, (self.depth, d, 4 * d)),
            "pwconv1_bias": self.param("pwconv1_bias", zeros, (self.depth, 4 * d)),
            "pwconv2_kernel": self.param("pwconv2_kernel", lecun, (self.depth, 4 * d, d)),
            "pwconv2_bias": self.param("pwconv2_bias", zeros, (self.depth, d)),
            "gamma": self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init), (self.depth, d)
            ),
        }
        dtype = self.dtype

        use_pallas = self.use_pallas_dwconv
        use_fused = self.use_fused_blocks
        quant = self.quant
        if self.gelu not in ("exact", "tanh"):
            # fail loudly: a typo'd knob ("Tanh", "approx") silently running
            # the exact path would be undetectable except by speed
            raise ValueError(
                f"ConvNeXtConfig.gelu must be 'exact' or 'tanh', got {self.gelu!r}")
        gelu_tanh = self.gelu == "tanh"

        def block(x, p):
            from ..ops.depthwise_conv import depthwise_conv7x7

            if use_fused:
                from ..ops.fused_block import (fused_convnext_block,
                                               fused_convnext_block_int8)

                kernel_fn = (fused_convnext_block_int8 if quant == "int8"
                             else fused_convnext_block)
                out = kernel_fn(
                    x,
                    p["dwconv_kernel"].astype(dtype), p["dwconv_bias"].astype(dtype),
                    # LN affine params stay full-precision: the unfused path
                    # applies them inside the fp32 _layer_norm (line ~148),
                    # so casting here would make the off-TPU lax fallback
                    # differ from the unfused tower by bf16 rounding —
                    # breaking the knob's byte-parity contract
                    p["norm_scale"], p["norm_bias"],
                    p["pwconv1_kernel"].astype(dtype), p["pwconv1_bias"].astype(dtype),
                    p["pwconv2_kernel"].astype(dtype), p["pwconv2_bias"].astype(dtype),
                    p["gamma"].astype(dtype),
                    False, gelu_tanh,  # interpret, gelu_tanh (positional:
                    # custom_vjp nondiff args must not be keywords)
                )
                if mask is not None:
                    out = out * mask
                return out, None

            residual = x
            if use_pallas:
                y = depthwise_conv7x7(x, p["dwconv_kernel"].astype(dtype), p["dwconv_bias"].astype(dtype))
            else:
                y = jax.lax.conv_general_dilated(
                    x,
                    p["dwconv_kernel"].astype(dtype),
                    window_strides=(1, 1),
                    padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=d,
                ) + p["dwconv_bias"].astype(dtype)
            y = _layer_norm(y, p["norm_scale"], p["norm_bias"]).astype(dtype)
            if quant == "int8":
                from ..ops.quant import int8_dot

                y = int8_dot(y, p["pwconv1_kernel"], out_dtype=dtype) + p["pwconv1_bias"].astype(dtype)
                y = nn.gelu(y, approximate=gelu_tanh)
                y = int8_dot(y, p["pwconv2_kernel"], out_dtype=dtype) + p["pwconv2_bias"].astype(dtype)
            else:
                y = jnp.einsum("bhwc,cf->bhwf", y, p["pwconv1_kernel"].astype(dtype)) + p["pwconv1_bias"].astype(dtype)
                y = nn.gelu(y, approximate=gelu_tanh)
                y = jnp.einsum("bhwf,fc->bhwc", y, p["pwconv2_kernel"].astype(dtype)) + p["pwconv2_bias"].astype(dtype)
            out = residual + p["gamma"].astype(dtype) * y
            if mask is not None:
                # re-zero the pad region so the NEXT dwconv's halo sees the
                # exact zeros SAME padding injects in an exact-shape run
                out = out * mask
            return out, None

        x, _ = jax.lax.scan(block, x.astype(dtype), stacked, unroll=self.unroll)
        return x


class ConvNeXt(nn.Module):
    """ConvNeXt backbone: stem -> 4 scanned stages -> pooled features."""

    config: ConvNeXtConfig

    @nn.compact
    def __call__(self, x, pool: bool = True, classify: bool = False, valid_hw=None):
        """``valid_hw`` ([n, 2] int32, pixel space) enables shape-bucketed
        EXACT encoding: images zero-padded onto a shared canvas produce the
        same features as an exact-shape run, because the pad region is
        re-zeroed at every spatial-mixing boundary (each dwconv block, each
        downsample conv) — making the canvas zeros indistinguishable from
        the SAME padding the convs inject at true borders — and pooling
        averages only the ceil-chain valid cells.  One compiled program per
        bucket instead of one per unique mammogram resolution."""
        cfg = self.config

        def br_pad(h, w, s):
            # bottom/right-only padding (== SAME at multiple-of-s sizes).
            # lax SAME splits the pad top/bottom, shifting the conv origin at
            # non-multiple sizes; anchoring at (0,0) keeps canvas runs and
            # exact-shape runs cell-aligned so bucketed encode stays exact.
            return ((0, (-h) % s), (0, (-w) % s))

        # stem: 4x4/4 conv + LN (channels-last)
        stem_conv = nn.Conv(cfg.dims[0], kernel_size=(4, 4), strides=(4, 4), name="stem_conv",
                            padding=br_pad(x.shape[1], x.shape[2], 4), dtype=cfg.dtype)
        stem_norm = nn.LayerNorm(epsilon=1e-6, name="stem_norm")
        from ..ops.fused_block import FORCE_INTERPRET as _FI
        from ..ops.fused_stem import fused_stem
        from ..ops.fused_stem import kernel_available as _stem_ok

        if (cfg.use_fused_blocks and cfg.fuse_stem
                and _stem_ok(x.shape, cfg.dims[0], x.dtype.itemsize, _FI)):
            # fused stem kernel (ops/fused_stem.py) — the conv output stays
            # in VMEM through the LN.  Dummy calls register the SAME param
            # tree the flax path owns (outputs unused -> DCE'd); the
            # valid_hw mask applies after, so the bucketed path needs no
            # special casing.
            _ = stem_conv(jnp.zeros((1, 4, 4, x.shape[-1]), x.dtype))
            _ = stem_norm(jnp.zeros((1, 1, 1, cfg.dims[0]), cfg.dtype))
            p_cv = self.variables["params"]["stem_conv"]
            p_ln = self.variables["params"]["stem_norm"]
            x = fused_stem(x, p_cv["kernel"].astype(cfg.dtype),
                           p_cv["bias"].astype(cfg.dtype),
                           p_ln["scale"], p_ln["bias"], _FI)
        else:
            x = stem_conv(x)
            x = stem_norm(x)
        if valid_hw is not None:
            valid_hw = -(-valid_hw // 4)  # ceil: SAME-padded stride-4 stem
            x = x * _valid_mask(x, valid_hw)

        for stage, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            if stage > 0:
                norm = nn.LayerNorm(epsilon=1e-6, name=f"downsample_{stage}_norm")
                conv = nn.Conv(dim, kernel_size=(2, 2), strides=(2, 2), name=f"downsample_{stage}_conv",
                               padding=br_pad(x.shape[1], x.shape[2], 2), dtype=cfg.dtype)
                from ..ops.fused_block import FORCE_INTERPRET
                from ..ops.fused_downsample import (fused_ln_downsample,
                                                    kernel_available)

                if (cfg.use_fused_blocks and cfg.fuse_downsample
                        and valid_hw is None
                        and kernel_available(x.shape, dim, x.dtype.itemsize,
                                             FORCE_INTERPRET)):
                    # fused LN+downsample kernel (ops/fused_downsample.py):
                    # the LN output never touches HBM.  Bucketed (valid_hw)
                    # runs keep the flax path — the per-image mask between LN
                    # and conv is not expressible in the global-pad kernel —
                    # and so does the off-TPU fallback (kernel_available), so
                    # the knob stays byte-neutral off TPU.  Dummy calls
                    # register the SAME param tree the flax path owns (the
                    # outputs are unused -> DCE'd); the kernel then reads
                    # those params directly.
                    _ = norm(x[:, :1, :1, :])
                    _ = conv(jnp.zeros((1, 2, 2, x.shape[-1]), cfg.dtype))
                    p_ln = self.variables["params"][f"downsample_{stage}_norm"]
                    p_cv = self.variables["params"][f"downsample_{stage}_conv"]
                    x = fused_ln_downsample(
                        x, p_ln["scale"], p_ln["bias"],
                        p_cv["kernel"].astype(cfg.dtype),
                        p_cv["bias"].astype(cfg.dtype), FORCE_INTERPRET)
                else:
                    x = norm(x)
                    if valid_hw is not None:
                        # LN(0) is nonzero; re-zero so the strided conv's SAME
                        # boundary window matches the exact-shape run
                        x = x * _valid_mask(x, valid_hw)
                    x = conv(x)
                if valid_hw is not None:
                    valid_hw = -(-valid_hw // 2)
                    x = x * _valid_mask(x, valid_hw)
            mask = None if valid_hw is None else _valid_mask(x, valid_hw)
            x = ConvNeXtStage(dim, depth, cfg.layer_scale_init, cfg.dtype, cfg.unroll_blocks, cfg.use_pallas_dwconv, cfg.use_fused_blocks, cfg.quant, cfg.gelu, name=f"stage_{stage}")(x, mask)

        if not pool:
            return x
        if valid_hw is None:
            pooled = jnp.mean(x, axis=(1, 2))  # global average pool -> [b, dims[-1]]
        else:
            counts = (valid_hw[:, 0] * valid_hw[:, 1]).astype(x.dtype)
            pooled = jnp.sum(x, axis=(1, 2)) / jnp.maximum(counts, 1.0)[:, None]
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
    Conv kernels transpose NCHW->HWIO; linear kernels transpose; per-stage
    block tensors stack along a leading depth axis for the scanned stages.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}

    def conv(name):
        return jnp.asarray(sd[name]).transpose(2, 3, 1, 0)  # OIHW -> HWIO

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
        stack = {
            "dwconv_kernel": [], "dwconv_bias": [], "norm_scale": [], "norm_bias": [],
            "pwconv1_kernel": [], "pwconv1_bias": [], "pwconv2_kernel": [], "pwconv2_bias": [],
            "gamma": [],
        }
        for b in range(depth):
            pre = f"features.{si}.{b}.block"
            w = np.asarray(sd[f"{pre}.0.weight"])  # [C, 1, kh, kw]
            stack["dwconv_kernel"].append(jnp.asarray(w.transpose(2, 3, 1, 0)))
            stack["dwconv_bias"].append(vec(f"{pre}.0.bias"))
            stack["norm_scale"].append(vec(f"{pre}.2.weight"))
            stack["norm_bias"].append(vec(f"{pre}.2.bias"))
            stack["pwconv1_kernel"].append(lin(f"{pre}.3.weight"))
            stack["pwconv1_bias"].append(vec(f"{pre}.3.bias"))
            stack["pwconv2_kernel"].append(lin(f"{pre}.5.weight"))
            stack["pwconv2_bias"].append(vec(f"{pre}.5.bias"))
            stack["gamma"].append(vec(f"features.{si}.{b}.layer_scale"))
        p[f"stage_{stage}"] = {key: jnp.stack(vals) for key, vals in stack.items()}
    # classifier head (present on the reference's binary classifier artifact)
    if "classifier.0.weight" in sd:
        p["head_norm"]["scale"] = vec("classifier.0.weight")
        p["head_norm"]["bias"] = vec("classifier.0.bias")
        p["head_fc"]["kernel"] = lin("classifier.2.weight")
        p["head_fc"]["bias"] = vec("classifier.2.bias")
    return params
