"""Convert the reference's ConvNeXt-Tiny weights to the JAX tower format.

The reference image tower is an opaque TorchScript classifier
(reference: configs/networks/clip_convnext_bert.yaml:5-6, loaded at
mmgclip/networks/image_features.py:23).  This tool extracts its state dict
(TorchScript or regular torchvision checkpoint), maps it onto our flax
ConvNeXt param tree, verifies numerics on a random input against torch, and
writes a `.npz`-serialized msgpack the framework loads directly.

Usage:
  python tools/convert_convnext.py --input classifier_convnext_tiny_16bits_images.pt \
      --output mmgclip_tpu/models/image_encoders/clf_convnext_tiny/classifier_convnext_tiny_16bits_images.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Conversion is pure weight reshaping: force the CPU backend BEFORE any jax
# backend init.  The JAX_PLATFORMS env var is NOT enough — the axon TPU
# plugin ignores it, and on that tunnel a first full-tower compile takes
# ~15 min (the reproduce flow's converter subprocesses were timing out).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="TorchScript .pt or torch checkpoint")
    parser.add_argument("--output", required=True, help="Output .npz path")
    parser.add_argument("--verify", action="store_true", help="Check numerics vs torch")
    args = parser.parse_args()

    import torch

    scripted = None
    try:
        scripted = torch.jit.load(args.input, map_location="cpu")
        state_dict = scripted.state_dict()
    except Exception:
        obj = torch.load(args.input, map_location="cpu", weights_only=False)
        state_dict = obj.get("model_state_dict", obj) if isinstance(obj, dict) else obj.state_dict()

    in_channels = state_dict["features.0.0.weight"].shape[1]
    print(f"Source stem has {in_channels} input channels.")

    import jax
    from flax import serialization

    from mmgclip_tpu.models.convnext import ConvNeXtConfig, init_convnext, load_torchvision_weights

    num_classes = state_dict.get("classifier.2.weight", torch.zeros(2, 768)).shape[0]
    from dataclasses import replace

    config = replace(ConvNeXtConfig.tiny(num_classes=num_classes), in_channels=in_channels)
    module, params = init_convnext(config, image_size=64)
    params = load_torchvision_weights(params, state_dict, config)

    if args.verify and scripted is None:
        # the torch-side forward needs the TorchScript module; a bare state
        # dict has no callable graph to verify against
        print("WARNING: --verify needs a TorchScript input; skipping the torch oracle check.")
    if args.verify and scripted is not None:
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 64, 64, in_channels)).astype(np.float32)
        ours = np.asarray(module.apply(params, jnp.asarray(x)))
        with torch.no_grad():
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            fmap = scripted.features(xt)
            theirs = scripted.avgpool(fmap).squeeze(-1).squeeze(-1).numpy()
        err = np.abs(ours - theirs).max()
        print(f"max abs feature error vs torch: {err:.3e}")
        assert err < 1e-3, "conversion verification failed"

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(params)))
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
