"""Convert a local HuggingFace BioGPT checkpoint to the JAX causal tower.

Usage:
  python tools/convert_biogpt.py --input /path/to/biogpt_snapshot --output biogpt.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Conversion is pure weight reshaping: force the CPU backend BEFORE any jax
# backend init.  The JAX_PLATFORMS env var is NOT enough — the axon TPU
# plugin ignores it, and on that tunnel a first full-tower compile takes
# ~15 min (the reproduce flow's converter subprocesses were timing out).
import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="Local HF BioGPT dir")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import torch

    with open(os.path.join(args.input, "config.json")) as fh:
        hf_config = json.load(fh)
    bin_path = os.path.join(args.input, "pytorch_model.bin")
    if os.path.isfile(bin_path):
        state_dict = torch.load(bin_path, map_location="cpu", weights_only=True)
    else:
        from safetensors.torch import load_file

        state_dict = load_file(os.path.join(args.input, "model.safetensors"))
    state_dict = {(k[7:] if k.startswith("biogpt.") else k): v for k, v in state_dict.items()}

    import jax
    from flax import serialization

    from mmgclip_tpu.models.gpt import GPTConfig, init_gpt, load_biogpt_weights

    config = GPTConfig(
        vocab_size=hf_config["vocab_size"],
        hidden_size=hf_config["hidden_size"],
        num_hidden_layers=hf_config["num_hidden_layers"],
        num_attention_heads=hf_config["num_attention_heads"],
        intermediate_size=hf_config["intermediate_size"],
        max_position_embeddings=hf_config["max_position_embeddings"],
        scale_embedding=hf_config.get("scale_embedding", True),
    )
    module, params = init_gpt(config)
    params = load_biogpt_weights(params, state_dict, config)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(params)))
    print(f"Wrote {args.output} ({config})")


if __name__ == "__main__":
    main()
