"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
(all-gather contrastive loss, pjit train step) are exercised without TPUs.
Must set XLA flags before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# offline BEFORE transformers can be imported (module-level imports during
# pytest collection): a hub request under zero egress hangs on dropped
# packets instead of failing fast
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU through jax.config
# (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
