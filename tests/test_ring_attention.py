"""Ring attention over a sequence-sharded mesh == full attention."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec

from mmgclip_tpu.ops.flash_attention import attention_reference
from mmgclip_tpu.ops.ring_attention import ring_attention

P = PartitionSpec


def test_ring_attention_matches_full_attention():
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 64, 16  # 8 tokens per device over 8 devices
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32) for _ in range(3))

    expected = attention_reference(q, k, v)

    mesh = Mesh(np.asarray(jax.devices()), ("seq",))
    spec = P(None, None, "seq", None)
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_ring_attention_respects_padding_mask():
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 32, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32) for _ in range(3))
    mask = jnp.ones((b, s), jnp.int32).at[:, 24:].set(0)

    expected = attention_reference(q, k, v, mask)

    mesh = Mesh(np.asarray(jax.devices()), ("seq",))
    qspec = P(None, None, "seq", None)
    mspec = P(None, "seq")
    fn = shard_map(
        lambda q, k, v, m: ring_attention(q, k, v, axis_name="seq", kv_valid=m),
        mesh=mesh, in_specs=(qspec, qspec, qspec, mspec), out_specs=qspec,
    )
    out = fn(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)
