"""Ring attention: sequence-parallel attention over the device mesh.

The extension point reserved in SURVEY §5.7: sequence length in this workload
never exceeds one chip (<=512 tokens), but the design keeps a path to long
context.  Sequence is sharded over a mesh axis; each device holds Q/K/V
blocks for its shard, computes blockwise attention against the KV block it
currently holds, then rotates KV around the ring with `ppermute` while
carrying online-softmax statistics — after `n_devices` steps every query has
attended to the full sequence without any device ever materializing the
[s, s] score matrix or the full K/V.

Pure-jnp inside shard_map (XLA overlaps the ppermute with the local block
compute).  The local block is a plain einsum — it materializes the
[s_local, s_local] score tile, which is fine at this workload's shard sizes;
swapping in the Pallas flash kernel for the local block is a possible
future optimization, NOT something this module does today.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _pvary(x, axis_name):
    """Mark a freshly-created array as varying over the mapped axis so the
    scan carry type stays stable across ppermute (jax>=0.9: pcast; older:
    pvary)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)


def ring_attention(q, k, v, axis_name: str, kv_valid=None):
    """Blockwise ring attention inside a shard_map.

    q, k, v: local sequence shards [b, h, s_local, d];
    kv_valid: optional [b, s_local] validity mask for the local KV shard.
    Returns [b, h, s_local, d] — identical to full attention over the
    gathered sequence.
    """
    n_devices = jax.lax.axis_size(axis_name)
    b, h, s_local, d = q.shape
    scale = 1.0 / (d**0.5)
    qf = q.astype(jnp.float32) * scale

    if kv_valid is None:
        kv_valid = jnp.ones((b, s_local), jnp.int32)
        # the freshly-created mask must be marked varying over the ring axis
        # so the scan carry type stays stable across ppermute
        kv_valid = _pvary(kv_valid, axis_name)

    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]

    def step(carry, _):
        k_blk, v_blk, valid, m, l, acc = carry
        scores = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32))
        scores = jnp.where(valid[:, None, None, :] > 0, scores, NEG_INF)

        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = alpha * acc + jnp.einsum("bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32))

        # rotate the KV shard (and its mask) to the next device
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        valid = jax.lax.ppermute(valid, axis_name, perm)
        return (k_blk, v_blk, valid, m_new, l, acc), None

    m0 = _pvary(jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32), axis_name)
    l0 = _pvary(jnp.zeros((b, h, s_local, 1), jnp.float32), axis_name)
    acc0 = _pvary(jnp.zeros((b, h, s_local, d), jnp.float32), axis_name)
    (_k, _v, _valid, _m, l, acc), _ = jax.lax.scan(
        step, (k, v, kv_valid, m0, l0, acc0), None, length=n_devices
    )
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)
