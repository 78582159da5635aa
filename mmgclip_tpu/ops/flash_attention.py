"""Blockwise (flash) attention for the text tower, as a Pallas TPU kernel.

The reference runs HF BERT's eager attention inside torch
(reference: mmgclip/networks/encoder.py:121-156).  Here attention is a single
fused Pallas kernel: online-softmax over key blocks so the [s, s] score
matrix never materializes in HBM.  Padding is handled as per-row *valid
lengths* delivered through scalar prefetch (SMEM) — tokenizers pad at the
end, so the key-validity mask is always a contiguous prefix; this avoids
streaming a mask tensor through VMEM entirely.  A pure-jnp fallback
(`attention_reference`) serves CPU tests and acts as the numerics oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def attention_reference(q, k, v, mask=None):
    """Plain softmax attention. q,k,v: [b, h, s, d]; mask: [b, s] key validity."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(d, scores.dtype))
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :].astype(bool), scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float):
    """One (batch*head, q-block) program: online softmax over key blocks.

    len_ref: [bh] valid key lengths (scalar prefetch, SMEM).
    q_ref: [1, block_q, d]; k_ref/v_ref: [1, s, d]; o_ref: [1, block_q, d].
    """
    valid_len = len_ref[pl.program_id(0)]
    q = q_ref[0].astype(jnp.float32) * sm_scale
    seq_len = k_ref.shape[1]
    num_kb = seq_len // block_k

    block_q, d = q.shape
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)  # running max
    l = jnp.zeros((block_q, 1), jnp.float32)  # running denominator
    acc = jnp.zeros((block_q, d), jnp.float32)  # running numerator

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        key_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        s = jnp.where(key_pos < valid_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc_prev + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_call(q, k, v, lengths, block_q, block_k, interpret):
    b, h, s, d = q.shape
    sm_scale = 1.0 / (d**0.5)
    bh = b * h
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    lens = jnp.repeat(lengths.astype(jnp.int32), h)  # [bh], b-major like reshape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, lens: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j, lens: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j, lens: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, lens: (i, j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(lens, qf, kf, vf)
    return out.reshape(b, h, s, d)


def flash_attention(q, k, v, mask=None, block_q: int = 128, block_k: int = 128, interpret: bool = False):
    """Fused attention. q,k,v: [b, h, s, d]; mask: [b, s] (1 = valid key).

    CONTRACT: the mask must be a contiguous valid PREFIX per row (standard
    right-padding — what every tokenizer in this repo emits).  The kernel
    reduces it to per-row lengths, so a non-contiguous mask (token dropout,
    sparse attention) would be silently reinterpreted as "first sum(mask)
    keys valid"; concrete masks are checked here and routed to the exact
    XLA path instead, traced masks trust the contract (a traced check would
    have to compute both paths).  Shapes the kernel cannot tile fall back
    to :func:`attention_reference`.
    """
    b, h, s, d = q.shape
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    # tiling guards: q/o blocks AND k/v blocks need sublane multiples of 8
    # (pl.ds starts at i*block_k must land on tile boundaries); small or
    # ragged shapes use the XLA path (it fuses fine at these sizes)
    if s % block_q or s % block_k or block_q % 8 or block_k % 8 or d % 8 or s < 128:
        return attention_reference(q, k, v, mask)

    if mask is None:
        lengths = jnp.full((b,), s, jnp.int32)
    else:
        if not isinstance(mask, jax.core.Tracer):
            m = np.asarray(mask).astype(np.int32)
            lens = m.sum(axis=-1)
            prefix = (np.arange(s)[None, :] < lens[:, None]).astype(np.int32)
            if not np.array_equal(m, prefix):
                return attention_reference(q, k, v, mask)
        lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
    return _flash_call(q, k, v, lengths, block_q, block_k, interpret)
