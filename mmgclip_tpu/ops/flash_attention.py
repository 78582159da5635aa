"""Blockwise (flash) attention for the text tower, as a Pallas TPU kernel.

The reference runs HF BERT's eager attention inside torch
(reference: mmgclip/networks/encoder.py:121-156).  Here attention is a single
fused Pallas kernel: online-softmax over key blocks so the [s, s] score
matrix never materializes in HBM.  Padding is handled as per-row *valid
lengths* delivered through scalar prefetch (SMEM) — tokenizers pad at the
end, so the key-validity mask is always a contiguous prefix; this avoids
streaming a mask tensor through VMEM entirely.

The kernel is the canonical pipelined TPU form: a (batch*head, q-block,
kv-block) grid whose k/v blocks arrive through BlockSpecs — Mosaic
double-buffers the HBM->VMEM copies across the innermost (kv) grid axis —
with the online-softmax state (m, l, acc) carried in VMEM scratch across
kv steps.  The MXU dots run in the INPUT dtype (bf16 in the product path)
with f32 accumulation; an earlier version cast q/k to f32 first and
streamed whole [s, d] k/v panels into each program through a serial
fori_loop, which measured 0.37-0.69x the XLA attention path on a real
v5e.  Measured honestly (BENCH_MODE=text + op-level sweeps on the chip):
at BERT-base sizes XLA's batched attention is a STRONG baseline — flash
wins only at op level on short rows padded to s<=256 (~1.25x, the
length-adaptive skip eliding the tail), roughly ties at full-length
s=256, and loses at s>=512 (XLA hits ~50 TFLOPs at s=2048; this kernel
~21 — the d=64 dots under-fill the MXU).  TOWER-level the kernel loses
everywhere (0.6-0.7x): the scanned layer hands over [b,h,s,d] operands
whose layout XLA's dot_general absorbs for free but a pallas_call turns
into materialized transposes.  Hence the product default is the XLA path
(BertConfig.use_flash_attention=False, opt-in for long-context work), and
pad-trimmed product batches run below the s>=128 tile floor anyway.

The kv loop is *length-adaptive*: blocks wholly past a row's valid length
are skipped — their compute is predicated off with pl.when AND their DMA
is elided by remapping the kv index_map to the previous block index (Pallas
skips the copy when consecutive grid steps ask for the same block).  This
is numerically exact for valid_len >= 1: a fully-masked block contributes
p = exp(NEG_INF - m) = 0 and alpha = 1, leaving (m, l, acc) bit-identical.
valid_len == 0 keeps the full loop — there the all-masked softmax
degenerates to uniform attention over ALL keys (matching
`attention_reference`), which the skip would change.  A pure-jnp fallback
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
_LANES = 128  # m/l scratch lane width: sub-lane-width VMEM scratch relayouts


def attention_reference(q, k, v, mask=None):
    """Plain softmax attention. q,k,v: [b, h, s, d]; mask: [b, s] key validity."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(d, scores.dtype))
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :].astype(bool), scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _last_kv_block(valid_len, block_k: int, num_kv: int):
    """Index of the last kv block a row must process (see module docstring
    for the valid_len == 0 rule)."""
    return jnp.where(
        valid_len > 0, (valid_len + block_k - 1) // block_k - 1, num_kv - 1
    )


def _flash_kernel(
    len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, block_k: int, num_kv: int, sm_scale: float,
):
    """One (bh, q-block, kv-block) grid step of the online softmax.

    len_ref: [bh] valid key lengths (scalar prefetch, SMEM).
    q_ref: [1, block_q, d]; k_ref/v_ref: [1, block_k, d];
    o_ref: [1, block_q, d] (written at the last kv step).
    m_ref/l_ref: [block_q, _LANES] f32 scratch (value broadcast across
    lanes); acc_ref: [block_q, d] f32 scratch.  Scratch persists across the
    innermost (kv) grid axis; kv step 0 initializes it.
    """
    i = pl.program_id(0)
    kk = pl.program_id(2)
    valid_len = len_ref[i]
    last = _last_kv_block(valid_len, block_k, num_kv)

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kk <= last)
    def _update():
        q = q_ref[0]  # [bq, d], input dtype — MXU runs at the native rate
        k = k_ref[0]  # [bk, d]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [bq, bk] f32
        key_pos = kk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        s = jnp.where(key_pos < valid_len, s, NEG_INF)

        m_prev = m_ref[:, :1]  # [bq, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_next)
        alpha = jnp.exp(m_prev - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = alpha * acc_ref[...] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    @pl.when(kk == num_kv - 1)
    def _finish():
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_call(q, k, v, lengths, block_q, block_k, interpret):
    b, h, s, d = q.shape
    sm_scale = 1.0 / (d**0.5)
    bh = b * h
    num_kv = s // block_k
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    lens = jnp.repeat(lengths.astype(jnp.int32), h)  # [bh], b-major like reshape

    def kv_map(i, j, kk, lens):
        # past-the-length blocks re-request the previous block index: the
        # pipeline sees an unchanged block and elides the HBM->VMEM copy
        # (compute for those steps is predicated off in the kernel)
        return (i, jnp.minimum(kk, _last_kv_block(lens[i], block_k, num_kv)), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, s // block_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk, lens: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), kv_map),
            pl.BlockSpec((1, block_k, d), kv_map),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk, lens: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, num_kv=num_kv, sm_scale=sm_scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lens, qf, kf, vf)
    return out.reshape(b, h, s, d)


def flash_attention(q, k, v, mask=None, block_q: int | None = None, block_k: int | None = None, interpret: bool = False):
    """Fused attention. q,k,v: [b, h, s, d]; mask: [b, s] (1 = valid key).

    CONTRACT: the mask must be a contiguous valid PREFIX per row (standard
    right-padding — what every tokenizer in this repo emits).  The kernel
    reduces it to per-row lengths, so a non-contiguous mask (token dropout,
    sparse attention) would be silently reinterpreted as "first sum(mask)
    keys valid"; concrete masks are checked here and routed to the exact
    XLA path instead, traced masks trust the contract (a traced check would
    have to compute both paths).  Shapes the kernel cannot tile fall back
    to :func:`attention_reference`.

    Default blocks are measurement-driven (v5e, BERT-base head dims): the
    q-block covers the whole sequence (one grid step per bh row — per-step
    overhead dominates at these sizes, bigger is uniformly faster) and the
    kv-block stays at 128 so the length-adaptive skip still elides the
    padded tail of short rows (the product case: prompt banks are 4-17
    tokens padded to 256, where bq=256/bk=128 measured 1.25x the XLA path
    while full-length rows are a wash).
    """
    b, h, s, d = q.shape
    block_q = min(block_q if block_q is not None else 512, s)
    block_k = min(block_k if block_k is not None else 128, s)
    # tiling guards: q/o blocks AND k/v blocks need sublane multiples of 8
    # (kv blocks must land on tile boundaries); small or ragged shapes use
    # the XLA path (it fuses fine at these sizes)
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
