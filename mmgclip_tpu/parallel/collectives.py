"""Collective communication layer.

The reference has no distributed backend (SURVEY §2.4/§5.8); this module is
the TPU-native equivalent of a NCCL-style comm library: thin named wrappers
over XLA collectives (`all_gather`, `psum`, `pmean`, `ppermute`,
`reduce_scatter`) for use inside shard_map/pjit programs, plus a hand-rolled
Pallas **ring all-gather** that moves chunks neighbor-to-neighbor over ICI
with RDMA — the kernel used when the embedding gather should overlap with
compute instead of going through XLA's combiner.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mesh import DATA_AXIS

# ----------------------------------------------------------------------
# XLA collective wrappers (bound axis names; usable under shard_map/pjit)
# ----------------------------------------------------------------------


def all_gather(x, axis_name: str = DATA_AXIS, tiled: bool = True):
    return jax.lax.all_gather(x, axis_name, tiled=tiled)


def psum(x, axis_name: str = DATA_AXIS):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = DATA_AXIS):
    return jax.lax.pmean(x, axis_name)


def ppermute(x, perm, axis_name: str = DATA_AXIS):
    return jax.lax.ppermute(x, axis_name, perm)


def reduce_scatter(x, axis_name: str = DATA_AXIS, scatter_dimension: int = 0):
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=scatter_dimension, tiled=True)


def axis_index(axis_name: str = DATA_AXIS):
    return jax.lax.axis_index(axis_name)


# ----------------------------------------------------------------------
# Pallas ring all-gather over ICI
# ----------------------------------------------------------------------


def _ring_all_gather_kernel(local_ref, out_ref, send_sems, recv_sems, *, num_devices: int,
                            axis_name: str, interpret: bool = False):
    """Unidirectional ring, race-free by construction: every transfer lands
    directly in a distinct ``out_ref`` slot (each slot written exactly once,
    and only forwarded after the local wait for its arrival), and every step
    uses its own DMA semaphore pair — no slot or semaphore reuse, so a
    run-ahead neighbor can never overwrite a chunk an outgoing DMA is still
    reading (the hazard a shared double-buffer design has)."""
    my_id = jax.lax.axis_index(axis_name)
    chunk = local_ref.shape[0]

    # Entry barrier with both ring neighbors (the standard collective-kernel
    # prologue): Mosaic REQUIRES a custom barrier whenever collective_id is
    # set (it rejects the combination at lowering otherwise), and it is also
    # needed for hardware safety — without it my left neighbor's RDMA could
    # land before this chip has entered the kernel.  Interpret mode cannot
    # lower get_barrier_semaphore (and needs no barrier: the interpreter
    # synchronizes devices itself), so the prologue is hardware-only.
    if not interpret:
        left = jax.lax.rem(my_id - 1 + num_devices, num_devices)
        right = jax.lax.rem(my_id + 1, num_devices)
        barrier_sem = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier_sem, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier_sem, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier_sem, 2)

    # own chunk into its output slot
    out_ref[pl.ds(my_id * chunk, chunk), :] = local_ref[...]

    def step(i, _):
        dst = jax.lax.rem(my_id + 1, num_devices)
        # forward the chunk originated by (my_id - i): my own chunk at step
        # 0, afterwards the one that arrived in the previous step
        src_device = jax.lax.rem(my_id - i + num_devices, num_devices)
        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[pl.ds(src_device * chunk, chunk), :],
            dst_ref=out_ref.at[pl.ds(src_device * chunk, chunk), :],
            send_sem=send_sems.at[i],
            recv_sem=recv_sems.at[i],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        # waits BOTH my send completion and the symmetric arrival from my
        # left neighbor (which fills slot (my_id - i - 1), read at step i+1)
        rdma.wait()
        return 0

    jax.lax.fori_loop(0, num_devices - 1, step, 0)


# distinct collective_id per call SITE, stable across retraces: two ring
# gathers in one compiled program must not share barrier/semaphore state
# (Pallas requires concurrent collectives to carry different ids), while an
# id that changes on every retrace would make identical programs lower
# differently and defeat XLA's compilation cache.  Each site (caller
# file:line + axis — NOT shape/dtype: ids only need to be distinct among
# collectives concurrent in ONE program, and keying on shape would leak an
# id per distinct batch size until the 63-id space spuriously exhausts)
# owns a block of _SLOTS_PER_SITE ids; calls from the same site within the
# SAME trace (one compiled program — e.g. a list comprehension of gathers,
# or a loop over differently-shaped shards) get consecutive slots, while a
# NEW trace resets the site to slot 0, so retraces of an identical program
# lower identically and keep hitting the cache.  The trace is identified by
# a weakref to the operand tracer's trace object; eager operands (no trace)
# always use slot 0 — eager pallas_calls execute sequentially, so id reuse
# is safe there.
_SLOTS_PER_SITE = 4
_collective_site_base: dict = {}
_collective_site_trace: dict = {}  # key -> (weakref-to-trace, next_slot)


def _site_collective_id(x, shape, dtype, axis_name) -> int:
    import weakref

    del shape, dtype  # distinctness is per concurrent program, not per shape
    frame = sys._getframe(2)  # caller of ring_all_gather
    key = (frame.f_code.co_filename, frame.f_lineno, axis_name)
    if key not in _collective_site_base:
        if (len(_collective_site_base) + 1) * _SLOTS_PER_SITE > 63:
            raise RuntimeError(
                "ring_all_gather: too many distinct call sites — pass explicit "
                "collective_id to disambiguate (Pallas supports ids 1..63)"
            )
        _collective_site_base[key] = 1 + len(_collective_site_base) * _SLOTS_PER_SITE
    trace_obj = getattr(x, "_trace", None)
    if trace_obj is None:
        return _collective_site_base[key]
    prev = _collective_site_trace.get(key)
    slot = 0
    if prev is not None and prev[0]() is trace_obj:
        slot = prev[1]
        if slot >= _SLOTS_PER_SITE:
            raise RuntimeError(
                f"ring_all_gather: more than {_SLOTS_PER_SITE} gathers traced "
                "from one call site into one program — pass explicit "
                "collective_id values to disambiguate"
            )
    try:
        ref = weakref.ref(trace_obj)
    except TypeError:
        # a trace type without weakref support would make slot tracking
        # reset every call — two concurrent gathers from one site would then
        # SHARE an id (shared barrier/semaphore state: deadlock hazard).
        # That direction is unsafe; demand an explicit id instead.
        raise RuntimeError(
            "ring_all_gather: this JAX version's trace objects don't support "
            "weakref, so per-program slot tracking can't tell concurrent "
            "gathers apart — pass explicit collective_id values"
        ) from None
    _collective_site_trace[key] = (ref, slot + 1)
    return _collective_site_base[key] + slot


def _ring_tileable(x) -> bool:
    """Shard [chunk, d] maps onto VMEM tiles: the sublane tile is
    dtype-dependent — (8,128) f32, (16,128) bf16, (32,128) int8 — and both
    the shard and the dynamic chunk offsets inside the kernel must land on
    tile boundaries."""
    chunk, d = x.shape
    if x.dtype.itemsize > 4:
        # 8-byte dtypes (f64/c64 under jax_enable_x64) have no Mosaic VMEM
        # tile — route to the XLA fallback rather than dividing by a
        # zero-sized sublane below
        return False
    sublane = 8 * (4 // max(1, x.dtype.itemsize))
    return not (chunk % sublane or d % 128)


def ring_all_gather(x, axis_name: str = DATA_AXIS, *, interpret: bool = False, collective_id=None):
    """All-gather the leading axis around the ring with Pallas RDMA.

    x: local shard [chunk, d] inside a shard_map over `axis_name`.
    Returns [chunk * n_devices, d].  Falls back to XLA's all_gather when the
    shard shape can't tile onto the dtype's VMEM tile (see _ring_tileable).
    """
    num_devices = jax.lax.axis_size(axis_name)
    chunk, d = x.shape
    if not _ring_tileable(x):
        return jax.lax.all_gather(x, axis_name, tiled=True)

    if collective_id is None:
        collective_id = _site_collective_id(x, x.shape, x.dtype, axis_name)
    out_shape = jax.ShapeDtypeStruct((chunk * num_devices, d), x.dtype, vma=frozenset({axis_name}))
    return pl.pallas_call(
        functools.partial(_ring_all_gather_kernel, num_devices=num_devices, axis_name=axis_name,
                          interpret=interpret),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((num_devices - 1,)),
            pltpu.SemaphoreType.DMA((num_devices - 1,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
        interpret=interpret,
    )(x)


def ring_all_gather_diff(x, axis_name: str = DATA_AXIS, *, interpret: bool = False,
                         collective_id=None):
    """DIFFERENTIABLE ring all-gather: forward is the Pallas RDMA ring,
    backward is the same transpose ``lax.all_gather`` has — a tiled
    ``psum_scatter`` of the cotangent (each chip sums every chip's
    contribution to its own chunk).  A raw ``pallas_call`` has no VJP, so
    without this the kernel was inference-only; with it the ring gather can
    serve training-path gathers (see ``parallel.contrastive``)."""
    # Resolve the collective id HERE, outside the custom_vjp wrapper: each
    # custom_vjp invocation traces ``gather`` under a fresh trace object, so
    # resolving inside ring_all_gather would key on gather's (shared)
    # file:line and reset the per-trace slot every invocation — two gathers
    # in one program would then share one id (advisor r3 finding; shared
    # ids mean shared barrier/semaphore state between concurrent rings).
    # Keying on THIS function's caller distinguishes the call sites.
    if collective_id is None:
        if _ring_tileable(x):  # else ring_all_gather falls back to XLA
            collective_id = _site_collective_id(x, x.shape, x.dtype, axis_name)

    @jax.custom_vjp
    def gather(x):
        return ring_all_gather(x, axis_name, interpret=interpret, collective_id=collective_id)

    def fwd(x):
        return gather(x), None

    def bwd(_residual, ct):
        return (jax.lax.psum_scatter(ct, axis_name, scatter_dimension=0, tiled=True),)

    gather.defvjp(fwd, bwd)
    return gather(x)
