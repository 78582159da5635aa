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


def _ring_all_gather_kernel(local_ref, out_ref, comm_buf, send_sem, recv_sem, *, num_devices: int, axis_name: str):
    """Unidirectional ring: each step forwards the chunk received last step
    to the right neighbor while copying it into the output."""
    my_id = jax.lax.axis_index(axis_name)
    chunk = local_ref.shape[0]

    # own chunk straight into the output slot
    out_ref[pl.ds(my_id * chunk, chunk), :] = local_ref[...]
    comm_buf[0] = local_ref[...]

    def step(i, _):
        send_slot = i % 2
        recv_slot = (i + 1) % 2
        dst = jax.lax.rem(my_id + 1, num_devices)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        src_device = jax.lax.rem(my_id - i - 1 + 2 * num_devices, num_devices)
        out_ref[pl.ds(src_device * chunk, chunk), :] = comm_buf[recv_slot]
        return 0

    jax.lax.fori_loop(0, num_devices - 1, step, 0)


def ring_all_gather(x, axis_name: str = DATA_AXIS, *, interpret: bool = False):
    """All-gather the leading axis around the ring with Pallas RDMA.

    x: local shard [chunk, d] inside a shard_map over `axis_name`.
    Returns [chunk * n_devices, d].  Falls back to XLA's all_gather when the
    shard shape can't tile onto (8, 128) lanes.
    """
    num_devices = jax.lax.axis_size(axis_name)
    chunk, d = x.shape
    if chunk % 8 or d % 128:
        return jax.lax.all_gather(x, axis_name, tiled=True)

    out_shape = jax.ShapeDtypeStruct((chunk * num_devices, d), x.dtype, vma=frozenset({axis_name}))
    return pl.pallas_call(
        functools.partial(_ring_all_gather_kernel, num_devices=num_devices, axis_name=axis_name),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=7),
        interpret=interpret,
    )(x)
