"""Multi-device tests on the 8-device virtual CPU mesh.

Validates that the sharded global-batch contrastive loss matches the
single-device reference loss exactly — the classic distributed-CLIP pitfall
(reference loss: mmgclip/loss/losses.py:28-44; new component per SURVEY §2.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec
from jax.experimental.shard_map import shard_map

from mmgclip_tpu.losses import clip_loss, mmgclip_loss
from mmgclip_tpu.parallel import (
    DATA_AXIS,
    create_mesh,
    global_clip_loss,
    global_mmgclip_loss,
    shard_batch,
)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_global_clip_loss_matches_single_device():
    rng = np.random.default_rng(0)
    n, d = 32, 16  # 4 rows per device
    img = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    txt = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    scale = jnp.asarray(1 / 0.07, jnp.float32)

    # single-device oracle
    expected, _ = clip_loss(scale * img @ txt.T, scale * txt @ img.T)

    mesh = create_mesh(data=8, model=1)
    spec = PartitionSpec(DATA_AXIS)
    fn = shard_map(
        lambda i, t: global_clip_loss(i, t, scale)[0],
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=PartitionSpec(),
    )
    sharded_loss = fn(img, txt)
    np.testing.assert_allclose(float(sharded_loss), float(expected), rtol=1e-5)


def test_global_clip_loss_gradients_match_single_device():
    rng = np.random.default_rng(1)
    n, d = 16, 8
    img = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    txt = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    scale = jnp.asarray(10.0, jnp.float32)

    def single(i, t):
        return clip_loss(scale * i @ t.T, scale * t @ i.T)[0]

    g_single = jax.grad(single, argnums=(0, 1))(img, txt)

    mesh = create_mesh(data=8, model=1)
    spec = PartitionSpec(DATA_AXIS)
    sharded = shard_map(
        lambda i, t: global_clip_loss(i, t, scale)[0],
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=PartitionSpec(),
    )
    g_sharded = jax.grad(lambda i, t: sharded(i, t), argnums=(0, 1))(img, txt)

    np.testing.assert_allclose(np.asarray(g_sharded[0]), np.asarray(g_single[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sharded[1]), np.asarray(g_single[1]), atol=1e-6)


def test_global_mmgclip_loss_matches_single_device():
    rng = np.random.default_rng(2)
    n, d = 16, 8
    img = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    txt = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    txt2 = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    scale = jnp.asarray(5.0, jnp.float32)

    expected, _ = mmgclip_loss(img, txt, txt2, scale)

    mesh = create_mesh(data=8, model=1)
    spec = PartitionSpec(DATA_AXIS)
    fn = shard_map(
        lambda i, t, t2: global_mmgclip_loss(i, t, t2, scale)[0],
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=PartitionSpec(),
    )
    np.testing.assert_allclose(float(fn(img, txt, txt2)), float(expected), rtol=1e-5)


def test_shard_batch_places_on_mesh():
    mesh = create_mesh()
    batch = {"x": jnp.ones((16, 4)), "y": jnp.ones((16,))}
    sharded = shard_batch(mesh, batch)
    assert isinstance(sharded["x"].sharding, NamedSharding)
    assert sharded["x"].sharding.spec == PartitionSpec(DATA_AXIS)
