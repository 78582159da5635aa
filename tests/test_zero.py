"""ZeRO-1 optimizer-state sharding: same numerics, 1/N state per device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmgclip_tpu.parallel import DATA_AXIS, create_mesh
from mmgclip_tpu.parallel.zero import (
    opt_state_bytes_per_device,
    shard_opt_state,
    zero1_shardings,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")

P = jax.sharding.PartitionSpec


def _setup():
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32),
        "b": jnp.asarray(rng.normal(size=(32,)), jnp.float32),
        "scale": jnp.asarray(0.7, jnp.float32),  # scalar: must replicate
    }
    grads = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), params
    )
    tx = optax.adamw(1e-3)
    return params, grads, tx


def test_zero1_update_matches_replicated():
    params, grads, tx = _setup()
    opt_state = tx.init(params)

    def step(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    expected_params, _ = jax.jit(step)(params, opt_state, grads)

    mesh = create_mesh(data=8, model=1)
    sharded_state = shard_opt_state(opt_state, mesh)
    got_params, new_state = jax.jit(step)(params, sharded_state, grads)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        expected_params, got_params,
    )
    # several update steps keep working with the sharded state
    for _ in range(3):
        got_params, new_state = jax.jit(step)(got_params, new_state, grads)
        expected_params, opt_state = jax.jit(step)(expected_params, opt_state, grads)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        expected_params, got_params,
    )


def test_zero1_state_is_actually_sharded():
    params, _, tx = _setup()
    mesh = create_mesh(data=8, model=1)
    opt_state = tx.init(params)
    shardings = zero1_shardings(opt_state, mesh)

    # the adam moments for `w` shard their leading 64-axis over 8 devices
    mu_sharding = shardings[0].mu["w"]
    assert mu_sharding.spec == P(DATA_AXIS)
    # scalars replicate
    assert shardings[0].mu["scale"].spec == P()

    sharded = shard_opt_state(opt_state, mesh)
    assert sharded[0].mu["w"].addressable_shards[0].data.shape == (8, 32)

    # per-device bytes shrink vs replicated (w: 64x32 f32 moments -> 1/8)
    replicated_bytes = opt_state_bytes_per_device(opt_state)
    sharded_bytes = opt_state_bytes_per_device(sharded)
    assert sharded_bytes < replicated_bytes
