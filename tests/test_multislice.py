"""Multi-slice (DCN) mesh: contrastive loss over (slice, data) DP axes."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec

from mmgclip_tpu.losses import clip_loss
from mmgclip_tpu.parallel import batch_sharding, global_clip_loss
from mmgclip_tpu.parallel.mesh import create_multislice_mesh

P = PartitionSpec


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_multislice_mesh_shape():
    mesh = create_multislice_mesh(n_slices=2, data=4, model=1)
    assert mesh.axis_names == ("slice", "data", "model")
    assert mesh.devices.shape == (2, 4, 1)


def test_batch_sharding_spans_slice_and_data():
    mesh = create_multislice_mesh(n_slices=2, data=4, model=1)
    sharding = batch_sharding(mesh)
    assert sharding.spec == P(("slice", "data"))


def test_global_clip_loss_across_slices_matches_single_device():
    rng = np.random.default_rng(0)
    n, d = 32, 16  # 4 rows per chip over 2x4 DP
    img = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    txt = jnp.asarray(_norm(rng.normal(size=(n, d))), jnp.float32)
    scale = jnp.asarray(1 / 0.07, jnp.float32)

    expected, _ = clip_loss(scale * img @ txt.T, scale * txt @ img.T)

    mesh = create_multislice_mesh(n_slices=2, data=4, model=1)
    spec = P(("slice", "data"))
    fn = shard_map(
        lambda i, t: global_clip_loss(i, t, scale, axis_name=("slice", "data"))[0],
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=P(),
    )
    np.testing.assert_allclose(float(fn(img, txt)), float(expected), rtol=1e-5)
