"""Fused stem kernel (ops/fused_stem.py): patchify geometry, equality vs
the lax path (multiple-of-4 and ragged sizes), gradient via the lax vjp,
and the model wiring (fuse_stem keeps the identical param tree and matches
the flax stem, including the bucketed valid_hw path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgclip_tpu.ops import fused_stem as fs
from mmgclip_tpu.ops.fused_stem import _lax_stem, _patchify, fused_stem


def _params(rng, cin, cout, dtype=jnp.float32):
    r = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, dtype)  # noqa: E731
    return dict(kernel=r(4, 4, cin, cout), bias=r(cout),
                ns=1.0 + r(cout), nb=r(cout))


def test_patchify_geometry():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 12, 2)), jnp.float32)
    p = np.asarray(_patchify(x))
    assert p.shape == (1, 2, 3, 32)
    # patch (0, 1) row dy=1, col dx=2, channel 1 -> flat index (dy*4+dx)*2+1
    np.testing.assert_allclose(p[0, 0, 1, (1 * 4 + 2) * 2 + 1], x[0, 1, 4 + 2, 1])
    # ragged sizes pad bottom/right with zeros (br_pad convention)
    pr = np.asarray(_patchify(jnp.ones((1, 6, 7, 1))))
    assert pr.shape == (1, 2, 2, 16)
    assert pr[0, 1, 1, -1] == 0  # the padded corner cell


@pytest.mark.parametrize("shape,cout", [
    ((2, 32, 32, 1), 96),   # gray product shape
    ((1, 30, 27, 1), 96),   # ragged: br_pad
    ((1, 16, 24, 3), 64),   # RGB
])
def test_fused_stem_matches_lax(shape, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    p = _params(rng, shape[-1], cout)
    ref = _lax_stem(x, *p.values())
    out = fused_stem(x, *p.values(), True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_stem_multi_band_and_chunk():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 48, 16, 1)), jnp.float32)
    p = _params(rng, 1, 96)
    old_chunk, old_vmem = fs._CHUNK_BUDGET, fs._VMEM_BUDGET
    fs._CHUNK_BUDGET = 4 * (16 + 96) * 4 * 2
    fs._VMEM_BUDGET = fs._working_set(4, 4, 16, 96, 4, 2) + 1
    try:
        picked = fs._pick_band(12, 4, 16, 96, 4)
        assert picked is not None and picked[1] < 12
        out = fused_stem(x, *p.values(), True)
    finally:
        fs._CHUNK_BUDGET, fs._VMEM_BUDGET = old_chunk, old_vmem
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_lax_stem(x, *p.values())),
                               atol=2e-5, rtol=2e-5)


def test_fused_stem_gradient_and_fallback():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1)), jnp.float32)
    p = _params(rng, 1, 32)
    gf = jax.grad(lambda x: jnp.sum(fused_stem(x, *p.values(), True) ** 2))(x)
    gl = jax.grad(lambda x: jnp.sum(_lax_stem(x, *p.values()) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gl),
                               atol=1e-4, rtol=1e-4)
    # off-TPU without interpret: the lax math
    out = fused_stem(x, *p.values())
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_lax_stem(x, *p.values())), atol=1e-6)


def test_model_fused_stem_matches_unfused(monkeypatch):
    """ConvNeXt with fuse_stem: same param tree, matching features at exact
    AND bucketed (valid_hw) shapes — the mask applies after the stem norm,
    so the kernel needs no special casing."""
    from mmgclip_tpu.models.convnext import ConvNeXtConfig, init_convnext
    from mmgclip_tpu.ops import fused_block as fb

    cfg = ConvNeXtConfig.micro()
    cfg = type(cfg)(**{**cfg.__dict__, "in_channels": 1})
    module, params = init_convnext(cfg, seed=0, image_size=32)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 33, 31, 1)), jnp.float32)
    ref = np.asarray(module.apply(params, x))

    fused_cfg = type(cfg)(**{**cfg.__dict__, "use_fused_blocks": True,
                             "fuse_stem": True})
    fused_module = type(module)(fused_cfg)
    fused_params = jax.jit(
        lambda k, xx: fused_module.init(k, xx, classify=True)
    )(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(fused_params)

    monkeypatch.setattr(fb, "FORCE_INTERPRET", True)
    monkeypatch.setattr(fs, "FORCE_INTERPRET", True)
    out = np.asarray(fused_module.apply(params, x))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-4)

    # bucketed canvas: valid-region features must match the exact-shape run
    canvas = jnp.zeros((2, 40, 40, 1), jnp.float32).at[:, :33, :31].set(x)
    valid = jnp.asarray([[33, 31], [33, 31]], jnp.int32)
    pooled_canvas = np.asarray(fused_module.apply(params, canvas, valid_hw=valid))
    np.testing.assert_allclose(pooled_canvas, ref, atol=5e-4, rtol=5e-4)
