"""Fused LayerNorm+downsample kernel (ops/fused_downsample.py): equality vs
the lax path (even/odd sizes, multi-band, multi-chunk), gradient via the lax
vjp, the VMEM gate, and the model wiring (use_fused_blocks routes the
downsample glue through the kernel while keeping the identical param tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgclip_tpu.ops import fused_downsample as fd
from mmgclip_tpu.ops.fused_downsample import (_lax_ln_downsample,
                                              fused_ln_downsample)


def _params(rng, cin, cout, dtype=jnp.float32):
    r = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, dtype)  # noqa: E731
    return dict(ns=1.0 + r(cin), nb=r(cin), kernel=r(2, 2, cin, cout),
                bias=r(cout))


@pytest.mark.parametrize("shape,cout", [
    ((2, 16, 16, 96), 192),   # even, single band
    ((1, 17, 15, 64), 128),   # ODD h and w: LN-then-pad order must hold
    ((1, 8, 12, 128), 256),
])
def test_fused_downsample_matches_lax(shape, cout):
    rng = np.random.default_rng(0)
    n, h, w, cin = shape
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    p = _params(rng, cin, cout)
    ref = _lax_ln_downsample(x, *p.values())
    out = fused_ln_downsample(x, *p.values(), True)
    assert out.shape == ref.shape == (n, -(-h // 2), -(-w // 2), cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_downsample_multi_band_and_chunk():
    """Shrunken budgets force several bands and several chunks per band;
    band/chunk seams must be invisible (no halo: stride == kernel)."""
    rng = np.random.default_rng(1)
    cin, cout = 64, 128
    x = jnp.asarray(rng.normal(size=(1, 48, 16, cin)), jnp.float32)
    p = _params(rng, cin, cout)
    old_chunk, old_vmem = fd._CHUNK_BUDGET, fd._VMEM_BUDGET
    fd._CHUNK_BUDGET = (2 * 8 * 2 * cin + 8 * cout) * 4 * 2  # ~2 rows/chunk
    fd._VMEM_BUDGET = fd._working_set(6, 16, cin, cout, 4, 2) + 1
    try:
        picked = fd._pick_band(24, 16, cin, cout, 4)
        assert picked is not None and picked[1] < 24
        out = fused_ln_downsample(x, *p.values(), True)
    finally:
        fd._CHUNK_BUDGET, fd._VMEM_BUDGET = old_chunk, old_vmem
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_lax_ln_downsample(x, *p.values())),
                               atol=2e-5, rtol=2e-5)


def test_fused_downsample_gradient_via_lax():
    rng = np.random.default_rng(2)
    cin, cout = 32, 64
    x = jnp.asarray(rng.normal(size=(1, 8, 8, cin)), jnp.float32)
    p = _params(rng, cin, cout)
    gf = jax.grad(lambda x: jnp.sum(fused_ln_downsample(x, *p.values(), True) ** 2))(x)
    gl = jax.grad(lambda x: jnp.sum(_lax_ln_downsample(x, *p.values()) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gl),
                               atol=1e-4, rtol=1e-4)


def test_fused_downsample_fallback_off_tpu():
    """Without interpret on a non-TPU backend the op runs the lax math."""
    rng = np.random.default_rng(3)
    p = _params(rng, 16, 32)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 16)), jnp.float32)
    out = fused_ln_downsample(x, *p.values())
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_lax_ln_downsample(x, *p.values())),
                               atol=1e-6)


def test_model_fused_downsample_matches_unfused(monkeypatch):
    """ConvNeXt with use_fused_blocks routes the downsample glue through the
    kernel (FORCE_INTERPRET drives it off-TPU) with the SAME param tree and
    matching features; at bf16 the off-TPU fallback stays byte-compatible."""
    from mmgclip_tpu.models.convnext import ConvNeXtConfig, init_convnext
    from mmgclip_tpu.ops import fused_block as fb

    cfg = ConvNeXtConfig.micro()
    cfg = type(cfg)(**{**cfg.__dict__, "in_channels": 1})
    module, params = init_convnext(cfg, seed=0, image_size=32)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 33, 31, 1)),
                    jnp.float32)
    ref = np.asarray(module.apply(params, x))

    fused_cfg = type(cfg)(**{**cfg.__dict__, "use_fused_blocks": True,
                             "fuse_downsample": True})
    fused_module = type(module)(fused_cfg)
    # identical param tree: the fused path registers the same names
    fused_params = jax.jit(
        lambda k, xx: fused_module.init(k, xx, classify=True)
    )(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(fused_params)

    monkeypatch.setattr(fb, "FORCE_INTERPRET", True)
    monkeypatch.setattr(fd, "FORCE_INTERPRET", True)
    out = np.asarray(fused_module.apply(params, x))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-4)
