"""Fused ConvNeXt-block Pallas kernel (ops/fused_block.py): equality vs the
lax path, gradient safety, shape/fallback gates, and the model wiring
(ConvNeXtConfig.use_fused_blocks).  The kernel replaces the per-block
dwconv->LN->MLP->residual chain whose HBM round trips bound the encode
roofline (VERDICT r3 next #1; reference loop:
mmgclip/networks/image_features.py:87-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgclip_tpu.ops import fused_block as fb
from mmgclip_tpu.ops.fused_block import _lax_block, _pick_tile_h, fused_convnext_block


def _params(rng, c, dtype=jnp.float32):
    r = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, dtype)  # noqa: E731
    return dict(
        dwk=r(7, 7, 1, c), dwb=r(c), ns=1.0 + r(c), nb=r(c),
        w1=r(c, 4 * c), b1=r(4 * c), w2=r(4 * c, c), b2=r(c), g=r(c),
    )


@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 16, 128),  # aligned lanes
        (1, 12, 20, 96),   # ConvNeXt-Tiny stage0 channel count (lane-padded)
        (2, 8, 8, 256),    # small spatial, single chunk
    ],
)
def test_fused_block_matches_lax(shape):
    rng = np.random.default_rng(0)
    n, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    p = _params(rng, c)
    ref = _lax_block(x, *p.values())
    out = fused_convnext_block(x, *p.values(), True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_block_multi_chunk_rows():
    """H forces several row-chunks through the fori_loop path: chunk seams
    must be invisible (the dwconv halo spans them)."""
    rng = np.random.default_rng(1)
    c = 128
    x = jnp.asarray(rng.normal(size=(1, 48, 8, c)), jnp.float32)
    p = _params(rng, c)
    # shrink the chunk budget so 48 rows split into several chunks
    old = fb._CHUNK_BUDGET
    fb._CHUNK_BUDGET = 8 * 4 * c * 4 * 8  # ~8 rows per chunk
    try:
        assert _pick_tile_h(48, 8, c) < 48
        out = fused_convnext_block(x, *p.values(), True)
    finally:
        fb._CHUNK_BUDGET = old
    ref = _lax_block(x, *p.values())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_block_gradient_matches_lax():
    """custom_vjp: backward re-derives through the lax path — gradients of a
    scalar loss through the fused block equal the pure-lax gradients."""
    rng = np.random.default_rng(2)
    c = 128
    x = jnp.asarray(rng.normal(size=(1, 8, 8, c)), jnp.float32)
    p = _params(rng, c)

    def loss_fused(x, w1):
        q = dict(p, w1=w1)
        return jnp.sum(fused_convnext_block(x, *q.values(), True) ** 2)

    def loss_lax(x, w1):
        q = dict(p, w1=w1)
        return jnp.sum(_lax_block(x, *q.values()) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, p["w1"])
    gx_l, gw_l = jax.grad(loss_lax, argnums=(0, 1))(x, p["w1"])
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_l), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_l), atol=1e-4, rtol=1e-4)


def test_fused_block_fallback_paths():
    # non-TPU backend without interpret: lax fallback, correct result
    rng = np.random.default_rng(3)
    c = 32
    x = jnp.asarray(rng.normal(size=(1, 4, 4, c)), jnp.float32)
    p = _params(rng, c)
    out = fused_convnext_block(x, *p.values())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_lax_block(x, *p.values())), atol=1e-5
    )
    # a working set far beyond VMEM must take the fallback even on TPU
    assert fb._vmem_working_set(512, 512, 96, 2, _pick_tile_h(512, 512, 96)) > fb._VMEM_BUDGET


def test_fused_int8_block_close_to_fp32_and_int8_lax():
    """The int8 kernel (per-chunk activation scales, per-channel weight
    scales, int32 MXU accumulation) must track the fp32 math within the
    quant error budget AND sit near the unfused int8 reference path — its
    per-chunk activation scale is a finer partition of the per-tensor scheme
    (ops/quant.py), not a different one."""
    from mmgclip_tpu.ops.fused_block import (_lax_block_int8,
                                             fused_convnext_block_int8)

    rng = np.random.default_rng(6)
    for shape in [(2, 16, 16, 128), (1, 12, 20, 96)]:
        n, h, w, c = shape
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        p = _params(rng, c)
        fp32 = np.asarray(_lax_block(x, *p.values()))
        q_lax = np.asarray(_lax_block_int8(x, *p.values()))
        q_fused = np.asarray(fused_convnext_block_int8(x, *p.values(), True))
        scale = np.abs(fp32).max()
        # both int8 paths within the quant budget of fp32
        assert np.abs(q_lax - fp32).max() / scale < 0.02
        assert np.abs(q_fused - fp32).max() / scale < 0.02
        # and the fused path no farther from fp32 than 2x the unfused one
        assert (np.abs(q_fused - fp32).max()
                <= 2.0 * np.abs(q_lax - fp32).max() + 1e-6)


def test_fused_int8_gradient_matches_unfused_int8():
    """custom_vjp backward of the int8 kernel differentiates the unfused
    int8 math (zero grads through round(), STE-free — the tower is frozen
    in every shipped config, this is the safety net)."""
    from mmgclip_tpu.ops.fused_block import (_lax_block_int8,
                                             fused_convnext_block_int8)

    rng = np.random.default_rng(7)
    c = 128
    x = jnp.asarray(rng.normal(size=(1, 8, 8, c)), jnp.float32)
    p = _params(rng, c)

    gx_f = jax.grad(lambda x: jnp.sum(
        fused_convnext_block_int8(x, *p.values(), True) ** 2))(x)
    gx_l = jax.grad(lambda x: jnp.sum(_lax_block_int8(x, *p.values()) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_l),
                               atol=1e-4, rtol=1e-4)


def test_convnext_model_fused_int8_close_to_fp32(monkeypatch):
    """use_fused_blocks + quant='int8' routes every stage block through the
    int8 kernel; full-tower features must stay within the int8 error budget
    of the fp32 tower (mirrors the unfused quant gate in test_quant.py).
    layer_scale_init must be at trained magnitude: at the 1e-6 training init
    the blocks are ~identity and int8-vs-fp32 would pass vacuously."""
    from dataclasses import replace

    from mmgclip_tpu.models.convnext import ConvNeXt, ConvNeXtConfig, init_convnext

    cfg = ConvNeXtConfig(depths=(1, 2, 1, 1), dims=(32, 64, 128, 256),
                         in_channels=1, layer_scale_init=0.1)
    module, params = init_convnext(cfg, seed=0, image_size=32)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    ref = np.asarray(module.apply(params, x))

    monkeypatch.setattr(fb, "FORCE_INTERPRET", True)
    qmod = ConvNeXt(replace(cfg, use_fused_blocks=True, quant="int8"))
    out = np.asarray(qmod.apply(params, x))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    cos = float((out * ref).sum()
                / (np.linalg.norm(out) * np.linalg.norm(ref)))
    assert rel < 0.02 and cos > 0.999
    # the int8 path must be LIVE: its output differs measurably from the
    # fp32 fused tower (guards against the branch silently not quantizing)
    fp = np.asarray(ConvNeXt(replace(cfg, use_fused_blocks=True)).apply(params, x))
    assert np.abs(out - fp).max() > 1e-4


def test_fused_block_tanh_gelu_matches_lax_tanh():
    """gelu_tanh=True: the kernel's in-VMEM tanh GELU must equal the lax
    path with jax.nn.gelu(approximate=True) — same math, both paths — and
    be live (differ from the exact-erf output) while staying within the
    approximation's published error of the exact path."""
    rng = np.random.default_rng(10)
    c = 128
    x = jnp.asarray(rng.normal(size=(2, 16, 16, c)), jnp.float32)
    p = _params(rng, c)
    ref_tanh = _lax_block(x, *p.values(), gelu_tanh=True)
    out_tanh = fused_convnext_block(x, *p.values(), True, True)
    np.testing.assert_allclose(np.asarray(out_tanh), np.asarray(ref_tanh),
                               atol=2e-5, rtol=2e-5)
    exact = np.asarray(_lax_block(x, *p.values()))
    diff = np.abs(np.asarray(out_tanh) - exact)
    assert diff.max() > 1e-7  # the approximation is actually in play
    # tanh-GELU max abs error ~3e-4 pre-projection; post pw2/layer-scale it
    # stays well below the fused kernel's 1e-3 feature contract
    assert diff.max() / max(np.abs(exact).max(), 1e-9) < 1e-3


def test_fused_block_tanh_gradient_matches_lax_tanh():
    """Backward of the tanh-GELU kernel differentiates the tanh lax math,
    not the exact-erf math."""
    rng = np.random.default_rng(11)
    c = 128
    x = jnp.asarray(rng.normal(size=(1, 8, 8, c)), jnp.float32)
    p = _params(rng, c)
    gx_f = jax.grad(lambda x: jnp.sum(
        fused_convnext_block(x, *p.values(), True, True) ** 2))(x)
    gx_l = jax.grad(lambda x: jnp.sum(
        _lax_block(x, *p.values(), gelu_tanh=True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_l),
                               atol=1e-4, rtol=1e-4)


def test_convnext_model_gelu_tanh_paths_agree(monkeypatch):
    """ConvNeXtConfig(gelu='tanh'): the fused kernel (interpret-forced), the
    off-TPU lax fallback, and the plain unfused tower must all run the SAME
    tanh math (fallback byte-matches unfused), and the tanh tower must stay
    within the approximation budget of the exact tower."""
    from dataclasses import replace

    from mmgclip_tpu.models.convnext import ConvNeXt, ConvNeXtConfig, init_convnext

    cfg = ConvNeXtConfig(depths=(1, 2, 1, 1), dims=(32, 64, 128, 256),
                         in_channels=1, layer_scale_init=0.1)
    module, params = init_convnext(cfg, seed=0, image_size=32)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    exact = np.asarray(module.apply(params, x))

    tanh_unfused = np.asarray(ConvNeXt(replace(cfg, gelu="tanh")).apply(params, x))
    # no FORCE_INTERPRET: fused knob off-TPU -> lax fallback, byte parity
    tanh_fallback = np.asarray(
        ConvNeXt(replace(cfg, gelu="tanh", use_fused_blocks=True)).apply(params, x))
    np.testing.assert_array_equal(tanh_fallback, tanh_unfused)

    monkeypatch.setattr(fb, "FORCE_INTERPRET", True)
    tanh_fused = np.asarray(
        ConvNeXt(replace(cfg, gelu="tanh", use_fused_blocks=True)).apply(params, x))
    np.testing.assert_allclose(tanh_fused, tanh_unfused, atol=2e-5, rtol=2e-5)
    rel = np.linalg.norm(tanh_fused - exact) / np.linalg.norm(exact)
    assert 0 < rel < 5e-3


def test_pick_tile_h_divides_h():
    for h in (8, 12, 48, 56, 64):
        t = _pick_tile_h(h, 64, 96)
        assert h % t == 0 and t >= 1


def test_convnext_model_fused_matches_unfused(monkeypatch):
    """ConvNeXtConfig.use_fused_blocks routes every stage block through the
    kernel (interpret-forced on CPU) and must reproduce the unfused tower's
    features."""
    from mmgclip_tpu.models.convnext import ConvNeXt, ConvNeXtConfig, init_convnext

    # layer_scale_init at trained magnitude — at the 1e-6 training init every
    # block is ~identity and the equality check would not exercise the kernel
    cfg = ConvNeXtConfig(depths=(1, 2, 1, 1), dims=(32, 64, 128, 256),
                         in_channels=1, layer_scale_init=0.1)
    module, params = init_convnext(cfg, seed=0, image_size=32)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    ref = module.apply(params, x)

    from dataclasses import replace

    monkeypatch.setattr(fb, "FORCE_INTERPRET", True)
    fused_module = ConvNeXt(replace(cfg, use_fused_blocks=True))
    out = fused_module.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_fallback_bytematches_unfused_in_bf16():
    """Off-TPU the fused knob takes the lax fallback, which must be
    BYTE-identical to the unfused tower — including in bf16, where casting
    the LN affine params would introduce rounding the unfused path (fp32
    _layer_norm) doesn't have."""
    from dataclasses import replace

    from mmgclip_tpu.models.convnext import ConvNeXt, ConvNeXtConfig, init_convnext

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(32, 64, 128, 256),
                         in_channels=1, layer_scale_init=0.1,
                         dtype=jnp.bfloat16)
    module, params = init_convnext(cfg, seed=0, image_size=32)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    ref = np.asarray(module.apply(params, x).astype(jnp.float32))
    # no FORCE_INTERPRET: non-TPU backend -> the lax fallback path
    out = np.asarray(
        ConvNeXt(replace(cfg, use_fused_blocks=True)).apply(params, x)
        .astype(jnp.float32))
    np.testing.assert_array_equal(out, ref)


def test_convnext_fused_bucketed_mask_stays_exact(monkeypatch):
    """Bucketed encode (valid_hw canvas padding) with fused blocks: the
    pad-region re-zeroing happens outside the kernel and must keep canvas
    runs equal to exact-shape runs."""
    from mmgclip_tpu.models.convnext import ConvNeXt, ConvNeXtConfig, init_convnext

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(32, 64, 128, 256), in_channels=1)
    module, params = init_convnext(cfg, seed=0, image_size=32)
    rng = np.random.default_rng(5)
    exact = jnp.asarray(rng.normal(size=(1, 24, 24, 1)), jnp.float32)
    canvas = jnp.zeros((1, 32, 32, 1), jnp.float32).at[:, :24, :24, :].set(exact)
    valid = jnp.asarray([[24, 24]], jnp.int32)

    from dataclasses import replace

    monkeypatch.setattr(fb, "FORCE_INTERPRET", True)
    fused_module = ConvNeXt(replace(cfg, use_fused_blocks=True))
    feats_exact = module.apply(params, exact)
    feats_canvas = fused_module.apply(params, canvas, valid_hw=valid)
    np.testing.assert_allclose(
        np.asarray(feats_canvas), np.asarray(feats_exact), atol=2e-4, rtol=2e-4
    )


# ---- row-banded kernel (native-resolution images: the reference encodes
# mammograms with NO resize — mmgclip/networks/image_features.py:28 — so
# shapes whose whole-image working set exceeds VMEM are the product norm)


def test_banded_kernel_matches_lax_all_variants():
    """_fused_call_banded == the lax path for bf16-exact, tanh and int8
    math, across band sizes (edge bands exercise the halo clamping)."""
    rng = np.random.default_rng(20)
    c = 128
    n, h, w = 2, 32, 16
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    p = _params(rng, c)
    ref = _lax_block(x, *p.values())
    for band in (8, 16):
        out = fb._fused_call_banded(
            x, *p.values(), band_h=band, tile_h=_pick_tile_h(band, w, c),
            eps=1e-6, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
    ref_t = _lax_block(x, *p.values(), gelu_tanh=True)
    out_t = fb._fused_call_banded(
        x, *p.values(), band_h=16, tile_h=_pick_tile_h(16, w, c), eps=1e-6,
        interpret=True, gelu_tanh=True)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t),
                               atol=2e-5, rtol=2e-5)
    ref8 = np.asarray(fb._lax_block_int8(x, *p.values())).ravel()
    out8 = np.asarray(fb._fused_call_banded(
        x, *p.values(), band_h=8, tile_h=_pick_tile_h(8, w, c), eps=1e-6,
        interpret=True, quant=True)).ravel()
    cos = float(out8 @ ref8 / (np.linalg.norm(out8) * np.linalg.norm(ref8)))
    assert cos > 0.999  # per-chunk scales are finer than the per-tensor lax scale


def test_public_gate_routes_large_shapes_to_banded(monkeypatch):
    """When the whole-image working set exceeds the budget but a band fits,
    fused_convnext_block must run the BANDED kernel (not fall back to lax)
    and still equal the lax math."""
    rng = np.random.default_rng(21)
    c = 128
    x = jnp.asarray(rng.normal(size=(1, 24, 8, c)), jnp.float32)
    p = _params(rng, c)
    whole_ws = fb._vmem_working_set(24, 8, c, 4, _pick_tile_h(24, 8, c))
    banded_ws = fb._banded_working_set(8, 8, c, 4, _pick_tile_h(8, 8, c))
    assert banded_ws < whole_ws
    monkeypatch.setattr(fb, "_VMEM_BUDGET", (whole_ws + banded_ws) // 2)

    calls = {}
    real = fb._fused_call_banded

    def spy(*args, **kw):
        calls["band_h"] = kw.get("band_h")
        return real(*args, **kw)

    monkeypatch.setattr(fb, "_fused_call_banded", spy)
    out = fused_convnext_block(x, *p.values(), True)
    assert calls, "banded path did not fire"
    assert 24 % calls["band_h"] == 0
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_lax_block(x, *p.values())),
                               atol=2e-5, rtol=2e-5)


def test_banded_gradient_via_lax_path(monkeypatch):
    """The custom_vjp backward stays the lax math when the primal ran the
    banded kernel."""
    rng = np.random.default_rng(22)
    c = 128
    x = jnp.asarray(rng.normal(size=(1, 16, 8, c)), jnp.float32)
    p = _params(rng, c)
    whole_ws = fb._vmem_working_set(16, 8, c, 4, _pick_tile_h(16, 8, c))
    monkeypatch.setattr(fb, "_VMEM_BUDGET", whole_ws)  # strict < fails -> banded
    gx_f = jax.grad(lambda x: jnp.sum(
        fused_convnext_block(x, *p.values(), True) ** 2))(x)
    gx_l = jax.grad(lambda x: jnp.sum(_lax_block(x, *p.values()) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_l),
                               atol=1e-4, rtol=1e-4)


def test_pick_band_h_properties():
    # divisor, >= 2*HALO, fits the budget
    band = fb._pick_band_h(128, 128, 96, 2)
    assert band is not None and 128 % band == 0 and band >= 2 * fb.HALO
    assert fb._banded_working_set(band, 128, 96, 2,
                                  _pick_tile_h(band, 128, 96)) < fb._VMEM_BUDGET
    # a prime row count has no usable divisor -> None (lax fallback)
    assert fb._pick_band_h(127, 4096, 512, 4) is None


def test_pad_to_band_covers_ffdm_post_stem():
    """A true FFDM mammogram (2294x1914 -> post-stem 573x478x96 bf16) has no
    usable band divisor (573 = 3*191); before pad-to-band the gate silently
    fell back to lax exactly at the product norm (native-resolution encode,
    reference image_features.py:28).  _pad_to_band must cover it."""
    h, w, c = 573, 478, 96
    assert fb._pick_band_h(h, w, c, 2) is None  # the pre-fix gap
    padded = fb._pad_to_band(h, w, c, 2)
    assert padded is not None
    h_pad, band = padded
    assert h_pad >= h and h_pad - h < 2 * fb.K
    assert h_pad % band == 0 and band >= 2 * fb.HALO
    assert fb._banded_working_set(band, w, c, 2, _pick_tile_h(band, w, c)) \
        < fb._VMEM_BUDGET


def test_route_never_falls_back_for_any_height(monkeypatch):
    """On TPU (interpret stands in for it), _route must pick a kernel path —
    whole / banded / pad-to-band — for EVERY height >= 6 at FFDM-scale
    width/channels; the lax fallback fires only below the kernel's minimum
    band height.  Routing-only check (no kernel execution): the pallas_call
    wrappers are stubbed to record the decision."""
    calls = []
    monkeypatch.setattr(fb, "_fused_call", lambda x, *a, **k: calls.append(("whole", x.shape)) or x)
    monkeypatch.setattr(fb, "_fused_call_int8", lambda x, *a, **k: calls.append(("whole8", x.shape)) or x)
    monkeypatch.setattr(
        fb, "_fused_call_banded",
        lambda x, *a, **k: calls.append(("banded", x.shape, k["band_h"])) or x)
    p = _params(np.random.default_rng(30), 96)
    w = 478
    for h in [6, 7, 11, 12, 127, 191, 573, 574, 1024]:
        calls.clear()
        x = jnp.zeros((1, h, w, 96), jnp.bfloat16)
        out = fb._route(x, *p.values(), interpret=True, gelu_tanh=False,
                        quant=False)
        assert calls, f"h={h}: silent lax fallback"
        assert out.shape == x.shape, f"h={h}: pad rows leaked into the output"
        if calls[0][0] == "banded":
            h_pad, band = calls[0][1][1], calls[0][2]
            assert h_pad % band == 0 and h_pad >= h


def test_route_pad_to_band_output_equals_lax(monkeypatch):
    """Numeric equality of the PAD-to-band path vs the lax math through the
    public gate, all variants, at a divisor-free height (h=23 is prime: no
    divisor in [6, 11])."""
    rng = np.random.default_rng(31)
    c = 128
    n, h, w = 1, 23, 8
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    p = _params(rng, c)
    # force the whole-image path out so the pad-to-band branch must carry it
    monkeypatch.setattr(
        fb, "_VMEM_BUDGET",
        fb._banded_working_set(6, w, c, 4, _pick_tile_h(6, w, c)) + 1)
    assert fb._pick_band_h(h, w, c, 4) is None

    banded_calls = []
    real = fb._fused_call_banded

    def spy(*args, **kw):
        banded_calls.append(kw["band_h"])
        return real(*args, **kw)

    monkeypatch.setattr(fb, "_fused_call_banded", spy)
    out = fused_convnext_block(x, *p.values(), True)
    assert banded_calls, "pad-to-band path did not fire"
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_lax_block(x, *p.values())),
                               atol=2e-5, rtol=2e-5)
    # tanh + int8 variants ride the same pad path
    out_t = fused_convnext_block(x, *p.values(), True, True)
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(_lax_block(x, *p.values(), gelu_tanh=True)),
        atol=2e-5, rtol=2e-5)
    ref8 = np.asarray(fb._lax_block_int8(x, *p.values())).ravel()
    out8 = np.asarray(fb.fused_convnext_block_int8(x, *p.values(), True)).ravel()
    cos = float(out8 @ ref8 / (np.linalg.norm(out8) * np.linalg.norm(ref8)))
    assert cos > 0.999
