"""Device-side resize (ops/resize.py) + intensity windowing
(ops/preprocess.py): oracle parity (torch area / jax.image bilinear),
canvas-fit geometry, and the fused native-res ingest path through
ImageFeatureExtractor (dataset.config.encode_resize / encode_window).

The reference resizes nothing (mmgclip/networks/image_features.py:28,
ToTensor only) — these stages are the north star's fused ingest chain
('decode, crop/pad, resize, intensity windowing, normalization'), off by
default and documented as a divergence in PARITY.md."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mmgclip_tpu.ops.preprocess import intensity_transform, normalize_16bit, to_16bit
from mmgclip_tpu.ops.resize import (_resize_weights, fit_shape, resize2d,
                                    resize_to_canvas)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("n_in,n_out", [(64, 32), (57, 13), (100, 37), (8, 8)])
@pytest.mark.parametrize("method", ["area", "bilinear"])
def test_resize_weight_rows_sum_to_one(n_in, n_out, method):
    w = _resize_weights(n_in, n_out, method)
    assert w.shape == (n_out, n_in)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
    assert (w >= 0).all()


def test_area_resize_matches_torch_at_integer_factors():
    """At integer downscale factors torch F.interpolate(mode='area') IS the
    box filter — exact-parity oracle."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 48)).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), (32, 24), method="area"))
    ref = F.interpolate(torch.from_numpy(x)[:, None], size=(32, 24),
                        mode="area")[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape,out_hw", [((1, 57, 91), (16, 20)),
                                          ((1, 230, 190), (64, 48))])
def test_area_resize_matches_tf_at_fractional_factors(shape, out_hw):
    """Fractional factors: tf.image.resize(method='area') is the true
    fractional-overlap box integration this op implements (torch 'area'
    switches to adaptive-avg-pool integer cells there, and PIL BOX weights
    whole pixels by center membership — both different, blockier filters)."""
    tf = pytest.importorskip("tensorflow")

    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), out_hw, method="area"))
    ref = tf.image.resize(x[..., None], out_hw, method="area").numpy()[..., 0]
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape,out_hw", [((2, 64, 48), (32, 24)),
                                          ((1, 57, 91), (128, 40))])
def test_bilinear_resize_matches_jax_image(shape, out_hw):
    """Classic 2-tap bilinear (half-pixel centers) == jax.image 'linear'
    with antialias off (the antialiased default widens the kernel when
    downscaling — that's what the 'area' method is for)."""
    import jax

    rng = np.random.default_rng(1)
    x = rng.normal(size=shape).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), out_hw, method="bilinear"))
    ref = np.asarray(jax.image.resize(jnp.asarray(x), (shape[0], *out_hw),
                                      method="linear", antialias=False))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_resize2d_nhwc_and_uint8():
    rng = np.random.default_rng(2)
    x8 = rng.integers(0, 256, (2, 16, 12, 3), dtype=np.uint8)
    y = np.asarray(resize2d(jnp.asarray(x8), (8, 6), method="area"))
    assert y.shape == (2, 8, 6, 3)
    ref = np.asarray(resize2d(jnp.asarray(x8.astype(np.float32)), (8, 6)))
    np.testing.assert_allclose(y, ref, atol=1e-3)
    # value range preserved (rows sum to 1)
    assert y.min() >= 0 and y.max() <= 255


def test_resize_method_validation():
    with pytest.raises(ValueError, match="area.*bilinear"):
        resize2d(jnp.zeros((1, 8, 8)), (4, 4), method="cubic")


def test_fit_shape_preserves_aspect():
    assert fit_shape((2294, 1914), (256, 256)) == (256, 214)
    assert fit_shape((1914, 2294), (256, 256)) == (214, 256)
    assert fit_shape((100, 100), (256, 256)) == (256, 256)  # upscale-to-fit
    vh, vw = fit_shape((2294, 1914), (512, 512))
    assert vh == 512 and abs(vw / vh - 1914 / 2294) < 0.01


def test_resize_to_canvas_geometry_and_pad():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 60, 40)).astype(np.float32) + 5.0  # positive
    y, valid = resize_to_canvas(jnp.asarray(x), (32, 32), method="area")
    y, valid = np.asarray(y), np.asarray(valid)
    assert y.shape == (2, 32, 32)
    vh, vw = valid[0]
    assert (valid == [vh, vw]).all() and vh == 32 and vw == 21
    # pad region exactly zero, valid region strictly positive
    assert np.abs(y[:, :, vw:]).max() == 0
    assert y[:, :vh, :vw].min() > 0
    # valid region equals the direct resize
    direct = np.asarray(resize2d(jnp.asarray(x), (int(vh), int(vw))))
    np.testing.assert_allclose(y[:, :vh, :vw], direct, atol=1e-5)


def test_intensity_window_full_range_equals_reference_transform():
    """window=(32767.5, 65535) IS the reference normalization — byte-exact,
    so the windowing stage is a strict superset of the shipped transform."""
    rng = np.random.default_rng(4)
    for dtype, arr in [("u1", rng.integers(0, 256, (3, 8, 8)).astype(np.uint8)),
                       ("u2", rng.integers(0, 65536, (3, 8, 8)).astype(np.uint16))]:
        base = np.asarray(intensity_transform(jnp.asarray(arr)))
        windowed = np.asarray(intensity_transform(jnp.asarray(arr),
                                                  window=(32767.5, 65535.0)))
        np.testing.assert_array_equal(base, windowed)


def test_intensity_window_clips_and_maps():
    # 16-bit domain window center 30000 width 20000 -> [20000, 40000] onto [-1, 1]
    x = jnp.asarray(np.array([0, 20000, 30000, 40000, 65535], np.uint16))
    y = np.asarray(intensity_transform(x, window=(30000, 20000)))
    np.testing.assert_allclose(y, [-1.0, -1.0, 0.0, 1.0, 1.0], atol=1e-6)
    with pytest.raises(ValueError, match="width"):
        normalize_16bit(to_16bit(x), window=(100, 0))


def test_encode_resize_end_to_end(tmp_path):
    """ImageFeatureExtractor with encode_resize: native shapes collapse onto
    ONE canvas; a square image whose fit fills the canvas produces features
    equal to the plain exact-shape encode of the pre-resized pixels (the
    masked tower with full valid_hw == the unmasked tower)."""
    import pandas as pd
    from PIL import Image

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.base.features_export_dir = str(tmp_path / "enc")
    cfg.dataset.config.encode_resize = [32, 32]
    cfg.dataset.config.encode_bucket_rounding = 64  # must be ignored

    rng = np.random.default_rng(5)
    paths = []
    for i, (h, w) in enumerate([(64, 64), (96, 64), (50, 70)]):
        p = str(tmp_path / f"r{i}.png")
        Image.fromarray(rng.integers(0, 256, (h, w), dtype=np.uint8), mode="L").save(p)
        paths.append(p)
    df = pd.DataFrame({"image_path": paths})

    extractor = ImageFeatureExtractor(config=cfg, dataset=df, batch_size=4)
    assert extractor.resize_hw == (32, 32)
    assert extractor.bucket_rounding == 0  # resize overrides rounding
    assert extractor.extract() == 3

    from mmgclip_tpu.ingest.png_reader import decode_png

    # oracle for the square image: host-side area resize in the 16-bit
    # domain, then the plain (unmasked) encode at the resized shape
    raw = to_16bit(jnp.asarray(decode_png(paths[0])[None]))
    pre = resize2d(raw, (32, 32), method="area")
    x = normalize_16bit(pre)[..., None]
    exact = np.asarray(extractor.module.apply(extractor.params, x))
    feats = np.load(os.path.join(
        str(tmp_path / "enc"), *paths[0].strip(os.sep).split(os.sep)[-4:]
    ).replace(".png", ".npy"))
    np.testing.assert_allclose(feats.reshape(1, -1), exact, atol=1e-4)


def test_encode_window_knob(tmp_path):
    """encode_window reaches the jitted encode program and changes features
    exactly as the windowed transform predicts."""
    import pandas as pd

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor
    from fixtures import write_png

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.base.features_export_dir = str(tmp_path / "enc")
    cfg.dataset.config.encode_window = [30000, 20000]

    p = str(tmp_path / "w.png")
    write_png(p, size=32, seed=6)
    df = pd.DataFrame({"image_path": [p]})
    extractor = ImageFeatureExtractor(config=cfg, dataset=df, batch_size=1)
    assert extractor.window == (30000.0, 20000.0)
    assert extractor.extract() == 1

    from mmgclip_tpu.ingest.png_reader import decode_png

    pixels = jnp.asarray(decode_png(p)[None])
    x = intensity_transform(pixels, window=(30000, 20000))[..., None]
    exact = np.asarray(extractor.module.apply(extractor.params, x))
    feats = np.load(os.path.join(
        str(tmp_path / "enc"), *p.strip(os.sep).split(os.sep)[-4:]
    ).replace(".png", ".npy"))
    np.testing.assert_allclose(feats.reshape(1, -1), exact, atol=1e-5)


def test_unfused_int8_warns(monkeypatch):
    """quant=int8 without use_fused_blocks is a measured slowdown (0.96x,
    PERF.md) — config resolution must say so loudly (VERDICT r4 weak #7)."""
    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import encode as enc
    from mmgclip_tpu.ingest.encode import load_convnext_tower

    warnings = []
    monkeypatch.setattr(enc.logger, "warning",
                        lambda msg, *a: warnings.append(str(msg)))

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config(
        {"micro": True, "in_channels": 1, "quant": "int8"})
    load_convnext_tower(cfg)
    assert any("use_fused_blocks" in w and "slowdown" in w for w in warnings)

    # the fused+int8 combination is the blessed one: no warning
    warnings.clear()
    cfg.networks.image_encoder.config["use_fused_blocks"] = True
    load_convnext_tower(cfg)
    assert not any("slowdown" in w for w in warnings)

def test_glue_knobs_without_fused_blocks_warn(monkeypatch):
    """fuse_stem/fuse_downsample are gated on use_fused_blocks in
    models/convnext.py — setting them alone is a silent no-op, so config
    resolution must say so loudly (same contract as the int8 footgun)."""
    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import encode as enc
    from mmgclip_tpu.ingest.encode import load_convnext_tower

    warnings = []
    monkeypatch.setattr(enc.logger, "warning",
                        lambda msg, *a: warnings.append(str(msg)))

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config(
        {"micro": True, "in_channels": 1, "fuse_stem": True})
    load_convnext_tower(cfg)
    assert any("no effect without" in w for w in warnings)

    warnings.clear()
    cfg.networks.image_encoder.config = Config(
        {"micro": True, "in_channels": 1, "fuse_downsample": True})
    load_convnext_tower(cfg)
    assert any("no effect without" in w for w in warnings)

    # the blessed combination: no warning
    warnings.clear()
    cfg.networks.image_encoder.config = Config(
        {"micro": True, "in_channels": 1, "fuse_stem": True,
         "fuse_downsample": True, "use_fused_blocks": True})
    load_convnext_tower(cfg)
    assert not any("no effect" in w for w in warnings)

def test_default_precision_truncation_bound():
    """DEFAULT-precision f32 einsums lower to a SINGLE bf16 MXU pass on TPU
    (chip-verified: DEFAULT matmul of 1+2^-12 returns exactly 1.0, HIGHEST
    returns 1.000244).  Bound the error that truncation injects into the
    shipped resize chain: simulate the bf16 pass on CPU (bf16 operands, f32
    accumulation) against the exact fp32 resample, after full-range
    normalization to [-1, 1] — the tower's input domain."""
    rng = np.random.default_rng(7)
    x = rng.integers(0, 65536, size=(2, 230, 190), dtype=np.uint16)
    xf = jnp.asarray(x, jnp.float32)

    exact = np.asarray(resize2d(xf, (64, 48), method="area"))

    from mmgclip_tpu.ops.resize import _resize_weights as W
    rh = jnp.asarray(W(230, 64, "area"), jnp.bfloat16)
    rw = jnp.asarray(W(190, 48, "area"), jnp.bfloat16)
    xb = xf.astype(jnp.bfloat16)
    y = jnp.einsum("oh,nhw->now", rh, xb, preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,now->nop", rw, y.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    trunc = np.asarray(y)

    # post-normalization (the tower's input): (v - 32767.5) / 32767.5
    err = np.abs(trunc - exact) / 32767.5
    assert err.max() < 1.2e-2, err.max()  # ~1% of the [-1, 1] range worst-case
    assert np.mean(err) < 6e-3, err.mean()


def test_encode_resize_precision_knob(tmp_path):
    """dataset.config.encode_resize_precision: validation + plumbed through
    parse_ingest_knobs ('highest' -> lax.Precision.HIGHEST; bad -> loud)."""
    import jax

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest.encode import parse_ingest_knobs

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.dataset.config["encode_resize"] = 64
    hw, method, prec, window, prepool = parse_ingest_knobs(cfg)
    assert hw == (64, 64) and prec is None and prepool == 0

    cfg.dataset.config["encode_resize_precision"] = "highest"
    _hw, _m, prec, _w, _p = parse_ingest_knobs(cfg)
    assert prec == jax.lax.Precision.HIGHEST

    cfg.dataset.config["encode_resize_precision"] = "bf16"
    with pytest.raises(ValueError, match="encode_resize_precision"):
        parse_ingest_knobs(cfg)

# ---------------------------------------------------------------------------
# host-prepool chain (encode_host_prepool): exact block sums on the host,
# block-mean resample on device — the PCIe lever of the north-star chain


def test_host_block_sum_exact_and_dtypes():
    from mmgclip_tpu.ops.resize import host_block_sum

    rng = np.random.default_rng(8)
    x8 = rng.integers(0, 256, (2, 10, 13), dtype=np.uint8)  # partial blocks
    s = host_block_sum(x8, 4)
    assert s.shape == (2, 3, 4) and s.dtype == np.uint16
    # exact integer sums incl. zero-padded partial edge blocks
    ref = np.zeros((2, 12, 16), np.uint32)
    ref[:, :10, :13] = x8
    ref = ref.reshape(2, 3, 4, 4, 4).sum(axis=(2, 4))
    np.testing.assert_array_equal(s.astype(np.uint32), ref)

    x16 = rng.integers(0, 65536, (1, 32, 32), dtype=np.uint16)
    s16 = host_block_sum(x16, 16)
    assert s16.dtype == np.uint32
    np.testing.assert_array_equal(
        s16, x16.astype(np.uint64).reshape(1, 2, 16, 2, 16).sum(axis=(2, 4)))

    with pytest.raises(ValueError, match="uint8/uint16"):
        host_block_sum(x8.astype(np.float32), 4)
    with pytest.raises(ValueError, match="block"):
        host_block_sum(x8, 32)


def test_prepool_resample_exact_on_block_constant_images():
    """For images constant within each k x k block the prepooled resample is
    EXACTLY the per-pixel area resample (the only approximation is
    within-block variation)."""
    from mmgclip_tpu.ops.resize import (host_block_sum,
                                        resize_to_canvas_from_block_sums)

    rng = np.random.default_rng(9)
    k, h, w = 4, 92, 76  # partial edge blocks (92=4*23, 76=4*19 exact; use odd)
    h, w = 90, 74
    blocks = rng.integers(0, 256, (1, -(-h // k), -(-w // k)), dtype=np.uint8)
    x = np.repeat(np.repeat(blocks, k, axis=1), k, axis=2)[:, :h, :w]

    exact, valid_exact = resize_to_canvas(jnp.asarray(x.astype(np.float32)), (32, 32))
    sums = host_block_sum(x, k)
    pre, valid_pre = resize_to_canvas_from_block_sums(
        jnp.asarray(sums), (h, w), (32, 32), k)
    np.testing.assert_array_equal(np.asarray(valid_exact), np.asarray(valid_pre))
    np.testing.assert_allclose(np.asarray(pre), np.asarray(exact), atol=2e-3)


def test_prepool_error_bound():
    """Random (worst-case-texture) images at a mammography-class downscale:
    the block-mean approximation error after full-range normalization stays
    small — the knob's fidelity basis (PARITY.md / PERF.md)."""
    from mmgclip_tpu.ops.resize import (host_block_sum,
                                        resize_to_canvas_from_block_sums)

    rng = np.random.default_rng(10)
    h, w, k = 574, 479, 4  # ~1/4-scale FFDM aspect; scale ~2.2 past prepool
    x = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
    exact, _ = resize_to_canvas(jnp.asarray(x.astype(np.float32)), (64, 64))
    pre, _ = resize_to_canvas_from_block_sums(
        jnp.asarray(host_block_sum(x, k)), (h, w), (64, 64), k)
    # both in source uint8 units; normalize to the tower's [-1, 1] domain
    err = np.abs(np.asarray(pre) - np.asarray(exact)) * (257.0 / 32767.5)
    assert err.max() < 0.15, err.max()
    assert err.mean() < 0.03, err.mean()


def test_encode_host_prepool_knob_validation():
    from mmgclip_tpu.config import compose
    from mmgclip_tpu.ingest.encode import parse_ingest_knobs

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.dataset.config["encode_host_prepool"] = 4
    with pytest.raises(ValueError, match="requires"):
        parse_ingest_knobs(cfg)  # prepool without resize
    cfg.dataset.config["encode_resize"] = 64
    *_rest, prepool = parse_ingest_knobs(cfg)
    assert prepool == 4
    cfg.dataset.config["encode_host_prepool"] = 32
    with pytest.raises(ValueError, match="encode_host_prepool"):
        parse_ingest_knobs(cfg)


def test_prepool_e2e_feature_store(tmp_path):
    """ImageFeatureExtractor with encode_resize + encode_host_prepool: the
    stored features equal a direct call of the SAME prepooled program
    (consistency), and stay close to the non-prepooled chain's features
    (the documented approximation)."""
    import pandas as pd
    from PIL import Image

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor

    rng = np.random.default_rng(11)
    paths = []
    # downscale factors >= k=4 (the knob's supported regime — a runtime
    # warning fires when blocks are coarser than the output grid) and
    # smooth low-frequency content + mild noise (mammography-like at this
    # scale; pure noise is the pixel-bound test's job above)
    for i, (h, w) in enumerate([(180, 148), (256, 256)]):
        yy, xx = np.mgrid[0:h, 0:w]
        img = (120 + 90 * np.sin(yy / 17.0) * np.cos(xx / 23.0)
               + rng.normal(0, 6, (h, w)))
        p = str(tmp_path / f"pp{i}.png")
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), mode="L").save(p)
        paths.append(p)

    def run(prepool, out):
        cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
        cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
        cfg.base.features_export_dir = str(tmp_path / out)
        cfg.dataset.config.encode_resize = [32, 32]
        if prepool:
            cfg.dataset.config.encode_host_prepool = prepool
        ex = ImageFeatureExtractor(config=cfg, dataset=pd.DataFrame({"image_path": paths}),
                                   batch_size=2)
        assert ex.extract() == 2
        feats = {}
        for r, _d, fs in os.walk(str(tmp_path / out)):
            for f in fs:
                if f.endswith(".npy"):
                    feats[f] = np.load(os.path.join(r, f))
        assert len(feats) == 2
        return feats, ex

    plain, _ = run(0, "plain")
    pre, ex = run(4, "pre")

    # consistency: store == direct program call on the same inputs
    from mmgclip_tpu.ops.resize import host_block_sum
    from mmgclip_tpu.ingest.png_reader import decode_png

    px = decode_png(paths[0])
    fn = ex._jitted["resized_fn"]
    direct = np.asarray(fn(jnp.asarray(host_block_sum(px[None], 4)),
                           native_hw=px.shape[:2]))
    np.testing.assert_allclose(pre["pp0.npy"].reshape(1, -1), direct, atol=1e-5)

    # approximation: prepooled features near the exact chain's
    for f in plain:
        a, b = plain[f].ravel(), pre[f].ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.98, (f, cos)

def test_prepool_warns_when_blocks_coarser_than_output(tmp_path, monkeypatch):
    """k greater than the downscale factor upscales block means — the
    extractor must say so (once per shape), naming the shapes."""
    import pandas as pd
    from PIL import Image

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor
    from mmgclip_tpu.ingest import encode as enc

    warnings = []
    monkeypatch.setattr(enc.logger, "warning",
                        lambda msg, *a: warnings.append(str(msg)))

    rng = np.random.default_rng(12)
    p = str(tmp_path / "small.png")
    Image.fromarray(rng.integers(0, 256, (48, 40), dtype=np.uint8), mode="L").save(p)

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.base.features_export_dir = str(tmp_path / "enc_warn")
    cfg.dataset.config.encode_resize = [32, 32]  # scale 1.5 < k=4
    cfg.dataset.config.encode_host_prepool = 4

    ex = ImageFeatureExtractor(config=cfg, dataset=pd.DataFrame({"image_path": [p]}),
                               batch_size=1)
    assert ex.extract() == 1
    assert any("exceeds the downscale factor" in w for w in warnings)
