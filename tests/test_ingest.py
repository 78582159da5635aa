import os
import subprocess

import numpy as np
import pytest

from mmgclip_tpu.ingest.png_reader import decode_png, _load_native
from fixtures import write_png

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_decode_png_8bit_matches_pil(tmp_path):
    from PIL import Image

    path = str(tmp_path / "g.png")
    write_png(path, size=40, seed=1)
    arr = decode_png(path)
    ref = np.asarray(Image.open(path))
    assert arr.dtype == np.uint8
    np.testing.assert_array_equal(arr, ref)


def test_decode_png_16bit(tmp_path):
    from PIL import Image

    path = str(tmp_path / "g16.png")
    data = np.random.default_rng(0).integers(0, 65535, (24, 24)).astype(np.uint16)
    Image.fromarray(data).save(path)
    arr = decode_png(path)
    assert arr.dtype == np.uint16
    np.testing.assert_array_equal(arr.astype(np.uint16), data)


def test_native_shim_builds_and_decodes(tmp_path):
    """Build the C++ shim if absent, verify byte-identical decode vs PIL."""
    so_path = os.path.join(REPO, "native", "libmmg_png.so")
    if not os.path.isfile(so_path):
        result = subprocess.run(["make", "-C", os.path.join(REPO, "native")], capture_output=True)
        if result.returncode != 0:
            pytest.skip(f"native build unavailable: {result.stderr.decode()[:200]}")
    lib = _load_native()
    if lib is None:
        pytest.skip("native lib not loadable")

    from PIL import Image

    path = str(tmp_path / "n.png")
    write_png(path, size=33, seed=2)  # odd size exercises row handling
    arr = decode_png(path)
    ref = np.asarray(Image.open(path))
    np.testing.assert_array_equal(arr, ref)


def test_native_color_decode_matches_pil(tmp_path):
    """COLOR input parity (review r4): the native shim grays RGB with the
    same ITU-R 601 weights PIL's convert('L') uses — libpng's default
    coefficients would silently skew cached features for color inputs
    depending on whether the .so is present.  Tolerance 1 LSB for the two
    libraries' rounding."""
    lib = _load_native()
    if lib is None:
        pytest.skip("native lib not loadable")
    from PIL import Image

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    path = str(tmp_path / "c.png")
    Image.fromarray(rgb, mode="RGB").save(path)
    native_arr = decode_png(path)
    pil_arr = np.asarray(Image.open(path).convert("L"))
    assert native_arr.shape == pil_arr.shape
    diff = np.abs(native_arr.astype(np.int32) - pil_arr.astype(np.int32))
    assert diff.max() <= 1, f"max gray diff {diff.max()}"


def test_native_wordpiece_rejects_degenerate_max_len():
    """max_len < 2 can't hold [CLS]+[SEP]: the shim must return an error
    code (Python falls back), not underflow resize() and abort the process."""
    from mmgclip_tpu.data.native_wordpiece import NativeWordPiece, native_available

    if not native_available():
        pytest.skip("native wordpiece unavailable")
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "hi": 4}
    enc = NativeWordPiece(vocab)
    assert enc.encode_batch(["hi"], 0) is None
    assert enc.encode_batch(["hi"], 1) is None
    out = enc.encode_batch(["hi"], 4)
    assert out is not None


def test_decode_missing_file_raises(tmp_path):
    with pytest.raises(Exception):
        decode_png(str(tmp_path / "nope.png"))


def test_graft_entry_contract():
    import sys

    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    fn, args = g.entry()
    import jax

    loss, logits = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert logits.shape[0] == logits.shape[1]


def test_dryrun_multichip_8():
    import sys

    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bucket_rounding_encode(tmp_path):
    """Ragged image sizes collapse into rounded buckets; masked pooling
    matches the exact-shape encode for an unpadded image."""
    import numpy as np
    import pandas as pd

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor

    CONFIG_DIR = os.path.join(REPO, "configs")
    cfg = compose(CONFIG_DIR, "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.base.features_export_dir = str(tmp_path / "enc")
    cfg.dataset.config.encode_bucket_rounding = 64

    # ragged sizes: 50x60, 62x44, 64x64 -> buckets (64,64)
    paths = []
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate([(50, 60), (62, 44), (64, 64)]):
        from PIL import Image

        p = str(tmp_path / f"r{i}.png")
        Image.fromarray(rng.integers(0, 256, (h, w), dtype=np.uint8), mode="L").save(p)
        paths.append(p)
    df = pd.DataFrame({"image_path": paths})

    extractor = ImageFeatureExtractor(config=cfg, dataset=df, batch_size=4)
    assert extractor.bucket_rounding == 64
    count = extractor.extract()
    assert count == 3

    # the already-aligned 64x64 image must match the exact (unmasked) encode
    import jax.numpy as jnp

    from mmgclip_tpu.ingest.png_reader import decode_png

    exact = np.asarray(extractor._encode_fn()(jnp.asarray(decode_png(paths[2])[None])))
    feats = np.load(os.path.join(str(tmp_path / "enc"), *paths[2].strip(os.sep).split(os.sep)[-4:]).replace(".png", ".npy"))
    np.testing.assert_allclose(feats.reshape(1, -1), exact, atol=1e-4)


def test_shard_items_for_host():
    from mmgclip_tpu.ingest import shard_items_for_host

    items = list(range(10))
    shards = [shard_items_for_host(items, process_index=i, process_count=3) for i in range(3)]
    assert sorted(sum(shards, [])) == items  # complete, disjoint partition
    assert all(len(s) in (3, 4) for s in shards)
    # single-process default covers everything
    assert shard_items_for_host(items) == items


def test_mixed_dtype_buckets_do_not_mix(tmp_path):
    """Same-shape 8-bit and 16-bit PNGs must encode in SEPARATE buckets:
    np.stack would promote uint8 to uint16 without rescaling and the
    intensity transform would normalize 0-255 values as if 16-bit
    (near-constant -1 input, silently garbage features)."""
    import jax.numpy as jnp
    import pandas as pd
    from PIL import Image

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor
    from mmgclip_tpu.ingest.png_reader import decode_png

    CONFIG_DIR = os.path.join(REPO, "configs")
    cfg = compose(CONFIG_DIR, "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.base.features_export_dir = str(tmp_path / "enc")

    rng = np.random.default_rng(0)
    p8 = str(tmp_path / "img8.png")
    p16 = str(tmp_path / "img16.png")
    Image.fromarray(rng.integers(0, 256, (48, 48), dtype=np.uint8), mode="L").save(p8)
    Image.fromarray(rng.integers(0, 65535, (48, 48)).astype(np.uint16)).save(p16)

    extractor = ImageFeatureExtractor(
        config=cfg, dataset=pd.DataFrame({"image_path": [p8, p16]}), batch_size=4
    )
    assert extractor.extract() == 2

    encode = extractor._encode_fn()

    def stored(path):
        out = os.path.join(
            str(tmp_path / "enc"), *path.strip(os.sep).split(os.sep)[-4:]
        ).replace(".png", ".npy")
        return np.load(out).reshape(1, -1)

    for path in (p8, p16):
        solo = np.asarray(encode(jnp.asarray(decode_png(path)[None])))
        np.testing.assert_allclose(stored(path), solo, atol=1e-4)


def test_native_decode_gray_with_trns(tmp_path):
    """Gray PNG with a tRNS transparency chunk: tRNS_to_alpha adds a channel
    that must be stripped even though gray lacks the alpha mask bit."""
    import ctypes

    from PIL import Image

    so_path = os.path.join(REPO, "native", "libmmg_png.so")
    if not os.path.isfile(so_path):
        pytest.skip("native shim not built")

    path = str(tmp_path / "trns.png")
    data = np.random.default_rng(0).integers(0, 256, (16, 16), dtype=np.uint8)
    img = Image.fromarray(data, mode="L")
    img.save(path, transparency=0)  # adds a tRNS chunk

    arr = decode_png(path)
    assert arr.shape == (16, 16)

    lib = _load_native()
    if lib is None:
        pytest.skip("native shim unavailable")
    width = ctypes.c_int(0)
    height = ctypes.c_int(0)
    depth = ctypes.c_int(0)
    assert lib.mmg_png_read_info(path.encode(), ctypes.byref(width), ctypes.byref(height), ctypes.byref(depth)) == 0
    out = np.zeros((16, 16), np.uint8)
    rc = lib.mmg_png_decode_gray(path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
    assert rc == 0, f"native decode failed rc={rc}"
    np.testing.assert_array_equal(out, data)


def test_int8_quant_encode_config_knob(tmp_path):
    """networks.image_encoder.config.quant=int8 reaches the real encode
    pipeline (not just the bench): features stay close to the fp tower."""
    import numpy as np
    import pandas as pd
    from PIL import Image

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.base.features_export_dir = str(tmp_path / "fp")

    rng = np.random.default_rng(0)
    p = str(tmp_path / "img.png")
    Image.fromarray(rng.integers(0, 256, (32, 32), dtype=np.uint8), mode="L").save(p)
    df = pd.DataFrame({"image_path": [p]})

    ImageFeatureExtractor(config=cfg, dataset=df, batch_size=2).extract()
    rel = os.path.join(*p.strip(os.sep).split(os.sep)[-4:]).replace(".png", ".npy")
    fp_feats = np.load(os.path.join(str(tmp_path / "fp"), rel)).ravel()

    cfg.networks.image_encoder.config.quant = "int8"
    cfg.base.features_export_dir = str(tmp_path / "q8")
    extractor = ImageFeatureExtractor(config=cfg, dataset=df, batch_size=2)
    assert extractor.cn_config.quant == "int8"
    extractor.extract()
    q8_feats = np.load(os.path.join(str(tmp_path / "q8"), rel)).ravel()

    cos = float(np.dot(fp_feats, q8_feats) / (np.linalg.norm(fp_feats) * np.linalg.norm(q8_feats)))
    assert cos > 0.99
    assert not np.array_equal(fp_feats, q8_feats)  # the int8 path really ran


def test_fused_blocks_encode_config_knob(tmp_path):
    """networks.image_encoder.config.use_fused_blocks reaches the real encode
    pipeline (not just the bench): the whole-block Pallas kernel
    (interpret-forced on this CPU backend) produces the fp tower's features."""
    import numpy as np
    import pandas as pd
    from PIL import Image

    from mmgclip_tpu.config import Config, compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor
    from mmgclip_tpu.ops import fused_block

    cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf")
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.base.features_export_dir = str(tmp_path / "fp")

    rng = np.random.default_rng(0)
    p = str(tmp_path / "img.png")
    Image.fromarray(rng.integers(0, 256, (32, 32), dtype=np.uint8), mode="L").save(p)
    df = pd.DataFrame({"image_path": [p]})

    ImageFeatureExtractor(config=cfg, dataset=df, batch_size=2).extract()
    rel = os.path.join(*p.strip(os.sep).split(os.sep)[-4:]).replace(".png", ".npy")
    fp_feats = np.load(os.path.join(str(tmp_path / "fp"), rel)).ravel()

    cfg.networks.image_encoder.config.use_fused_blocks = True
    cfg.base.features_export_dir = str(tmp_path / "fused")
    extractor = ImageFeatureExtractor(config=cfg, dataset=df, batch_size=2)
    assert extractor.cn_config.use_fused_blocks is True
    old = fused_block.FORCE_INTERPRET
    fused_block.FORCE_INTERPRET = True  # drive the REAL kernel on this CPU backend
    try:
        extractor.extract()
    finally:
        fused_block.FORCE_INTERPRET = old
    fused_feats = np.load(os.path.join(str(tmp_path / "fused"), rel)).ravel()

    np.testing.assert_allclose(fused_feats, fp_feats, atol=2e-3, rtol=2e-3)


def test_fused_tanh_preset_encode_end_to_end(tmp_path):
    """The `networks=clip_convnext_fused_tanh_bert` preset (the fastest
    measured tower) drives the REAL fused kernel with the tanh GELU through
    the product encode pipeline: features stay within the approximation
    budget of the exact-GELU fp tower and are not byte-identical (the tanh
    math really ran)."""
    import numpy as np
    import pandas as pd
    from PIL import Image

    from mmgclip_tpu.config import compose
    from mmgclip_tpu.ingest import ImageFeatureExtractor
    from mmgclip_tpu.ops import fused_block

    rng = np.random.default_rng(3)
    p = str(tmp_path / "img.png")
    Image.fromarray(rng.integers(0, 256, (32, 32), dtype=np.uint8), mode="L").save(p)
    df = pd.DataFrame({"image_path": [p]})
    rel = os.path.join(*p.strip(os.sep).split(os.sep)[-4:]).replace(".png", ".npy")

    def run(preset_overrides, out):
        cfg = compose(os.path.join(REPO, "configs"), "train_binary_class_clf",
                      overrides=preset_overrides)
        if "config" not in cfg.networks.image_encoder:
            from mmgclip_tpu.config import Config
            cfg.networks.image_encoder.config = Config({})
        cfg.networks.image_encoder.config.micro = True
        cfg.networks.image_encoder.config.in_channels = 1
        cfg.networks.image_encoder.config.dtype = "float32"
        cfg.networks.image_encoder.convnext_tiny_clf_path = ""
        cfg.base.features_export_dir = str(tmp_path / out)
        extractor = ImageFeatureExtractor(config=cfg, dataset=df, batch_size=2)
        extractor.extract()
        return extractor, np.load(os.path.join(str(tmp_path / out), rel)).ravel()

    _, exact = run([], "exact")

    old = fused_block.FORCE_INTERPRET
    fused_block.FORCE_INTERPRET = True  # the REAL kernel on this CPU backend
    try:
        extractor, tanh_feats = run(["networks=clip_convnext_fused_tanh_bert"], "tanh")
    finally:
        fused_block.FORCE_INTERPRET = old
    assert extractor.cn_config.use_fused_blocks is True
    assert extractor.cn_config.gelu == "tanh"

    cos = float(np.dot(exact, tanh_feats)
                / (np.linalg.norm(exact) * np.linalg.norm(tanh_feats)))
    assert cos > 0.999
    assert not np.array_equal(exact, tanh_feats)
