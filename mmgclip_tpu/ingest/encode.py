"""Offline feature extraction: the throughput-critical ingest path.

The reference encodes one image per step — PIL decode, per-image host->device
transfer, one forward, one device->host copy, one file write
(reference: mmgclip/networks/image_features.py:87-117).  This rebuild:

* decodes on the host with a thread pool (C++ libpng shim when built,
  PIL fallback) overlapping the device;
* groups images into same-shape buckets and runs *batched* jitted forwards —
  intensity transform fused with the ConvNeXt tower in one XLA program, raw
  uint8 crossing the PCIe link instead of float32;
* double-buffers: batch N+1 decodes while batch N runs on device;
* writes one ``.npy`` per image mirroring the source tree, with the
  reference's skip-and-log failure contract (failed.txt).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..models.convnext import ConvNeXtConfig, init_convnext
from ..ops.fusion import fuse_views
from ..ops.preprocess import intensity_transform
from ..utils.logging import logger
from ..utils.seeding import create_directory_if_not_exists
from .png_reader import decode_png


def shard_items_for_host(items, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """Deterministic per-host slice of the work list (multi-host ingest).

    Each host walks the same sorted file list and takes every k-th item —
    ingest scales with hosts independently of chips (SCALING.md).  Defaults
    to this process's position in the jax runtime."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return [item for i, item in enumerate(items) if i % process_count == process_index]


def load_convnext_tower(config, seed: int = 0):
    """Build the ConvNeXt-Tiny tower, loading converted weights when present.

    The weight file is the ``.npz`` produced by tools/convert_convnext.py from
    the reference's TorchScript artifact; without it the tower initializes
    deterministically (features are then self-consistent but not
    reference-matching — fine for pipeline/throughput work)."""
    path = str(config.networks.image_encoder.convnext_tiny_clf_path or "")
    overrides = config.get_path("networks.image_encoder.config", {}) or {}
    cn_config = ConvNeXtConfig.micro() if overrides.get("micro") else ConvNeXtConfig.tiny()
    from dataclasses import replace

    if overrides.get("in_channels"):
        cn_config = replace(cn_config, in_channels=int(overrides["in_channels"]))
    if overrides.get("dtype"):
        # bf16 compute on the MXU halves HBM traffic for the encode tower;
        # params stay float32 on disk and cast per-op inside the blocks
        from ..models.clip import resolve_dtype

        cn_config = replace(cn_config, dtype=resolve_dtype(overrides["dtype"]))
    if overrides.get("quant"):
        # int8 pointwise convs (ops/quant.py): 2x MXU rate on v5e, feature
        # error bounded by tests/test_quant.py + the bench's recorded
        # int8_max_feature_rel_err
        cn_config = replace(cn_config, quant=str(overrides["quant"]))
        if not overrides.get("use_fused_blocks"):
            # measured on the real chip (PERF.md): UNFUSED int8 is a 0.96x
            # SLOWDOWN — dynamic quantization adds a VPU quantize pass and
            # extra HBM round trips without shrinking activation traffic.
            # int8 only pays inside the fused kernel, where the quantize /
            # dequantize stay VMEM-resident (fused_convnext_block_int8).
            logger.warning(
                "quant=int8 WITHOUT use_fused_blocks is a measured slowdown "
                "(0.96x vs bf16 on TPU v5e, PERF.md): the dynamic quantize "
                "pass costs more than the int8 MXU rate saves on the unfused "
                "path. Set networks.image_encoder.config.use_fused_blocks="
                "true (or use the clip_convnext_fused_bert presets) to get "
                "the in-kernel int8 path where int8 actually pays."
            )
    if overrides.get("use_fused_blocks"):
        # whole-block VMEM-resident Pallas kernel (ops/fused_block.py):
        # collapses the block's ~25 HBM element-passes to ~2 on real TPU;
        # falls back to the identical-math lax path off-TPU
        cn_config = replace(cn_config, use_fused_blocks=True)
    if overrides.get("fuse_downsample"):
        # LN+2x2/2 downsample as one kernel (ops/fused_downsample.py) —
        # opt-in: measured a wash on v5e (see ConvNeXtConfig docstring)
        cn_config = replace(cn_config, fuse_downsample=True)
    if overrides.get("fuse_stem"):
        # stem conv+LN as one kernel (ops/fused_stem.py)
        cn_config = replace(cn_config, fuse_stem=True)
    if ((overrides.get("fuse_stem") or overrides.get("fuse_downsample"))
            and not overrides.get("use_fused_blocks")):
        # the glue-kernel gates in models/convnext.py require
        # use_fused_blocks too (the glue kernels only pay alongside the
        # block kernel, and share its FORCE_INTERPRET plumbing) — without
        # it the knob is a silent no-op and any A/B "measuring" it
        # benchmarks the plain flax path
        logger.warning(
            "fuse_stem/fuse_downsample have no effect without "
            "use_fused_blocks=true: the glue kernels are gated on the "
            "fused-block path (models/convnext.py). Set networks."
            "image_encoder.config.use_fused_blocks=true (or use the "
            "clip_convnext_fused_* presets) to activate them."
        )
    if overrides.get("fuse_downsample") and overrides.get("use_fused_blocks") and (
        config.get_path("dataset.config.encode_resize", None)
        or config.get_path("dataset.config.encode_bucket_rounding", 0)
    ):
        # the fused downsample is additionally gated on `valid_hw is None`
        # (the per-image mask between LN and conv is not expressible in the
        # global-pad kernel) — and encode_resize / bucket rounding ALWAYS
        # run the masked tower path, so the knob would be a silent no-op
        logger.warning(
            "fuse_downsample has no effect on masked-tower encodes: "
            "encode_resize / encode_bucket_rounding run the valid_hw path, "
            "which keeps the flax downsample (models/convnext.py). The knob "
            "only applies to exact-shape unmasked encodes."
        )
    if overrides.get("gelu"):
        # "tanh" swaps the exact-erf GELU for the tanh approximation in
        # BOTH the fused kernel and the lax path (~3e-4 max abs error, an
        # order below bf16 resolution) — stages 0/1 are VPU-bound once
        # fused, and the 4C-wide GELU is the largest elementwise pass
        gelu = str(overrides["gelu"])
        if gelu not in ("exact", "tanh"):
            raise ValueError(
                "networks.image_encoder.config.gelu must be 'exact' or "
                f"'tanh', got {gelu!r}")
        cn_config = replace(cn_config, gelu=gelu)
    module, params = init_convnext(cn_config, seed=seed, image_size=64)
    if path and os.path.isfile(path) and path.endswith(".npz"):
        from flax import serialization

        with open(path, "rb") as fh:
            params = serialization.from_bytes(jax.device_get(params), fh.read())
        logger.info(f"Loaded ConvNeXt weights from {path}.")
        # from_bytes restores by TREE STRUCTURE, not shape: a converted
        # grayscale artifact (the reference's product ConvNeXt has a
        # 1-channel stem, tools/convert_convnext.py preserves it) loads
        # "successfully" into a 3-channel template and only explodes at
        # apply time.  The stored stem kernel is the source of truth —
        # adapt the tower config to it.
        stem_in = int(params["params"]["stem_conv"]["kernel"].shape[2])
        if stem_in != cn_config.in_channels:
            logger.info(
                f"Converted stem expects {stem_in} input channel(s); adapting "
                f"tower config (was {cn_config.in_channels})."
            )
            cn_config = replace(cn_config, in_channels=stem_in)
            module = type(module)(cn_config)  # apply() ignores in_channels, but
            # keep module.cfg truthful for anyone who reads it
    else:
        logger.warning(
            f"ConvNeXt weight file {path!r} not found; using deterministic random init."
        )
    return module, params, cn_config


def parse_ingest_knobs(config):
    """``dataset.config.encode_resize`` / ``encode_resize_method`` /
    ``encode_resize_precision`` / ``encode_window`` ->
    ``(resize_hw, resize_method, resize_precision, window)``.

    ONE parser for every consumer — the feature-store encode (_Encoder),
    serving (InferenceEngine) and generate_report — so online features
    always ride the SAME ingest chain the stored features were built with
    (a window/resize applied at training time but not at serving time would
    silently shift the input distribution)."""
    resize = config.get_path("dataset.config.encode_resize", None)
    if resize is None:
        resize_hw = None
    elif isinstance(resize, (list, tuple)):
        resize_hw = (int(resize[0]), int(resize[1]))
    else:
        resize_hw = (int(resize), int(resize))
    resize_method = str(
        config.get_path("dataset.config.encode_resize_method", "area") or "area")
    # "default" = single bf16 MXU pass (fast; truncation bounded by
    # tests/test_resize.py); "highest" = oracle-exact fp32 on TPU at ~6
    # passes per matmul.  See ops/resize.py::resize2d.
    precision = str(
        config.get_path("dataset.config.encode_resize_precision", "default")
        or "default")
    if precision not in ("default", "highest"):
        raise ValueError(
            "dataset.config.encode_resize_precision must be 'default' or "
            f"'highest', got {precision!r}")
    resize_precision = jax.lax.Precision.HIGHEST if precision == "highest" else None
    window = config.get_path("dataset.config.encode_window", None)
    window = (float(window[0]), float(window[1])) if window else None
    # host-side exact k x k block-sum prepool (ops/resize.py::host_block_sum):
    # cuts host-link bytes ~k^2/2 for uint8 sources; the device resamples the
    # block-MEAN image exactly.  Requires encode_resize (it IS a resample
    # front half); 0 = off (default — reference parity).
    prepool = int(config.get_path("dataset.config.encode_host_prepool", 0) or 0)
    if prepool:
        if not 2 <= prepool <= 16:
            raise ValueError(
                "dataset.config.encode_host_prepool must be in [2, 16] "
                f"(block sums must fit uint16/uint32), got {prepool}")
        if resize_hw is None:
            raise ValueError(
                "dataset.config.encode_host_prepool requires "
                "dataset.config.encode_resize: the prepool is the host half "
                "of the resample chain and has no meaning at native "
                "resolution (the tower would see block means, not pixels)")
    return resize_hw, resize_method, resize_precision, window, prepool


def build_encode_program(module, params, in_ch: int, window=None,
                         resize_hw=None, resize_method: str = "area",
                         resize_precision=None, prepool: int = 0):
    """The jitted ``[n, H, W] uint8/uint16 -> [n, d] features`` program.

    Without ``resize_hw``: intensity transform (optionally windowed) fused
    with the tower in one XLA program.  With it: the north-star ingest chain
    — raw pixels -> aspect-preserving resample onto the canvas
    (ops/resize.py, two MXU matmuls) -> intensity windowing ->
    normalization -> the tower's EXACT masked-encode path (``valid_hw``).
    Shared by the feature store, serving and generate_report (see
    parse_ingest_knobs).

    With ``prepool`` k > 0 (requires ``resize_hw``): the returned program
    takes ``[n, ceil(H/k), ceil(W/k)]`` integer block SUMS
    (ops/resize.py::host_block_sum) plus the static ``native_hw`` keyword —
    the sum dtype carries the source scale (uint16 = 8-bit source, 257x;
    uint32 = 16-bit source) — and resamples the block-mean image with
    exactly-aggregated weights.  Callers prepool on the host BEFORE the
    transfer; that is the point: the host link carries ~2 bytes per k^2
    pixels."""
    if resize_hw is None:

        @jax.jit
        def encode(pixels_u8):  # [n, H, W] uint8/uint16
            x = intensity_transform(pixels_u8, window=window)[..., None]
            if in_ch > 1:
                x = jnp.repeat(x, in_ch, axis=-1)
            return module.apply(params, x)  # pooled [n, d]

        return encode

    from ..models.convnext import _valid_mask
    from ..ops.preprocess import normalize_16bit, to_16bit
    from ..ops.resize import resize_to_canvas, resize_to_canvas_from_block_sums

    if prepool:
        import functools

        @functools.partial(jax.jit, static_argnames=("native_hw",))
        def encode_prepooled(block_sums, *, native_hw):
            # block sums are in SOURCE intensity units; scale to the 16-bit
            # domain per the sum dtype (uint16 <=> uint8 source, x257 like
            # to_16bit; uint32 <=> uint16 source, already 16-bit)
            scale = 257.0 if block_sums.dtype == jnp.uint16 else 1.0
            y, valid_hw = resize_to_canvas_from_block_sums(
                block_sums, native_hw, resize_hw, prepool,
                method=resize_method, precision=resize_precision)
            x = normalize_16bit(y * scale, window=window)[..., None]
            x = x * _valid_mask(x, valid_hw)
            if in_ch > 1:
                x = jnp.repeat(x, in_ch, axis=-1)
            return module.apply(params, x, valid_hw=valid_hw)

        return encode_prepooled

    @jax.jit
    def encode(pixels_u8):  # [n, H, W] uint8/uint16, any native shape
        raw = to_16bit(pixels_u8)
        y, valid_hw = resize_to_canvas(raw, resize_hw, method=resize_method,
                                       precision=resize_precision)
        x = normalize_16bit(y, window=window)[..., None]
        # zero the canvas pad AFTER normalization (raw zeros map to -1,
        # a strong signal) — the masked-tower convention
        x = x * _valid_mask(x, valid_hw)
        if in_ch > 1:
            x = jnp.repeat(x, in_ch, axis=-1)
        return module.apply(params, x, valid_hw=valid_hw)

    return encode


class _Encoder:
    """Shared batched-encode machinery for image- and study-level extractors.

    Multi-chip: when more than one device is visible, batches shard over a
    ``data`` mesh axis (per-host file sharding composes on top — each host
    simply runs its own extractor over its slice of the file list)."""

    def __init__(self, config, batch_size: int = 32, decode_threads: int = 8, bucket_rounding: int = 0):
        self.config = config
        self.batch_size = int(batch_size)
        self.decode_threads = int(decode_threads)
        # >0: round image shapes up to multiples of this, encode padded with
        # masked pooling — bounds the number of shape buckets (and XLA
        # compilations) when every image has a unique resolution
        self.bucket_rounding = int(
            config.get_path("dataset.config.encode_bucket_rounding", bucket_rounding) or bucket_rounding
        )
        # device-side ingest stages (the north-star fused chain: decode ->
        # crop/pad -> RESIZE -> INTENSITY WINDOWING -> normalization).  The
        # reference resizes nothing (image_features.py:28, ToTensor only) —
        # both knobs are off by default and PARITY.md documents them.
        (self.resize_hw, self.resize_method, self.resize_precision,
         self.window, self.prepool) = parse_ingest_knobs(config)
        if self.resize_hw and self.bucket_rounding:
            # resize already maps every image onto ONE output canvas; input
            # buckets stay exact-shape so each native resolution gets exact
            # (aspect-preserving) resample weights
            logger.info("encode_resize set: ignoring encode_bucket_rounding "
                        "(resize buckets by exact native shape).")
            self.bucket_rounding = 0
        self.module, self.params, self.cn_config = load_convnext_tower(config)
        self._jitted: Dict = {}
        self._prepool_warned: set = set()  # one k-vs-scale warning per shape

        # LOCAL devices only: each process feeds host-local pixel batches
        # (files already sharded per host by shard_items_for_host), and a
        # mesh spanning other hosts' non-addressable chips would make
        # device_put raise — the per-host pattern parallel/multihost.py uses
        n_devices = len(jax.local_devices())
        self._mesh = None
        if n_devices > 1:
            from ..parallel.mesh import batch_sharding, create_mesh

            self._mesh = create_mesh(data=n_devices, model=1,
                                     devices=jax.local_devices())
            self._sharding = batch_sharding(self._mesh)
            # round batches up so they split evenly over the data axis
            self.batch_size = max(self.batch_size, n_devices)
            self.batch_size -= self.batch_size % n_devices
            logger.info(f"Encode pipeline sharded over {n_devices} local devices.")

    def _encode_fn(self):
        return build_encode_program(
            self.module, self.params, self.cn_config.in_channels, window=self.window
        )

    def _resized_encode_fn(self):
        """The fused native-res ingest program: raw uint8 crosses PCIe, then
        resize -> intensity windowing -> normalization -> tower run as ONE
        XLA program per native input shape.

        The aspect-preserving resample lands each image top-left on the
        fixed canvas (ops/resize.py::resize_to_canvas) and the tower runs
        its EXACT masked-encode path (``valid_hw``) over the result — the
        same contract bucket rounding uses, so features are invariant to
        which other shapes share the canvas.  This is the physical route to
        the north-star throughput at native input sizes: the tower runs at
        canvas FLOPs (e.g. the measured 256/512-class rates) regardless of
        the 2294x1914-class source resolution, and the resample itself is
        two MXU matmuls."""
        return build_encode_program(
            self.module, self.params, self.cn_config.in_channels,
            window=self.window, resize_hw=self.resize_hw,
            resize_method=self.resize_method,
            resize_precision=self.resize_precision,
            prepool=self.prepool,
        )

    def _masked_encode_fn(self):
        """Encode zero-padded canvases EXACTLY as if each image ran at its
        own shape.

        Used by bucket rounding: rounding shapes up to a shared canvas bounds
        the number of XLA compilations when every mammogram has a unique
        resolution (see SCALING.md).  The tower (models/convnext.py
        ``valid_hw`` path) re-zeroes the pad region at every spatial-mixing
        boundary, making the canvas padding indistinguishable from the SAME
        padding an exact-shape run injects — features match the per-shape
        encode to float tolerance (tests/test_bucket_rounding.py).
        valid_hw: [n, 2] valid (H, W) per image."""
        module, params, in_ch = self.module, self.params, self.cn_config.in_channels
        window = self.window

        from ..models.convnext import _valid_mask

        @jax.jit
        def encode(pixels_u8, valid_hw):
            x = intensity_transform(pixels_u8, window=window)[..., None]
            # zero the pad region AFTER the transform: raw uint8 zeros map to
            # -1.0 (a strong signal); the exact-shape run has no pixels there.
            # Same masking convention as the tower's valid_hw path — shared
            # on purpose so the pre-mask can't drift from the in-tower one
            x = x * _valid_mask(x, valid_hw)
            if in_ch > 1:
                x = jnp.repeat(x, in_ch, axis=-1)
            return module.apply(params, x, valid_hw=valid_hw)

        return encode

    def _to_device(self, pixels: np.ndarray):
        """Host batch -> (device array, valid count), padded to shard evenly."""
        n = pixels.shape[0]
        if self._mesh is None:
            return jnp.asarray(pixels), n
        shards = self._mesh.devices.size
        padded_n = -(-n // shards) * shards
        if padded_n != n:
            pad = np.zeros((padded_n - n, *pixels.shape[1:]), pixels.dtype)
            pixels = np.concatenate([pixels, pad], axis=0)
        # device_put straight from the host buffer: jnp.asarray first would
        # land the whole batch on the default device before the sharded
        # placement (a redundant H2D of every byte).  Local mesh only, so
        # plain device_put is pod-safe (items are pre-sharded per host).
        return jax.device_put(pixels, self._sharding), n

    def encode_batches(self, items: List[Tuple[str, str]], on_result, failed_path: str):
        """items: (source_path, export_key).  Decoded on a thread pool,
        bucketed by shape, encoded in jitted batches; ``on_result(key, vec)``
        per image."""
        rounding = self.bucket_rounding
        if self.resize_hw:
            encode = self._jitted.setdefault("resized_fn", self._resized_encode_fn())
        elif rounding:
            encode = self._jitted.setdefault("masked_fn", self._masked_encode_fn())
        else:
            encode = self._jitted.setdefault("fn", self._encode_fn())
        buckets: Dict[Tuple[int, int], List[Tuple[str, np.ndarray]]] = defaultdict(list)

        from concurrent.futures import ThreadPoolExecutor

        # two-deep device pipeline (double-buffered): device_put and jit
        # dispatch are async, so batch N+1's H2D transfer is issued — and
        # rides the DMA path — while batch N computes; the blocking D2H
        # drain of batch N-1 happens only after N+1's transfer AND compute
        # are both in flight
        pending: List = []  # [(chunk, device_result, valid)]

        def drain_one():
            chunk, result, valid = pending.pop(0)
            feats = np.asarray(result)[:valid]
            for (key, _), vec in zip(chunk, feats):
                on_result(key, vec)

        def drain():
            while pending:
                drain_one()

        def submit(chunk, shape):
            if rounding:
                valid_hw = np.asarray([arr.shape[:2] for _k, arr in chunk], np.int32)
                canvas_hw = shape[:2]  # bucket key is (H, W, dtype-str)
                pixels = np.zeros((len(chunk), *canvas_hw), chunk[0][1].dtype)
                for i, (_k, arr) in enumerate(chunk):
                    pixels[i, : arr.shape[0], : arr.shape[1]] = arr
                device_pixels, valid = self._to_device(pixels)  # async H2D
                pad = device_pixels.shape[0] - len(chunk)
                if pad:
                    valid_hw = np.concatenate([valid_hw, np.ones((pad, 2), np.int32)])
                result = encode(device_pixels, jnp.asarray(valid_hw))
            else:
                pixels = np.stack([arr for _k, arr in chunk])
                if self.resize_hw and self.prepool:
                    # host half of the prepooled chain: the transfer carries
                    # 2 bytes per k^2 pixels (ops/resize.py::host_block_sum);
                    # the jitted program resamples the block means exactly
                    from ..ops.resize import fit_shape, host_block_sum

                    vh, vw = fit_shape(pixels.shape[1:3], self.resize_hw)
                    scale = min(pixels.shape[1] / vh, pixels.shape[2] / vw)
                    if self.prepool > scale and shape not in self._prepool_warned:
                        # blocks coarser than the output grid: the resample
                        # upscales block means — real fidelity loss, not the
                        # bounded antialias approximation
                        self._prepool_warned.add(shape)
                        logger.warning(
                            f"encode_host_prepool={self.prepool} exceeds the "
                            f"downscale factor {scale:.2f} for native shape "
                            f"{pixels.shape[1:3]} -> {self.resize_hw}: output "
                            "cells are finer than the prepool blocks, features "
                            "degrade beyond the documented bound. Use a "
                            "smaller block (k <= downscale factor)."
                        )
                    sums = host_block_sum(pixels, self.prepool)
                    device_sums, valid = self._to_device(sums)  # async H2D
                    result = encode(device_sums, native_hw=tuple(int(d) for d in pixels.shape[1:3]))
                else:
                    device_pixels, valid = self._to_device(pixels)  # async H2D
                    result = encode(device_pixels)
            pending.append((chunk, result, valid))
            while len(pending) > 2:
                drain_one()  # convert older batches while this one runs

        def flush(shape):
            bucket = buckets.pop(shape)
            for start in range(0, len(bucket), self.batch_size):
                submit(bucket[start : start + self.batch_size], shape)

        def bucket_shape(pixels):
            # dtype is part of the key: np.stack would silently promote a
            # mixed uint8/uint16 bucket to uint16, and the intensity
            # transform branches on dtype (8-bit pixels would normalize as
            # if 16-bit -> near-constant -1 images, garbage features)
            if not rounding:
                return (*pixels.shape[:2], pixels.dtype.str)
            return (
                *(-(-dim // rounding) * rounding for dim in pixels.shape[:2]),
                pixels.dtype.str,
            )

        with ThreadPoolExecutor(max_workers=self.decode_threads) as pool:
            # bounded in-flight window — Executor.map submits every item
            # eagerly, which would buffer the whole dataset's decoded pixels
            # (full-res mammograms) when the device side is the bottleneck
            from collections import deque

            window = max(2 * self.batch_size, 2 * self.decode_threads)
            inflight: deque = deque()
            item_iter = iter(items)

            def refill():
                while len(inflight) < window:
                    try:
                        item = item_iter.__next__()
                    except StopIteration:
                        return
                    inflight.append(
                        (item, pool.submit(self._safe_decode, item[0], failed_path))
                    )

            refill()
            while inflight:
                (_src, key), future = inflight.popleft()
                pixels = future.result()
                refill()  # keep the decode window full while we consume
                if pixels is None:
                    continue
                shape = bucket_shape(pixels)
                buckets[shape].append((key, pixels))
                if len(buckets[shape]) >= self.batch_size:
                    flush(shape)
        for shape in list(buckets):
            flush(shape)
        drain()

    @staticmethod
    def _safe_decode(path: str, failed_path: str) -> Optional[np.ndarray]:
        try:
            return decode_png(path)
        except Exception as exc:
            with open(failed_path, "a") as fh:
                fh.write(path + "\n" + str(exc) + "\n\n")
            return None


class ImageFeatureExtractor(_Encoder):
    """Per-image 768-d feature export (reference: image_features.py:11-122)."""

    def __init__(self, config=None, dataset: Optional[pd.DataFrame] = None, batch_size: int = 32):
        assert config is not None, "Missing config object."
        super().__init__(config, batch_size=batch_size)
        if not isinstance(dataset, pd.DataFrame):
            raise ValueError("Pass the annotation DataFrame from create_dataset_df.")
        self.dataset = dataset
        self.export_dir = create_directory_if_not_exists(config.base.features_export_dir)

    def _export_path(self, image_path: str) -> str:
        tail = image_path.split("2D_100micron/")[-1]
        if os.path.isabs(tail):  # no marker in path: mirror last 4 components
            tail = os.path.join(*image_path.strip(os.sep).split(os.sep)[-4:])
        # whole-path replace (not just the extension) is DELIBERATE parity
        # with the reference's export convention
        # (reference: mmgclip/networks/image_features.py:108 does
        # .replace('.png', '.pth') on the full path) — a directory name
        # containing '.png' mangles identically on both sides, keeping
        # stored layouts interchangeable
        return os.path.join(self.export_dir, tail).replace(".png", ".npy")

    def extract(self) -> int:
        logger.info(f"Extracting features into {self.export_dir}.")
        failed = os.path.join(self.export_dir, "failed.txt")
        items = [(row["image_path"], self._export_path(row["image_path"])) for _, row in self.dataset.iterrows()]
        items = shard_items_for_host(items)
        count = 0

        def save(key: str, vec: np.ndarray):
            nonlocal count
            os.makedirs(os.path.dirname(key), exist_ok=True)
            # store as [1, 768, 1, 1] matching the reference's layout
            np.save(key, vec.reshape(1, -1, 1, 1).astype(np.float32))
            count += 1

        self.encode_batches(items, save, failed)
        logger.info(f"Encoded {count}/{len(items)} images.")
        return count


class StudyFeatureExtractor(_Encoder):
    """Per-study fused features (reference: image_features.py:126-265)."""

    def __init__(self, config=None, dataset: Optional[pd.DataFrame] = None, batch_size: int = 32):
        assert config is not None, "Missing config object."
        super().__init__(config, batch_size=batch_size)
        if not isinstance(dataset, pd.DataFrame) or "study_path" not in dataset.columns:
            raise ValueError("Pass a DataFrame with a `study_path` column.")
        self.dataset = dataset
        self.export_dir = config.base.features_export_dir

    def extract(self) -> int:
        method = self.config.dataset.config.concatenate_features_method
        n_views = int(self.config.dataset.config.n_images_per_study)
        logger.info(f"Concatenating {n_views} images per study using {method}.")
        failed = os.path.join(create_directory_if_not_exists(self.export_dir), "failed.txt")

        # enumerate all (view_path, study_key) pairs, batch-encode through the
        # shared shape-bucketed pipeline, then fuse per study.  Multi-host:
        # shard at STUDY granularity (a study's views must stay on one host
        # for the fusion step)
        items: List[Tuple[str, str]] = []
        study_paths: List[str] = []
        rows = shard_items_for_host([row for _, row in self.dataset.iterrows()])
        for row in rows:
            study_path = row["study_path"]
            try:
                views = sorted(os.listdir(study_path))[:n_views]
            except Exception as exc:
                with open(failed, "a") as fh:
                    fh.write(str(study_path) + "\n" + str(exc) + "\n\n")
                continue
            study_paths.append(study_path)
            for view in views:
                view_path = os.path.join(study_path, view)
                items.append((view_path, f"{study_path}\x00{view_path}"))

        view_vectors: Dict[str, Dict[str, np.ndarray]] = defaultdict(dict)

        def collect(key: str, vec: np.ndarray):
            study_path, view_path = key.split("\x00")
            view_vectors[study_path][view_path] = vec

        self.encode_batches(items, collect, failed)

        count = 0
        for study_path in study_paths:
            per_view = view_vectors.get(study_path)
            if not per_view:
                continue
            try:
                stack = np.stack([per_view[k] for k in sorted(per_view)])
                fused = np.asarray(fuse_views(jnp.asarray(stack), method))

                tail = study_path.split("2D_100micron/")[-1]
                if os.path.isabs(tail):
                    tail = os.path.join(*study_path.strip(os.sep).split(os.sep)[-3:])
                patient_id = next(
                    (part for part in study_path.split(os.sep) if part.isdigit() and len(part) == 8), "study"
                )
                out = os.path.join(self.export_dir, tail, f"{patient_id}.npy")
                os.makedirs(os.path.dirname(out), exist_ok=True)
                np.save(out, fused.astype(np.float32))
                count += 1
            except Exception as exc:
                with open(failed, "a") as fh:
                    fh.write(str(study_path) + "\n" + str(exc) + "\n\n")
        return count


# lower-case aliases kept for facade parity (reference: image_features.py:267-268)
image_feature_extractor = ImageFeatureExtractor
study_feature_extractor = StudyFeatureExtractor
