"""Batch inference engine for production serving.

The reference has no serving path — inference means re-running evaluation
scripts.  This engine loads everything once — trained CLIP head, frozen text
tower, ConvNeXt encode tower — keeps prompt-bank embeddings and the jitted
encode/classify programs warm, and serves three operations:

* ``encode``   : image paths -> 768-d features (shape-bucketed batches);
* ``classify`` : zero-shot classification of features/paths against an
                 arbitrary prompt list (cached per prompt tuple);
* ``report``   : structured BI-RADS report per image/exam (one-device-call
                 cascade + seeded template assembly).

`serve.py` wraps it in a stdin/stdout JSONL protocol.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, recompose
from .data.tokenizer import Tokenizer
from .evaluation.report_cascade import (
    build_prompt_table,
    run_cascade,
    run_cascade_batch,
    unpack_decisions,
)
from .ingest.encode import build_encode_program, load_convnext_tower, parse_ingest_knobs
from .ingest.png_reader import decode_png
from .models.clip import MMGCLIP, l2_normalize
from .ops.fusion import fuse_views
from .training.checkpoint import load_checkpoint
from .utils.logging import logger


class InferenceEngine:
    def __init__(self, config: Config, checkpoint_path: Optional[str] = None, seed: int = 0):
        self.config = config
        self.tokenizer = Tokenizer.from_pretrained(
            config.tokenizer.config.tokenizer_name,
            sequence_length=int(config.tokenizer.config.sequence_length),
        )
        self.model = MMGCLIP(config, seed=int(config.get_path("base.seed", seed)),
                             vocab_size=self.tokenizer.vocab_size)
        if checkpoint_path is None:
            checkpoint_path = os.path.join(
                config.checkpoints.checkpoints_export_dir, config.checkpoints.checkpoints_file_name
            )
        if os.path.isfile(checkpoint_path):
            self.params = load_checkpoint(checkpoint_path, self.model.trainable_params)["params"]
        else:
            logger.warning(f"No checkpoint at {checkpoint_path}; serving with init params.")
            self.params = self.model.trainable_params
        # resident ON DEVICE once: checkpoint loading returns numpy leaves,
        # and numpy args to a jitted call re-transfer H2D per invocation —
        # per-buffer transfer cost is the documented tunnel pathology
        self.params = jax.device_put(self.params)

        self.encode_module, self.encode_params, self.cn_config = load_convnext_tower(config)
        # the SAME ingest chain the feature store was built with: if the run
        # config sets encode_resize / encode_window, online encodes must
        # apply them too, or served features silently come from a different
        # input distribution than the one the classifier was trained on
        (resize_hw, resize_method, resize_precision, window,
         self._prepool) = parse_ingest_knobs(config)
        if resize_hw or window:
            logger.info(
                f"Serving encode applies the configured ingest chain: "
                f"resize={resize_hw} ({resize_method}), window={window}, "
                f"prepool={self._prepool}."
            )
        self._encode_jit = build_encode_program(
            self.encode_module, self.encode_params, self.cn_config.in_channels,
            window=window, resize_hw=resize_hw, resize_method=resize_method,
            resize_precision=resize_precision, prepool=self._prepool,
        )
        self._prompt_cache: Dict[tuple, jnp.ndarray] = {}
        self._cascade_table = None
        self._decode_pool = None  # lazy; see encode_paths
        # the projection/classify math is tiny but eager dispatch costs one
        # slow RPC per op on a remote device link (SKILL: eager is
        # pathologically slow over the tunnel) — one jitted call each;
        # programs specialize per batch shape (the socket dispatcher buckets
        # merged batches to powers of two)
        self._embed_jit = jax.jit(self._embed_impl)
        # classify = embed + probs in ONE program: one dispatch RPC per
        # request instead of two (each dispatch is ~ms on a remote link)
        self._classify_jit = jax.jit(
            lambda params, feats, text_emb: self._probs_impl(
                params, self._embed_impl(params, feats), text_emb
            )
        )
        # report path likewise: embed + cascade in one program per request
        self._cascade_one_jit = jax.jit(
            lambda params, feats, table, mask: run_cascade(
                self._embed_impl(params, feats)[0], table, mask
            )
        )
        self._cascade_batch_jit = jax.jit(
            lambda params, feats, table, mask: run_cascade_batch(
                self._embed_impl(params, feats), table, mask
            )
        )

    # ------------------------------------------------------------------
    def encode_paths(self, paths: Sequence[str]) -> np.ndarray:
        """PNG paths -> [n, 768] features, bucketed by shape.

        Host decode rides a thread pool and the per-bucket device calls are
        double-buffered (async H2D + dispatch, drain one behind) — the same
        overlap discipline as the ingest ``_Encoder`` — so path-based serve
        traffic isn't bounded by serial PIL decode on the executor thread.
        Decode errors raise to the caller (per-request error contract),
        unlike the ingest pipeline's skip-and-log ``failed.txt`` sweep."""
        from collections import defaultdict
        from concurrent.futures import ThreadPoolExecutor

        if self._decode_pool is None:
            self._decode_pool = ThreadPoolExecutor(
                max_workers=8, thread_name_prefix="serve-decode"
            )
        decoded = list(self._decode_pool.map(decode_png, paths))
        buckets = defaultdict(list)
        for i, pixels in enumerate(decoded):
            # dtype in the key: stacking mixed uint8/uint16 would promote to
            # uint16 and mis-scale the intensity transform (see ingest)
            buckets[(*pixels.shape, pixels.dtype.str)].append((i, pixels))
        out = np.zeros((len(paths), self.cn_config.dims[-1]), np.float32)
        pending = []  # [(items, device_result)]

        def drain_one():
            items, result = pending.pop(0)
            feats = np.asarray(result)
            for (i, _px), vec in zip(items, feats):
                out[i] = vec

        for shape, items in buckets.items():
            stack = np.stack([px for _i, px in items])
            if self._prepool:
                # same prepooled chain the feature store was built with —
                # online features must match the stored distribution
                from .ops.resize import host_block_sum

                sums = jnp.asarray(host_block_sum(stack, self._prepool))
                result = self._encode_jit(sums, native_hw=tuple(shape[:2]))
            else:
                result = self._encode_jit(jnp.asarray(stack))  # async H2D+dispatch
            pending.append((items, result))
            if len(pending) > 1:
                drain_one()
        while pending:
            drain_one()
        return out

    def encode_exam(self, exam_dir: str, method: Optional[str] = None, n_views: int = 4) -> np.ndarray:
        # PNG views only: exam dirs carry sidecars (.json annotations,
        # thumbnails, .DS_Store) that would crash decode_png or displace
        # real views from the first-n selection
        views = sorted(v for v in os.listdir(exam_dir) if v.lower().endswith(".png"))[:n_views]
        if not views:
            raise FileNotFoundError(
                f"no .png views in exam dir {exam_dir!r} — refusing to fuse "
                "an empty view set (it would produce an all-NaN vector)"
            )
        feats = self.encode_paths([os.path.join(exam_dir, v) for v in views])
        method = method or self.config.get_path("dataset.config.concatenate_features_method", "avgpool")
        fused = np.asarray(fuse_views(jnp.asarray(feats), method))
        return fused if fused.ndim == 2 else fused[None, :]

    # ------------------------------------------------------------------
    # bound the prompt cache: the socket server forwards arbitrary client
    # class_lists, and every distinct tuple would otherwise pin a
    # device-resident embedding forever (unbounded HBM growth under
    # varied or adversarial prompt traffic)
    _PROMPT_CACHE_MAX = 128

    def _prompt_embeddings(self, prompts: Sequence[str]) -> jnp.ndarray:
        key = tuple(prompts)
        cached = self._prompt_cache.pop(key, None)
        if cached is None:
            tokens = self.tokenizer(list(prompts), max_length=self.tokenizer.sequence_length)
            tokens = {k: jnp.asarray(v) for k, v in tokens.items()}
            pooled = self.model.apply_text_tower(tokens)
            cached = l2_normalize(
                self.model.project_text(self.params, pooled, train=False)
            )
        self._prompt_cache[key] = cached  # re-insert: LRU order (dicts are ordered)
        while len(self._prompt_cache) > self._PROMPT_CACHE_MAX:
            self._prompt_cache.pop(next(iter(self._prompt_cache)))
        return self._prompt_cache[key]

    def _embed_impl(self, params, feats):
        flat = self.model.apply_image_tower(params, feats)
        return l2_normalize(self.model.project_image(params, flat, train=False))

    def _probs_impl(self, params, image_emb, text_emb):
        logits = jnp.exp(params["logit_scale"]) * image_emb @ text_emb.T
        return jax.nn.softmax(logits, axis=-1)

    @staticmethod
    def _bucket_rows(feats):
        """Pad the row count to the next power of two so jitted programs
        specialize on a handful of shapes, not every request size."""
        n = feats.shape[0]
        bucket = 1 << max(n - 1, 0).bit_length()
        if bucket > n:
            feats = jnp.concatenate([feats, jnp.repeat(feats[-1:], bucket - n, axis=0)])
        return feats, n

    def image_embeddings(self, features: np.ndarray) -> jnp.ndarray:
        feats = jnp.asarray(features, jnp.float32)
        if feats.ndim == 1:
            feats = feats[None, :]
        padded, n = self._bucket_rows(feats)
        return self._embed_jit(self.params, padded)[:n]

    def classify(self, features: np.ndarray, class_list: Sequence[str]) -> Dict:
        """Zero-shot classify features against prompts -> probs + argmax."""
        feats = jnp.asarray(features, jnp.float32)
        if feats.ndim == 1:
            feats = feats[None, :]
        padded, n = self._bucket_rows(feats)
        text_emb = self._prompt_embeddings(class_list)
        probs = np.asarray(self._classify_jit(self.params, padded, text_emb))[:n]
        return {
            "classes_similarities": probs.tolist(),
            "similarities_argmax": np.argmax(probs, axis=-1).tolist(),
            "class_list": list(class_list),
        }

    # ------------------------------------------------------------------
    def cascade_decisions(self, features: np.ndarray) -> List[Dict[str, int]]:
        if self._cascade_table is None:
            self._cascade_table = build_prompt_table(self.model, self.params, self.tokenizer)
        table, mask = self._cascade_table
        feats = jnp.asarray(features, jnp.float32)
        if feats.ndim == 1:
            feats = feats[None, :]
        padded, n = self._bucket_rows(feats)  # shape-stable jit programs
        if n == 1:
            # single request: ONE dispatch (embed fused into the cascade) and
            # the packed-scalar fetch — the cheapest D2H on high-latency
            # links (report_cascade.run_cascade docstring)
            return [unpack_decisions(self._cascade_one_jit(self.params, padded[:1], table, mask))]
        packed = np.asarray(  # one dispatch + one fetch for n reports
            self._cascade_batch_jit(self.params, padded, table, mask)
        )[:n]
        return [unpack_decisions(p) for p in packed]

    def generate_reports(
        self, features: np.ndarray, seed: int = 42, bug_compat: bool = True
    ) -> List[str]:
        from .evaluation.report_text import generate_report

        texts = []
        for decisions in self.cascade_decisions(features):
            texts.append(
                generate_report(decisions, rng=random.Random(seed), bug_compat=bug_compat)[0]
            )
        return texts

    @classmethod
    def from_experiment(cls, experiment_path: str) -> "InferenceEngine":
        """Load from a run directory (reads the .hydra snapshot)."""
        cfg = recompose(experiment_path)
        cfg.checkpoints.checkpoints_export_dir = os.path.join(experiment_path, "checkpoints")
        return cls(cfg)
