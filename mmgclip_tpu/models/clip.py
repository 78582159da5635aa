"""MMGCLIP: dual-encoder CLIP head over frozen towers, as a jitted program.

Functional rebuild of the reference model
(reference: mmgclip/networks/mmgclip_model.py:12-166):

* image path: precomputed 768-d features are flattened (ConvNextTiny store)
  or pushed through a partially-trainable ResNet-50;
* text path: frozen BERT tower -> EOS pooling;
* per-tower projection heads -> L2-normalize -> learnable logit scale ->
  symmetric [n, n] logit matrices.

The TPU-first differences: the forward is one pure function under `jax.jit`
(shardable with pjit over a data mesh), frozen tower params live outside the
trainable pytree so the optimizer state is tiny, and the text tower can be
skipped entirely when cached text embeddings are supplied (frozen tower =>
identical numerics, reference recomputes BERT every step).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.compose import Config
from ..config.registry import NETWORKS
from ..utils.logging import logger
from .bert import BertConfig, BertEncoder, eos_pool, trim_padded_tail
from .projections import get_projection_head
from .resnet import ResNetConfig, ResNet50Encoder


def _text_tower_config_from(config: Config, vocab_size: Optional[int], config_cls):
    """Shared YAML-override extraction for every text-tower config dataclass
    (BertConfig / GPTConfig): size keys, vocab fallback, dtype."""
    overrides = config.get_path("networks.text_encoder.config", {}) or {}
    kwargs = {}
    for key in (
        "vocab_size",
        "hidden_size",
        "num_hidden_layers",
        "num_attention_heads",
        "intermediate_size",
        "max_position_embeddings",
    ):
        if key in overrides:
            kwargs[key] = int(overrides[key])
    if vocab_size is not None and "vocab_size" not in kwargs:
        kwargs["vocab_size"] = int(vocab_size)
    if "dtype" in overrides:
        kwargs["dtype"] = resolve_dtype(overrides["dtype"])
    return config_cls(**kwargs)


def _bert_config_from(config: Config, vocab_size: Optional[int]) -> BertConfig:
    return _text_tower_config_from(config, vocab_size, BertConfig)


def resolve_dtype(name) -> Any:
    """Config string -> jnp dtype ('bfloat16'|'float32'|'float16')."""
    if not isinstance(name, str):
        return name
    table = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
             "float32": jnp.float32, "f32": jnp.float32,
             "float16": jnp.float16, "f16": jnp.float16}
    if name not in table:
        raise ValueError(f"Unknown dtype {name!r}; expected one of {sorted(table)}")
    return table[name]


def l2_normalize(x, axis=-1, eps=1e-12):
    """Row-normalize, gradient-safe at x=0.

    Clamp the SQUARED norm before the sqrt: `x / max(norm(x), eps)` has a
    finite forward at 0 but a NaN gradient (d sqrt at 0 is inf, times the
    zero row -> inf*0).  Exact-zero rows are reachable — the MoE projection
    head emits zeros for capacity-dropped tokens — and one NaN row poisons
    every parameter through the contrastive loss."""
    squared = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(squared, eps * eps))


class MMGCLIP:
    """Model facade: owns modules + frozen params, exposes pure apply fns.

    ``trainable_params`` is the pytree the optimizer sees:
    ``{image_projection?, text_projection?, logit_scale, image_encoder?}``.
    """

    def __init__(self, config: Config, seed: int = 0, vocab_size: Optional[int] = None):
        self.config = config
        self.seed = seed

        image_encoder_name = config.networks.image_encoder.name
        self.image_encoder_name = image_encoder_name
        self.image_features_dimension = int(config.networks.image_encoder.image_features_dimension)

        # --- text tower (frozen; BERT-family or causal/BioGPT-family) ----
        text_encoder_name = str(config.get_path("networks.text_encoder.name", "BertEncoder"))
        if text_encoder_name in ("CausalTextEncoder", "BioGptEncoder", "GPTEncoder"):
            from .gpt import CausalTextEncoder, GPTConfig

            self.bert_config = _text_tower_config_from(config, vocab_size, GPTConfig)
            self.text_module = CausalTextEncoder(self.bert_config)
        else:
            self.bert_config = _bert_config_from(config, vocab_size)
            self.text_module = BertEncoder(self.bert_config)
        dummy_tokens = jnp.zeros((1, 8), jnp.int32)
        self.text_variables = jax.jit(self.text_module.init)(jax.random.key(seed), dummy_tokens)
        # converted reference weights (tools/convert_bert.py output) load here,
        # mirroring the image tower's convnext_tiny_clf_path contract
        # (reference: encoder.py:121-144 loads the HF tower by name)
        weights_path = str(config.get_path("networks.text_encoder.weights_path", "") or "")
        if weights_path:
            import os as _os

            if _os.path.isfile(weights_path):
                from flax import serialization

                with open(weights_path, "rb") as fh:
                    self.text_variables = serialization.from_bytes(
                        jax.device_get(self.text_variables), fh.read()
                    )
                logger.info(f"Loaded converted text-tower weights from {weights_path}.")
            else:
                logger.warning(f"text_encoder.weights_path {weights_path!r} not found; using random init.")
        self.text_output_dimension = self.bert_config.hidden_size
        # pad-trim bucket for concrete text batches (0 disables; see
        # apply_text_tower / bert.trim_padded_tail)
        self.text_pad_trim_multiple = int(
            config.get_path("networks.text_encoder.config.pad_trim_multiple", 32)
        )

        # --- optional trainable image tower (ResNet-50 ablation path) --
        self.image_module = None
        image_encoder_params = None
        self._image_tower_dim = self.image_features_dimension
        if image_encoder_name == "ResNet50Encoder":
            rn_overrides = config.get_path("networks.image_encoder.config", {}) or {}
            rn_config = ResNetConfig.micro() if rn_overrides.get("micro") else ResNetConfig.resnet50()
            self.image_module = ResNet50Encoder(rn_config)
            # pooled output width (width*32: 2048 for resnet50, 256 for micro)
            self._image_tower_dim = int(rn_config.width) * 32
            dummy = jnp.zeros((1, self.image_features_dimension), jnp.float32)
            self.image_variables = jax.jit(self.image_module.init)(jax.random.key(seed + 1), dummy)
            image_encoder_params = self.image_variables["params"]
            logger.info("Using ResNet50Encoder image tower.")

        # --- projection heads ------------------------------------------
        projection_name = config.projection.config.projection_name
        self.projection_name = projection_name
        dropout = float(config.get_path("networks.dropout.config.dropout", 0.0))
        self.image_projection = None
        self.text_projection = None
        self._head_state = {"image_projection": {}, "text_projection": {}}
        trainable: Dict[str, Any] = {}
        if projection_name != "ZeroProjection":
            head_cls = get_projection_head(projection_name)
            proj_dim = config.projection.config.output_projection_dimension
            image_in = self._image_tower_dim
            # pass through any extra knobs the head declares (e.g. the MoE
            # head's n_experts / capacity_factor) from the projection config
            extra = {
                key: config.projection.config[key]
                for key in getattr(head_cls, "__dataclass_fields__", {})
                if key not in ("embedding_dim", "projection_dim", "dropout", "parent", "name")
                and key in config.projection.config
            }
            self.image_projection = head_cls(
                embedding_dim=image_in, projection_dim=proj_dim, dropout=dropout, **extra
            )
            self.text_projection = head_cls(
                embedding_dim=self.text_output_dimension, projection_dim=proj_dim, dropout=dropout, **extra
            )
            img_dummy = jnp.zeros((1, image_in), jnp.float32)
            txt_dummy = jnp.zeros((1, self.text_output_dimension), jnp.float32)
            img_vars = jax.jit(self.image_projection.init)(jax.random.key(seed + 2), img_dummy)
            txt_vars = jax.jit(self.text_projection.init)(jax.random.key(seed + 3), txt_dummy)
            trainable["image_projection"] = img_vars["params"]
            trainable["text_projection"] = txt_vars["params"]
            # non-trainable head collections (the BatchNorm head's
            # batch_stats): held on the model, threaded into apply.  Stats
            # stay at init — train mode normalizes with current-batch
            # statistics (flax use_running_average=False ignores the
            # collection), eval normalizes with the init stats
            self._head_state = {
                "image_projection": {k: v for k, v in img_vars.items() if k != "params"},
                "text_projection": {k: v for k, v in txt_vars.items() if k != "params"},
            }
            logger.info(
                f"Embeddings projected to {proj_dim} features using {projection_name}."
            )

        # temperature parameter controlling the logit range
        # (reference: mmgclip_model.py:52)
        temperature = float(config.networks.logit_temperature)
        trainable["logit_scale"] = jnp.asarray(np.log(1.0 / temperature), jnp.float32)
        if image_encoder_params is not None:
            trainable["image_encoder"] = image_encoder_params
        self.trainable_params = trainable

        self.loss_name = str(config.get_path("loss.config.loss_name", "CLIPLoss"))

    # ------------------------------------------------------------------
    # pure apply functions (safe under jit / pjit)
    # ------------------------------------------------------------------
    def apply_image_tower(self, params: Dict, image_features, train: bool = False):
        """Flatten stored features; ResNet path re-encodes them
        (reference: mmgclip_model.py:76-93).

        DELIBERATE divergence (PARITY.md #8): BatchNorm runs in FROZEN mode
        (running stats, never batch stats) even when `train=True` and layer4
        fine-tunes.  The torch reference's train() mode uses batch statistics
        and mutates running stats per step; mutable BN state inside a jitted
        donated-buffer train step would force threading batch_stats through
        every step signature for an ablation-only tower, and frozen-BN
        fine-tuning is the standard practice for small-batch transfer
        anyway.  `train` still gates dropout semantics for callers."""
        del train  # BN deliberately frozen; see docstring
        flat = image_features.reshape(image_features.shape[0], -1)
        if self.image_module is not None:
            variables = {"params": params["image_encoder"], **{
                k: v for k, v in self.image_variables.items() if k != "params"
            }}
            return self.image_module.apply(variables, flat, train=False)
        return flat

    def apply_text_tower(self, text_tokens: Dict):
        """Frozen BERT -> EOS pooling (reference: mmgclip_model.py:95-115).

        Concrete (non-traced) token batches get their all-padding tail
        trimmed first (``trim_padded_tail`` — numerically exact, ~5x on the
        short-prompt product case); traced calls run at the caller's shape.
        """
        text_tokens = trim_padded_tail(text_tokens, self.text_pad_trim_multiple)
        hidden = self.text_module.apply(
            self.text_variables,
            text_tokens["input_ids"],
            attention_mask=text_tokens["attention_mask"],
            token_type_ids=text_tokens.get("token_type_ids"),
            deterministic=True,
        )
        return eos_pool(hidden, text_tokens["attention_mask"])

    def _apply_head(self, module, name: str, params: Dict, features, train: bool, rng):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        variables = {"params": params[name], **self._head_state[name]}
        # heads with non-param state (the BatchNorm head) write batch_stats
        # in train mode; mark it mutable and discard the update (stats stay
        # at init — see __init__)
        mutable = [k for k in self._head_state[name]] if train else False
        if mutable:
            out, _updates = module.apply(
                variables, features, deterministic=not train, rngs=rngs, mutable=mutable
            )
            return out
        return module.apply(variables, features, deterministic=not train, rngs=rngs)

    def project_image(self, params: Dict, features, train: bool = False, rng=None):
        if self.image_projection is None:
            return features
        return self._apply_head(self.image_projection, "image_projection", params, features, train, rng)

    def project_text(self, params: Dict, features, train: bool = False, rng=None):
        if self.text_projection is None:
            return features
        return self._apply_head(self.text_projection, "text_projection", params, features, train, rng)

    def forward(
        self,
        params: Dict,
        batch: Dict,
        train: bool = False,
        rng=None,
        validation: bool = False,
        text_features: Optional[jnp.ndarray] = None,
        text_features2: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Full forward (reference: mmgclip_model.py:117-166).

        ``text_features``/``text_features2`` short-circuit the frozen text
        tower with cached EOS-pooled activations.
        """
        image_features = self.apply_image_tower(params, batch["image_features"], train)
        if text_features is None:
            text_features = self.apply_text_tower(batch["text_tokens"])

        rng_img = rng_txt = rng_txt2 = None
        if rng is not None:
            rng_img, rng_txt, rng_txt2 = jax.random.split(rng, 3)
        image_embeddings = l2_normalize(self.project_image(params, image_features, train, rng_img))
        text_embeddings = l2_normalize(self.project_text(params, text_features, train, rng_txt))

        logit_scale = jnp.exp(params["logit_scale"])
        logits_per_image = logit_scale * image_embeddings @ text_embeddings.T
        logits_per_text = logit_scale * text_embeddings @ image_embeddings.T

        output = {
            "image_embeddings": image_embeddings,
            "text_embeddings": text_embeddings,
            "logit_scale": logit_scale,
            "logits_per_image": logits_per_image,
            "logits_per_text": logits_per_text,
        }

        # second text pass for the T2T term (reference: mmgclip_model.py:154-164)
        if self.loss_name == "MMGCLIPLoss" and not validation:
            if text_features2 is None and "image_impression_tokens" in batch:
                text_features2 = self.apply_text_tower(batch["image_impression_tokens"])
            if text_features2 is not None:
                emb2 = l2_normalize(self.project_text(params, text_features2, train, rng_txt2))
                output["text_embeddings2"] = emb2
        return output

    __call__ = forward

    def count_parameters(self, params: Optional[Dict] = None) -> int:
        params = params if params is not None else self.trainable_params
        leaves = jax.tree_util.tree_leaves(params)
        # shapes only — never np.asarray a leaf (full D2H per tensor)
        total = int(sum(np.prod(getattr(leaf, "shape", ()) or (1,)) for leaf in leaves))
        logger.info(f"Total Trainable Params: {total}")
        return total


class PromptClassifier:
    """Zero-shot wrapper (reference: mmgclip_model.py:168-249).

    Tokenizes an arbitrary prompt list, runs one forward, softmaxes
    ``logits_per_image``.  ``encode_prompts(class_list)`` caches the
    prompt-bank text embeddings (invalidated when ``params`` is swapped) so
    repeated cascade steps cost one matmul each.
    """

    def __init__(self, model: MMGCLIP, tokenizer, params: Optional[Dict] = None):
        self.model = model
        self.tokenizer = tokenizer
        self.params = params if params is not None else model.trainable_params
        self._text_cache: Dict[tuple, jnp.ndarray] = {}
        # strong reference + `is` comparison: an id() comparison could
        # falsely validate the cache if CPython recycles the freed dict's id
        self._cache_params = self.params

    def encode_prompts(self, class_list) -> jnp.ndarray:
        if self.params is not self._cache_params:
            # params were swapped (new checkpoint / further training) —
            # cached embeddings would silently mix old text with new image
            # projections
            self._text_cache.clear()
            self._cache_params = self.params
        key = tuple(class_list)
        if key not in self._text_cache:
            tokens = self.tokenizer(
                list(class_list),
                padding="max_length",
                truncation=True,
                max_length=self.model.config.tokenizer.config.sequence_length,
            )
            tokens = {k: jnp.asarray(v) for k, v in tokens.items()}
            pooled = self.model.apply_text_tower(tokens)
            emb = l2_normalize(self.model.project_text(self.params, pooled, train=False))
            self._text_cache[key] = emb
        return self._text_cache[key]

    def __call__(self, image_features, class_list, visualize: bool = False, **_):
        image_features = jnp.asarray(image_features)
        if image_features.ndim == 1:
            image_features = image_features[None, :]
        feats = self.model.apply_image_tower(self.params, image_features)
        image_embeddings = l2_normalize(self.model.project_image(self.params, feats, train=False))
        text_embeddings = self.encode_prompts(class_list)
        logit_scale = jnp.exp(self.params["logit_scale"])
        logits = logit_scale * image_embeddings @ text_embeddings.T
        sims = jax.nn.softmax(logits, axis=-1)
        # ONE D2H fetch for the whole argmax vector: per-element int() would
        # block on a separate ~0.5s transfer per image on the tunnel
        argmax_host = np.asarray(jnp.argmax(sims, axis=-1)).tolist()
        return {
            "classes_similarities": sims,
            # first image only — the reference's contract
            # (reference: mmgclip_model.py:208 `argmax(...)[0].item()`);
            # batch callers read similarities_argmax_per_image
            "similarities_argmax": int(argmax_host[0]),
            "similarities_argmax_per_image": [int(v) for v in argmax_host],
            "class_list": list(class_list),
        }


@NETWORKS.register("ConvNextTiny")
def _convnext_factory(**kwargs):
    from .convnext import ConvNeXt, ConvNeXtConfig

    return ConvNeXt(ConvNeXtConfig.tiny(**kwargs))


@NETWORKS.register("ResNet50Encoder")
def _resnet_factory(**kwargs):
    return ResNet50Encoder(ResNetConfig.resnet50())


@NETWORKS.register("BertEncoder")
def _bert_factory(**kwargs):
    return BertEncoder(BertConfig(**kwargs))
