import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_default_matmul_precision", "highest")

from mmgclip_tpu.config import Config, compose
from mmgclip_tpu.data.tokenizer import Tokenizer
from mmgclip_tpu.models import (
    BertConfig,
    ConvNeXtConfig,
    MMGCLIP,
    PromptClassifier,
    eos_pool,
    init_bert,
    init_convnext,
    init_resnet50,
    ResNetConfig,
    get_projection_head,
)
from mmgclip_tpu.ops import attention_reference, flash_attention, fuse_views, intensity_transform

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")

TINY_TEXT = {
    "config": {
        "vocab_size": 512,
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "intermediate_size": 128,
        "max_position_embeddings": 64,
    }
}


def tiny_config(**over):
    cfg = compose(CONFIG_DIR, "train_binary_class_clf")
    cfg.networks.text_encoder = Config({"name": "BertEncoder", **TINY_TEXT})
    cfg.tokenizer.config.sequence_length = 32
    for key, value in over.items():
        cfg.set_path(key, value)
    return cfg


def test_flash_attention_matches_reference():
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 2, 128, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32) for _ in range(3))
    mask = jnp.ones((b, s), jnp.int32).at[:, 100:].set(0)
    ref = attention_reference(q, k, v, mask)
    out = flash_attention(q, k, v, mask, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_attention_length_adaptive_short_rows_exact():
    """The kernel's key-block loop is bounded by ceil(valid_len/block_k);
    short rows (the product case: ~dozens of prompt tokens padded to 256)
    must stay exactly equal to the full-loop reference, including the
    valid_len == 0 degenerate row (uniform attention over all keys)."""
    rng = np.random.default_rng(2)
    b, h, s, d = 4, 2, 256, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32) for _ in range(3))
    lens = [0, 1, 10, 200]  # degenerate, sub-block, one-block, multi-block
    mask = jnp.asarray(np.arange(s)[None, :] < np.asarray(lens)[:, None], jnp.int32)
    ref = attention_reference(q, k, v, mask)
    out = flash_attention(q, k, v, mask, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # traced-mask route (what BertEncoder hits under jit) too
    out_t = jax.jit(
        lambda q, k, v, m: flash_attention(q, k, v, m, block_q=64, block_k=64, interpret=True)
    )(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref), atol=1e-5)


def test_flash_attention_nonprefix_mask_falls_back_exactly():
    """The kernel's mask contract is prefix-only (it reduces to per-row
    lengths); a concrete NON-contiguous mask must route to the exact XLA
    path, not be silently reinterpreted as 'first sum(mask) keys valid'
    (review r4 — the misread was worth ~1.0 abs error)."""
    rng = np.random.default_rng(1)
    b, h, s, d = 2, 2, 128, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32) for _ in range(3))
    mask = jnp.asarray(np.tile([1, 0], s // 2)[None, :].repeat(b, axis=0), jnp.int32)
    ref = attention_reference(q, k, v, mask)
    out = flash_attention(q, k, v, mask, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # degenerate block_k (not a sublane multiple) must also fall back
    out2 = flash_attention(q, k, v, None, block_q=64, block_k=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(attention_reference(q, k, v, None)), atol=1e-5
    )


def test_eos_pool_picks_last_valid_token():
    hidden = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 1]])
    pooled = eos_pool(hidden, mask)
    np.testing.assert_array_equal(np.asarray(pooled[0]), np.asarray(hidden[0, 2]))
    np.testing.assert_array_equal(np.asarray(pooled[1]), np.asarray(hidden[1, 3]))


def test_bert_forward_shape_and_determinism():
    config = BertConfig.tiny()
    module, params = init_bert(config, seed=0)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    out1 = module.apply(params, ids, attention_mask=mask, deterministic=True)
    out2 = module.apply(params, ids, attention_mask=mask, deterministic=True)
    assert out1.shape == (2, 16, 64)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_bert_padding_invariance():
    """Padding tokens must not change earlier positions (mask correctness)."""
    config = BertConfig.tiny()
    module, params = init_bert(config, seed=0)
    ids = jnp.asarray([[7, 8, 9, 10, 0, 0, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.int32)
    ids2 = jnp.asarray([[7, 8, 9, 10, 99, 99, 99, 99]], jnp.int32)
    out1 = module.apply(params, ids, attention_mask=mask)
    out2 = module.apply(params, ids2, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), atol=1e-5)


def test_trim_padded_tail_semantics():
    from mmgclip_tpu.models.bert import trim_padded_tail

    ids = np.zeros((3, 256), np.int32)
    mask = np.zeros((3, 256), np.int32)
    mask[0, :4] = 1
    mask[1, :17] = 1
    mask[2, :9] = 1
    extra = np.arange(3)  # non-sequence entry must pass through untouched
    tokens = {"input_ids": ids, "attention_mask": mask, "labels": extra}
    out = trim_padded_tail(tokens, multiple=32)
    assert out["input_ids"].shape == (3, 32)  # max len 17 -> bucket 32
    assert out["attention_mask"].shape == (3, 32)
    assert out["labels"] is extra
    # disabled / full-length / traced inputs are no-ops
    assert trim_padded_tail(tokens, multiple=0) is tokens
    full = {"input_ids": ids, "attention_mask": np.ones_like(mask)}
    assert trim_padded_tail(full, multiple=32) is full
    traced_shapes = jax.eval_shape(
        lambda tt: trim_padded_tail(tt, 32)["input_ids"],
        {"input_ids": jnp.zeros((3, 256), jnp.int32), "attention_mask": jnp.zeros((3, 256), jnp.int32)},
    )
    assert traced_shapes.shape == (3, 256)


def test_trim_padded_tail_pooled_equality_both_towers():
    """Trimming the all-padding tail must leave EOS-pooled features exact
    for both tower families: BERT (absolute arange positions) and the
    causal BioGPT topology (cumsum-of-mask positions)."""
    from mmgclip_tpu.models import GPTConfig, init_gpt
    from mmgclip_tpu.models.bert import eos_pool, trim_padded_tail

    rng = np.random.default_rng(5)
    b, s = 4, 64
    lens = np.asarray([3, 11, 17, 9])
    ids = rng.integers(1, 200, size=(b, s)).astype(np.int32)
    mask = (np.arange(s)[None, :] < lens[:, None]).astype(np.int32)
    ids = ids * mask  # pad id 0 outside the valid prefix

    for build in (
        lambda: init_bert(BertConfig.tiny(), seed=0),
        lambda: __import__("mmgclip_tpu.models", fromlist=["init_gpt"]).init_gpt(GPTConfig.tiny(), seed=0),
    ):
        module, params = build()
        full = eos_pool(
            module.apply(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask)),
            jnp.asarray(mask),
        )
        trimmed_tokens = trim_padded_tail(
            {"input_ids": ids, "attention_mask": mask}, multiple=8
        )
        assert trimmed_tokens["input_ids"].shape == (b, 24)  # max 17 -> 24
        trimmed = eos_pool(
            module.apply(
                params,
                jnp.asarray(trimmed_tokens["input_ids"]),
                attention_mask=jnp.asarray(trimmed_tokens["attention_mask"]),
            ),
            jnp.asarray(trimmed_tokens["attention_mask"]),
        )
        np.testing.assert_allclose(np.asarray(full), np.asarray(trimmed), atol=1e-5)


def test_projection_heads_shapes():
    x = jnp.ones((4, 96))
    for name, kwargs, out_dim in [
        ("LinearProjectionLayer", dict(projection_dim=32), 32),
        ("MultiLinearHead", dict(projection_dim=[64, 32]), 32),
        ("MLPProjectionHead", dict(projection_dim=32), 32),
    ]:
        head = get_projection_head(name)(embedding_dim=96, dropout=0.2, **kwargs)
        params = head.init(jax.random.key(0), x)
        out = head.apply(params, x, deterministic=True)
        assert out.shape == (4, out_dim), name


def test_linear_projection_has_no_bias():
    head = get_projection_head("LinearProjectionLayer")(embedding_dim=8, projection_dim=4)
    params = head.init(jax.random.key(0), jnp.ones((1, 8)))
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = [jax.tree_util.keystr(path) for path, _ in flat]
    assert not any("bias" in n for n in names)


def test_convnext_shapes_and_classifier():
    config = ConvNeXtConfig.micro()
    module, params = init_convnext(config, image_size=64)
    x = jnp.ones((2, 64, 64, 3))
    feats = module.apply(params, x)
    assert feats.shape == (2, 768)
    logits = module.apply(params, x, classify=True)
    assert logits.shape == (2, 2)
    fmap = module.apply(params, x, pool=False)
    assert fmap.shape == (2, 2, 2, 768)


def test_resnet50_encoder_from_flat_features():
    config = ResNetConfig.micro()
    module, variables = init_resnet50(config, image_size=64)
    flat = jnp.ones((2, 768))
    out = module.apply(variables, flat)
    assert out.shape == (2, config.width * 32)


def test_intensity_transform_matches_reference_math():
    # uint8 pixel p: ToTensor -> p/255, *65535, (x-32767.5)/32767.5
    pixels = np.asarray([[0, 128, 255]], np.uint8)
    out = np.asarray(intensity_transform(jnp.asarray(pixels)))
    expected = (pixels.astype(np.float64) / 255.0 * 65535.0 - 32767.5) / 32767.5
    np.testing.assert_allclose(out, expected, atol=1e-5)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_fuse_views_methods():
    v = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)), jnp.float32)
    assert fuse_views(v, "maxpool").shape == (16,)
    assert fuse_views(v, "avgpool").shape == (16,)
    assert fuse_views(v, "stack").shape == (4, 16)
    assert fuse_views(v, "concat").shape == (64,)
    np.testing.assert_allclose(np.asarray(fuse_views(v, "avgpool")), np.asarray(v.mean(0)), atol=1e-6)
    with pytest.raises(ValueError):
        fuse_views(v, "nope")


def _batch(model_cfg, tokenizer, n=4):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(n, 1, 768, 1, 1)), jnp.float32)
    texts = [f"Finding suggesting benign number {i}." for i in range(n)]
    tokens = tokenizer(texts, max_length=32)
    return {
        "image_features": feats,
        "text_tokens": {k: jnp.asarray(v) for k, v in tokens.items()},
    }


def test_mmgclip_forward_output_contract():
    cfg = tiny_config()
    tok = Tokenizer.from_pretrained("wordpiece-test", sequence_length=32)
    model = MMGCLIP(cfg, seed=0, vocab_size=tok.vocab_size)
    batch = _batch(cfg, tok)
    out = model.forward(model.trainable_params, batch)
    assert out["image_embeddings"].shape == (4, 512)
    assert out["text_embeddings"].shape == (4, 512)
    assert out["logits_per_image"].shape == (4, 4)
    assert out["logits_per_text"].shape == (4, 4)
    np.testing.assert_allclose(
        np.asarray(out["logits_per_text"]), np.asarray(out["logits_per_image"].T), atol=1e-5
    )
    # embeddings are unit-norm
    norms = np.linalg.norm(np.asarray(out["image_embeddings"]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # logit scale starts at 1/0.07
    np.testing.assert_allclose(float(out["logit_scale"]), 1 / 0.07, rtol=1e-5)


def test_mmgclip_cached_text_matches_recompute():
    cfg = tiny_config()
    tok = Tokenizer.from_pretrained("wordpiece-test", sequence_length=32)
    model = MMGCLIP(cfg, seed=0, vocab_size=tok.vocab_size)
    batch = _batch(cfg, tok)
    pooled = model.apply_text_tower(batch["text_tokens"])
    out_recompute = model.forward(model.trainable_params, batch)
    out_cached = model.forward(model.trainable_params, batch, text_features=pooled)
    np.testing.assert_allclose(
        np.asarray(out_recompute["logits_per_image"]),
        np.asarray(out_cached["logits_per_image"]),
        atol=1e-5,
    )


def test_mmgclip_zero_projection():
    # ZeroProjection requires matching tower dims (as in the reference)
    cfg = tiny_config()
    cfg.projection.config = Config({"projection_name": "ZeroProjection"})
    cfg.networks.image_encoder.image_features_dimension = 64
    tok = Tokenizer.from_pretrained("wordpiece-test", sequence_length=32)
    model = MMGCLIP(cfg, seed=0, vocab_size=tok.vocab_size)
    rng = np.random.default_rng(0)
    batch = {
        "image_features": jnp.asarray(rng.normal(size=(4, 1, 64, 1, 1)), jnp.float32),
        "text_tokens": {
            k: jnp.asarray(v)
            for k, v in tok([f"text {i}" for i in range(4)], max_length=32).items()
        },
    }
    out = model.forward(model.trainable_params, batch)
    # without projection, embedding dims are the tower dims
    assert out["image_embeddings"].shape == (4, 64)
    assert out["text_embeddings"].shape == (4, 64)
    assert "image_projection" not in model.trainable_params


def test_prompt_classifier_output():
    cfg = tiny_config()
    tok = Tokenizer.from_pretrained("wordpiece-test", sequence_length=32)
    model = MMGCLIP(cfg, seed=0, vocab_size=tok.vocab_size)
    clf = PromptClassifier(model, tok)
    feats = jnp.asarray(np.random.default_rng(1).normal(size=(1, 768)), jnp.float32)
    out = clf(feats, ["Mammogram revealed a mass.", "No findings are present."])
    sims = np.asarray(out["classes_similarities"])
    assert sims.shape == (1, 2)
    np.testing.assert_allclose(sims.sum(), 1.0, atol=1e-5)
    assert out["similarities_argmax"] in (0, 1)
    # cache hit: second call reuses prompt embeddings
    out2 = clf(feats, ["Mammogram revealed a mass.", "No findings are present."])
    np.testing.assert_array_equal(sims, np.asarray(out2["classes_similarities"]))


def test_tokenizer_fallback_contract():
    tok = Tokenizer.from_pretrained("definitely/not-cached", sequence_length=16)
    assert tok.is_fallback
    out = tok(["Mass margin is circumscribed.", "No mass."])
    assert out["input_ids"].shape == (2, 16)
    assert out["attention_mask"].shape == (2, 16)
    assert out["attention_mask"][0].sum() > out["attention_mask"][1].sum()
    # deterministic across instances
    tok2 = Tokenizer.from_pretrained("other/name", sequence_length=16)
    out2 = tok2(["Mass margin is circumscribed.", "No mass."])
    np.testing.assert_array_equal(out["input_ids"], out2["input_ids"])


def test_pallas_depthwise_conv_matches_lax():
    from mmgclip_tpu.ops.depthwise_conv import depthwise_conv7x7

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(7, 7, 1, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=128,
    ) + b
    out = depthwise_conv7x7(x, kern, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # ragged channel count falls back to lax
    x3 = jnp.ones((1, 8, 8, 96))
    k3 = jnp.ones((7, 7, 1, 96))
    out3 = depthwise_conv7x7(x3, k3)
    assert out3.shape == (1, 8, 8, 96)


def test_mmgclip_with_causal_text_tower():
    """The BioGPT-family ablation tower plugs into the CLIP head
    (reference text-encoder ablation: BASELINE.md; configs/tokenizer/biogpt.yaml)."""
    cfg = tiny_config()
    cfg.networks.text_encoder = Config(
        {
            "name": "CausalTextEncoder",
            "config": {
                "vocab_size": 512, "hidden_size": 64, "num_hidden_layers": 2,
                "num_attention_heads": 4, "intermediate_size": 128,
                "max_position_embeddings": 64,
            },
        }
    )
    tok = Tokenizer.from_pretrained("wordpiece-test", sequence_length=32)
    model = MMGCLIP(cfg, seed=0, vocab_size=tok.vocab_size)
    batch = _batch(cfg, tok)
    out = model.forward(model.trainable_params, batch)
    assert out["logits_per_image"].shape == (4, 4)
    assert np.isfinite(np.asarray(out["logits_per_image"])).all()


def test_batchnorm_projection_head_forward_and_train():
    """ProjectionHead (the BatchNorm head) must run: its batch_stats
    collection lives on the model, threaded into apply; train mode
    normalizes with current-batch statistics and discards stat updates."""
    cfg = tiny_config()
    cfg.projection.config.projection_name = "ProjectionHead"
    cfg.projection.config.output_projection_dimension = 16
    model = MMGCLIP(cfg, seed=0)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(4, 768)), jnp.float32)

    out_eval = model.project_image(model.trainable_params, feats, train=False)
    assert out_eval.shape == (4, 16)
    out_train = model.project_image(
        model.trainable_params, feats, train=True, rng=jax.random.key(0)
    )
    assert out_train.shape == (4, 16)
    assert np.isfinite(np.asarray(out_eval)).all()
    assert np.isfinite(np.asarray(out_train)).all()

    # gradients flow through the head in train mode
    def loss(p):
        return jnp.sum(model.project_image(p, feats, train=True, rng=jax.random.key(1)) ** 2)

    grads = jax.grad(loss)(model.trainable_params)
    assert float(jnp.abs(grads["image_projection"]["hidden_0"]["kernel"]).sum()) > 0


def test_micro_resnet_projection_dim_matches_tower():
    """The projection input width follows the ResNet variant's actual pooled
    output (width*32), not a hardcoded 2048."""
    cfg = tiny_config()
    cfg.networks.image_encoder = Config(
        {
            "name": "ResNet50Encoder",
            "image_features_dimension": 768,
            "convnext_tiny_clf_path": "",
            "config": {"micro": True},
        }
    )
    model = MMGCLIP(cfg, seed=0)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 768, 1, 1)), jnp.float32)
    batch = {
        "image_features": feats,
        "text_tokens": {
            "input_ids": jnp.zeros((2, 8), jnp.int32),
            "attention_mask": jnp.ones((2, 8), jnp.int32),
            "token_type_ids": jnp.zeros((2, 8), jnp.int32),
        },
    }
    out = model.forward(model.trainable_params, batch)
    assert out["logits_per_image"].shape == (2, 2)
    assert np.isfinite(np.asarray(out["logits_per_image"])).all()


def test_prompt_classifier_cache_invalidates_on_param_swap():
    cfg = tiny_config()
    model = MMGCLIP(cfg, seed=0)
    tokenizer = Tokenizer.from_pretrained("wordpiece", sequence_length=16)
    clf = PromptClassifier(model, tokenizer)
    prompts = ["benign finding", "malignant finding"]
    emb_old = np.asarray(clf.encode_prompts(prompts))

    # new params (different seed) must refresh the cached text embeddings
    clf.params = MMGCLIP(cfg, seed=1).trainable_params
    emb_new = np.asarray(clf.encode_prompts(prompts))
    assert not np.allclose(emb_old, emb_new)


def test_prompt_classifier_batched_argmax_per_image():
    cfg = tiny_config()
    model = MMGCLIP(cfg, seed=0)
    tokenizer = Tokenizer.from_pretrained("wordpiece", sequence_length=16)
    clf = PromptClassifier(model, tokenizer)
    feats = np.random.default_rng(0).normal(size=(3, 1, 768, 1, 1)).astype(np.float32)
    out = clf(feats, ["class a", "class b"])
    assert len(out["similarities_argmax_per_image"]) == 3
    # reference contract: the scalar field is the FIRST image's argmax
    assert out["similarities_argmax"] == out["similarities_argmax_per_image"][0]


def test_batchnorm_head_matches_torch_train_and_documents_eval_divergence():
    """PARITY.md divergence #6: our BatchNorm ProjectionHead equals the
    torch reference head in TRAIN mode (current-batch statistics); at EVAL
    the reference uses its accumulated running stats while ours keeps the
    init stats — pinned here so the divergence stays documented, not
    accidental (reference: projection.py:64-83; unused by shipped configs)."""
    torch = pytest.importorskip("torch")
    from mmgclip_tpu.models.projections import ProjectionHead

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(8, 32)).astype(np.float32)
    head = ProjectionHead(embedding_dim=32, hidden_dims=(16, 8), projection_dim=4,
                          dropout=0.0)
    variables = head.init(jax.random.key(0), jnp.zeros((1, 32)))

    # the torch reference head: Linear -> BN -> ReLU -> ... -> Linear
    layers = []
    widths = [32, 16, 8]
    for i in range(2):
        layers += [torch.nn.Linear(widths[i], widths[i + 1]),
                   torch.nn.BatchNorm1d(widths[i + 1]), torch.nn.ReLU()]
    layers.append(torch.nn.Linear(8, 4))
    ref = torch.nn.Sequential(*layers)
    with torch.no_grad():
        for i, name in enumerate(["hidden_0", "hidden_1"]):
            layers[i * 3].weight.copy_(torch.from_numpy(
                np.asarray(variables["params"][name]["kernel"]).T))
            layers[i * 3].bias.copy_(torch.from_numpy(
                np.asarray(variables["params"][name]["bias"])))
        layers[-1].weight.copy_(torch.from_numpy(np.asarray(variables["params"]["out"]["kernel"]).T))
        layers[-1].bias.copy_(torch.from_numpy(np.asarray(variables["params"]["out"]["bias"])))

    # TRAIN mode: identical numerics (current-batch statistics)
    ref.train()
    with torch.no_grad():
        theirs_train = ref(torch.from_numpy(feats)).numpy()  # also updates running stats
    ours_train, _updates = head.apply(
        variables, jnp.asarray(feats), deterministic=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(ours_train), theirs_train, rtol=2e-4, atol=2e-5)

    # EVAL: torch now normalizes with the running stats the train pass
    # accumulated; we keep the init stats (mean 0 / var 1) — the documented
    # divergence (a fresh torch head in eval() equals ours exactly)
    ref.eval()
    with torch.no_grad():
        theirs_eval = ref(torch.from_numpy(feats)).numpy()
    ours_eval = head.apply(variables, jnp.asarray(feats), deterministic=True)
    assert np.abs(np.asarray(ours_eval) - theirs_eval).max() > 1e-3
    with torch.no_grad():
        for module in ref.modules():
            if isinstance(module, torch.nn.BatchNorm1d):
                module.reset_running_stats()
        theirs_fresh_eval = ref(torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(np.asarray(ours_eval), theirs_fresh_eval, rtol=2e-4, atol=2e-5)


def test_stacked_param_init_std_ignores_stack_axis():
    """The leading layer/depth/expert axis of scanned stacked kernels is a
    batch axis, not receptive field: default lecun_normal folds it (and, for
    the [L, H, 3, heads, dh] qkv kernel, the 3/heads axes) into fan_in,
    shrinking init std by sqrt(L*3*heads) — enough to degenerate from-scratch
    towers (the seeded demo's zero-shot AUC collapsed to 0.0 when the qkv
    layout change triggered it).  Pin each stacked kernel's std to the
    per-layer lecun target 1/sqrt(fan_in)."""
    from mmgclip_tpu.models import GPTConfig, init_gpt
    from mmgclip_tpu.models.projections import MoEProjectionHead

    def check(arr, fan_in, name):
        # truncated-normal lecun: realized std ~ 1/sqrt(fan_in) (the
        # truncation correction is already folded into the initializer)
        target = 1.0 / np.sqrt(fan_in)
        got = float(np.asarray(arr).std())
        assert 0.8 * target < got < 1.2 * target, (
            f"{name}: init std {got:.5f} vs per-layer lecun target {target:.5f}"
        )

    bcfg = BertConfig.tiny()
    _, bparams = init_bert(bcfg, seed=0)
    bp = bparams["params"]
    H, I = bcfg.hidden_size, bcfg.intermediate_size
    check(bp["qkv_kernel"], H, "bert qkv_kernel")
    check(bp["out_kernel"], H, "bert out_kernel")
    check(bp["mlp_in_kernel"], H, "bert mlp_in_kernel")
    check(bp["mlp_out_kernel"], I, "bert mlp_out_kernel")

    gcfg = GPTConfig.tiny()
    _, gparams = init_gpt(gcfg, seed=0)
    gp = gparams["params"]
    check(gp["qkv_kernel"], gcfg.hidden_size, "gpt qkv_kernel")
    check(gp["mlp_out_kernel"], gcfg.intermediate_size, "gpt mlp_out_kernel")

    ccfg = ConvNeXtConfig.micro()
    _, cparams = init_convnext(ccfg, image_size=64)
    stage = cparams["params"]["stage_0"]
    d = int(np.asarray(stage["pwconv1_kernel"]).shape[1])
    check(stage["dwconv_kernel"], 49, "convnext dwconv_kernel")
    check(stage["pwconv1_kernel"], d, "convnext pwconv1_kernel")
    check(stage["pwconv2_kernel"], 4 * d, "convnext pwconv2_kernel")

    moe = MoEProjectionHead(embedding_dim=64, projection_dim=32, n_experts=4)
    mparams = moe.init(jax.random.key(0), jnp.zeros((8, 64)))["params"]
    check(mparams["w_in"], 64, "moe w_in")
    check(mparams["w_out"], 32, "moe w_out")
