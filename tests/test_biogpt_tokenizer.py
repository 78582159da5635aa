"""Moses+BPE tokenizer parity against transformers.BioGptTokenizer.

The reference's BioGPT ablation tokenizes with ``AutoTokenizer`` on
``microsoft/biogpt`` (reference: configs/tokenizer/biogpt.yaml:1-4,
mmgclip/dataset/dataset.py:72) — a Moses + fastBPE scheme, NOT WordPiece.
These tests prove the in-repo :class:`MosesBpeTokenizer` is ALGORITHM-EQUAL
to ``transformers.BioGptTokenizer`` given the same vocab.json + merges.txt
(fixture learned deterministically from the prompt-bank corpus), that
``Tokenizer.from_pretrained`` engages it for biogpt-family names offline,
and that the biogpt tokenizer config reaches a causal-decoder forward
end-to-end.
"""

import json
import os

import numpy as np
import pytest

from mmgclip_tpu.data.tokenizer import (
    MosesBpeTokenizer,
    Tokenizer,
    _default_corpus,
    learn_bpe_from_corpus,
)

transformers = pytest.importorskip("transformers")
pytest.importorskip("sacremoses")


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """Deterministic vocab.json + merges.txt learned from the in-repo corpus."""
    vocab, merges = learn_bpe_from_corpus(_default_corpus(), num_merges=256)
    d = tmp_path_factory.mktemp("biogpt_fixture")
    with open(d / "vocab.json", "w", encoding="utf-8") as fh:
        json.dump(vocab, fh, ensure_ascii=False)
    with open(d / "merges.txt", "w", encoding="utf-8") as fh:
        fh.writelines(" ".join(m) + "\n" for m in merges)
    return str(d)


@pytest.fixture(scope="module")
def hf_tokenizer(bpe_dir):
    return transformers.BioGptTokenizer(
        vocab_file=os.path.join(bpe_dir, "vocab.json"),
        merges_file=os.path.join(bpe_dir, "merges.txt"),
    )


@pytest.fixture(scope="module")
def ours(bpe_dir):
    backend = MosesBpeTokenizer.from_files(
        os.path.join(bpe_dir, "vocab.json"), os.path.join(bpe_dir, "merges.txt")
    )
    return Tokenizer(backend, sequence_length=64, name="biogpt-fixture")


def _bank_sentences():
    sents = []
    for text in _default_corpus():
        sents.append(
            text.replace("{M_MARG}", "spiculated").replace("{M_SHAPE}", "irregular")
            .replace("{M_MALIG}", "malignant").replace("{C_MALIG}", "benign")
            .replace("{C_DIST}", "regional").replace("{B_SCORE}", "4")
            .replace("{HISTOLOGY}", "invasive ductal carcinoma")
            .replace("{E}", "mass").replace("{R}", "clearly")
        )
    return sents


ADVERSARIAL = [
    "",
    "   ",
    "word",
    "UPPERCASE Mixed-Case punctuation!!! (parens) [brackets]",
    "café naïve résumé",
    "ill-defined non-calcified mass, 3.5mm & <tag>",  # dash splits + escaping
    "1234567890 12 3.5mm",
    "zzzgibberishwordzzz",
    "architectural distortion with calcifications, BIRADS score of 5.",
]


def test_bpe_equals_hf_on_prompt_banks(hf_tokenizer, ours):
    sents = _bank_sentences()
    theirs = hf_tokenizer(sents, padding="max_length", truncation=True,
                          max_length=64, return_tensors="np")
    mine = ours(sents, padding="max_length", truncation=True, max_length=64)
    np.testing.assert_array_equal(mine["input_ids"], np.asarray(theirs["input_ids"]))
    np.testing.assert_array_equal(mine["attention_mask"], np.asarray(theirs["attention_mask"]))


def test_bpe_equals_hf_on_adversarial_strings(hf_tokenizer, ours):
    for text in ADVERSARIAL:
        theirs = hf_tokenizer([text], padding="max_length", truncation=True,
                              max_length=48, return_tensors="np")
        mine = ours([text], padding="max_length", truncation=True, max_length=48)
        np.testing.assert_array_equal(
            mine["input_ids"], np.asarray(theirs["input_ids"]), err_msg=repr(text)
        )
        np.testing.assert_array_equal(
            mine["attention_mask"], np.asarray(theirs["attention_mask"]), err_msg=repr(text)
        )


def test_truncation_matches_hf(hf_tokenizer, ours):
    long_text = " ".join(_bank_sentences()[:20])
    for max_length in (8, 16, 33):
        theirs = hf_tokenizer([long_text], padding="max_length", truncation=True,
                              max_length=max_length, return_tensors="np")
        mine = ours([long_text], padding="max_length", truncation=True, max_length=max_length)
        np.testing.assert_array_equal(mine["input_ids"], np.asarray(theirs["input_ids"]))


def test_sep_is_first_token_fairseq_framing(hf_tokenizer, ours):
    """BioGPT frames `</s> X` — sep FIRST; the last real token is an
    ordinary word piece, which EOS pooling (sum(mask)-1) still selects."""
    mine = ours(["mass margin is spiculated"], max_length=32)
    assert mine["input_ids"][0, 0] == hf_tokenizer.sep_token_id
    eos = mine["attention_mask"][0].sum() - 1
    assert eos > 0 and mine["input_ids"][0, eos] != 0


def test_from_pretrained_engages_bpe_on_local_dir(bpe_dir):
    tok = Tokenizer.from_pretrained(bpe_dir, sequence_length=32)
    assert isinstance(tok._backend, MosesBpeTokenizer)
    out = tok(["mass margin is spiculated."])
    assert out["input_ids"].shape == (1, 32)


def test_from_pretrained_biogpt_name_falls_back_to_bpe_not_wordpiece():
    tok = Tokenizer.from_pretrained("microsoft/biogpt", sequence_length=32)
    assert isinstance(tok._backend, MosesBpeTokenizer)
    assert tok.is_fallback
    out = tok(["calcifications are present"], max_length=16)
    assert out["input_ids"].shape == (1, 16)
    assert out["attention_mask"][0].sum() > 2


def test_sentencepiece_family_fails_loudly():
    with pytest.raises(RuntimeError, match="SentencePiece"):
        Tokenizer.from_pretrained("mistralai/Mistral-7B-v0.1", sequence_length=32)


def test_biogpt_config_end_to_end_forward():
    """configs/tokenizer/biogpt.yaml -> BPE tokenization -> causal text
    tower forward: the ablation pipeline is actually runnable offline."""
    import jax
    import jax.numpy as jnp

    from mmgclip_tpu.config import compose

    cfg = compose(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"),
        "train_binary_class_clf",
        overrides=["tokenizer=biogpt"],
    )
    name = cfg.tokenizer.config.tokenizer_name
    assert name == "microsoft/biogpt"
    tok = Tokenizer.from_pretrained(name, sequence_length=32)
    assert isinstance(tok._backend, MosesBpeTokenizer)
    batch = tok(["mass margin is spiculated", "no calcifications observed"],
                max_length=32)

    from mmgclip_tpu.models.gpt import CausalTextEncoder, GPTConfig

    config = GPTConfig(
        vocab_size=max(tok.vocab_size, 512), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=32,
    )
    enc = CausalTextEncoder(config)
    variables = jax.jit(enc.init)(jax.random.key(0), jnp.asarray(batch["input_ids"]),
                                  jnp.asarray(batch["attention_mask"]))
    hidden = jax.jit(enc.apply)(variables, jnp.asarray(batch["input_ids"]),
                                jnp.asarray(batch["attention_mask"]))
    assert hidden.shape == (2, 32, 64)
    assert bool(jnp.all(jnp.isfinite(hidden)))


def test_sentencepiece_markers_are_word_bounded():
    """'t5' must not match inside unrelated names like 'gpt5-med' (review
    fix): non-SentencePiece names still get the WordPiece fallback."""
    from mmgclip_tpu.data.tokenizer import WordPieceTokenizer

    tok = Tokenizer.from_pretrained("acme/gpt5-med-tokenizer", sequence_length=16)
    assert isinstance(tok._backend, WordPieceTokenizer)
    with pytest.raises(RuntimeError, match="SentencePiece"):
        Tokenizer.from_pretrained("google/t5-base", sequence_length=16)
    with pytest.raises(RuntimeError, match="SentencePiece"):
        Tokenizer.from_pretrained("meta/Llama-3-8B", sequence_length=16)


@pytest.mark.slow
def test_biogpt_ablation_trains_end_to_end(tmp_path):
    """The thesis' BioGPT ablation row is reachable as a PIPELINE offline:
    tokenizer=biogpt (Moses+BPE fallback) + CausalTextEncoder text tower
    through the standard train.run flow — finite, decreasing loss."""
    import json as _json

    import numpy as np

    import train
    from mmgclip_tpu.config import Config, compose
    from fixtures import build_image_label_tree

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base, annotated, lists_dir, features_dir = build_image_label_tree(
        str(tmp_path), n_benign=8, n_malignant=8
    )
    run_dir = tmp_path / "run"
    cfg = compose(os.path.join(repo, "configs"), "train_binary_class_clf",
                  run_dir=str(run_dir), overrides=["tokenizer=biogpt"])
    cfg.dataset.config.base_dataset_path = base
    cfg.dataset.config.annotated_dataset_path = annotated
    cfg.dataset.config.lists_dataset_path = lists_dir
    cfg.base.features_export_dir = features_dir
    cfg.base.export_dir = str(run_dir)
    cfg.base.tensorboard_export_dir = str(tmp_path / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(tmp_path / "ckpt")
    cfg.tokenizer.config.sequence_length = 32
    # tiny BioGPT-topology tower; vocab_size comes from the BPE tokenizer
    cfg.networks.text_encoder = Config({
        "name": "CausalTextEncoder",
        "config": {"hidden_size": 64, "num_hidden_layers": 2,
                   "num_attention_heads": 4, "intermediate_size": 128,
                   "max_position_embeddings": 64},
    })
    cfg.scheduler.config.epochs = 4
    cfg.dataloader.train.batch_size = 4
    cfg.dataloader.valid.batch_size = 2
    cfg.dataset.eval.enum_classes = []

    train.run(cfg)
    lines = [_json.loads(l) for l in open(os.path.join(str(tmp_path / "runs"), "scalars.jsonl"))]
    losses = [l["value"] for l in lines if l["tag"] == "loss/train"]
    assert len(losses) == 4
    assert all(np.isfinite(v) for v in losses)
    assert min(losses[1:]) < losses[0]  # epoch 0 is lr=0 warmup
