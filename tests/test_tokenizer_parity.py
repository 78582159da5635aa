"""Tokenizer parity against HuggingFace BertTokenizer (VERDICT round-1 #6).

The reference's entire text path depends on HF tokenization — EOS pooling
reads the index `attention_mask.sum(-1) - 1`
(reference: mmgclip/networks/mmgclip_model.py:110-111; tokenizer calls at
mmgclip/dataset/dataset.py:72,343-351).  These tests prove the in-repo
WordPiece fallback is ALGORITHM-EQUAL to transformers.BertTokenizer given
the same vocab.txt: identical input_ids, attention_mask, token_type_ids and
[SEP]-at-EOS on every prompt-bank sentence plus adversarial strings.
"""

import os

import numpy as np
import pytest

from mmgclip_tpu.data.tokenizer import Tokenizer, WordPieceTokenizer, _default_corpus

VOCAB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "vocab_fixture.txt")

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_tokenizer():
    return transformers.BertTokenizer(vocab_file=VOCAB, do_lower_case=True)


@pytest.fixture(scope="module")
def ours():
    return Tokenizer(WordPieceTokenizer.from_vocab_file(VOCAB), sequence_length=64)


def _bank_sentences():
    """Every sentence the framework ever tokenizes, slots filled."""
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
    "",  # empty -> [CLS] [SEP]
    "   ",
    "word",
    "UPPERCASE Mixed-Case punctuation!!! (parens) [brackets]",
    "café naïve résumé",  # accent stripping
    "multi  spaces\tand\nnewlines",
    "1234567890 12 3.5mm",
    "supercalifragilistic" * 6,  # >100 chars -> whole-word [UNK]
    "zzzgibberishwordzzz",  # not in vocab, no piece cover -> [UNK]
    "architectural distortion with calcifications, BIRADS score of 5.",
]


def test_wordpiece_equals_hf_on_prompt_banks(hf_tokenizer, ours):
    sents = _bank_sentences()
    theirs = hf_tokenizer(sents, padding="max_length", truncation=True,
                          max_length=64, return_tensors="np")
    mine = ours(sents, padding="max_length", truncation=True, max_length=64)
    np.testing.assert_array_equal(mine["input_ids"], np.asarray(theirs["input_ids"]))
    np.testing.assert_array_equal(mine["attention_mask"], np.asarray(theirs["attention_mask"]))
    np.testing.assert_array_equal(mine["token_type_ids"], np.asarray(theirs["token_type_ids"]))


def test_wordpiece_equals_hf_on_adversarial_strings(hf_tokenizer, ours):
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


def test_eos_index_is_sep_everywhere(hf_tokenizer, ours):
    """EOS pooling contract: input_ids[i, mask.sum()-1] == [SEP], matching
    the reference's eos_token_indices (mmgclip_model.py:110-111)."""
    sep = hf_tokenizer.vocab["[SEP]"]
    sents = _bank_sentences() + [a for a in ADVERSARIAL]
    mine = ours(sents, padding="max_length", truncation=True, max_length=32)
    eos = mine["attention_mask"].sum(-1) - 1
    np.testing.assert_array_equal(
        mine["input_ids"][np.arange(len(sents)), eos], np.full(len(sents), sep)
    )


def test_truncation_keeps_sep_last_like_hf(hf_tokenizer, ours):
    long_text = " ".join(_bank_sentences()[:20])
    for max_length in (8, 16, 33):
        theirs = hf_tokenizer([long_text], padding="max_length", truncation=True,
                              max_length=max_length, return_tensors="np")
        mine = ours([long_text], padding="max_length", truncation=True, max_length=max_length)
        np.testing.assert_array_equal(mine["input_ids"], np.asarray(theirs["input_ids"]))


def test_from_pretrained_loads_vocab_file():
    tok = Tokenizer.from_pretrained(VOCAB, sequence_length=32)
    out = tok(["mass margin is spiculated."])
    assert out["input_ids"].shape == (1, 32)
    # special ids come from the vocab file, not assumed module positions
    wp = WordPieceTokenizer.from_vocab_file(VOCAB)
    assert wp.cls_id == 7 and wp.sep_id == 8 and wp.unk_id == 6 and wp.pad_id == 0
    assert out["input_ids"][0, 0] == 7


def test_fixture_exercises_multipiece_and_unk(hf_tokenizer):
    """The committed vocab really forces multi-piece splits and [UNK]s."""
    toks = hf_tokenizer.tokenize("calcifications architectural zzgibberishzz")
    assert any(t.startswith("##") for t in toks)
    assert "[UNK]" in toks

def test_no_truncation_overflow_still_keeps_sep_last(hf_tokenizer, ours):
    """truncation=False + padding='max_length' with an over-length text: the
    fixed canvas still has to cut, and the cut must follow the family
    truncate rule (keep [SEP] last) — a bare slice would chop [SEP] and make
    eos_pool (sum(mask)-1) pool an arbitrary mid-sentence token."""
    sep = hf_tokenizer.vocab["[SEP]"]
    long_text = " ".join(_bank_sentences()[:20])
    mine = ours([long_text], padding="max_length", truncation=False, max_length=16)
    assert mine["input_ids"].shape == (1, 16)
    eos = int(mine["attention_mask"][0].sum()) - 1
    assert mine["input_ids"][0, eos] == sep
