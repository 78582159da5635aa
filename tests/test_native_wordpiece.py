"""Native C++ batch WordPiece (native/wordpiece.cc) == the Python tokenizer.

The native path implements the ASCII subset of HF BertTokenizer semantics;
non-ASCII strings route to the Python implementation.  These tests pin
byte-equality of the two paths on the prompt banks, adversarial ASCII
strings and truncation edges, plus the routing rules.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.isfile(os.path.join(REPO, "native", "libmmg_wordpiece.so")):
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], capture_output=True)

from mmgclip_tpu.data.tokenizer import Tokenizer, WordPieceTokenizer, _default_corpus  # noqa: E402
from mmgclip_tpu.data.native_wordpiece import NativeWordPiece, native_available  # noqa: E402

VOCAB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "vocab_fixture.txt")

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libmmg_wordpiece.so failed to build (make -C native)"
)


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
    return [s for s in sents if s.isascii()]


ADVERSARIAL_ASCII = [
    "",
    "   ",
    "word",
    "UPPERCASE Mixed-Case punctuation!!! (parens) [brackets]",
    "multi  spaces\tand\nnewlines",
    "1234567890 12 3.5mm",
    "supercalifragilistic" * 6,  # >100 chars -> whole-word [UNK]
    "zzzgibberishwordzzz",
    "architectural distortion with calcifications, BIRADS score of 5.",
    "$price <tag> a|b ~x `y` c^d",
]


@pytest.fixture(scope="module", params=["default-vocab", "file-vocab"])
def pair(request):
    if request.param == "file-vocab":
        backend = WordPieceTokenizer.from_vocab_file(VOCAB)
    else:
        backend = WordPieceTokenizer()
    native = NativeWordPiece(backend.vocab, lowercase=backend.lowercase)
    return backend, native


def _python_encode(tok, backend, texts, max_len, padding="max_length"):
    os.environ["MMGCLIP_NATIVE_TOKENIZER"] = "0"
    try:
        fresh = Tokenizer(backend, sequence_length=max_len)
        return fresh(texts, padding=padding, truncation=True, max_length=max_len)
    finally:
        os.environ.pop("MMGCLIP_NATIVE_TOKENIZER", None)


@pytest.mark.parametrize("max_len", [16, 32, 64])
def test_native_equals_python_on_banks_and_adversarial(pair, max_len):
    backend, native = pair
    texts = _bank_sentences() + ADVERSARIAL_ASCII
    ids, mask = native.encode_batch(texts, max_len)
    expected = _python_encode(None, backend, texts, max_len)
    np.testing.assert_array_equal(ids, expected["input_ids"], err_msg=f"max_len={max_len}")
    np.testing.assert_array_equal(mask, expected["attention_mask"])


def test_tokenizer_call_uses_native_and_matches_python(pair):
    backend, _ = pair
    texts = ADVERSARIAL_ASCII
    tok = Tokenizer(backend, sequence_length=32)
    assert tok._native_backend() is not None
    native_out = tok(texts, max_length=32)
    python_out = _python_encode(None, backend, texts, 32)
    np.testing.assert_array_equal(native_out["input_ids"], python_out["input_ids"])
    np.testing.assert_array_equal(native_out["attention_mask"], python_out["attention_mask"])
    np.testing.assert_array_equal(native_out["token_type_ids"], python_out["token_type_ids"])


def test_longest_padding_matches_python(pair):
    backend, _ = pair
    tok = Tokenizer(backend, sequence_length=64)
    texts = ["mass margin is spiculated", "benign"]
    native_out = tok(texts, padding="longest", max_length=64)
    python_out = _python_encode(None, backend, texts, 64, padding="longest")
    assert native_out["input_ids"].shape == python_out["input_ids"].shape
    np.testing.assert_array_equal(native_out["input_ids"], python_out["input_ids"])


def test_non_ascii_routes_to_python(pair):
    backend, native = pair
    texts = ["café naïve résumé", "plain ascii"]
    assert native.encode_batch(texts, 16) is None  # native refuses
    tok = Tokenizer(backend, sequence_length=16)
    out = tok(texts, max_length=16)  # transparently falls back
    expected = _python_encode(None, backend, texts, 16)
    np.testing.assert_array_equal(out["input_ids"], expected["input_ids"])


def test_native_is_actually_engaged_by_default():
    tok = Tokenizer(WordPieceTokenizer(), sequence_length=16)
    assert tok._native_backend() is not None


def test_empty_string_token_does_not_shift_ids():
    """A vocab containing the empty-string token must not shift later ids
    off-by-one in the native blob (review fix: empty lines consume ids)."""
    backend = WordPieceTokenizer()
    vocab = dict(backend.vocab)
    hole = len(vocab)
    vocab[""] = hole  # dense, but serializes to an empty line
    vocab["zzztail"] = hole + 1
    native = NativeWordPiece(vocab, lowercase=True)
    patched = WordPieceTokenizer(vocab, lowercase=True)
    texts = ["zzztail mass margin is spiculated"]
    ids, mask = native.encode_batch(texts, 16)
    tok = Tokenizer(patched, sequence_length=16)
    os.environ["MMGCLIP_NATIVE_TOKENIZER"] = "0"
    try:
        expected = Tokenizer(patched, sequence_length=16)(texts, max_length=16)
    finally:
        os.environ.pop("MMGCLIP_NATIVE_TOKENIZER", None)
    np.testing.assert_array_equal(ids, expected["input_ids"])


def test_newline_token_rejected():
    backend = WordPieceTokenizer()
    vocab = dict(backend.vocab)
    vocab["bad\ntoken"] = len(vocab)
    with pytest.raises(ValueError, match="newline"):
        NativeWordPiece(vocab)
