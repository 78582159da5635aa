"""Tokenization for the text tower.

The reference tokenizes with HuggingFace ``AutoTokenizer`` everywhere
(reference: mmgclip/dataset/dataset.py:72,343-351, mmgclip_model.py:192-195).
This wrapper keeps that call signature (`padding="max_length"`, truncation,
max_length) but returns plain numpy arrays (jit-ready), and degrades to an
in-repo WordPiece tokenizer with a deterministic vocabulary when the HF hub
is unreachable — this environment has zero egress.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..utils.logging import logger

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
PAD_ID, UNK_ID, CLS_ID, SEP_ID, MASK_ID = range(5)

_TOKEN_RE = re.compile(r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]")


def _basic_tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text.lower())


def build_vocab_from_corpus(corpus: Sequence[str], max_size: int = 8192) -> Dict[str, int]:
    """Deterministic vocabulary: specials, single chars, then corpus words by
    frequency (ties broken lexicographically)."""
    from collections import Counter

    counts: Counter = Counter()
    chars = set()
    for text in corpus:
        for tok in _basic_tokenize(text):
            counts[tok] += 1
            chars.update(tok)
    vocab: Dict[str, int] = {}
    for sp in SPECIALS:
        vocab[sp] = len(vocab)
    for ch in sorted(chars):
        for form in (ch, f"##{ch}"):
            if form not in vocab:
                vocab[form] = len(vocab)
    for word, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])):
        if word not in vocab and len(vocab) < max_size:
            vocab[word] = len(vocab)
    return vocab


def _default_corpus() -> List[str]:
    """Seed corpus: every sentence bank plus label vocabulary words."""
    from ..prompts.enums import ENUM_CLASSES, gtr_Histology
    from ..prompts.generator import _banks  # noqa: SLF001 - internal by design

    corpus: List[str] = []

    def collect(node):
        if isinstance(node, str):
            corpus.append(node)
        elif isinstance(node, dict):
            for v in node.values():
                collect(v)
        elif isinstance(node, list):
            for v in node:
                collect(v)

    collect(_banks())
    for enum_class in ENUM_CLASSES.values():
        corpus.extend(member.name for member in enum_class)
    corpus.extend(gtr_Histology.values())
    corpus.append("finding suggesting mass margin shape is no was observed revealed "
                  "normal architecture visible displayed architectural distortion "
                  "calcifications are present birads score of benign malignant "
                  "mammogram a the this ill defined non-calcified unknown")
    return corpus


_DEFAULT_VOCAB: Optional[Dict[str, int]] = None


def _default_vocab() -> Dict[str, int]:
    """The deterministic fallback vocabulary, built once per process."""
    global _DEFAULT_VOCAB
    if _DEFAULT_VOCAB is None:
        _DEFAULT_VOCAB = build_vocab_from_corpus(_default_corpus())
    return _DEFAULT_VOCAB


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece with [CLS] ... [SEP] framing."""

    def __init__(self, vocab: Optional[Dict[str, int]] = None, max_wordpiece_len: int = 32):
        self.vocab = vocab if vocab is not None else _default_vocab()
        self.ids_to_tokens = {v: k for k, v in self.vocab.items()}
        self.max_wordpiece_len = max_wordpiece_len

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def _wordpiece(self, word: str) -> List[int]:
        if word in self.vocab:
            return [self.vocab[word]]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = min(len(word), start + self.max_wordpiece_len)
            piece_id = None
            while end > start:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    piece_id = self.vocab[piece]
                    break
                end -= 1
            if piece_id is None:
                return [UNK_ID]
            ids.append(piece_id)
            start = end
        return ids

    def encode(self, text: str) -> List[int]:
        ids = [CLS_ID]
        for tok in _basic_tokenize(text):
            ids.extend(self._wordpiece(tok))
        ids.append(SEP_ID)
        return ids


class Tokenizer:
    """HF-call-compatible front; numpy outputs.

    ``Tokenizer.from_pretrained(name)`` prefers a locally cached HF tokenizer
    and silently falls back to :class:`WordPieceTokenizer`.
    """

    def __init__(self, backend, sequence_length: int = 256, name: str = "wordpiece"):
        self._backend = backend
        self.sequence_length = sequence_length
        self.name = name

    @property
    def vocab_size(self) -> int:
        if hasattr(self._backend, "vocab_size"):
            return int(self._backend.vocab_size)
        return len(self._backend)  # pragma: no cover

    @property
    def is_fallback(self) -> bool:
        return isinstance(self._backend, WordPieceTokenizer)

    @classmethod
    def from_pretrained(cls, name: str, sequence_length: int = 256) -> "Tokenizer":
        try:
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
            os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
            from transformers import AutoTokenizer

            backend = AutoTokenizer.from_pretrained(name)
            logger.info(f"Loaded cached HF tokenizer {name!r}.")
            return cls(backend, sequence_length, name)
        except Exception:
            logger.info(
                f"HF tokenizer {name!r} unavailable offline; using in-repo WordPiece fallback."
            )
            return cls(WordPieceTokenizer(), sequence_length, name)

    def __call__(
        self,
        texts: Union[str, Sequence[str]],
        padding: str = "max_length",
        truncation: bool = True,
        max_length: Optional[int] = None,
        return_tensors: str = "np",
    ) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.sequence_length

        if not self.is_fallback:
            out = self._backend(
                list(texts), padding=padding, truncation=truncation,
                max_length=max_length, return_tensors="np",
            )
            result = {k: np.asarray(v) for k, v in out.items()}
            if "token_type_ids" not in result:
                result["token_type_ids"] = np.zeros_like(result["input_ids"])
            return result

        encoded = [self._backend.encode(t)[:max_length] if truncation else self._backend.encode(t) for t in texts]
        if padding == "longest":
            width = max(len(e) for e in encoded)
        else:
            width = max_length
        n = len(encoded)
        input_ids = np.full((n, width), PAD_ID, np.int32)
        attention_mask = np.zeros((n, width), np.int32)
        for i, ids in enumerate(encoded):
            ids = ids[:width]
            input_ids[i, : len(ids)] = ids
            attention_mask[i, : len(ids)] = 1
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "token_type_ids": np.zeros((n, width), np.int32),
        }
