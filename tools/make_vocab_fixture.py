"""Generate tests/data/vocab_fixture.txt — a small, real-structure WordPiece
vocab.txt (one token per line, id = line number, BERT-family artifact format)
covering the prompt banks.

Deliberately drops every word of >= 10 chars from the whole-word section and
adds 4-char pieces instead, so greedy multi-piece WordPiece splitting is
exercised; words absent entirely fall to whole-word [UNK] in both HF
BertTokenizer and the in-repo fallback (reference tokenization contract:
mmgclip/dataset/dataset.py:72,343-351).

Run: python tools/make_vocab_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmgclip_tpu.data.tokenizer import _basic_tokenize, _default_corpus  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "vocab_fixture.txt")


def main() -> None:
    words = set()
    chars = set()
    for text in _default_corpus():
        for tok in _basic_tokenize(text, lowercase=True):
            words.add(tok)
            chars.update(tok)

    vocab = ["[PAD]"] + [f"[unused{i}]" for i in range(5)] + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += sorted(ch for ch in chars if not ch.isalnum())
    vocab += [str(d) for d in range(10)] + [f"##{d}" for d in range(10)]

    whole, pieces = [], set()
    for word in sorted(words):
        if word.isdigit() or (len(word) == 1 and not word.isalnum()):
            continue
        if len(word) >= 10:
            pieces.add(word[:4])
            for start in range(4, len(word), 4):
                pieces.add("##" + word[start : start + 4])
        else:
            whole.append(word)
    vocab += whole + sorted(pieces)

    seen = set()
    with open(OUT, "w", encoding="utf-8") as fh:
        for token in vocab:
            if token not in seen:
                seen.add(token)
                fh.write(token + "\n")
    print(f"wrote {len(seen)} tokens to {OUT}")


if __name__ == "__main__":
    main()
