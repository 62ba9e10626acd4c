"""Wikitext-2 word-level corpus (reference lstm_models/data.py:5-48).

Tokenization: whitespace split + '<eos>' appended per line; the
dictionary is built by tokenizing train, valid, test **in that order**
(Corpus.__init__), so word ids — and therefore any pretrained
checkpoint's embedding rows — depend on that exact order.

Looks for ``train.txt``/``valid.txt``/``test.txt`` under the given
directory or ``$TQ_DATA_DIR/wikitext-2``; falls back to a deterministic
Zipf-distributed synthetic stream with the real vocab size.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = ["Corpus", "load_corpus", "batchify"]


class Dictionary:
    def __init__(self):
        self.word2idx: dict[str, int] = {}
        self.idx2word: list[str] = []

    def add_word(self, word: str) -> int:
        if word not in self.word2idx:
            self.idx2word.append(word)
            self.word2idx[word] = len(self.idx2word) - 1
        return self.word2idx[word]

    def __len__(self):
        return len(self.idx2word)


class Corpus:
    def __init__(self, path: str | Path):
        path = Path(path)
        self.dictionary = Dictionary()
        self.train = self._tokenize(path / "train.txt")
        self.valid = self._tokenize(path / "valid.txt")
        self.test = self._tokenize(path / "test.txt")

    def _tokenize(self, path: Path) -> np.ndarray:
        """Two passes like the reference: build vocab, then id-ify."""
        if not path.exists():
            return np.zeros((0,), np.int32)
        ids = []
        with open(path, encoding="utf8") as f:
            for line in f:
                for word in line.split() + ["<eos>"]:
                    ids.append(self.dictionary.add_word(word))
        return np.asarray(ids, np.int32)


def load_corpus(data_dir: str | None = None):
    """(corpus-like object, source) — synthetic fallback keeps pipelines
    runnable without the dataset on disk."""
    roots = []
    if data_dir:
        roots.append(Path(data_dir))
    env = os.environ.get("TQ_DATA_DIR")
    if env:
        roots += [Path(env) / "wikitext-2", Path(env)]
    for root in roots:
        if (root / "test.txt").exists():
            return Corpus(root), "real"

    from tq_tpu.data.synthetic import synthetic_tokens

    class _Synth:
        class dictionary:
            idx2word = list(range(33278))

            @classmethod
            def __len__(cls):
                return 33278

        train = synthetic_tokens(length=200000, seed=7)
        valid = synthetic_tokens(length=20000, seed=8)
        test = synthetic_tokens(length=20000, seed=9)

    s = _Synth()
    s.vocab = 33278
    return s, "synthetic"


def batchify(data: np.ndarray, bsz: int) -> np.ndarray:
    """(N,) -> (N//bsz, bsz) column-major stream split (evaluate_lstm.py:104-110)."""
    nbatch = len(data) // bsz
    return data[: nbatch * bsz].reshape(bsz, nbatch).T.copy()
