"""KenLM-style character n-gram language model perplexity.

Replaces the reference's LLM "Interpretability / Fitness for Use" judgment
with a deterministic gibberish detector per the north rule: an order-3
hashed-char-n-gram LM with interpolated backoff to the bigram/unigram
levels, trained at import on the fixed EN corpus, broadcast to executors,
and scored in numpy batches inside a pandas UDF.

perplexity(text) = exp(-mean log P(c_i | c_{i-2} c_{i-1})).  Lower is more
English-like; the calibrated dimension thresholds live in
``operators/scoring.py``.
"""

from __future__ import annotations

import numpy as np

from ..datagen import corpus
from .texthash import char_ngrams_hashed

DIM = 1 << 16
ORDER = 3
# Interpolation weights for order 3, 2, 1 (KenLM-style fixed interpolation).
LAMBDAS = (0.7, 0.2, 0.1)
# Perplexity assigned to empty / too-short text (scores as uninterpretable).
EMPTY_PPL = 10000.0


class CharLM:
    """Hashed count tables for n=1..ORDER, interpolated. Picklable."""

    def __init__(self, probs: list[np.ndarray]):
        self.probs = probs  # probs[n-1]: normalized bucket probs for n-grams

    def perplexity_one(self, text: str) -> float:
        text = text or ""
        if len(text) < ORDER:
            return EMPTY_PPL
        p = np.zeros(len(text) - ORDER + 1, dtype=np.float64)
        for n, lam in zip(range(ORDER, 0, -1), LAMBDAS):
            idx = char_ngrams_hashed(text, n, DIM)
            # align windows of each order to the trigram positions (suffix)
            off = idx.size - p.size
            p += lam * self.probs[n - 1][idx[off:]]
        return float(np.exp(-np.log(np.maximum(p, 1e-12)).mean()))

    def perplexity_batch(self, texts) -> np.ndarray:
        return np.fromiter(
            (self.perplexity_one(t if t is not None else "") for t in texts),
            dtype=np.float64,
            count=len(texts),
        )


def _train_level(text: str, n: int) -> np.ndarray:
    counts = np.full(DIM, 0.1, dtype=np.float64)  # add-k smoothing
    idx = char_ngrams_hashed(text, n, DIM)
    np.add.at(counts, idx, 1.0)
    return counts / counts.sum()


def default_model() -> CharLM:
    text = corpus.training_text(corpus.EN_WORDS, n_tokens=40000)
    return CharLM([_train_level(text, n) for n in range(1, ORDER + 1)])


_MODEL: CharLM | None = None


def get_model() -> CharLM:
    global _MODEL
    if _MODEL is None:
        _MODEL = default_model()
    return _MODEL
