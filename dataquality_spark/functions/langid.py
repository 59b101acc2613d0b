"""fastText-style language identification: hashed char-n-gram linear model.

Replaces the reference's LLM document-type/validity judgment
(``backend/app/services/bedrock.py:111-264``) with a deterministic,
broadcastable scorer per the north rule.  The model is a per-class
log-probability table over hashed character trigram buckets (multinomial
Naive Bayes — the same family fastText's linear classifier reduces to for
char n-grams), trained at import time on the fixed synthetic corpora so
every process (Spark executor, oracle, test) holds byte-identical weights.

Scoring is numpy-vectorized per batch: the only per-row Python is the string
encode. Designed to be wrapped in a pandas/Arrow UDF (see
``operators/enrich.py``) with the weight matrix broadcast once per executor.
"""

from __future__ import annotations

import numpy as np

from ..datagen import corpus
from .texthash import char_ngrams_hashed

DIM = 4096
NGRAM = 3
LANGS = ("en", "xx")
UNKNOWN = "und"


def _train_class(text: str) -> np.ndarray:
    counts = np.ones(DIM, dtype=np.float64)  # add-1 smoothing
    idx = char_ngrams_hashed(text, NGRAM, DIM)
    np.add.at(counts, idx, 1.0)
    return np.log(counts / counts.sum())


class LangIdModel:
    """Per-class hashed-trigram log-prob tables; picklable + broadcastable."""

    def __init__(self, log_probs: np.ndarray, langs: tuple[str, ...]):
        self.log_probs = log_probs  # shape (n_classes, DIM)
        self.langs = langs

    def predict_one(self, text: str) -> tuple[str, float]:
        idx = char_ngrams_hashed(text or "", NGRAM, DIM)
        if idx.size == 0:
            return UNKNOWN, 0.0
        means = self.log_probs[:, idx].mean(axis=1)
        order = np.argsort(means)[::-1]
        margin = float(means[order[0]] - means[order[1]]) if len(means) > 1 else 1.0
        conf = float(1.0 / (1.0 + np.exp(-8.0 * margin)))
        return self.langs[order[0]], conf

    def predict_batch(self, texts) -> tuple[list[str], np.ndarray]:
        langs: list[str] = []
        confs = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            lang, conf = self.predict_one(t if t is not None else "")
            langs.append(lang)
            confs[i] = conf
        return langs, confs


def default_model() -> LangIdModel:
    lp = np.stack(
        [
            _train_class(corpus.training_text(corpus.EN_WORDS)),
            _train_class(corpus.training_text(corpus.XX_WORDS)),
        ]
    )
    return LangIdModel(lp, LANGS)


_MODEL: LangIdModel | None = None


def get_model() -> LangIdModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = default_model()
    return _MODEL
