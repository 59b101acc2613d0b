"""Compiled-regex PII / toxicity scrub bank.

The reference only *detects* PII/toxicity risk through the LLM's Value-
dimension rubric ("High risk of bias, toxicity, PII, or legal exposure",
``backend/app/services/bedrock.py:211-214``; SSN example ``:250``).  Per the
north rule our engine must also *emit scrubbed transcripts*.  The bank is a
module-level compiled constant so executors pay compilation once; the same
functions are used verbatim by the pure-Python oracle, making scrubbed-text
equality exact by construction.
"""

from __future__ import annotations

import re

from ..datagen.corpus import TOXIC_WORDS

# Order matters: scrub is applied in list order (email before phone so the
# digits inside an email local-part are not half-eaten by the phone regex).
PII_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("SSN", re.compile(r"\b\d{3}-\d{2}-\d{4}\b")),
    ("EMAIL", re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b")),
    ("PHONE", re.compile(r"\b(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b")),
    ("CCNUM", re.compile(r"\b(?:\d[ -]?){13,16}\b")),
    ("IP", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")),
]

TOXIC_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(w) for w in TOXIC_WORDS) + r")\b", re.IGNORECASE
)


def scrub_text(text: str) -> tuple[str, int, int]:
    """-> (scrubbed_text, pii_hits, toxic_hits).

    PII spans are replaced with ``[TAG]`` placeholders; toxic words with
    ``[TOX]``.  Idempotent: placeholders contain no digits/@ so a second pass
    is a no-op.
    """
    if not text:
        return text, 0, 0
    pii_hits = 0
    for tag, pat in PII_PATTERNS:
        text, n = pat.subn(f"[{tag}]", text)
        pii_hits += n
    text, toxic_hits = TOXIC_RE.subn("[TOX]", text)
    return text, pii_hits, toxic_hits


def scrub_batch(texts) -> tuple[list[str], list[int], list[int]]:
    out_t: list[str] = []
    out_p: list[int] = []
    out_x: list[int] = []
    for t in texts:
        s, p, x = scrub_text(t if t is not None else "")
        out_t.append(s)
        out_p.append(p)
        out_x.append(x)
    return out_t, out_p, out_x
