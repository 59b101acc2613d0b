"""Property-based checks (SURVEY §5.4) over the pure scorer functions —
no SparkSession; hypothesis drives the input space."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from dataquality_spark.functions.minhash import (
    bow_vector,
    exact_jaccard,
    minhash_jaccard_estimate,
    minhash_signature,
)
from dataquality_spark.functions.pii import scrub_text
from dataquality_spark.functions.texthash import text_hash64, tokenize
from dataquality_spark.operators.scoring import py_action, py_overall

TEXT = st.text(max_size=300)
TOKENS = st.lists(st.text(st.characters(codec="ascii", categories=("L", "N")),
                          min_size=1, max_size=12), max_size=60)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_scrub_is_idempotent_and_clean(t):
    s1, hits1, tox1 = scrub_text(t)
    s2, hits2, tox2 = scrub_text(s1)
    assert s2 == s1  # idempotent
    assert hits2 == 0  # nothing left to scrub
    # no raw SSN/phone/email shapes survive
    assert not re.search(r"\d{3}-\d{2}-\d{4}", s1)
    assert not re.search(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", s1)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_tokenize_matches_reference_spec(t):
    # lowercase, split \W+, drop empties — metadata.py:218-226
    want = [x for x in re.split(r"\W+", t.lower()) if x]
    assert tokenize(t) == want


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_text_hash64_is_stable_and_pure(t):
    assert text_hash64(t) == text_hash64(str(t))


@settings(max_examples=100, deadline=None)
@given(TOKENS)
def test_minhash_self_estimate_is_one(toks):
    sig = minhash_signature(toks)
    assert minhash_jaccard_estimate(sig, sig) == 1.0
    assert 0.0 <= exact_jaccard(toks, toks) <= 1.0
    if toks:
        assert exact_jaccard(toks, toks) == 1.0


@settings(max_examples=100, deadline=None)
@given(TOKENS, TOKENS)
def test_jaccard_symmetry_and_bounds(a, b):
    j = exact_jaccard(a, b)
    assert j == exact_jaccard(b, a)
    assert 0.0 <= j <= 1.0
    est = minhash_jaccard_estimate(minhash_signature(a), minhash_signature(b))
    assert 0.0 <= est <= 1.0


@settings(max_examples=100, deadline=None)
@given(TOKENS)
def test_bow_vector_is_unit_or_zero(toks):
    import numpy as np

    v = bow_vector(toks)
    n = float(np.linalg.norm(v.astype(np.float64)))
    if toks:
        assert abs(n - 1.0) < 1e-5
    else:
        assert n == 0.0


@settings(max_examples=300, deadline=None)
@given(st.dictionaries(st.sampled_from(list("abcdefghijklmnopq")),
                       st.integers(0, 100), min_size=0, max_size=17))
def test_overall_and_action_are_total(scores):
    o = py_overall(scores)
    assert 0 <= o <= 100
    assert py_action(o) in {"KEEP", "REVIEW", "QUARANTINE", "DISCARD"}
    # threshold boundaries — metadata.py:425-433
    assert py_action(85) == "KEEP" and py_action(84) == "REVIEW"
    assert py_action(70) == "REVIEW" and py_action(69) == "QUARANTINE"
    assert py_action(60) == "QUARANTINE" and py_action(59) == "DISCARD"
