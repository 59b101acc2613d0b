"""Policy-rule unit tests (P1-P4) + Spark-vs-Python parity of all 17 rules."""

import pandas as pd
import pytest

from dataquality_spark.operators import scoring


def _sig(**overrides):
    base = dict(
        clip_id="clip_000000000001", sr_hz=16000, dur_ms=1000, codec="pcm_s16le",
        decode_ok=True, n_samples=16000, header_sr_hz=16000, clip_ratio=0.0,
        is_silent=False, lang="en", lang_conf=0.99, ppl=100.0, pii_hits=0,
        toxic_hits=0, n_chars=120, n_tokens=20, n_distinct=19,
        alpha_space_ratio=0.97, age_days=5, is_dup=False,
    )
    base.update(overrides)
    return base


def test_action_thresholds_boundaries():
    # P4 — metadata.py:425-433: >=85 KEEP, >=70 REVIEW, >=60 QUARANTINE
    assert scoring.py_action(85) == "KEEP"
    assert scoring.py_action(84) == "REVIEW"
    assert scoring.py_action(70) == "REVIEW"
    assert scoring.py_action(69) == "QUARANTINE"
    assert scoring.py_action(60) == "QUARANTINE"
    assert scoring.py_action(59) == "DISCARD"
    assert scoring.py_action(0) == "DISCARD"


def test_timeliness_boundary():
    # P2 — age > 30 days caps at 60; exactly 30 does not (metadata.py:398-407)
    assert scoring.py_dimension_scores(_sig(age_days=30))["Timeliness"] == 90
    assert scoring.py_dimension_scores(_sig(age_days=31))["Timeliness"] == 60


def test_overall_default_and_mean():
    assert scoring.py_overall({}) == 50  # P3 default — metadata.py:419-421
    assert scoring.py_overall({d: 90 for d in scoring.DIMENSIONS}) == 90


def test_all_scores_in_range():
    for sig in [
        _sig(), _sig(decode_ok=False), _sig(is_silent=True),
        _sig(n_tokens=0, n_chars=0, n_distinct=0), _sig(ppl=9999.0),
        _sig(lang="xx", lang_conf=0.2), _sig(pii_hits=3), _sig(is_dup=True),
        _sig(sr_hz=44101, codec="mp3"), _sig(clip_id="weird!!"),
    ]:
        scores = scoring.py_dimension_scores(sig)
        assert set(scores) == set(scoring.DIMENSIONS)
        assert all(0 <= v <= 100 for v in scores.values())


SIGNAL_CASES = [
    _sig(),
    _sig(decode_ok=False, n_samples=0, header_sr_hz=0),
    _sig(is_silent=True),
    _sig(clip_ratio=0.5),
    _sig(n_tokens=0, n_distinct=0, n_chars=0, alpha_space_ratio=0.0),
    _sig(n_chars=5, dur_ms=4000),          # cps below band
    _sig(n_chars=3000, dur_ms=500),        # cps above band
    _sig(n_distinct=4),                     # repetition > 0.5
    _sig(age_days=31),
    _sig(age_days=30),
    _sig(alpha_space_ratio=0.5),
    _sig(is_dup=True),
    _sig(sr_hz=44101),
    _sig(codec="mp3"),
    _sig(lang="xx", lang_conf=0.9),
    _sig(lang="en", lang_conf=0.3),
    _sig(ppl=150.0), _sig(ppl=150.5), _sig(ppl=250.0), _sig(ppl=250.5),
    _sig(pii_hits=1), _sig(toxic_hits=2),
    _sig(clip_id="not-a-clip-id"),
    _sig(n_samples=20000),                  # dur mismatch
]


def test_spark_python_rule_parity(spark):
    """Every dimension rule rendered as a Spark expr must agree with its
    pure-Python mirror on all boundary signal rows."""
    pdf = pd.DataFrame(SIGNAL_CASES)
    pdf2 = pdf.copy()
    pdf2["idx"] = range(len(pdf2))
    df2 = scoring.with_policy(
        scoring.with_dimensions(spark.createDataFrame(pdf2), include_evidence=False)
    )
    for r in df2.collect():
        sig = SIGNAL_CASES[r["idx"]]
        expected = scoring.py_dimension_scores(sig)
        for name in scoring.DIMENSIONS:
            assert r[f"score_{name}"] == expected[name], (
                f"dimension {name} mismatch for case {r['idx']}: "
                f"spark={r[f'score_{name}']} py={expected[name]}"
            )
        overall = scoring.py_overall(expected)
        assert r["overall_quality_score"] == overall
        assert r["recommended_action"] == scoring.py_action(overall)
        assert r["keep"] == (scoring.py_action(overall) == "KEEP")
