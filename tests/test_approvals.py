"""P7 approvals workflow: MERGE-style upsert + promotion boundary at 7
(reference routes.py:626-638, :698-709)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dataquality_spark.operators.approvals import (
    APPROVALS_PROMOTE_MIN,
    approval_counts,
    latest_dimension_state,
    promote,
    promote_event_ordered,
    upsert_approvals,
)

T0 = dt.datetime(2026, 1, 10, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(f, d, s, T0 + dt.timedelta(minutes=m)) for f, d, s, m in rows],
        "file_key string, dimension string, status string, ts timestamp",
    )


def _results(spark, rows):
    return spark.createDataFrame(
        rows, "clip_id string, recommended_action string"
    )


def _finals(df):
    return {r["clip_id"]: r["final_action"] for r in df.collect()}


def test_promote_demote_boundary_at_exactly_7(spark):
    # file A: exactly 7 approved dims -> APPROVED
    # file B: 6 approved + 1 rejected -> below bar w/ rejection -> REVIEW
    # file C: 6 approved, no rejection -> base action stands
    rows = []
    for i in range(APPROVALS_PROMOTE_MIN):
        rows.append(("A", f"dim{i}", "approved", i))
    for i in range(6):
        rows.append(("B", f"dim{i}", "approved", i))
    rows.append(("B", "dim6", "rejected", 6))
    for i in range(6):
        rows.append(("C", f"dim{i}", "approved", i))
    counts = approval_counts(latest_dimension_state(_events(spark, rows)))
    res = _results(spark, [("A", "KEEP"), ("B", "KEEP"), ("C", "QUARANTINE")])
    out = _finals(promote(res, counts))
    assert out == {"A": "APPROVED", "B": "REVIEW", "C": "QUARANTINE"}


def test_rejection_dropping_below_7_demotes(spark):
    # 7 approvals promote; a LATER rejection of one of them drops the
    # current-state count to 6 -> REVIEW (the reference's demotion rule).
    base = [("A", f"dim{i}", "approved", i) for i in range(7)]
    st1 = latest_dimension_state(_events(spark, base))
    out1 = _finals(promote(_results(spark, [("A", "KEEP")]),
                           approval_counts(st1)))
    assert out1 == {"A": "APPROVED"}

    st2 = upsert_approvals(
        _events(spark, base), _events(spark, [("A", "dim3", "rejected", 99)])
    )
    assert st2.count() == 7  # still one row per (file, dimension)
    out2 = _finals(promote(_results(spark, [("A", "KEEP")]),
                           approval_counts(st2)))
    assert out2 == {"A": "REVIEW"}


def test_upsert_is_latest_wins_per_dimension(spark):
    ev1 = _events(spark, [("A", "dim0", "rejected", 0),
                          ("A", "dim1", "approved", 0)])
    ev2 = _events(spark, [("A", "dim0", "approved", 5)])
    st = upsert_approvals(ev1, ev2)
    got = {(r["file_key"], r["dimension"]): r["status"] for r in st.collect()}
    assert got == {("A", "dim0"): "approved", ("A", "dim1"): "approved"}


def test_files_without_events_keep_base_action(spark):
    counts = approval_counts(
        latest_dimension_state(_events(spark, [("A", "dim0", "approved", 0)]))
    )
    res = _results(spark, [("A", "KEEP"), ("Z", "DISCARD")])
    out = _finals(promote(res, counts))
    assert out == {"A": "KEEP", "Z": "DISCARD"}


# ---- event-ordered (sticky) reference-parity mode -------------------------

def _ordered_events(spark, rows):
    # minute index doubles as event_id: unique and in call order, like the
    # reference's serialized HTTP calls.
    return spark.createDataFrame(
        [(f, d, s, T0 + dt.timedelta(minutes=m), m) for f, d, s, m in rows],
        "file_key string, dimension string, status string, ts timestamp, "
        "event_id long",
    )


def _sticky(spark, rows, base=(("A", "KEEP"),)):
    return _finals(promote_event_ordered(
        _results(spark, list(base)), _ordered_events(spark, rows)))


def test_sticky_review_survives_reapproval_below_bar(spark):
    # The routes.py:698-709 divergence case: reject fires REVIEW at event
    # time; the later re-approval (count still < 7) fires nothing, so
    # REVIEW sticks — while the stateless mode, seeing zero CURRENT
    # rejections, reverts to the base action.
    rows = [("A", f"dim{i}", "approved", i) for i in range(3)]
    rows += [("A", "dim1", "rejected", 10), ("A", "dim1", "approved", 20)]
    assert _sticky(spark, rows) == {"A": "REVIEW"}
    ev = _ordered_events(spark, rows)
    stateless = _finals(promote(
        _results(spark, [("A", "KEEP")]),
        approval_counts(latest_dimension_state(ev.drop("event_id")))))
    assert stateless == {"A": "KEEP"}  # the two verified modes diverge


def test_sticky_approved_survives_reanalyze_below_bar(spark):
    # 7 approvals fire APPROVED; a reanalyze overwriting one approval
    # drops the count to 6 but fires no transition -> APPROVED sticks
    # (the reference's reanalyze route never touches recommended_action).
    rows = [("A", f"dim{i}", "approved", i) for i in range(7)]
    rows.append(("A", "dim0", "reanalyzed", 10))
    assert _sticky(spark, rows) == {"A": "APPROVED"}


def test_sticky_demotion_still_fires_on_below_bar_reject(spark):
    # A reject that lands while count < 7 fires REVIEW in BOTH modes.
    rows = [("A", f"dim{i}", "approved", i) for i in range(7)]
    rows.append(("A", "dim0", "rejected", 10))
    assert _sticky(spark, rows) == {"A": "REVIEW"}


def test_sticky_no_trigger_keeps_base(spark):
    # Approvals below the bar and rejects at >= 7 fire nothing.
    rows = [("A", f"dim{i}", "approved", i) for i in range(4)]
    assert _sticky(spark, rows, base=(("A", "QUARANTINE"),)) == {
        "A": "QUARANTINE"}
    assert _sticky(spark, [], base=(("A", "KEEP"),)) == {"A": "KEEP"}
