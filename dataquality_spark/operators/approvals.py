"""Batch approvals workflow: P7 promotion over an approvals state table.

The reference keeps a mutable ``dimension_approvals`` map per file and
promotes: >= 7 approved dimensions -> action "APPROVED"; a rejection that
drops the count below 7 -> "REVIEW" (``backend/app/api/routes.py:620-638``,
``:698-709``), propagated to dashboards via the best-approvals snapshot
join (``routes.py:43-82``, ``:516-527``).

Batch re-expression over an append-only approval-events table
``(file_key, dimension, status, ts)``:

* :func:`latest_dimension_state` — MERGE-style upsert as a latest-wins
  window (``row_number`` per (file_key, dimension) by ts desc): appending
  new events and re-running IS the upsert, no mutable state.  This is the
  Iceberg ``MERGE INTO`` shape: at production scale the same dedup runs as
  a MERGE on the snapshot table keyed by (file_key, dimension).
* :func:`approval_counts` — approved/rejected counts per file from the
  latest state only (rejected history under an approval does not count,
  matching the reference's "current status" map semantics).
* :func:`promote` — the promotion join applied to a results frame:
  approvals >= 7 -> APPROVED; else any rejection -> REVIEW; else the
  pipeline action stands.

All native expressions (one shuffle for the window, one for the count,
one broadcast-able join back) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# routes.py:626-638 — promotion threshold on approved-dimension count
APPROVALS_PROMOTE_MIN = 7
STATUS_APPROVED = "approved"
STATUS_REJECTED = "rejected"


def latest_dimension_state(events: DataFrame) -> DataFrame:
    """(file_key, dimension, status, ts) events -> latest status per
    (file_key, dimension). Latest-wins window = the batch MERGE upsert."""
    w = Window.partitionBy("file_key", "dimension").orderBy(
        F.desc("ts"), F.desc("status")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("file_key", "dimension", "status", "ts")
    )


def upsert_approvals(existing: DataFrame, new_events: DataFrame) -> DataFrame:
    """MERGE-style upsert: union the snapshot with new events, latest wins.
    Append + re-window gives identical results to a keyed MERGE, with no
    mutable table required (sandbox parquet; Iceberg MERGE INTO at prod)."""
    return latest_dimension_state(existing.unionByName(new_events))


def approval_counts(state: DataFrame) -> DataFrame:
    """Per-file approved/rejected dimension counts from the latest state
    (A6: count of dims whose CURRENT status is approved, routes.py:59-60)."""
    return state.groupBy("file_key").agg(
        F.sum((F.col("status") == STATUS_APPROVED).cast("long")).alias(
            "approvals"
        ),
        F.sum((F.col("status") == STATUS_REJECTED).cast("long")).alias(
            "rejections"
        ),
    )


def promote(results: DataFrame, counts: DataFrame,
            key: str = "clip_id") -> DataFrame:
    """Promotion join (P7): approvals >= 7 -> APPROVED; below the bar with
    any rejection -> REVIEW; else the pipeline action stands.  ``counts``
    is per-file and tiny relative to results -> Catalyst broadcasts it.

    Deliberate latest-state deviation from the reference: routes.py:698-709
    sets REVIEW *at rejection time* and keeps it sticky — a later
    re-approval of that dimension (still < 7 approvals) does not clear it.
    This operator is a stateless re-derivation from the CURRENT approval
    state, so such a file reverts to the pipeline action.  Stateless
    re-derivation is the scalable batch shape (any snapshot replays to the
    same answer; no event-order-dependent flag to checkpoint), mirroring
    the dedup-reporting deviation documented in operators/dedup.py.
    :func:`promote_event_ordered` is the opt-in reference-parity mode —
    both semantics are oracle-checked, and doc_approvals_sticky_review
    exhibits the divergence rows."""
    joined = results.join(
        counts.withColumnRenamed("file_key", key), key, "left"
    ).fillna({"approvals": 0, "rejections": 0})
    final = (
        F.when(F.col("approvals") >= APPROVALS_PROMOTE_MIN, F.lit("APPROVED"))
        .when(F.col("rejections") > 0, F.lit("REVIEW"))
        .otherwise(F.col("recommended_action"))
    )
    return joined.withColumn("final_action", final)


def promote_event_ordered(results: DataFrame, events: DataFrame,
                          key: str = "clip_id") -> DataFrame:
    """Opt-in reference-parity promotion: replay the approval events in
    time order with the reference's AT-EVENT-TIME transitions
    (routes.py:626-638 approve, :698-709 reject), so REVIEW is sticky.

    Each HTTP call in the reference mutates ``recommended_action`` when
    it fires a transition: an approve that brings the approved-dimension
    count to >= 7 sets APPROVED; a reject that leaves it < 7 sets
    REVIEW.  A non-triggering event (approve below the bar, reject while
    still >= 7, reanalyze) leaves the action alone — which is exactly
    why a reject-then-reapprove file keeps REVIEW even though its
    CURRENT state has zero rejections (the divergence :func:`promote`
    documents).  The fold is order-dependent but needs no mutable state:

    * per (file, dimension): ``lag(status)`` gives each event's delta to
      the approved-dimension count (+1 newly approved, -1 approval
      overwritten, 0 otherwise);
    * per file: a running sum of deltas over (ts, event_id) order is the
      count AFTER each event — the same number the reference recomputes
      from its mutated map at each call;
    * the LAST transition-firing event per file decides the action;
      files with no trigger keep the pipeline action.

    Three narrow windows + one broadcast-able join; events shuffle once
    on file_key (the per-dimension window is a prefix of the same key),
    so replaying 10^12 clips' audit trails is one sort per partition.
    ``events`` columns: (file_key, dimension, status, ts, event_id) with
    event_id unique per file — the reference serializes calls, so the
    (ts, event_id) order is the call order."""
    per_dim = Window.partitionBy("file_key", "dimension").orderBy(
        "ts", "event_id")
    per_file = (
        Window.partitionBy("file_key").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_appr = (F.col("status") == STATUS_APPROVED).cast("int")
    was_appr = (
        F.lag("status").over(per_dim) == STATUS_APPROVED
    ).cast("int")
    folded = (
        events.withColumn("delta", is_appr - F.coalesce(was_appr, F.lit(0)))
        .withColumn("cnt_after", F.sum("delta").over(per_file))
        .withColumn(
            "trigger",
            F.when(
                (F.col("status") == STATUS_APPROVED)
                & (F.col("cnt_after") >= APPROVALS_PROMOTE_MIN),
                F.lit("APPROVED"),
            ).when(
                (F.col("status") == STATUS_REJECTED)
                & (F.col("cnt_after") < APPROVALS_PROMOTE_MIN),
                F.lit("REVIEW"),
            ),
        )
    )
    last_trigger = Window.partitionBy("file_key").orderBy(
        F.desc("ts"), F.desc("event_id"))
    sticky = (
        folded.filter(F.col("trigger").isNotNull())
        .withColumn("rn", F.row_number().over(last_trigger))
        .filter(F.col("rn") == 1)
        .select("file_key", F.col("trigger").alias("sticky_trigger"))
    )
    return (
        results.join(sticky.withColumnRenamed("file_key", key), key, "left")
        .withColumn(
            "final_action",
            F.coalesce(F.col("sticky_trigger"), F.col("recommended_action")),
        )
        .drop("sticky_trigger")
    )
