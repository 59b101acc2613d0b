"""Checkpointed, resumable pipeline runs (SURVEY §7.1 M5).

Stage layout at scale:

1. **enrich** (decode + scorers) is the expensive, embarrassingly-parallel
   stage → it is checkpointed per partition batch: clips are split by
   ``pmod(xxhash64(clip_id), n_batches)`` (the same salted hash the
   pipeline shuffles on, so batches are uniform even when input files
   cluster duplicates). All still-uncommitted batches are enriched and
   written in ONE pass — ``write.partitionBy("batch_id")`` with dynamic
   partition overwrite — so the clips input (the dominant scan at 100 TB)
   is read exactly once per run, not once per batch; per-batch metrics
   come from a single ``groupBy(batch_id).agg(...)`` over the slim
   just-written parquet (decode_ok + batch_id columns only), not from two
   count() scans per batch.  Each batch is then committed to the manifest
   individually, preserving per-batch resume granularity: a crash between
   commits leaves written-but-uncommitted partition dirs that stay
   invisible (manifest isolation) and are simply rewritten on resume.
2. **dedup + policy** are global (near-dup pairs cross batch boundaries,
   like the reference's whole-run pairwise scan, metadata.py:514-624) and
   cheap relative to enrich: they run over the slim committed enriched
   table (no audio bytes — column-pruning discipline of SURVEY §4).

The reference has no recovery story (a failed run loses all work,
"reconstruction" re-reads JSON side-files, metadata.py:789-861); this
replaces it with commit-log semantics.
"""

from __future__ import annotations

import datetime as dt
import os
import time
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .io.tableio import Manifest, read_table
from .operators.dedup import DedupResult, dedup
from .operators.enrich import enrich
from .operators.scoring import with_dimensions, with_policy
from .pipeline import RESULT_COLUMNS, PipelineResult


class CheckpointedRun(NamedTuple):
    result: PipelineResult
    lineage: DataFrame          # per-batch metrics (snapshots analog)
    batches_run: list[int]      # batches actually computed this invocation
    batches_skipped: list[int]  # batches resumed from the manifest


def _batch_col(n_batches: int) -> F.Column:
    return F.pmod(F.xxhash64("clip_id"), F.lit(n_batches)).cast("int")


def run_checkpointed(
    clips: DataFrame,
    run_ts: dt.datetime,
    out_dir: str,
    n_batches: int = 8,
    include_evidence: bool = True,
    fail_after_batches: int | None = None,
) -> CheckpointedRun:
    """Run the pipeline with per-batch enrich checkpointing under
    ``out_dir``. ``fail_after_batches`` simulates a mid-run crash for
    tests: raises after committing that many new batches."""
    spark = clips.sparkSession
    enriched_dir = os.path.join(out_dir, "enriched")
    manifest = Manifest(enriched_dir)

    done = manifest.committed_batches()
    todo = [b for b in range(n_batches) if b not in done]
    skipped = sorted(done)
    ran: list[int] = []

    if todo:
        t0 = time.time()
        part = clips.withColumn("batch_id", _batch_col(n_batches))
        if skipped:  # resume: only the uncommitted slices are (re)enriched
            part = part.filter(F.col("batch_id").isin(todo))
        # enrich consumes `bytes` map-side on the scan partitions (ONE scan
        # of the input for ALL batches) and the batch id is re-derived from
        # clip_id after the pass — enrich's output schema is fixed.
        enr = enrich(part.drop("batch_id"), run_ts).withColumn(
            "batch_id", _batch_col(n_batches)
        )
        (
            enr.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(enriched_dir)
        )
        # One slim read-back for ALL per-batch metrics (columnar: only
        # batch_id + decode_ok are scanned), replacing 2 count() scans per
        # batch of the previous design.
        wall = round(time.time() - t0, 3)
        stats = {
            int(r["batch_id"]): (int(r["n_rows"]), int(r["n_error"]))
            for r in spark.read.parquet(enriched_dir)
            .filter(F.col("batch_id").isin(todo))
            .groupBy("batch_id")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum((~F.col("decode_ok")).cast("long")).alias("n_error"),
            )
            .collect()
        }
        total_rows = sum(n for n, _ in stats.values()) or 1
        for b in todo:
            n_rows, n_err = stats.get(b, (0, 0))
            manifest.commit(
                b, {"n_rows": n_rows, "n_error": n_err,
                    # single-pass write: apportion the one wall time by row
                    # share (an estimate — the pass is not per-batch timed)
                    "wall_sec": round(wall * n_rows / total_rows, 3),
                    "run_wall_sec": round(wall, 3)}
            )
            ran.append(b)
            if fail_after_batches is not None and len(ran) >= fail_after_batches:
                raise RuntimeError(f"simulated failure after {len(ran)} batches")

    # Global stages over the committed enriched table (slim columns only).
    enriched = read_table(spark, enriched_dir, manifest).drop(
        "batch", "batch_id"
    )
    dd: DedupResult = dedup(enriched)
    scored = (
        enriched.join(dd.flags, "clip_id", "left")
        .fillna({"is_dup": False})
        .withColumn(
            "status", F.when(F.col("decode_ok"), "success").otherwise("error")
        )
        .withColumn("processed_at", F.lit(run_ts))
    )
    scored = with_policy(with_dimensions(scored, include_evidence))
    results = scored.select(*RESULT_COLUMNS)
    run_metrics = (
        scored.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("n_clips"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
            F.sum((F.col("status") == "error").cast("long")).alias("n_error"),
            F.sum(F.col("is_dup").cast("long")).alias("n_duplicates"),
            F.avg("overall_quality_score").alias("avg_overall"),
        )
        .withColumn("run_ts", F.lit(run_ts))
    )
    return CheckpointedRun(
        PipelineResult(results, dd.duplicate_pairs, dd.similarity_pairs, run_metrics),
        manifest.lineage_df(spark),
        ran,
        skipped,
    )
