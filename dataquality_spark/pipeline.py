"""End-to-end quality-filter pipeline (reference's POST /extract-metadata,
``backend/app/api/routes.py:92-133`` -> ``metadata.py:245-714``, re-expressed
as a Spark DataFrame DAG — SURVEY §3.1).

Stages:
    clips --(salted repartition by clip_id hash)--> enrich (one fused
    mapInPandas: decode/langid/ppl/scrub/minhash) --> dedup (exact-group
    collapse + LSH banding + cogroup verify) --> 17-dimension scoring +
    keep/drop policy (pure native exprs, WholeStageCodegen) --> results,
    duplicate_pairs, similarity_pairs, run_metrics.
"""

from __future__ import annotations

import datetime as dt
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import cached
from .operators.dedup import DedupResult, dedup
from .operators.enrich import enrich
from .operators.scoring import with_dimensions, with_policy

RESULT_COLUMNS = [
    "clip_id", "status", "processed_at", "age_days", "lang", "lang_conf",
    "ppl", "pii_hits", "toxic_hits", "is_dup", "dup_of",
    "scrubbed_transcript", "dimensions", "overall_quality_score",
    "recommended_action", "keep", "minhash_sig",
]


class PipelineResult(NamedTuple):
    results: DataFrame
    duplicate_pairs: DataFrame
    similarity_pairs: DataFrame
    run_metrics: DataFrame


def run_pipeline(
    clips: DataFrame,
    run_ts: dt.datetime,
    partitions: int | None = None,
    include_evidence: bool = True,
    dedup_buckets: int = 64,
) -> PipelineResult:
    spark = clips.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    enriched = enrich(clips, run_ts)
    # Salted repartition by clip_id hash (north rule): spreads duplicate
    # clusters (co-located in input files) evenly before the dedup joins.
    # Deliberately AFTER enrich: the map-only enrich stage consumes `bytes`
    # in place on the scan partitions, so the audio payload — the dominant
    # volume at 100 TB — never enters a shuffle; only slim enriched columns
    # are redistributed.
    enriched = enriched.repartition(
        partitions, F.pmod(F.xxhash64("clip_id"), F.lit(partitions))
    )
    # Reused by the dedup joins AND the scoring/report path — persist once.
    # (registered: callers caching.release_all() after materializing sinks)
    enriched = cached(enriched)

    dd: DedupResult = dedup(enriched, buckets=dedup_buckets)

    scored = enriched.join(dd.flags, "clip_id", "left").fillna(
        {"is_dup": False}
    )
    # F2 error-row routing: decode failure is recorded, not dropped —
    # status column pattern (metadata.py:284-299).
    scored = scored.withColumn(
        "status", F.when(F.col("decode_ok"), "success").otherwise("error")
    ).withColumn("processed_at", F.lit(run_ts))

    scored = with_policy(with_dimensions(scored, include_evidence))
    results = scored.select(*RESULT_COLUMNS)

    # Run-level metrics (reference consolidated record, metadata.py:639-677):
    # A2 counters + keep/drop/dup rates, computed per partition for lineage.
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
    return PipelineResult(results, dd.duplicate_pairs, dd.similarity_pairs, run_metrics)
