"""Co-located joins and AQE skew handling — the two shuffle-management
claims the 100 TB design leans on, proven against actual final plans.

* Bucketed tables on the join key join WITHOUT any Exchange: the
  one-off bucketed write prepays the shuffle every later join would
  repeat (the batch analog of Iceberg bucket partition transforms).
* AQE splits a skewed join partition at runtime (the planted hot key)
  — the final plan's AQEShuffleRead reports skewed splits.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dataquality_spark.plan_utils import formatted_plan


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so Exchange/skew behavior is observable."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", old
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    """Two tables bucketed+sorted on the join key must SortMergeJoin with
    ZERO Exchange operators — the co-located join the bucketing layout
    exists to buy. An unbucketed twin of the same join shuffles both
    sides."""
    for name in ("b_left", "b_right"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        spark.range(0, 20000).withColumn("v", F.col("id") % 7)
        .write.bucketBy(8, "id").sortBy("id")
        .option("path", str(tmp_path / "bl")).saveAsTable("b_left")
    )
    (
        spark.range(0, 20000, 2).withColumn("w", F.col("id") % 5)
        .write.bucketBy(8, "id").sortBy("id")
        .option("path", str(tmp_path / "br")).saveAsTable("b_right")
    )
    try:
        j = spark.table("b_left").join(spark.table("b_right"), "id")
        assert j.count() == 10000
        plan = formatted_plan(j, execute=True)
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 0, plan

        # unbucketed twin: same join, both sides shuffle
        ub = (
            spark.read.parquet(str(tmp_path / "bl"))
            .join(spark.read.parquet(str(tmp_path / "br")), "id")
        )
        uplan = formatted_plan(ub, execute=True)
        assert "Exchange" in uplan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_aqe_splits_skewed_join_partition(spark, no_broadcast):
    """A planted hot key (half of the left side) must trigger AQE's
    skew-join split: the final plan's AQEShuffleRead on the skewed side
    reports a skewed partition being split into multiple reader tasks."""
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
    )
    try:
        left = spark.range(0, 120000).select(
            F.when(F.col("id") < 60000, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload_payload_payload_"), F.col("id"))
            .alias("pad"),
        )
        right = spark.createDataFrame(
            [(i,) for i in range(0, 200)], "k bigint"
        )
        j = left.join(right, "k")
        # only the hot key (7) exists on both sides: 60000 matches
        assert j.count() == 60000
        plan = formatted_plan(j, execute=True)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # AQE marks the skewed read: "AQEShuffleRead ... skewed" blocks
        assert re.search(r"AQEShuffleRead[\s\S]{0,200}?skewed", plan), plan
    finally:
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
