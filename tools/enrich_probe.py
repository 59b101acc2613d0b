"""Enrich-stage microbenchmark: isolates the fused mapInPandas pass to
measure Arrow-boundary / scan-split parameter effects at a pinned core
count (the stage is ~70% of the scaling job's wall, so its per-core CPU
inflation at 4N cores is what the strong-scaling efficiency rides on).

Usage:
    python tools/enrich_probe.py <cores> <clips_parquet> [maxRecordsPerBatch] [maxPartitionBytes]

Runs inside the caller's interpreter via spark-submit + taskset, prints
one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    clips_path = sys.argv[1]
    cores = int(sys.argv[2])
    batch = sys.argv[3] if len(sys.argv) > 3 else "10000"
    split = sys.argv[4] if len(sys.argv) > 4 else "16m"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"enrich_probe_{cores}")
        .config("spark.sql.shuffle.partitions", str(max(4 * cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
        .config("spark.sql.files.maxPartitionBytes", split)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from dataquality_spark.datagen.clips import DEFAULT_RUN_TS
    from dataquality_spark.operators.enrich import enrich

    clips = spark.read.parquet(clips_path)
    n = clips.count()

    # warm: datagen-based tiny frame (no full-input scan)
    from dataquality_spark.datagen.clips import clips_df

    enrich(clips_df(spark, 256), DEFAULT_RUN_TS).write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.time()
    enrich(clips, DEFAULT_RUN_TS).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(json.dumps({
        "cores": cores, "n": n, "batch": batch, "split": split,
        "wall_sec": round(wall, 2), "clips_per_sec": round(n / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
