"""Small-files compaction over the checkpointed table: fewer files, same
rows, resume untouched."""

from __future__ import annotations

import os

from dataquality_spark.checkpoint import run_checkpointed
from dataquality_spark.datagen.clips import DEFAULT_RUN_TS, clips_df
from dataquality_spark.io.tableio import Manifest, compact_table, read_table


def _parquet_files(table_dir: str) -> int:
    n = 0
    for root, _, files in os.walk(table_dir):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_compaction_reduces_files_preserves_rows_and_resume(spark, tmp_path):
    clips = clips_df(spark, 200).repartition(8).cache()
    d = str(tmp_path / "tbl")
    run = run_checkpointed(clips, DEFAULT_RUN_TS, d, n_batches=4)
    assert sorted(run.batches_run) == [0, 1, 2, 3]

    table_dir = os.path.join(d, "enriched")
    manifest = Manifest(table_dir)
    before_rows = (
        read_table(spark, table_dir, manifest)
        .select("clip_id", "t_hash").toPandas()
        .sort_values("clip_id", ignore_index=True)
    )
    files_before = _parquet_files(table_dir)
    assert files_before > 4  # multiple files per batch pre-compaction

    stats = compact_table(spark, table_dir, manifest, files_per_batch=1)
    assert set(stats) == {0, 1, 2, 3}
    assert all(after <= 1 for _, after in stats.values())
    assert _parquet_files(table_dir) <= 4

    after_rows = (
        read_table(spark, table_dir, manifest)
        .select("clip_id", "t_hash").toPandas()
        .sort_values("clip_id", ignore_index=True)
    )
    assert after_rows.equals(before_rows)

    # resume over the compacted table: fully incremental, same output
    again = run_checkpointed(clips, DEFAULT_RUN_TS, d, n_batches=4)
    assert not again.batches_run
    assert again.result.results.count() == 200
    clips.unpersist()
