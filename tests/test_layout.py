"""Z-order clustered writes (io/layout.py): the footer min/max stats of
a z-ordered table must make file skipping work on BOTH dimensions,
where a single-column sort only prunes its own column."""

from __future__ import annotations

import numpy as np
import pytest

from dataquality_spark.io.layout import (
    file_bboxes,
    skip_fraction,
    write_zordered,
    zvalue,
)


def _grid_df(spark, n=4096, seed=7):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, 256, size=n)
    ys = rng.integers(0, 256, size=n)
    return spark.createDataFrame(
        [(int(x), int(y), i) for i, (x, y) in enumerate(zip(xs, ys))],
        "x int, y int, payload bigint",
    )


def test_zvalue_matches_python_interleave(spark):
    """Native-fold Morton key == bit-twiddling reference for random and
    boundary inputs (0, max, clamped negatives / overflow)."""
    import pandas as pd

    def ref(x, y, bits=16):
        x = min(max(x, 0), (1 << bits) - 1)
        y = min(max(y, 0), (1 << bits) - 1)
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rng = np.random.default_rng(3)
    cases = [(0, 0), (65535, 65535), (-5, 3), (70000, 2), (1, 0), (0, 1)] + [
        (int(a), int(b)) for a, b in rng.integers(0, 65536, size=(50, 2))
    ]
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["x", "y"]),
                               "x bigint, y bigint")
    from pyspark.sql import functions as F

    got = df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r.z == ref(r.x, r.y), (r.x, r.y)


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """Z-ordered files are tight rectangles in (x, y): a point predicate
    on EITHER column must skip most files; an x-sorted layout skips on
    x but reads every file for a y predicate."""
    df = _grid_df(spark)
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "xsort")
    write_zordered(df, zpath, "x", "y", n_files=16)
    (
        df.repartitionByRange(16, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(spath)
    )

    zb = file_bboxes(zpath, "x", "y")
    sb = file_bboxes(spath, "x", "y")
    assert len(zb) == 16 and len(sb) == 16

    # average point-predicate skip fraction over a probe grid: both
    # layouts prune well when BOTH columns are constrained (x-sort nails
    # the point probe through x alone) — the z-order requirement is that
    # it stays in that league
    probes = [(x, y) for x in range(8, 256, 64) for y in range(8, 256, 64)]
    z_skip = np.mean([skip_fraction(zb, x, y) for x, y in probes])
    assert z_skip >= 0.70, z_skip

    # and on the y dimension alone the x-sorted layout is useless
    def y_only_skip(bboxes, y):
        hit = sum(1 for _, _, ymin, ymax in bboxes if ymin <= y <= ymax)
        return 1.0 - hit / len(bboxes)

    z_y = np.mean([y_only_skip(zb, y) for y in range(8, 256, 16)])
    s_y = np.mean([y_only_skip(sb, y) for y in range(8, 256, 16)])
    assert s_y <= 0.05, s_y          # every x-sorted file spans all of y
    assert z_y >= 0.5, z_y           # z-ordered files bound y too

    # row content identical regardless of layout
    a = spark.read.parquet(zpath).orderBy("payload").collect()
    b = spark.read.parquet(spath).orderBy("payload").collect()
    assert a == b
