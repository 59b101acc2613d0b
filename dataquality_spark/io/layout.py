"""Z-order clustered writes: multi-dimension data-skipping layout.

A table sorted on one column skips files well for THAT column's
predicates and not at all for any other. Interleaving the bits of two
(bucketized) columns into one Morton/Z key and range-partitioning +
sorting the write on it makes every output file a tight rectangle in
BOTH dimensions, so engine-side file/row-group pruning (parquet
min/max stats) works for predicates on either column — the layout trick
Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``/``rewrite_data_files``
(public docs), built here from primitives.

At 100 TB this is a write-amplification-for-read-amplification trade: a
one-off repartitionByRange shuffle of the slim sort key + payload buys
every later scan bounded file sets on two predicate dimensions.  The
key is computed with a native integer fold (whole-stage codegen, no
UDF); ``repartitionByRange`` samples the key distribution, so skewed
dimensions still yield balanced files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension (key fits in a BIGINT for 2 dims)


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two non-negative ints (x even bits, y odd).

    Native fold over the bit positions — stays inside codegen:
    z = sum_i ((x>>i & 1) << 2i) + ((y>>i & 1) << (2i+1)).
    Values are clamped into [0, 2^bits) so out-of-range inputs can't
    silently collide across distant cells."""
    xc = F.least(F.greatest(x.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1))
    yc = F.least(F.greatest(y.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = Z_BITS,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of two columns.

    repartitionByRange on the z key (sampled range boundaries → balanced
    files even when the dimensions skew) + sortWithinPartitions so
    row-group min/max stats inside each file are tight too."""
    keyed = df.withColumn("__z", zvalue(F.col(x_col), F.col(y_col), bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_bboxes(path: str, x_col: str, y_col: str) -> list:
    """Per-file (min,max) of both dimensions from parquet footer stats —
    exactly the metadata an engine consults to skip files.  Returns
    [(xmin, xmax, ymin, ymax)] per data file."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        xmin = ymin = None
        xmax = ymax = None
        for rg in range(md.num_row_groups):
            xs = md.row_group(rg).column(idx[x_col]).statistics
            ys = md.row_group(rg).column(idx[y_col]).statistics
            if (
                xs is None or ys is None
                or not xs.has_min_max or not ys.has_min_max
            ):
                # a stats-less row group makes the whole file unprunable
                # on these columns — the honest bbox is "unknown", which
                # an engine treats as always-hit; callers see that as a
                # degenerate, file-spanning rectangle
                xmin = xmax = ymin = ymax = None
                break
            xmin = xs.min if xmin is None else min(xmin, xs.min)
            xmax = xs.max if xmax is None else max(xmax, xs.max)
            ymin = ys.min if ymin is None else min(ymin, ys.min)
            ymax = ys.max if ymax is None else max(ymax, ys.max)
        out.append((xmin, xmax, ymin, ymax))
    return out


def skip_fraction(bboxes: list, x_pred: int, y_pred: int) -> float:
    """Fraction of files an engine would SKIP for the point predicate
    ``x = x_pred AND y = y_pred`` given footer bboxes."""
    hit = sum(
        1
        for xmin, xmax, ymin, ymax in bboxes
        if xmin is None  # stats-less file: engines must read it
        or (xmin <= x_pred <= xmax and ymin <= y_pred <= ymax)
    )
    return 1.0 - hit / max(len(bboxes), 1)
