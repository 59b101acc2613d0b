"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark and, when an oracle exists,
the paired SQL through DuckDB on the same parquet tables; compares row
count, column names, and order-insensitive values. Usage:

    python tools/selfcheck.py [--json OUT.json] [sf_dir] [name ...]

With --json, writes one record per query (rows/schema/hash matches +
row counts + wall seconds) in the same shape as the driver's
CORRECTNESS artifacts, so demoted catalog entries past the driver's
50-row window keep a committed, reproducible evidence trail.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def compare_values(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    """Order-insensitive value comparison, as strict as the driver's hash.

    The driver tolerates width differences within a numeric kind (int32
    vs int64 hash identically once collected) but NOT cross-kind drift:
    a DuckDB HUGEINT window-sum landing as float64 against Spark's int64
    hashes 0.0 vs 0 and goes red even though the values are numerically
    equal (the r4 ``doc_curation_pipeline`` bug, which the old
    dtype-coercion fallback here masked for three rounds).  So:
    same-kind width differences are widened and compared; any cross-kind
    mismatch is a hard FAIL, never harmonized.  Returns (ok, reason).
    """
    a, b = normalize(sdf), normalize(odf)
    kind_bad = []
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka == kb or {ka, kb} <= {"i", "u"}:
            continue
        kind_bad.append(f"{c}: spark {a[c].dtype} vs oracle {b[c].dtype}")
    if kind_bad:
        return False, "dtype mismatch: " + "; ".join(kind_bad)
    for c in a.columns:  # same-kind width widening only (int32 vs int64)
        if a[c].dtype != b[c].dtype:
            try:
                t = np.result_type(a[c].dtype, b[c].dtype)
                a[c] = a[c].astype(t)
                b[c] = b[c].astype(t)
            except (ValueError, TypeError):
                a[c] = a[c].astype(str)
                b[c] = b[c].astype(str)
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        detail = []
        for c in bad_cols[:2]:
            i = neq[c].idxmax()
            detail.append(f"first diff {c}[{i}]: spark={a[c][i]!r} oracle={b[c][i]!r}")
        return False, f"value mismatch in {bad_cols}" + (
            " (" + "; ".join(detail) + ")" if detail else "")
    return True, ""


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

    import __spark_entry__ as entry_mod
    from dataquality_spark.session import get_spark

    spark = get_spark(app_name="selfcheck")
    con = duckdb.connect()
    from dataquality_spark.queries import TABLES
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = records[name] = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None, "sec": None,
        }
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            rec["err"] = f"spark {type(e).__name__}: {e}"
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        rec["sec"] = round(dt, 2)
        rec["spark_rows"] = len(sdf)
        if name not in oracles:
            rec["err"] = "rows-only (no oracle)"
            print(f"ok*   {name}: {len(sdf)} rows (rows-only, no oracle) [{dt:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            rec["err"] = f"duckdb {type(e).__name__}: {e}"
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        rec["oracle_rows"] = len(odf)
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        if not rec["schema_match"]:
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        rec["rows_match"] = len(sdf) == len(odf)
        if not rec["rows_match"]:
            failures.append(name)
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            continue
        ok, reason = compare_values(sdf, odf)
        if not ok:
            failures.append(name)
            rec["err"] = reason
            print(f"FAIL  {name}: {reason}")
            continue
        rec["hash_match"] = True
        print(f"OK    {name}: {len(sdf)} rows match [{dt:.1f}s]")

    if not only:
        t0 = time.time()
        edf = entry_mod.entry(spark)
        n = edf.count()
        print(f"entry(): {n} rows, schema: {[f.name for f in edf.schema.fields]} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {json_out} ({len(records)} records)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
