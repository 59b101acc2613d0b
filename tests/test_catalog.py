"""Guards the driver contract: a representative subset of the query
catalog is run through Spark AND its DuckDB oracle at sf0.001 and
compared exactly (the full sweep lives in tools/selfcheck.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dataquality_spark.queries import CATALOG, TABLES

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "doc_quality_policy",
    "doc_shingle_jaccard_pairs",
    "doc_minhash_band_pairs",
    "doc_simhash",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "events_latest_per_user",
    "tpch_q1_pricing_summary",
    "orders_status_rollup",
    "events_asof_last_click",
    "events_flexible_date_parse",
    "doc_span_boilerplate",
    "doc_pack_sequences",
    "tpch_q5_local_supplier_volume",
    "events_value_drift",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


@pytest.mark.parametrize("name", SUBSET)
def test_catalog_matches_oracle(spark, duck, name):
    q = CATALOG[name]
    assert q.oracle, f"{name} has no oracle"
    sdf = q.run(spark, SF_DIR).toPandas()
    odf = duck.execute(q.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = _norm(sdf), _norm(odf)
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            try:
                b[c] = b[c].astype(a[c].dtype)
            except (ValueError, TypeError):
                a[c], b[c] = a[c].astype(str), b[c].astype(str)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_every_query_has_doc_and_callable():
    for name, q in CATALOG.items():
        assert q.doc, name
        assert q.fn or q.spark_sql, name


def test_every_query_has_an_oracle():
    """The correctness bar: NO rows-only entries — every operator carries
    a hard DuckDB-checked oracle."""
    missing = [n for n, q in CATALOG.items() if not q.oracle]
    assert not missing, f"queries without oracle: {missing}"


def test_catalog_frozen_at_87():
    """Round-3 freeze: the driver's correctness gate records one row per
    queries() entry, so the catalog must not grow mid-round (additions
    after the driver's check produce unevidenced queries — the round-2
    lesson). Bump this ONLY together with a round-boundary freeze note
    in SURVEY.md §8."""
    assert len(CATALOG) == 87, (
        f"catalog has {len(CATALOG)} queries; the round-3 freeze is 87"
    )


def test_emb_cosine_pairs_has_no_cartesian_plan(spark):
    """The embedding pair query must generate candidates via the banded
    equi-join — never a cartesian / theta self-join (the scale-killer the
    LSH rework removed). emb_cosine_topk's single-probe broadcast NL join
    is the accepted J4 degenerate case; this guards the PAIRS query."""
    plan = (
        CATALOG["emb_cosine_pairs"]
        .run(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.oracle_sql()) <= set(m.queries())
