"""The local replica gate (tools/selfcheck.py) must be at least as strict
as the driver's value-hash.

Round-4 postmortem: ``doc_curation_pipeline`` was driver-red for three
rounds while the replica said green, because the replica harmonized
dtypes before comparing — the DuckDB oracle's un-cast HUGEINT window-sum
landed in pandas as float64 against Spark's int64, which the driver's
hash rejects (0.0 vs 0) but the old coercion silently accepted.  These
tests pin the strict behavior so the gate can't regress to lenient.
Pure pandas — no Spark session needed.
"""

import sys

import pandas as pd
import pytest

sys.path.insert(0, ".")

from tools.selfcheck import compare_values  # noqa: E402


def test_float_vs_int_is_a_failure_even_when_numerically_equal():
    # exactly the r4 bug shape: spark int64, oracle float64, same values
    spark = pd.DataFrame({"doc_id": [1, 2], "start_tok": pd.array([0, 7], dtype="int64")})
    oracle = pd.DataFrame({"doc_id": [1, 2], "start_tok": pd.array([0.0, 7.0], dtype="float64")})
    ok, reason = compare_values(spark, oracle)
    assert not ok
    assert "dtype mismatch" in reason and "start_tok" in reason


def test_int_width_difference_is_tolerated_like_the_driver():
    # int32 vs int64 hash identically once collected; must stay green
    spark = pd.DataFrame({"k": pd.array([1, 2], dtype="int32")})
    oracle = pd.DataFrame({"k": pd.array([1, 2], dtype="int64")})
    ok, reason = compare_values(spark, oracle)
    assert ok, reason


def test_float_width_difference_is_tolerated():
    spark = pd.DataFrame({"x": pd.array([0.5, 1.25], dtype="float32")})
    oracle = pd.DataFrame({"x": pd.array([0.5, 1.25], dtype="float64")})
    ok, reason = compare_values(spark, oracle)
    assert ok, reason


def test_value_mismatch_still_detected():
    a = pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
    b = pd.DataFrame({"k": [1, 2], "v": ["a", "c"]})
    ok, reason = compare_values(a, b)
    assert not ok
    assert "value mismatch" in reason


def test_order_insensitive_green_path():
    a = pd.DataFrame({"k": [2, 1], "v": [20, 10]})
    b = pd.DataFrame({"v": [10, 20], "k": [1, 2]})
    ok, reason = compare_values(a, b)
    assert ok, reason


def test_bool_vs_int_is_cross_kind():
    a = pd.DataFrame({"f": pd.array([True, False], dtype="bool")})
    b = pd.DataFrame({"f": pd.array([1, 0], dtype="int64")})
    ok, reason = compare_values(a, b)
    assert not ok
    assert "dtype mismatch" in reason


@pytest.mark.parametrize("name", ["doc_curation_pipeline", "doc_pack_sequences"])
def test_fixed_oracles_cast_start_tok(name):
    """The two r4 oracles now cast their window-sum arithmetic to BIGINT
    so DuckDB's HUGEINT widening can't leak float64 into the compare."""
    from dataquality_spark.queries import CATALOG

    sql = CATALOG[name].oracle
    assert "AS start_tok" in sql
    assert "CAST(cum_end - " in sql and "AS BIGINT) AS start_tok" in sql
