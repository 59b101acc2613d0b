"""Dedup operator tests: planted clusters, symmetry, pair ordering (P5/P6,
J1-J5 analogs, A8)."""

import datetime as dt

import pandas as pd
import pytest

from dataquality_spark.datagen.clips import DEFAULT_RUN_TS, clips_pdf
from dataquality_spark.operators.dedup import dedup
from dataquality_spark.operators.enrich import enrich


@pytest.fixture(scope="module")
def dd(spark):
    pdf = clips_pdf(300)
    enriched = enrich(spark.createDataFrame(pdf), DEFAULT_RUN_TS).persist()
    res = dedup(enriched)
    flags = res.flags.toPandas().set_index("clip_id")
    dpairs = res.duplicate_pairs.toPandas()
    spairs = res.similarity_pairs.toPandas()
    return flags, dpairs, spairs


def test_hot_cluster_all_flagged(dd):
    flags, _, _ = dd
    hot = [i for i in range(300) if i % 100 < 5]
    for i in hot:
        assert flags.loc[f"clip_{i:012d}", "is_dup"], i


def test_near_dup_pairs_both_flagged(dd):
    # symmetric attachment — reference metadata.py:608-617
    flags, _, _ = dd
    for i in range(300):
        if i % 100 in (5, 6, 7, 8):
            assert flags.loc[f"clip_{i:012d}", "is_dup"], i


def test_normal_rows_not_flagged(dd):
    flags, _, _ = dd
    for i in range(300):
        if i % 100 >= 28:
            assert not flags.loc[f"clip_{i:012d}", "is_dup"], i


def test_empty_transcripts_never_duplicates(dd):
    # identical-empty rows must not pair up (gate needs non-empty tokens)
    flags, _, _ = dd
    for i in range(300):
        if i % 100 in (17, 18):
            assert not flags.loc[f"clip_{i:012d}", "is_dup"], i


def test_pairs_ordered_and_unique(dd):
    # A8: unordered-pair dedup via strict clip_1 < clip_2 (metadata.py:655-666)
    _, dpairs, spairs = dd
    for pairs in (dpairs, spairs):
        assert (pairs["clip_1"] < pairs["clip_2"]).all()
        assert not pairs.duplicated(["clip_1", "clip_2"]).any()


def test_duplicate_pairs_thresholds(dd):
    # P5: every reported duplicate satisfies gate >= 0.7 AND cos >= 0.95
    _, dpairs, _ = dd
    assert (dpairs["metadata_similarity"] >= 70.0).all()
    assert (dpairs["similarity"] >= 95.0).all()


def test_dup_of_points_to_representative(dd):
    flags, _, _ = dd
    hot = flags.loc[[f"clip_{i:012d}" for i in range(300) if i % 100 < 5]]
    reps = hot["dup_of"].dropna().unique()
    assert list(reps) == ["clip_000000000000"]


def test_connected_components_path_and_singleton(spark):
    """Min-label propagation: a 5-node path (diameter 4 — needs multiple
    propagation rounds), a separate triangle, and an isolated node must
    land in exactly the right components with min-id labels."""
    from dataquality_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14),   # path
         (20, 21), (21, 22), (20, 22)],            # triangle
        "id_a bigint, id_b bigint",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in [10, 11, 12, 13, 14, 20, 21, 22, 99]], "node bigint"
    )
    got = {r.node: r.component
           for r in connected_components(edges, nodes).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 22: 20, 99: 99}


def test_connected_components_raises_at_iteration_cap(spark):
    from dataquality_spark.operators.dedup import connected_components

    import pytest

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "id_a bigint, id_b bigint")
    nodes = spark.createDataFrame([(n,) for n in [1, 2, 3, 4]], "node bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, max_iters=1)


def test_native_and_cogroup_verify_bit_equal(spark):
    """The north-star's cogroup-based verify and the default codegen
    array_intersect verify are interchangeable: same pairs, same gate and
    similarity values to the last bit (both compute exact set Jaccard on
    the same sorted-distinct hash arrays)."""
    from dataquality_spark.datagen.clips import clips_pdf
    pdf = clips_pdf(300)
    enriched = enrich(spark.createDataFrame(pdf), DEFAULT_RUN_TS).persist()
    cols = ["clip_1", "clip_2", "metadata_similarity", "similarity"]
    a = (dedup(enriched, verify="native").duplicate_pairs.toPandas()[cols]
         .sort_values(cols[:2], ignore_index=True))
    b = (dedup(enriched, verify="cogroup").duplicate_pairs.toPandas()[cols]
         .sort_values(cols[:2], ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
