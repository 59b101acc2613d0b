"""Scalable near-duplicate detection (reference J1-J5 / P5-P6).

The reference runs a single-threaded O(n^2) nested loop over all successful
files — metadata-similarity gate >= 0.7, then embedding cosine >= 0.95
(``backend/app/services/metadata.py:514-624``).  At 10^12 rows that is
impossible; this operator keeps the *decision rule* bit-exact while making
the *search* scale:

1. **Exact-group collapse** (skew defusal): group by transcript content hash
   with a map-side-combinable ``min/count`` agg — the pathological "5% of all
   rows identical" hot cluster never enters the pairwise stage.  Members of a
   group of size >= 2 are duplicates by definition (gate=1, cos=1) and are
   reported as linear star edges (rep, member) instead of the reference's
   quadratic all-pairs (documented deviation; the full pair set is the
   transitive closure within each equal-transcript group).
2. **MinHash/LSH banding** over one representative per group: explode slim
   (band_idx, band_hash, lang) rows — heavy payloads (tokens/bow) do NOT get
   16x-duplicated through the shuffle — and equi-self-join on the band key.
   ``lang`` rides in the join key because the reference's gate needs
   0.5*exact-type-match and 0.5 < 0.7 makes cross-lang duplicates impossible
   (P6, metadata.py:213-243) — the gate becomes a join-key pre-filter.
3. **Cogroup exact verification**: candidate pairs are bucketed by clip-id
   hash and cogrouped with the slim feature table
   (``groupby(bucket).cogroup(...).applyInPandas``) — a manual shuffle-hash
   join in pandas, one pass per pair side — then the exact decision runs
   vectorized in numpy: gate = 0.5*lang_match + 0.5*exact Jaccard on token
   sets; similarity = cosine on hashed-BoW vectors.  LSH therefore only
   affects recall; precision is exact (SURVEY §7.3).

AQE skew-join handles residual band-bucket skew; the explicit salting knob
is the coarse bucket count of the cogroup.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# P5 thresholds — metadata.py:536, :599; README.md:50-53
DUP_GATE_MIN = 0.7
DUP_COS_MIN = 0.95
LANG_UNKNOWN = "und"

_PAIR_SCHEMA = (
    "clip_1 string, clip_2 string, metadata_similarity double, "
    "similarity double, is_duplicate boolean"
)


class DedupResult(NamedTuple):
    flags: DataFrame        # clip_id, is_dup, dup_of (rep id or null)
    duplicate_pairs: DataFrame   # clip_1 < clip_2, sims (0-100, 2dp)
    similarity_pairs: DataFrame  # every verified candidate pair (P5 reporting)


def _eligible_col() -> F.Column:
    # Reference gate requires a non-empty doc type + token overlap; rows with
    # unknown language or no tokens can never reach gate >= 0.7.
    return (F.col("lang") != LANG_UNKNOWN) & (F.col("n_tokens") > 0)


def exact_groups(enriched: DataFrame) -> DataFrame:
    """t_hash -> (rep_id, group_size); map-side combinable, skew-safe."""
    return (
        enriched.select("t_hash", "clip_id")
        .groupBy("t_hash")
        .agg(F.min("clip_id").alias("rep_id"), F.count("*").alias("group_size"))
    )


def _attach_and_score(buckets: int):
    """Builders for the two cogroup passes (side A attach, side B score)."""

    def attach_a(cand: pd.DataFrame, feats: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(
                columns=["id_a", "id_b", "a_tokens", "a_bow"]
            )
        f = feats.set_index("clip_id")
        sel = f.loc[cand["id_a"].values]
        return pd.DataFrame(
            {
                "id_a": cand["id_a"].values,
                "id_b": cand["id_b"].values,
                "a_tokens": sel["tokens"].values,
                "a_bow": sel["bow"].values,
            }
        )

    def score_b(cand: pd.DataFrame, feats: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(
                columns=[
                    "clip_1", "clip_2", "metadata_similarity", "similarity",
                    "is_duplicate",
                ]
            )
        f = feats.set_index("clip_id")
        sel = f.loc[cand["id_b"].values]
        a_tok = cand["a_tokens"].values
        b_tok = sel["tokens"].values
        # bow blobs -> (n, dim) float32 matrix: one frombuffer per side
        a_bow = np.frombuffer(b"".join(cand["a_bow"]), dtype="<f4").reshape(len(cand), -1)
        b_bow = np.frombuffer(b"".join(sel["bow"]), dtype="<f4").reshape(len(cand), -1)
        # cosine, vectorized: vectors are L2-normalized at construction
        cos = np.einsum("ij,ij->i", a_bow, b_bow).astype(np.float64)
        jac = np.empty(len(cand), dtype=np.float64)
        for i in range(len(cand)):
            sa, sb = set(a_tok[i]), set(b_tok[i])
            u = len(sa | sb)
            jac[i] = (len(sa & sb) / u) if u else 0.0
        # P6: lang equality is guaranteed by the band join key -> 0.5 + ...
        gate = 0.5 + 0.5 * jac
        dup = (gate >= DUP_GATE_MIN) & (cos >= DUP_COS_MIN)
        return pd.DataFrame(
            {
                "clip_1": cand["id_a"].values,
                "clip_2": cand["id_b"].values,
                # C7 percent formatting — metadata.py:595-596
                "metadata_similarity": np.round(gate * 100.0, 2),
                "similarity": np.round(cos * 100.0, 2),
                "is_duplicate": dup,
            }
        )

    return attach_a, score_b


def dedup(enriched: DataFrame, buckets: int = 64) -> DedupResult:
    spark = enriched.sparkSession
    groups = exact_groups(enriched)

    members = (
        enriched.select("clip_id", "t_hash", "lang", "n_tokens")
        .withColumn("eligible", _eligible_col())
        .join(groups, "t_hash")
    )

    # --- exact duplicates: linear star edges (rep, member) ----------------
    exact_pairs = (
        members.filter(
            F.col("eligible") & (F.col("group_size") >= 2)
            & (F.col("clip_id") != F.col("rep_id"))
        )
        .select(
            F.col("rep_id").alias("clip_1"),
            F.col("clip_id").alias("clip_2"),
            F.lit(100.0).alias("metadata_similarity"),
            F.lit(100.0).alias("similarity"),
            F.lit(True).alias("is_duplicate"),
        )
    )

    # --- LSH candidates over representatives ------------------------------
    feats = (
        enriched.join(
            groups.select(F.col("rep_id").alias("clip_id"), "group_size"),
            "clip_id",
            "left_semi",
        )
        .filter(_eligible_col())
        .select("clip_id", "lang", "tokens", "bow", "bands")
    )
    exploded = feats.select(
        "clip_id", "lang", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        )
        .select(F.col("a.clip_id").alias("id_a"), F.col("b.clip_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])  # A8 pair dedup across bands
    )

    # --- cogroup verification (exact decision on candidates only) ---------
    attach_a, score_b = _attach_and_score(buckets)
    slim = feats.select("clip_id", "tokens", "bow")
    cand_a = cand.withColumn("bucket", F.pmod(F.xxhash64("id_a"), F.lit(buckets)))
    feats_bk = slim.withColumn(
        "bucket", F.pmod(F.xxhash64("clip_id"), F.lit(buckets))
    )
    attached = (
        cand_a.groupBy("bucket")
        .cogroup(feats_bk.groupBy("bucket"))
        .applyInPandas(
            lambda c, f: attach_a(c, f),
            schema="id_a string, id_b string, a_tokens array<string>, a_bow binary",
        )
    )
    attached_b = attached.withColumn(
        "bucket", F.pmod(F.xxhash64("id_b"), F.lit(buckets))
    )
    verified = (
        attached_b.groupBy("bucket")
        .cogroup(feats_bk.groupBy("bucket"))
        .applyInPandas(lambda c, f: score_b(c, f), schema=_PAIR_SCHEMA)
    )
    verified = verified.persist()

    # --- flags -------------------------------------------------------------
    near_rep_ids = (
        verified.filter("is_duplicate")
        .select(F.explode(F.array("clip_1", "clip_2")).alias("rep_id"))
        .distinct()
        .withColumn("rep_near_dup", F.lit(True))
    )
    flags = (
        members.join(near_rep_ids, "rep_id", "left")
        .withColumn(
            "is_dup",
            F.col("eligible")
            & (
                (F.col("group_size") >= 2)
                | F.coalesce(F.col("rep_near_dup"), F.lit(False))
            ),
        )
        .withColumn(
            "dup_of",
            F.when(
                F.col("is_dup") & (F.col("clip_id") != F.col("rep_id")),
                F.col("rep_id"),
            ),
        )
        .select("clip_id", "is_dup", "dup_of")
    )

    duplicate_pairs = exact_pairs.unionByName(
        verified.filter("is_duplicate")
    ).orderBy(F.desc("similarity"), "clip_1", "clip_2")  # O3
    similarity_pairs = verified.orderBy(F.desc("similarity"), "clip_1", "clip_2")  # O2
    return DedupResult(flags, duplicate_pairs, similarity_pairs)
