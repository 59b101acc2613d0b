"""Scalable near-duplicate detection (reference J1-J5 / P5-P6).

The reference runs a single-threaded O(n^2) nested loop over all successful
files — metadata-similarity gate >= 0.7, then embedding cosine >= 0.95
(``backend/app/services/metadata.py:514-624``).  At 10^12 rows that is
impossible; this operator keeps the *decision rule* exact while making the
*search* scale.  The funnel, cheapest-per-pair first, with the per-pair
payload growing only as the pair count shrinks:

1. **Exact-group collapse** (skew defusal): group by transcript content hash
   with a map-side-combinable ``min/count`` agg — the pathological "5% of all
   rows identical" hot cluster never enters the pairwise stage.  Members of a
   group of size >= 2 are duplicates by definition (gate=1, cos=1) and are
   reported as linear star edges (rep, member) instead of the reference's
   quadratic all-pairs (documented deviation; the full pair set is the
   transitive closure within each equal-transcript group).
2. **MinHash/LSH banding** over one representative per group: explode slim
   (band_idx, band_hash, lang) rows — heavy payloads never enter this
   shuffle — and equi-self-join on the band key.  ``lang`` rides in the join
   key because the reference's gate needs 0.5*exact-type-match and 0.5 < 0.7
   makes cross-lang duplicates impossible (P6, metadata.py:213-243).
3. **Signature-estimate prefilter**: candidates attach ONLY the packed
   64-perm MinHash blobs (512 B/side) via plain equi-joins (Catalyst picks
   broadcast/shuffle-hash; AQE splits skew) and a vectorized Arrow pass
   estimates Jaccard as the fraction of agreeing slots.  est sigma
   ~= sqrt(J(1-J)/64) ~= 0.06; pairs under EST_PREFILTER cannot reach the
   exact gate (J >= 0.4) and are dropped — ~70% of candidates at test SF.
4. **Vectorized cosine** on survivors: attach the 1 KB hashed-BoW blobs,
   one numpy einsum over each Arrow batch.  Only pairs with cos >=
   DUP_COS_MIN — the rule's rarest predicate — continue.
5. **Native exact verification** on those few: two equi-joins attach each
   side's sorted-distinct token-hash array and ``array_intersect``/``size``
   compute exact set Jaccard inside whole-stage codegen — zero Python, and
   the tokens scan prunes to participating ids (AQE broadcasts the small
   pairs side).  Exact set Jaccard decides gate >= 0.7, so the decision is
   exact on every surviving pair — LSH banding and the estimate prefilter
   affect recall only (SURVEY §7.3), and both sit multiple sigma below what
   a true duplicate (cos >= 0.95 implies near-identical token sets) can
   evade.  (A double-cogroup variant that ships each array once per bucket
   is kept for pathological amplification; see ``_exact_jaccard_cogroup``.)

``similarity_pairs`` reporting — a deliberate, documented deviation: the
reference appends EVERY compared pair to its report unconditionally before
the gate check (metadata.py:592-599), which is the O(n^2) pair list itself
and cannot exist at scale.  This operator reports the pairs whose
(estimated or exact) gate reaches the 0.7 decision threshold, with exact
gate values where the exact path ran (cos >= 0.95 survivors) and the
64-slot signature estimate elsewhere.  Every ``is_duplicate`` pair is
guaranteed present (the verified set is unioned in, not left-joined), so
the two outputs can never disagree.

AQE skew-join handles residual band-bucket skew; the explicit salting knob
is the coarse bucket count of the cogroup.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import cached

# P5 thresholds — metadata.py:536, :599; README.md:50-53
DUP_GATE_MIN = 0.7
DUP_COS_MIN = 0.95
LANG_UNKNOWN = "und"
# Prefilter on the 64-slot MinHash estimate of Jaccard.  The exact gate
# needs J >= 0.4 (gate = 0.5 + 0.5*J >= 0.7); at J = 0.4 the estimator's
# sigma is ~0.061, so 0.25 sits 2.5 sigma below the gate.  Recall-only:
# pairs dropped here can never flip a keep/drop decision that the exact
# path would have flipped the other way (precision stays exact).
EST_PREFILTER = 0.25
# Candidates must agree on >= 2 of the 16 LSH bands (see the filter site).
# Edge case this trades away: a repetitive transcript can reach cos >= 0.95
# on hashed-TF vectors with set-Jaccard only ~0.45, where P(>= 2 of 16
# bands) drops to ~14% — such pairs are under-recalled.  Accepted as part
# of the documented recall-only approximation; the synthetic corpus and
# golden suite contain no such pair, and production tuning would lower
# this to 1 (or exempt high-max-token-frequency rows) if they mattered.
MIN_SHARED_BANDS = 2
# Band buckets larger than this emit linear star edges instead of all
# pairs (duplicate-cluster skew defusal; see the candidate-generation site).
BUCKET_CAP = 128

_PAIR_SCHEMA = (
    "clip_1 string, clip_2 string, metadata_similarity double, "
    "similarity double, is_duplicate boolean"
)


class DedupResult(NamedTuple):
    flags: DataFrame        # clip_id, is_dup, dup_of (rep id or null)
    duplicate_pairs: DataFrame   # clip_1 < clip_2, sims (0-100, 2dp)
    similarity_pairs: DataFrame  # gate >= 0.7 pairs + cosine (P5 reporting)


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


def _attach_both(pairs: DataFrame, feat: DataFrame, col: str) -> DataFrame:
    """pairs(id_a, id_b, ...) x feat(clip_id, <col>) -> + <col>_a, <col>_b
    via two equi-joins (Catalyst picks the strategy, AQE handles skew)."""
    fa = feat.select(F.col("clip_id").alias("id_a"), F.col(col).alias(f"{col}_a"))
    fb = feat.select(F.col("clip_id").alias("id_b"), F.col(col).alias(f"{col}_b"))
    return pairs.join(fa, "id_a").join(fb, "id_b")


def _estimate_pairs(pairs: DataFrame) -> DataFrame:
    """Vectorized MinHash-agreement estimate over (sig_a, sig_b) blobs."""

    def est(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.frombuffer(b"".join(pdf["minhash_sig_a"]), dtype="<u8").reshape(len(pdf), -1)
            b = np.frombuffer(b"".join(pdf["minhash_sig_b"]), dtype="<u8").reshape(len(pdf), -1)
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].values,
                    "id_b": pdf["id_b"].values,
                    "est_jaccard": (a == b).mean(axis=1),
                }
            )

    return pairs.mapInPandas(
        est, schema="id_a string, id_b string, est_jaccard double"
    )


def _cosine_pairs(pairs: DataFrame) -> DataFrame:
    """Vectorized cosine over (bow_a, bow_b) blobs; carries est_jaccard."""

    def cos(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # float64 accumulation: keeps the dot bit-comparable with the
            # float64 list-arithmetic the DuckDB oracle runs on the same
            # float32 vector values (clips_duplicate_pairs correctness gate).
            a = (
                np.frombuffer(b"".join(pdf["bow_a"]), dtype="<f4")
                .reshape(len(pdf), -1).astype(np.float64)
            )
            b = (
                np.frombuffer(b"".join(pdf["bow_b"]), dtype="<f4")
                .reshape(len(pdf), -1).astype(np.float64)
            )
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].values,
                    "id_b": pdf["id_b"].values,
                    "est_jaccard": pdf["est_jaccard"].values,
                    "cos": np.einsum("ij,ij->i", a, b),
                }
            )

    return pairs.mapInPandas(
        cos, schema="id_a string, id_b string, est_jaccard double, cos double"
    )


def _exact_jaccard_native(pairs: DataFrame, tokens: DataFrame) -> DataFrame:
    """Exact token-set Jaccard for (id_a, id_b, cos) pairs, entirely
    JVM-side: two equi-joins attach each side's ``tok_hashes`` (sorted
    distinct token hashes, already computed for MinHash), then native
    ``array_intersect``/``size`` compute |A∩B| and |A∪B| inside
    whole-stage codegen.

    This replaced the round-2 double-cogroup (``applyInPandas``) verify:
    that design shipped the ENTIRE tokens table through the Arrow boundary
    twice to save re-shipping arrays once per pair — but the pairs reaching
    this stage are the cos>=0.95 survivors of a star-capped LSH funnel, so
    the per-pair amplification is small and bounded (BUCKET_CAP) while the
    tokens side is the whole corpus.  Profiled at 640k clips / 8 pinned
    cores the cogroup cost ~26 s of wall; the join form prunes the tokens
    scan to participating ids (AQE broadcasts the small pairs side) and
    keeps the set math in codegen — no Python in the loop at all.
    Intersection semantics are identical: per-clip hash arrays are
    distinct, and ``array_intersect`` returns distinct elements."""
    ta = tokens.select(
        F.col("clip_id").alias("id_a"), F.col("tok_hashes").alias("a_h")
    )
    tb = tokens.select(
        F.col("clip_id").alias("id_b"), F.col("tok_hashes").alias("b_h")
    )
    j = pairs.join(ta, "id_a").join(tb, "id_b")
    inter = F.size(F.array_intersect("a_h", "b_h")).cast("double")
    union = F.size("a_h").cast("double") + F.size("b_h").cast("double") - inter
    return j.select(
        "id_a", "id_b", "cos",
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )


def _exact_jaccard_cogroup(pairs: DataFrame, tokens: DataFrame,
                           buckets: int) -> DataFrame:
    """Exact token-set Jaccard for (id_a, id_b[, cos]) pairs via two cogroup
    passes; each rep's token-hash array ships once per bucket, not once per
    pair.  ``tokens`` carries ``tok_hashes`` — the sorted distinct uint64
    token hashes already computed for MinHash — so the per-pair set math is
    a numpy ``intersect1d`` over sorted int arrays (no Python ``set``
    objects, no string hashing in the hot path).

    Kept as the reference implementation for the pathological corpus where
    near-everything is a candidate pair (amplification >> BUCKET_CAP would
    favor ship-once-per-bucket); the decision path uses
    :func:`_exact_jaccard_native` — see its docstring for the measured
    trade."""

    def attach_a(cand: pd.DataFrame, feats: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "cos", "a_hashes"])
        sel = feats.set_index("clip_id").loc[cand["id_a"].values]
        return pd.DataFrame(
            {
                "id_a": cand["id_a"].values,
                "id_b": cand["id_b"].values,
                "cos": cand["cos"].values,
                "a_hashes": sel["tok_hashes"].values,
            }
        )

    def jac_b(cand: pd.DataFrame, feats: pd.DataFrame) -> pd.DataFrame:
        cols = ["id_a", "id_b", "cos", "jaccard"]
        if cand.empty:
            return pd.DataFrame(columns=cols)
        sel = feats.set_index("clip_id").loc[cand["id_b"].values]
        a_h, b_h = cand["a_hashes"].values, sel["tok_hashes"].values
        n = len(cand)
        # Fully vectorized per-pair set intersection: tag every hash with
        # its pair index, lexsort ONE concatenated (pair, hash) array, and
        # count adjacent duplicates — a hash appears at most once per side
        # (arrays are distinct per clip), so each adjacent-equal run is
        # exactly one intersection hit.  One sort for the whole bucket
        # replaces a Python loop of per-pair ``np.intersect1d`` calls.
        la = np.fromiter((len(x) for x in a_h), dtype=np.int64, count=n)
        lb = np.fromiter((len(x) for x in b_h), dtype=np.int64, count=n)
        idx = np.arange(n, dtype=np.int64)
        pair_ids = np.concatenate([np.repeat(idx, la), np.repeat(idx, lb)])
        hashes = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in a_h]
            + [np.asarray(x, dtype=np.int64) for x in b_h]
        ) if pair_ids.size else np.empty(0, dtype=np.int64)
        order = np.lexsort((hashes, pair_ids))
        sp, sh = pair_ids[order], hashes[order]
        dup = (sp[1:] == sp[:-1]) & (sh[1:] == sh[:-1])
        inter = np.bincount(sp[1:][dup], minlength=n).astype(np.float64)
        union = (la + lb).astype(np.float64) - inter
        jac = np.divide(inter, union, out=np.zeros(n), where=union > 0)
        return pd.DataFrame(
            {
                "id_a": cand["id_a"].values,
                "id_b": cand["id_b"].values,
                "cos": cand["cos"].values,
                "jaccard": jac,
            }
        )

    cand_a = pairs.withColumn("bucket", F.pmod(F.xxhash64("id_a"), F.lit(buckets)))
    tok_bk = tokens.withColumn("bucket", F.pmod(F.xxhash64("clip_id"), F.lit(buckets)))
    attached = (
        cand_a.groupBy("bucket")
        .cogroup(tok_bk.groupBy("bucket"))
        .applyInPandas(
            attach_a,
            schema="id_a string, id_b string, cos double, a_hashes array<bigint>",
        )
    )
    attached_b = attached.withColumn(
        "bucket", F.pmod(F.xxhash64("id_b"), F.lit(buckets))
    )
    return (
        attached_b.groupBy("bucket")
        .cogroup(tok_bk.groupBy("bucket"))
        .applyInPandas(
            jac_b, schema="id_a string, id_b string, cos double, jaccard double"
        )
    )


def dedup_increment(enriched_all: DataFrame, new_ids: DataFrame,
                    buckets: int = 64) -> DedupResult:
    """Incremental near-dup detection: flag a NEW slice of clips against
    the full corpus without recomputing corpus×corpus pairs.

    The production shape for continuously-landing data: the committed
    enriched table (checkpoint.py) holds every prior slice; each new batch
    only needs pairs that TOUCH a new row.  Candidate generation therefore
    joins ``new-side bands × all bands`` — the left side is only the new
    slice, so the join (and everything downstream) scales with
    |new| × collision rate, not |corpus|².  Semantics are append-only:
    a new row that matches an existing representative is flagged as the
    duplicate; the existing row stays canonical (its historical flag is
    not rewritten — same asymmetry as the star-edge deviation in
    :func:`dedup`).

    ``new_ids``: single-column ``clip_id`` frame naming the new slice.
    Returns a :class:`DedupResult` whose ``flags`` cover ONLY the new
    rows; pair outputs contain only pairs touching a new row.

    Verified in tests/test_dedup_incremental.py: incremental flags ==
    full-run flags restricted to the new slice, on a corpus whose planted
    duplicate clusters straddle the old/new boundary.
    """
    new_marked = new_ids.select("clip_id").withColumn("is_new", F.lit(True))
    groups = cached(exact_groups(enriched_all))

    members = (
        enriched_all.select("clip_id", "t_hash", "lang", "n_tokens")
        .withColumn("eligible", _eligible_col())
        .join(groups, "t_hash")
        .join(new_marked, "clip_id", "left")
        .fillna({"is_new": False})
    )
    rep_new = (
        members.filter(F.col("is_new"))
        .select(F.col("clip_id").alias("rep_id"))
        .distinct()
        .withColumn("rep_is_new", F.lit(True))
    )

    # exact star edges touching a new row (member new, or rep itself new)
    exact_pairs = (
        members.join(rep_new, "rep_id", "left")
        .filter(
            F.col("eligible") & (F.col("group_size") >= 2)
            & (F.col("clip_id") != F.col("rep_id"))
            & (F.col("is_new") | F.coalesce("rep_is_new", F.lit(False)))
        )
        .select(
            F.col("rep_id").alias("clip_1"),
            F.col("clip_id").alias("clip_2"),
            F.lit(100.0).alias("metadata_similarity"),
            F.lit(100.0).alias("similarity"),
            F.lit(True).alias("is_duplicate"),
        )
    )

    feats = (
        enriched_all.join(
            groups.select(F.col("rep_id").alias("clip_id")),
            "clip_id", "left_semi",
        )
        .filter(_eligible_col())
        .select("clip_id", "lang", "tok_hashes", "bow", "bands",
                "minhash_sig")
        .join(new_marked, "clip_id", "left")
        .fillna({"is_new": False})
    )
    feats = cached(feats)
    exploded = feats.select(
        "clip_id", "lang", "is_new",
        F.posexplode("bands").alias("band_idx", "band_hash"),
    )
    # Same BUCKET_CAP skew defusal as the full path: a hot band bucket in
    # the corpus would otherwise make the new-side × all-side join emit
    # |new-in-bucket| × |bucket| rows from one non-splittable key.  Same
    # window-over-band-key formulation as dedup(): one exchange, and the
    # band join below reuses the partitioning (cap bounds the worst key).
    bw = Window.partitionBy("band_idx", "band_hash", "lang")
    exploded = exploded.withColumn("bsize", F.count("*").over(bw)).withColumn(
        "leader", F.min("clip_id").over(bw)
    )
    small = exploded.filter(F.col("bsize") <= BUCKET_CAP)
    leaders_new = (
        exploded.select(F.col("leader").alias("clip_id")).distinct()
        .join(new_marked, "clip_id", "left_semi")
        .select(F.col("clip_id").alias("leader"))
        .withColumn("leader_is_new", F.lit(True))
    )
    big_edges = (
        exploded.filter(
            (F.col("bsize") > BUCKET_CAP) & (F.col("clip_id") != F.col("leader"))
        )
        .join(leaders_new, "leader", "left")
        .filter(F.col("is_new") | F.coalesce("leader_is_new", F.lit(False)))
        # leader = min(clip_id) in the bucket -> leader < member
        .select(F.col("leader").alias("id_a"), F.col("clip_id").alias("id_b"),
                "band_idx")
    )
    # new-side × all-side band join: output is only pairs touching new
    a = small.filter(F.col("is_new")).alias("a")
    b = small.alias("b")
    raw_pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.clip_id") != F.col("b.clip_id")),
    ).select(
        F.least("a.clip_id", "b.clip_id").alias("id_a"),      # A8 normalize
        F.greatest("a.clip_id", "b.clip_id").alias("id_b"),
        F.col("a.band_idx").alias("band_idx"),
    )
    cand = (
        raw_pairs.unionByName(big_edges)
        .dropDuplicates(["id_a", "id_b", "band_idx"])  # new×new double-emit
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
        .filter(F.col("n_bands") >= MIN_SHARED_BANDS)
        .select("id_a", "id_b")
    )

    slim = feats.select("clip_id", "minhash_sig", "bow", "tok_hashes")
    with_sigs = _attach_both(cand, slim.select("clip_id", "minhash_sig"),
                             "minhash_sig")
    survivors = _estimate_pairs(with_sigs).filter(
        F.col("est_jaccard") >= EST_PREFILTER
    )
    with_bows = _attach_both(survivors, slim.select("clip_id", "bow"), "bow")
    cos_pairs = cached(_cosine_pairs(with_bows))
    dup_elig = cos_pairs.filter(F.col("cos") >= DUP_COS_MIN).select(
        "id_a", "id_b", "cos"
    )
    exact = _exact_jaccard_native(
        dup_elig, slim.select("clip_id", "tok_hashes")
    )
    verified_dups = cached(
        exact.withColumn("gate", F.lit(0.5) + F.lit(0.5) * F.col("jaccard"))
        .filter(F.col("gate") >= DUP_GATE_MIN)
        .select(
            F.col("id_a").alias("clip_1"),
            F.col("id_b").alias("clip_2"),
            F.round(F.col("gate") * 100.0, 2).alias("metadata_similarity"),
            F.round(F.col("cos") * 100.0, 2).alias("similarity"),
            F.lit(True).alias("is_duplicate"),
        )
    )

    near_rep_ids = (
        verified_dups.select(
            F.explode(F.array("clip_1", "clip_2")).alias("rep_id")
        )
        .distinct()
        .withColumn("rep_near_dup", F.lit(True))
    )
    flags = (
        members.filter(F.col("is_new"))
        .join(near_rep_ids, "rep_id", "left")
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

    duplicate_pairs = exact_pairs.unionByName(verified_dups).orderBy(
        F.desc("similarity"), "clip_1", "clip_2"
    )
    return DedupResult(flags, duplicate_pairs, duplicate_pairs)


def dedup(enriched: DataFrame, buckets: int = 64,
          verify: str = "native") -> DedupResult:
    # groups feeds members AND feats; feats feeds the band explode, the
    # sig/bow attach joins, and the cogroup passes — without a persist each
    # consumer re-runs the upstream agg/joins (measured ~2x on the whole
    # dedup stage). Slim columns only; MEMORY_AND_DISK spills at scale.
    # Every persist goes through caching.cached() so callers can
    # caching.release_all() once outputs are materialized (paired
    # persist/unpersist lifecycle — bench, scaling job, catalog runner and
    # the pytest fixture all release).
    groups = cached(exact_groups(enriched))

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
        .select("clip_id", "lang", "tok_hashes", "bow", "bands", "minhash_sig")
    )
    feats = cached(feats)
    exploded = feats.select(
        "clip_id", "lang", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    # Duplicate-cluster skew defusal (north rule): a planted hot cluster
    # puts thousands of near-identical clips into ONE band bucket, and the
    # all-pairs self-join would emit C(k,2) rows from a single non-splittable
    # join key (one task emitting 10^7+ pairs serializes the whole stage —
    # measured: 8-core wall time doubled at 640k clips).  Buckets over
    # BUCKET_CAP therefore emit linear star edges (bucket leader, member)
    # instead of all pairs: at that size the bucket is a tight duplicate
    # cluster (random band collisions measured p99.9 = 35 members), every
    # member matches the leader, and the flags/transitive semantics match
    # the exact-group star-edge deviation documented above.  Buckets at or
    # under the cap keep exact all-pairs.
    #
    # Per-bucket size/leader come from a WINDOW over the band key, not a
    # groupBy + join-back: one exchange instead of three, and the self-join
    # below then reuses the window's hash partitioning (both sides derive
    # from the same frame), so candidate generation runs exchange-free
    # after the single band-key shuffle.  Giving up AQE skew-splitting on
    # that join is safe BY CONSTRUCTION: only bsize <= BUCKET_CAP rows
    # enter it, so the worst key's join work is bounded at C(cap, 2) per
    # band — the cap, not AQE, is the skew defusal here.
    bw = Window.partitionBy("band_idx", "band_hash", "lang")
    exploded = exploded.withColumn("bsize", F.count("*").over(bw)).withColumn(
        "leader", F.min("clip_id").over(bw)
    )
    small = exploded.filter(F.col("bsize") <= BUCKET_CAP)
    big_edges = (
        exploded.filter(
            (F.col("bsize") > BUCKET_CAP) & (F.col("clip_id") != F.col("leader"))
        )
        # leader = min(clip_id) -> leader < member, so ordering holds
        .select(F.col("leader").alias("id_a"), F.col("clip_id").alias("id_b"),
                "band_idx")
    )
    a = small.alias("a")
    b = small.alias("b")
    small_pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.clip_id") < F.col("b.clip_id")),
    ).select(
        F.col("a.clip_id").alias("id_a"), F.col("b.clip_id").alias("id_b"),
        F.col("a.band_idx").alias("band_idx"),
    )
    cand = (
        small_pairs.unionByName(big_edges)
        .groupBy("id_a", "id_b")  # A8 pair dedup across bands, counting
        .agg(F.count("*").alias("n_bands"))
        # Multi-band rule: a true duplicate (cos >= 0.95 -> J ~ 0.9) matches
        # a 4-row band with p = J^4 ~ 0.66 and >= 2 of 16 bands with
        # p > 0.9999996; single-band pairs are ~85% of candidates at test SF
        # and are overwhelmingly hash noise (measured: 7.7M of 9.0M at 160k
        # clips). This prunes them before any per-pair payload attaches.
        .filter(F.col("n_bands") >= MIN_SHARED_BANDS)
        .select("id_a", "id_b")
    )

    # --- stage 3: signature-estimate prefilter (512 B blobs) --------------
    with_sigs = _attach_both(cand, feats.select("clip_id", "minhash_sig"),
                             "minhash_sig")
    survivors = _estimate_pairs(with_sigs).filter(
        F.col("est_jaccard") >= EST_PREFILTER
    )

    # --- stage 4: vectorized cosine (1 KB blobs) ---------------------------
    with_bows = _attach_both(survivors, feats.select("clip_id", "bow"), "bow")
    cos_pairs = cached(_cosine_pairs(with_bows))

    # --- stage 5: exact gate on the cos-qualified few ----------------------
    dup_elig = cos_pairs.filter(F.col("cos") >= DUP_COS_MIN).select(
        "id_a", "id_b", "cos"
    )
    # verify="native" (default): codegen array_intersect joins — measured
    # faster at every tested scale because the pairs side is tiny.
    # verify="cogroup": the north-star's cogroup-based detection — ships
    # each token array once per bucket; the right trade only when pair
    # amplification dwarfs the corpus (tests prove bit-equal outputs).
    if verify == "cogroup":
        exact = _exact_jaccard_cogroup(
            dup_elig, feats.select("clip_id", "tok_hashes"), buckets
        )
    else:
        exact = _exact_jaccard_native(
            dup_elig, feats.select("clip_id", "tok_hashes")
        )
    # P6: lang equality is guaranteed by the band join key -> 0.5 + 0.5*jac
    verified_dups = (
        exact.withColumn("gate", F.lit(0.5) + F.lit(0.5) * F.col("jaccard"))
        .filter(F.col("gate") >= DUP_GATE_MIN)
        .select(
            F.col("id_a").alias("clip_1"),
            F.col("id_b").alias("clip_2"),
            # C7 percent formatting — metadata.py:595-596
            F.round(F.col("gate") * 100.0, 2).alias("metadata_similarity"),
            F.round(F.col("cos") * 100.0, 2).alias("similarity"),
            F.lit(True).alias("is_duplicate"),
        )
    )
    verified_dups = cached(verified_dups)

    # --- P5 reporting: gate >= 0.7 pairs with their cosine -----------------
    report = (
        cos_pairs.filter(F.lit(0.5) + F.lit(0.5) * F.col("est_jaccard")
                         >= DUP_GATE_MIN)
        .select(
            F.col("id_a").alias("clip_1"),
            F.col("id_b").alias("clip_2"),
            F.round((F.lit(0.5) + F.lit(0.5) * F.col("est_jaccard")) * 100.0, 2)
            .alias("est_gate_pct"),
            F.round(F.col("cos") * 100.0, 2).alias("similarity"),
        )
    )
    # FULL outer join: a verified duplicate whose signature-ESTIMATED gate
    # fell under 0.7 (possible for repetitive transcripts: exact set-Jaccard
    # just above 0.4 while the estimate dips below) must still appear here —
    # duplicate_pairs and similarity_pairs can never disagree on membership.
    similarity_pairs = (
        report.join(
            verified_dups.select(
                "clip_1", "clip_2",
                F.col("metadata_similarity").alias("exact_gate_pct"),
                F.col("similarity").alias("exact_sim_pct"),
                "is_duplicate",
            ),
            ["clip_1", "clip_2"],
            "full_outer",
        )
        .select(
            "clip_1", "clip_2",
            F.coalesce("exact_gate_pct", "est_gate_pct").alias("metadata_similarity"),
            F.coalesce("similarity", "exact_sim_pct").alias("similarity"),
            F.coalesce("is_duplicate", F.lit(False)).alias("is_duplicate"),
        )
        .orderBy(F.desc("similarity"), "clip_1", "clip_2")  # O2
    )

    # --- flags -------------------------------------------------------------
    near_rep_ids = (
        verified_dups.select(
            F.explode(F.array("clip_1", "clip_2")).alias("rep_id")
        )
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

    duplicate_pairs = exact_pairs.unionByName(verified_dups).orderBy(
        F.desc("similarity"), "clip_1", "clip_2"
    )  # O3
    return DedupResult(flags, duplicate_pairs, similarity_pairs)


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair graph by iterative
    min-label propagation (the Pregel shape on DataFrames).

    ``edges`` carries columns (id_a, id_b); ``nodes`` a single column
    ``node`` (isolated nodes become their own singleton component).
    Returns (node, component) where component = min node id reachable.

    Convergence / scale notes:

    * labels only ever DECREASE (``least``), so ``sum(label)`` is a
      strictly decreasing sequence — the driver-side loop stops on the
      first round where the sum is unchanged.  That fixpoint check is a
      single scalar aggregate per round, not a join-compare.  The sum
      runs over DECIMAL(38,0): 10^12 nodes carrying 64-bit hash ids sum
      to ~10^31, which overflows a BIGINT (ANSI abort — or worse, a
      silent wrap that could fake convergence) but fits DECIMAL
      exactly.
    * each round's frame is ``localCheckpoint``ed: without truncation
      the logical plan doubles per iteration and Catalyst planning time
      explodes long before the data does.  On a production cluster this
      would be a reliable-storage checkpoint instead (lineage must not
      pin executors at 10^12 rows).
    * rounds needed = graph diameter, and near-dup graphs are
      overwhelmingly star/clique-shaped (diameter 2-3); ``max_iters``
      is a runaway guard, not a tuning knob.  A RuntimeError at the cap
      is a red flag about the edge set, not something to bump.
    * every step is an equi-join / keyed aggregation on slim int rows —
      AQE re-plans the propagation join when components skew.
    """
    und = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()

    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iters):
        nbr_min = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds"
    )
