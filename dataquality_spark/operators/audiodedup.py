"""Audio-content near-duplicate detection over PCM payloads.

The text-dedup LSH funnel shape (operators/dedup.py) applied to the audio
itself: per clip an Arrow batch computes the Haitsma-Kalker band-energy
sign fingerprint (functions/audiofeat.py — amplitude-invariant uint16
word per 512-sample hop) plus crc32 chunk keys; candidate pairs come from
a banded equi-join on (n_words, chunk_idx, chunk_hash) — never all-pairs
— and verification is a NATIVE zip_with/bit_count hamming expression, so
no Python runs anywhere past the fingerprint map.

100 TB shape:
* the audio bytes are consumed on the scan partitions and never shuffle —
  only ~100-byte fingerprint rows move;
* the banded join is a plain equi-join AQE can re-plan (skew-join/ broadcast);
* silence is gated out up front (all-zero fingerprints would otherwise
  form a quadratic collision bucket — the audio analog of the hot
  transcript cluster);
* the verify filter runs inside whole-stage codegen (bit_count over the
  xor'd words), emitting only pairs within the hamming budget.

Semantics provenance: the reference's near-dup decision gates on metadata
similarity then verifies content (metadata.py:560-597); this operator is
the payload-level analog for re-encoded / re-normalized copies of the
same recording.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import audiofeat as af


def audio_fingerprints(clips: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """clip_id/bytes -> (fp_id, n_words, words array<int>, chunks
    array<bigint>) slim fingerprint rows; undecodable and silent clips
    are dropped (error routing happens upstream in the enrich pass)."""
    import numpy as np
    import pandas as pd

    from ..functions.audio import decode_wav_pcm16

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, raw in zip(pdf[id_col], pdf["bytes"]):
                try:
                    dec = decode_wav_pcm16(bytes(raw))
                except ValueError:
                    continue
                x = dec.pcm.astype(np.float64) / 32767.0
                if not x.size or float(np.sqrt(np.mean(x * x))) <= af.VAD_RMS_THRESH:
                    continue  # silence gate: all-zero fingerprints collide
                words = af.band_fingerprint(x, dec.sr_hz)
                rows.append((
                    cid,
                    int(words.size),
                    [int(w) for w in words],
                    af.fingerprint_chunks(words),
                ))
            yield pd.DataFrame(rows, columns=["fp_id", "n_words", "words", "chunks"])

    return clips.select(F.col(id_col).alias(id_col), "bytes").mapInPandas(
        fps,
        schema="fp_id string, n_words int, words array<int>, chunks array<bigint>",
    )


def fingerprint_pairs(
    fp: DataFrame, max_hamming: float = af.FP_HAMMING_MAX
) -> DataFrame:
    """Banded-LSH candidate generation + native hamming verify over a
    fingerprint frame (caller persists `fp` if it is expensive — it is
    consumed three times)."""
    chunk = fp.select(
        "fp_id", "n_words", F.posexplode("chunks").alias("chunk_idx", "chunk_hash")
    )
    cand = (
        chunk.alias("a")
        .join(
            chunk.alias("b"),
            on=[
                F.col("a.n_words") == F.col("b.n_words"),
                F.col("a.chunk_idx") == F.col("b.chunk_idx"),
                F.col("a.chunk_hash") == F.col("b.chunk_hash"),
                F.col("a.fp_id") < F.col("b.fp_id"),
            ],
        )
        .select(F.col("a.fp_id").alias("id_a"), F.col("b.fp_id").alias("id_b"))
        .distinct()
    )
    hamming = (
        F.expr(
            "CAST(aggregate(zip_with(wa, wb, (x, y) -> bit_count(x ^ y)), "
            "0, (s, v) -> s + v) AS DOUBLE)"
        )
        / (16.0 * F.col("nw").cast("double"))
    )
    return (
        cand.join(fp.select(F.col("fp_id").alias("id_a"),
                            F.col("words").alias("wa"),
                            F.col("n_words").alias("nw")), "id_a")
        .join(fp.select(F.col("fp_id").alias("id_b"),
                        F.col("words").alias("wb")), "id_b")
        .select(
            F.col("id_a").alias("clip_1"),
            F.col("id_b").alias("clip_2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
