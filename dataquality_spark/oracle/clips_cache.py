"""Materialized pure-Python inputs for the clips/media DuckDB oracles.

The clips catalog queries (``clips_quality_labels``, ``clips_duplicate_
pairs``, ``clips_audio_invariants``, ``media_feature_extract``) run over
DETERMINISTIC generated data, so their DuckDB oracles can be real: this
module generates the same clips locally (pure pandas/numpy — no Spark) and
writes the *intermediate* frames to parquet files whose paths are baked
into the oracle SQL strings:

* ``enriched_n{N}.parquet`` — the per-row enrichment signals (model
  outputs, token lists, hashed-BoW vectors, content hashes).  The oracle
  then re-derives EVERYTHING downstream in SQL: exact-group windows,
  exhaustive near-dup pairs (token-set Jaccard gate + BoW cosine — an
  all-pairs recompute the distributed LSH funnel must match exactly,
  which also verifies the funnel's recall), the 17-dimension policy CASE
  tree, overall/action/keep.  Spark's distributed ``enrich`` is checked
  against this pure-Python enrichment bit-for-bit, and Spark's
  dedup+policy against the SQL recompute.
* ``invariants_n{N}.parquet`` — per-clip decoded-PCM SNR from the same
  shared decode helper the Spark query ships to executors; the oracle
  re-derives decode_ok / snr_pass from clip-index arithmetic (the planted
  failure cases are index-determined) and checks the SNR >= 30 dB
  invariant on every decodable row.
* ``media_features.parquet`` — the multimodal extractor's outputs
  recomputed locally over identically-constructed media bytes.

Files are content-versioned (bump ``VERSION`` when enrichment semantics
change) and written atomically (tmp + rename), so the Spark query fn and
``oracle_sql()`` can both "ensure" them in any order.
"""

from __future__ import annotations

import os
import zlib

import numpy as np

VERSION = "v2"
CACHE_DIR = os.environ.get("DQ_ORACLE_CACHE", "/tmp/dq_oracle_cache")

N_LABELS = 4000      # clips_quality_labels corpus size
N_PAIRS = 2000       # clips_duplicate_pairs corpus size
N_INVARIANTS = 1000  # clips_audio_invariants corpus size
N_MEDIA_CLIPS = 300  # media_feature_extract: audio rows
N_MEDIA_BLOBS = 200  # media_feature_extract: image/video rows
N_SPECTRAL = 800     # clips_spectral_features corpus size
N_VAD = 900          # clips_vad_segments corpus size
N_FP = 500           # clips_fingerprint_dups originals (x2 with copies)
N_TRANSCODE = 700    # clips_transcode_8k corpus size
N_CHUNKS = 600       # clips_speech_chunks corpus size
NORM_PEAK = 0.70794578438413791  # -3 dBFS = 10^(-3/20) target peak


def enriched_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"enriched_{VERSION}_n{n}.parquet")


def invariants_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"invariants_{VERSION}_n{n}.parquet")


def media_path() -> str:
    return os.path.join(
        CACHE_DIR, f"media_{VERSION}_{N_MEDIA_CLIPS}_{N_MEDIA_BLOBS}.parquet"
    )


def _atomic_write(pdf, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
    os.replace(tmp, path)


# ----------------------------------------------------------------- enriched

_ENRICHED_COLS = [
    "clip_id", "sr_hz", "dur_ms", "codec", "decode_ok", "n_samples",
    "header_sr_hz", "clip_ratio", "is_silent", "lang", "lang_conf", "ppl",
    "pii_hits", "toxic_hits", "n_chars", "n_tokens", "n_distinct",
    "alpha_space_ratio", "t_hash", "tokens", "bow_vec", "age_days",
]


def ensure_enriched(n: int) -> str:
    """Generate + enrich n clips locally; write the signals parquet."""
    path = enriched_path(n)
    if os.path.exists(path):
        return path
    from ..datagen.clips import DEFAULT_RUN_TS, clips_pdf
    from ..functions.langid import get_model as get_langid
    from ..functions.minhash import unpack_bow
    from ..functions.perplexity import get_model as get_charlm
    from ..operators.enrich import enrich_batch

    pdf = clips_pdf(n)
    enr = enrich_batch(pdf, get_langid(), get_charlm())
    run_date = DEFAULT_RUN_TS.date()
    enr["age_days"] = np.asarray(
        [(run_date - ts.date()).days for ts in pdf["ingest_ts"]],
        dtype=np.int32,
    )
    # unpack the packed float32 blob so DuckDB sees a FLOAT[] list column
    enr["bow_vec"] = [unpack_bow(b).tolist() for b in enr["bow"]]
    # the Spark enriched schema deliberately drops the raw token strings
    # (operators/enrich.py — only tok_hashes ride the shuffle); the DuckDB
    # exhaustive-recompute oracle still wants them, so re-tokenize here on
    # the oracle side only (n is small and the parquet is cached).
    from ..functions.texthash import tokenize

    enr["tokens"] = [tokenize(t or "") for t in pdf["transcript"].tolist()]
    _atomic_write(enr[_ENRICHED_COLS], path)
    return path


# --------------------------------------------------------------- invariants

def snr_row(clip_id: str, raw: bytes) -> tuple[int, float, int]:
    """(decode_ok, snr_db, snr_pass) for one clip — decode the WAV bytes,
    recompute the analytic reference waveform from the clip index, SNR in
    dB (input_hint: >= 30 dB per decodable row).  Shared by the Spark
    ``clips_audio_invariants`` executors and the local oracle mirror, so
    the two sides run literally the same arithmetic."""
    from ..datagen.clips import reference_waveform
    from ..functions.audio import decode_wav_pcm16

    idx = int(clip_id.split("_")[1])
    try:
        dec = decode_wav_pcm16(bytes(raw))
    except ValueError:
        return 0, 0.0, 0
    sig = dec.pcm.astype(np.float64) / 32767.0  # invert encode scale
    ref = reference_waveform(idx, int(len(sig) * 1000 / dec.sr_hz))
    m = min(len(ref), len(sig))
    noise = ref[:m] - sig[:m]
    p_sig = float(np.mean(ref[:m] ** 2))
    p_noise = float(np.mean(noise**2)) or 1e-12
    snr = 10.0 * np.log10(p_sig / p_noise) if p_sig > 0 else 99.0
    return 1, round(float(snr), 2), int(snr >= 30.0 or p_sig == 0)


def ensure_invariants(n: int) -> str:
    path = invariants_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for

    rows = []
    for i in range(n):
        r = row_for(i)
        ok, snr, ok_pass = snr_row(r["clip_id"], r["bytes"])
        rows.append((r["clip_id"], ok, snr, ok_pass))
    pdf = pd.DataFrame(
        rows, columns=["clip_id", "decode_ok", "snr_db", "snr_pass"]
    )
    _atomic_write(pdf, path)
    return path


# -------------------------------------------------------------------- media

def blob_bytes(idx: int) -> bytes:
    """Mirror of the Spark-SQL blob constructor in media_feature_extract:
    cast(concat_ws('', transform(sequence(1,64), i -> char(65 + pmod(id*i,
    26)))) as binary)."""
    return bytes(65 + (idx * i) % 26 for i in range(1, 65))


def ensure_media() -> str:
    path = media_path()
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for
    from ..functions.audio import decode_wav_pcm16
    from ..functions.multimodal import FEATURE_DIM, _fake_decode, _fake_feature

    rows = []
    for i in range(N_MEDIA_CLIPS):
        r = row_for(i)
        try:
            dec = decode_wav_pcm16(r["bytes"])
            rows.append((r["clip_id"], 0, 0, int(dec.pcm.size),
                         zlib.crc32(r["bytes"]),
                         float(_fake_feature(r["bytes"])[0]), FEATURE_DIM))
        except ValueError:
            rows.append((r["clip_id"], 0, 0, 0, 0, None, 0))
    for i in range(N_MEDIA_BLOBS):
        raw = blob_bytes(i)
        w, hgt, nf = _fake_decode(raw)
        nf = 1 if i % 2 == 0 else nf  # image rows are single-frame
        rows.append((f"img_{i:09d}", w, hgt, nf, zlib.crc32(raw),
                     float(_fake_feature(raw)[0]), FEATURE_DIM))
    pdf = pd.DataFrame(
        rows,
        columns=["media_id", "width", "height", "n_frames", "content_hash",
                 "f0_raw", "feature_dim"],
    )
    _atomic_write(pdf, path)
    return path


# ---------------------------------------------------------- audio features

def spectral_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"spectral_{VERSION}_n{n}.parquet")


def vad_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"vad_{VERSION}_n{n}.parquet")


def fp_pairs_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"fp_pairs_{VERSION}_n{n}.parquet")


_SPECTRAL_COLS = [
    "clip_id", "decode_ok", "n_samples", "rms_db", "zcr", "dominant_hz",
    "centroid_hz", "rolloff85_hz", "flatness", "dominant_hz_8k", "tone_match",
]


def spectral_row(clip_id: str, raw: bytes) -> tuple:
    """Per-clip spectral descriptors + the planted-tone invariant.

    tone_match asserts the measured dominant rFFT bin equals the planted
    tone (110 + 3*(i%200) Hz, datagen/clips.py:reference_waveform) to
    within one bin at BOTH the native 16 kHz and after a linear resample
    to 8 kHz — i.e. the whole decode -> FFT -> resample path is verified
    against index arithmetic, not against itself.  Decode failures emit
    zeros (the invariants-row convention).  Shared verbatim by the Spark
    executors and the local oracle mirror."""
    import numpy as np

    from ..datagen.clips import SR
    from ..functions import audiofeat as af
    from ..functions.audio import decode_wav_pcm16

    idx = int(clip_id.split("_")[1])
    try:
        dec = decode_wav_pcm16(bytes(raw))
    except ValueError:
        return (clip_id, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0)
    x = dec.pcm.astype(np.float64) / 32767.0
    sf = af.spectral_features(x, dec.sr_hz)
    x8 = af.resample_linear(x, dec.sr_hz, 8000)
    s8 = af.spectral_features(x8, 8000)
    planted = 110.0 + 3.0 * (idx % 200)
    bin16 = dec.sr_hz / max(sf["n_samples"], 1)
    bin8 = 8000.0 / max(s8["n_samples"], 1)
    tone_match = int(
        abs(sf["dominant_hz"] - planted) <= bin16
        and abs(s8["dominant_hz"] - planted) <= bin8
    )
    return (
        clip_id, 1, sf["n_samples"], sf["rms_db"], sf["zcr"],
        sf["dominant_hz"], sf["centroid_hz"], sf["rolloff85_hz"],
        sf["flatness"], s8["dominant_hz"], tone_match,
    )


def ensure_spectral(n: int) -> str:
    path = spectral_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for

    rows = []
    for i in range(n):
        r = row_for(i)
        rows.append(spectral_row(r["clip_id"], r["bytes"]))
    _atomic_write(pd.DataFrame(rows, columns=_SPECTRAL_COLS), path)
    return path


_VAD_COLS = [
    "clip_id", "decode_ok", "n_frames", "speech_ratio", "n_segments",
    "longest_speech_ms",
]


def vad_row(clip_id: str, raw: bytes) -> tuple:
    """Energy-VAD summary with a planted silence gap: clips with index
    i % 3 == 0 get samples [0.4n, 0.6n) zeroed after decode, so the
    expected segment count is index-derivable (0 silent / 2 gapped / 1
    otherwise) — the oracle checks the segmenter against arithmetic, not
    against itself.  Shared verbatim by executors and the oracle mirror."""
    import numpy as np

    from ..functions import audiofeat as af
    from ..functions.audio import decode_wav_pcm16

    idx = int(clip_id.split("_")[1])
    try:
        dec = decode_wav_pcm16(bytes(raw))
    except ValueError:
        return (clip_id, 0, 0, 0.0, 0, 0.0)
    x = dec.pcm.astype(np.float64) / 32767.0
    if idx % 3 == 0:
        x = x.copy()
        x[int(0.4 * x.size):int(0.6 * x.size)] = 0.0
    v = af.vad_stats(x, dec.sr_hz)
    return (
        clip_id, 1, v["n_frames"], v["speech_ratio"], v["n_segments"],
        v["longest_speech_ms"],
    )


def ensure_vad(n: int) -> str:
    path = vad_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for

    rows = []
    for i in range(n):
        r = row_for(i)
        rows.append(vad_row(r["clip_id"], r["bytes"]))
    _atomic_write(pd.DataFrame(rows, columns=_VAD_COLS), path)
    return path


def scaled_pcm16(pcm) -> "np.ndarray":
    """The deterministic near-dup audio copy: 0.7x gain, requantized to
    PCM16.  Band-energy sign bits are amplitude-invariant, so the copy's
    fingerprint differs from the original's only by rare quantization-
    noise bit flips (measured max hamming 0.004 vs the 0.15 verify
    threshold).  Shared by the Spark corpus builder and the oracle."""
    import numpy as np

    return np.clip(
        np.round(pcm.astype(np.float64) * 0.7), -32768, 32767
    ).astype(np.int16)


def shifted_scaled_pcm16(pcm, s_words: int) -> "np.ndarray":
    """The time-shifted near-dup copy: `s_words` fingerprint hops of
    digital-silence leader prepended, then the 0.7x requantization.  The
    shift is a whole number of FP_HOP frames, so every content frame of
    the copy is sample-identical (pre-gain) to a frame of the original —
    the copy's fingerprint is the original's shifted by exactly s_words
    positions, modulo the same rare quantization bit flips as
    scaled_pcm16.  Shared by the Spark fan-out and the numpy oracle."""
    import numpy as np

    from ..functions import audiofeat as af

    pad = np.zeros(s_words * af.FP_HOP, dtype=np.int16)
    return scaled_pcm16(np.concatenate([pad, np.asarray(pcm, dtype=np.int16)]))


def fp_pair_row(clip_id: str, raw: bytes) -> tuple:
    """(clip_1, clip_2, hamming, eligible) for one clip index: the
    original vs its scaled requantized copy.  hamming is the exact
    fraction of differing fingerprint bits — integer popcount over the
    xor'd words divided by 16*n_words, bit-identical to the Spark-side
    native `aggregate(zip_with(...bit_count(x ^ y)...))` expression."""
    import numpy as np

    from ..functions import audiofeat as af
    from ..functions.audio import decode_wav_pcm16

    suffix = clip_id.split("_")[1]
    try:
        dec = decode_wav_pcm16(bytes(raw))
    except ValueError:
        return (clip_id, f"dupc_{suffix}", 0.0, 0)
    x = dec.pcm.astype(np.float64) / 32767.0
    voiced = float(np.sqrt(np.mean(x * x))) > af.VAD_RMS_THRESH if x.size else False
    if not voiced:
        return (clip_id, f"dupc_{suffix}", 0.0, 0)
    xs = scaled_pcm16(dec.pcm).astype(np.float64) / 32767.0
    fa = af.band_fingerprint(x, dec.sr_hz)
    fb = af.band_fingerprint(xs, dec.sr_hz)
    return (clip_id, f"dupc_{suffix}", af.hamming_frac(fa, fb), 1)


def ensure_fp_pairs(n: int) -> str:
    path = fp_pairs_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for

    rows = []
    for i in range(n):
        r = row_for(i)
        rows.append(fp_pair_row(r["clip_id"], r["bytes"]))
    _atomic_write(
        pd.DataFrame(rows, columns=["clip_1", "clip_2", "hamming", "eligible"]),
        path,
    )
    return path


def transcode_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"transcode_{VERSION}_n{n}.parquet")


def chunks_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"chunks_{VERSION}_n{n}.parquet")


_TRANSCODE_COLS = [
    "clip_id", "decode_ok", "out_sr", "out_n_samples", "gain_db",
    "out_peak", "out_crc32",
]


def transcode_row(clip_id: str, raw: bytes) -> tuple:
    """The write-path audio transform: decode -> linear resample to 8 kHz
    -> peak-normalize to -3 dBFS -> requantize -> re-encode WAV.  Emits
    the transformed payload's crc32 (a bit-exact check of the WHOLE
    decode/resample/normalize/encode chain), the gain applied, and the
    achieved peak.  Silent clips get unity gain.  Shared verbatim by the
    Spark executors and the oracle mirror."""
    import numpy as np

    from ..functions import audiofeat as af
    from ..functions.audio import decode_wav_pcm16, encode_wav_pcm16

    try:
        dec = decode_wav_pcm16(bytes(raw))
    except ValueError:
        return (clip_id, 0, 0, 0, 0.0, 0.0, 0)
    x = dec.pcm.astype(np.float64) / 32767.0
    y = af.resample_linear(x, dec.sr_hz, 8000)
    peak = float(np.max(np.abs(y))) if y.size else 0.0
    gain = NORM_PEAK / peak if peak > 0 else 1.0
    y = np.clip(y * gain, -1.0, 1.0)
    out = encode_wav_pcm16(y, 8000)
    pcm_out = np.frombuffer(out[44:], dtype="<i2")
    out_peak = float(np.max(np.abs(pcm_out)) / 32767.0) if pcm_out.size else 0.0
    return (
        clip_id, 1, 8000, int(y.size),
        round(20.0 * float(np.log10(gain)), 3) if gain > 0 else 0.0,
        round(out_peak, 4),
        zlib.crc32(out),
    )


def ensure_transcode(n: int) -> str:
    path = transcode_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for

    rows = []
    for i in range(n):
        r = row_for(i)
        rows.append(transcode_row(r["clip_id"], r["bytes"]))
    _atomic_write(pd.DataFrame(rows, columns=_TRANSCODE_COLS), path)
    return path


_CHUNK_COLS = ["clip_id", "seg_idx", "start_ms", "end_ms", "seg_rms_db"]


def chunk_rows(clip_id: str, raw: bytes) -> list:
    """Chunk extraction: one row per VAD speech segment (the gapped-clip
    convention from vad_row applies, so segment counts stay index-
    derivable: 0 silent / 2 gapped / 1 plain; decode failures emit no
    rows).  Shared verbatim by executors and the oracle mirror."""
    import numpy as np

    from ..functions import audiofeat as af
    from ..functions.audio import decode_wav_pcm16

    idx = int(clip_id.split("_")[1])
    try:
        dec = decode_wav_pcm16(bytes(raw))
    except ValueError:
        return []
    x = dec.pcm.astype(np.float64) / 32767.0
    if idx % 3 == 0:
        x = x.copy()
        x[int(0.4 * x.size):int(0.6 * x.size)] = 0.0
    return [
        (clip_id, j, s, e, r)
        for j, (s, e, r) in enumerate(af.speech_segments(x, dec.sr_hz))
    ]


def ensure_chunks(n: int) -> str:
    path = chunks_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for

    rows = []
    for i in range(n):
        r = row_for(i)
        rows.extend(chunk_rows(r["clip_id"], r["bytes"]))
    _atomic_write(pd.DataFrame(rows, columns=_CHUNK_COLS), path)
    return path


N_LOUD = 800  # clips_loudness_stats corpus size (x2 with hot4 variants)


def loudness_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"loudness_{VERSION}_n{n}.parquet")


_LOUD_COLS = [
    "clip_id", "variant", "decode_ok", "peak", "rms_db", "crest_db",
    "clip_ratio", "is_clipped",
]


def _pcm_loudness(pcm_int: "np.ndarray") -> tuple:
    """(peak, rms_db, crest_db, clip_ratio, is_clipped) from int16 PCM.

    clip_ratio counts saturated codes (|code| >= 32767 — the negative rail
    saturates at -32768, which abs() still catches); is_clipped uses the
    1% ratio the policy's Accuracy dimension gates on (operators/
    scoring.py, metadata.py:419-433)."""
    import numpy as np

    x = pcm_int.astype(np.float64) / 32767.0
    if x.size == 0:
        return (0.0, -120.0, 0.0, 0.0, 0)
    peak = float(np.max(np.abs(x)))
    rms = float(np.sqrt(np.mean(x * x)))
    clip_ratio = float(np.mean(np.abs(pcm_int.astype(np.int32)) >= 32767))
    rms_db = 20.0 * np.log10(rms) if rms > 1e-6 else -120.0
    crest_db = 20.0 * np.log10(peak / rms) if rms > 1e-6 and peak > 0 else 0.0
    return (
        round(peak, 4), round(rms_db, 3), round(crest_db, 3),
        round(clip_ratio, 5), int(clip_ratio > 0.01),
    )


def loudness_rows(clip_id: str, raw: bytes) -> list:
    """Two rows per clip — the original and a 4x-gain requantized 'hot4'
    variant — so the clipping detector sees both sides of the 1% gate on
    every index: the hot copy of any voiced clip MUST clip (tone amplitude
    0.5 -> 2.0 saturates ~2/3 of samples), the original must NOT except
    the planted k=26 clipped case, silence never clips, and decode
    failures emit zeroed rows.  All expectations are index-derivable,
    which is what the DuckDB oracle re-derives.  Shared verbatim by the
    Spark executors and the local oracle mirror."""
    import numpy as np

    from ..functions.audio import decode_wav_pcm16

    try:
        dec = decode_wav_pcm16(bytes(raw))
    except ValueError:
        zero = (0.0, -120.0, 0.0, 0.0, 0)
        return [
            (clip_id, "orig", 0) + zero,
            (clip_id, "hot4", 0) + zero,
        ]
    hot = np.clip(
        np.round(dec.pcm.astype(np.float64) * 4.0), -32768, 32767
    ).astype(np.int16)
    return [
        (clip_id, "orig", 1) + _pcm_loudness(dec.pcm),
        (clip_id, "hot4", 1) + _pcm_loudness(hot),
    ]


def ensure_loudness(n: int) -> str:
    path = loudness_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for

    rows = []
    for i in range(n):
        r = row_for(i)
        rows.extend(loudness_rows(r["clip_id"], r["bytes"]))
    _atomic_write(pd.DataFrame(rows, columns=_LOUD_COLS), path)
    return path


DOC_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale


def doc_models_path() -> str:
    return os.path.join(CACHE_DIR, f"doc_models_{VERSION}_sf001.parquet")


def ensure_doc_models() -> str:
    """Run the REAL scorer models (hashed-char-trigram langid NB +
    interpolated-backoff char-LM perplexity) locally over the driver's
    sf0.01 documents table and persist their outputs — the oracle input
    for doc_model_scores, which runs the same broadcast models
    distributed. Unlike doc_langid_vote / doc_char_bigram_ppl (their
    SQL-expressible stand-ins), this checks the actual model path."""
    path = doc_models_path()
    if os.path.exists(path):
        return path
    import pandas as pd
    import pyarrow.parquet as pq

    from ..functions.langid import get_model as get_langid
    from ..functions.perplexity import get_model as get_charlm

    docs = pq.read_table(
        os.path.join(DOC_SF_DIR, "documents.parquet"),
        columns=["doc_id", "text"],
    ).to_pandas()
    texts = docs["text"].tolist()
    langs, confs = get_langid().predict_batch(texts)
    ppl = get_charlm().perplexity_batch(texts)
    out = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].values,
            "lang_pred": langs,
            "lang_conf": confs,
            "ppl": ppl,
        }
    )
    _atomic_write(out, path)
    return path




N_ALIGN = 500  # clips_word_alignment corpus size


def align_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"align_{VERSION}_n{n}.parquet")


_ALIGN_COLS = [
    "clip_id", "seg_idx", "start_ms", "end_ms", "w_start", "w_end",
]


def align_rows(clip_id: str, raw: bytes, transcript: str) -> list:
    """Proportional word-to-segment alignment (the forced-alignment stub
    an ASR data-prep pipeline runs before per-segment training pairs):
    whitespace words are split across the clip's VAD speech segments in
    proportion to segment duration, boundaries by integer floor over
    cumulative speech milliseconds — w_end_i = floor(W * cum_i / D).
    By construction the ranges partition [0, W): seg 0 starts at 0,
    the last segment ends at W, ranges are contiguous and monotone —
    invariants the DuckDB oracle RE-DERIVES in SQL rather than trusts.
    Gapped/silent/undecodable conventions follow chunk_rows."""
    import numpy as np

    from ..functions import audiofeat as af
    from ..functions.audio import decode_wav_pcm16

    idx = int(clip_id.split("_")[1])
    try:
        dec = decode_wav_pcm16(bytes(raw))
    except ValueError:
        return []
    x = dec.pcm.astype(np.float64) / 32767.0
    if idx % 3 == 0:
        x = x.copy()
        x[int(0.4 * x.size):int(0.6 * x.size)] = 0.0
    segs = af.speech_segments(x, dec.sr_hz)
    if not segs:
        return []
    words = [w for w in (transcript or "").split() if w]
    n_w = len(words)
    # VAD emits hop-aligned times (exact multiples of 10 ms) as floats;
    # integer ms keep the boundary arithmetic exact
    seg_ms = [(int(s), int(e)) for s, e, _r in segs]
    total = sum(e - s for s, e in seg_ms)
    rows, cum, prev_end = [], 0, 0
    for j, (s, e) in enumerate(seg_ms):
        cum += e - s
        w_end = (n_w * cum) // total if total > 0 else 0
        rows.append((clip_id, j, s, e, prev_end, w_end))
        prev_end = w_end
    return rows


def ensure_align(n: int) -> str:
    path = align_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import row_for

    rows = []
    for i in range(n):
        r = row_for(i)
        rows.extend(align_rows(r["clip_id"], r["bytes"], r["transcript"]))
    _atomic_write(pd.DataFrame(rows, columns=_ALIGN_COLS), path)
    return path


N_MIXED = 600  # clips_mixed_codec_decode corpus size


def mixed_path(n: int) -> str:
    return os.path.join(CACHE_DIR, f"mixed_{VERSION}_n{n}.parquet")


_MIXED_COLS = [
    "clip_id", "codec", "decode_ok", "n_samples", "snr_db", "snr_pass",
]


def mixed_codec_row(clip_id: str, raw: bytes, codec: str) -> tuple:
    """(clip_id, codec, decode_ok, n_samples, snr_db, snr_pass) for one
    mixed-codec clip: codec-dispatched decode (PCM16 or G.711 mu-law —
    functions/audio.decode_clip), SNR vs the analytic reference waveform
    recomputed from the clip index.  Exercises the codec dispatch seam
    with a REAL second codec path (mu-law expands in pure numpy); 'mp3'
    rows still hit the honest NotImplementedError gate and are
    error-routed.  Mu-law companding error is ~35-38 dB SNR — above the
    input_hint's 30 dB floor, which snr_pass asserts per row.  Shared
    verbatim by the Spark executors and the local oracle mirror."""
    from ..datagen.clips import reference_waveform
    from ..functions.audio import decode_clip

    idx = int(clip_id.split("_")[1])
    try:
        dec = decode_clip(bytes(raw), codec)
    except (ValueError, NotImplementedError):
        return (clip_id, codec, 0, 0, 0.0, 0)
    sig = dec.pcm.astype(np.float64) / 32767.0
    ref = reference_waveform(idx, int(len(sig) * 1000 / dec.sr_hz))
    m = min(len(ref), len(sig))
    noise = ref[:m] - sig[:m]
    p_sig = float(np.mean(ref[:m] ** 2))
    p_noise = float(np.mean(noise**2)) or 1e-12
    snr = 10.0 * np.log10(p_sig / p_noise) if p_sig > 0 else 99.0
    return (
        clip_id, codec, 1, int(dec.pcm.size), round(float(snr), 2),
        int(snr >= 30.0 or p_sig == 0),
    )


def ensure_mixed(n: int) -> str:
    path = mixed_path(n)
    if os.path.exists(path):
        return path
    import pandas as pd

    from ..datagen.clips import mixed_codec_row_for

    rows = []
    for i in range(n):
        r = mixed_codec_row_for(i)
        rows.append(mixed_codec_row(r["clip_id"], r["bytes"], r["codec"]))
    _atomic_write(pd.DataFrame(rows, columns=_MIXED_COLS), path)
    return path


def ensure_all() -> None:
    """Materialize every oracle input (no-op when cached)."""
    ensure_enriched(N_LABELS)
    ensure_enriched(N_PAIRS)
    ensure_invariants(N_INVARIANTS)
    ensure_media()
    ensure_doc_models()
    ensure_spectral(N_SPECTRAL)
    ensure_vad(N_VAD)
    ensure_fp_pairs(N_FP)
    ensure_transcode(N_TRANSCODE)
    ensure_chunks(N_CHUNKS)
    ensure_loudness(N_LOUD)
    ensure_align(N_ALIGN)
    ensure_mixed(N_MIXED)
