"""Unit tests for the payload-level audio feature operators
(functions/audiofeat.py): spectral descriptors, linear resampling,
energy-gate VAD, and the Haitsma-Kalker band-energy fingerprint used by
the audio-content dedup query."""

import numpy as np
import pytest

from dataquality_spark.datagen.clips import SR, reference_waveform, row_for
from dataquality_spark.functions import audiofeat as af
from dataquality_spark.functions.audio import decode_wav_pcm16
from dataquality_spark.oracle.clips_cache import (
    fp_pair_row,
    scaled_pcm16,
    spectral_row,
    vad_row,
)


def _pcm_float(i: int) -> np.ndarray:
    dec = decode_wav_pcm16(row_for(i)["bytes"])
    return dec.pcm.astype(np.float64) / 32767.0


def test_dominant_bin_hits_planted_tone():
    for i in (28, 129, 333):  # normal rows, distinct planted tones
        x = _pcm_float(i)
        sf = af.spectral_features(x, SR)
        planted = 110.0 + 3.0 * (i % 200)
        assert abs(sf["dominant_hz"] - planted) <= SR / sf["n_samples"]


def test_resample_preserves_dominant_tone():
    x = _pcm_float(28)
    x8 = af.resample_linear(x, SR, 8000)
    assert x8.size == int(x.size * 8000 / SR)
    s8 = af.spectral_features(x8, 8000)
    planted = 110.0 + 3.0 * (28 % 200)
    assert abs(s8["dominant_hz"] - planted) <= 8000 / s8["n_samples"]


def test_silent_clip_spectral_conventions():
    x = np.zeros(4800)
    sf = af.spectral_features(x, SR)
    assert sf["dominant_hz"] == 0.0
    assert sf["flatness"] == 1.0
    assert sf["rms_db"] == -120.0


def test_tonal_vs_noise_flatness_orders():
    """Flatness separates tone (≈0) from white noise (≈1) — the quality
    signal a speech filter thresholds on."""
    rng = np.random.default_rng(7)
    tone = _pcm_float(28)
    noise = 0.3 * rng.standard_normal(tone.size)
    assert af.spectral_features(tone, SR)["flatness"] < 0.05
    assert af.spectral_features(noise, SR)["flatness"] > 0.5


def test_vad_counts_planted_gap_segments():
    # i=30 (i%3==0, normal): gap injected by vad_row -> 2 segments
    r = row_for(30)
    row = vad_row(r["clip_id"], r["bytes"])
    assert row[4] == 2  # n_segments
    # i=28 (i%3!=0): single segment covering ~the whole clip
    r = row_for(28)
    row = vad_row(r["clip_id"], r["bytes"])
    assert row[4] == 1
    assert row[3] > 0.9  # speech_ratio
    # i=325 (k=25 silent): zero segments, zero speech
    r = row_for(325)
    row = vad_row(r["clip_id"], r["bytes"])
    assert row[4] == 0 and row[3] == 0.0


def test_vad_decode_failure_row():
    r = row_for(23)
    assert vad_row(r["clip_id"], r["bytes"]) == (r["clip_id"], 0, 0, 0.0, 0, 0.0)


def test_fingerprint_amplitude_invariance_float():
    """Sign-of-band-difference bits are exactly gain-invariant in float."""
    x = _pcm_float(28)
    a = af.band_fingerprint(x, SR)
    b = af.band_fingerprint(0.25 * x, SR)
    np.testing.assert_array_equal(a, b)


def test_fingerprint_requantized_copy_within_threshold():
    dec = decode_wav_pcm16(row_for(28)["bytes"])
    x = dec.pcm.astype(np.float64) / 32767.0
    xs = scaled_pcm16(dec.pcm).astype(np.float64) / 32767.0
    h = af.hamming_frac(af.band_fingerprint(x, SR), af.band_fingerprint(xs, SR))
    assert h <= af.FP_HAMMING_MAX / 3  # wide margin under the verify gate


def test_fingerprint_distinct_clips_far_apart():
    a = af.band_fingerprint(_pcm_float(28), SR)
    # i=9728 shares k AND i%97 (thus duration) with i=28, different tone
    b = af.band_fingerprint(_pcm_float(9728), SR)
    assert a.size == b.size
    assert af.hamming_frac(a, b) > 2 * af.FP_HAMMING_MAX


def test_fingerprint_chunk_recall_on_true_pair():
    dec = decode_wav_pcm16(row_for(28)["bytes"])
    x = dec.pcm.astype(np.float64) / 32767.0
    xs = scaled_pcm16(dec.pcm).astype(np.float64) / 32767.0
    ca = af.fingerprint_chunks(af.band_fingerprint(x, SR))
    cb = af.fingerprint_chunks(af.band_fingerprint(xs, SR))
    assert set(ca) & set(cb)  # at least one identical LSH band


def test_fp_pair_row_eligibility():
    r23, r25, r28 = row_for(23), row_for(325), row_for(28)
    assert fp_pair_row(r23["clip_id"], r23["bytes"])[3] == 0  # decode fail
    assert fp_pair_row(r25["clip_id"], r25["bytes"])[3] == 0  # silent
    row = fp_pair_row(r28["clip_id"], r28["bytes"])
    assert row[3] == 1 and row[2] <= af.FP_HAMMING_MAX


def test_spectral_row_matches_planted_cases():
    for i, expected_tone in ((28, 1), (325, 0), (126, 1)):  # normal/silent/clipped
        r = row_for(i)
        row = spectral_row(r["clip_id"], r["bytes"])
        assert row[1] == 1  # decode_ok
        assert row[10] == expected_tone
    r = row_for(23)
    assert spectral_row(r["clip_id"], r["bytes"])[1] == 0


def test_hamming_frac_length_mismatch_is_far():
    a = np.array([1, 2, 3], dtype=np.uint16)
    b = np.array([1, 2], dtype=np.uint16)
    assert af.hamming_frac(a, b) == 1.0


def test_transcode_row_invariants():
    from dataquality_spark.oracle.clips_cache import NORM_PEAK, transcode_row
    from dataquality_spark.functions.audio import decode_wav_pcm16

    r = row_for(28)
    row = transcode_row(r["clip_id"], r["bytes"])
    assert row[1] == 1 and row[2] == 8000
    # output length = resampled length
    n_in = decode_wav_pcm16(r["bytes"]).pcm.size
    assert row[3] == int(n_in * 8000 / SR)
    # achieved peak lands on the -3 dBFS target (within quantization)
    assert abs(row[5] - NORM_PEAK) < 2e-4
    # deterministic: same input -> same crc
    assert transcode_row(r["clip_id"], r["bytes"])[6] == row[6]
    # silent: unity gain
    r25 = row_for(325)
    assert transcode_row(r25["clip_id"], r25["bytes"])[4] == 0.0
    # decode failure
    r23 = row_for(23)
    assert transcode_row(r23["clip_id"], r23["bytes"])[1] == 0


def test_chunk_rows_match_planted_counts():
    from dataquality_spark.oracle.clips_cache import chunk_rows

    gapped = chunk_rows(*[row_for(30)[c] for c in ("clip_id", "bytes")])
    assert len(gapped) == 2
    # second segment starts after the 40-60% planted gap
    assert gapped[0][2] == 0.0 and gapped[1][2] > gapped[0][3] - 20
    plain = chunk_rows(*[row_for(28)[c] for c in ("clip_id", "bytes")])
    assert len(plain) == 1
    assert chunk_rows(*[row_for(325)[c] for c in ("clip_id", "bytes")]) == []
    assert chunk_rows(*[row_for(23)[c] for c in ("clip_id", "bytes")]) == []


def test_speech_segments_consistent_with_vad_stats():
    x = _pcm_float(30)
    x = x.copy(); x[int(0.4*x.size):int(0.6*x.size)] = 0.0
    segs = af.speech_segments(x, SR)
    stats = af.vad_stats(x, SR)
    assert len(segs) == stats["n_segments"]
    longest = max(e - s for s, e, _ in segs)
    assert longest == stats["longest_speech_ms"]


def test_loudness_rows_clipping_expectations():
    from dataquality_spark.oracle.clips_cache import loudness_rows

    # voiced row: hot4 variant clips (~2/3 of tone samples), original clean
    orig, hot = loudness_rows(*[row_for(28)[c] for c in ("clip_id", "bytes")])
    assert orig[1] == "orig" and orig[2] == 1 and orig[7] == 0
    assert hot[1] == "hot4" and hot[7] == 1 and hot[6] > 0.3
    # crest factor of a near-sine sits around 3 dB
    assert 2.0 < orig[5] < 5.0
    # planted clipped row (k=26): the ORIGINAL already clips
    orig26, _ = loudness_rows(*[row_for(126)[c] for c in ("clip_id", "bytes")])
    assert orig26[7] == 1 and orig26[3] == 1.0
    # silence never clips, at any gain
    orig25, hot25 = loudness_rows(*[row_for(325)[c] for c in ("clip_id", "bytes")])
    assert orig25[7] == 0 and hot25[7] == 0 and orig25[4] == -120.0
    # decode failure emits zeroed rows for both variants
    rows23 = loudness_rows(*[row_for(23)[c] for c in ("clip_id", "bytes")])
    assert [r[2] for r in rows23] == [0, 0]


def test_trim_zero_frames_frame_quantized():
    """Sub-frame zero runs (content zero-crossings) must NOT trim; whole
    padded frames must trim exactly; all-zero input trims to its
    sub-frame remainder from the front."""
    import numpy as np

    from dataquality_spark.functions.audiofeat import trim_zero_frames

    content = np.ones(700, dtype=np.int16)
    x = np.concatenate([np.zeros(1024, np.int16), content, np.zeros(600, np.int16)])
    trm, lead, trail = trim_zero_frames(x)
    assert (lead, trail) == (2, 1)
    assert trm.size == 1024 + 700 + 600 - 3 * 512

    # sub-frame runs survive untouched
    x2 = np.concatenate([np.zeros(511, np.int16), content])
    trm2, lead2, trail2 = trim_zero_frames(x2)
    assert (lead2, trail2) == (0, 0) and trm2.size == x2.size

    # all-zero: front-trims whole frames, keeps the remainder
    z = np.zeros(1300, np.int16)
    trmz, leadz, trailz = trim_zero_frames(z)
    assert (leadz, trailz) == (2, 0) and trmz.size == 1300 - 1024

    # no zeros anywhere
    trmc, leadc, trailc = trim_zero_frames(content)
    assert (leadc, trailc) == (0, 0) and trmc.size == content.size
