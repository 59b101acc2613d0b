import numpy as np
import pytest

from dataquality_spark.datagen.clips import reference_waveform, row_for
from dataquality_spark.functions.audio import (
    AudioStats,
    audio_stats,
    decode_clip,
    decode_wav_pcm16,
    encode_wav_pcm16,
    snr_db,
)


def test_wav_roundtrip_exact():
    pcm = (np.sin(np.linspace(0, 40, 1600)) * 20000).astype(np.int16)
    raw = encode_wav_pcm16(pcm, 16000)
    dec = decode_wav_pcm16(raw)
    assert dec.sr_hz == 16000
    np.testing.assert_array_equal(dec.pcm, pcm)


def test_quantization_snr_over_30db():
    x = reference_waveform(31, 500)
    raw = encode_wav_pcm16(x, 16000)
    dec = decode_wav_pcm16(raw).pcm.astype(np.float64) / 32767.0
    assert snr_db(x, dec) >= 30.0


@pytest.mark.parametrize("i", list(range(0, 100)))
def test_per_row_pcm_invariant(i):
    """Per-row invariant (input_hint): decoded PCM ~ reference waveform with
    SNR >= 30 dB, for every decodable planted case."""
    row = row_for(i)
    if row["codec"] != "pcm_s16le" or i % 100 == 23:
        return  # undecodable-by-design rows
    dec = decode_wav_pcm16(row["bytes"])
    k = i % 100
    dur = row["dur_ms"] - 500 if k in (24, 27) else row["dur_ms"]
    ref = reference_waveform(i, dur)
    assert dec.pcm.size == ref.size
    if k == 25:  # silent clip: SNR undefined; assert exact silence instead
        assert np.all(dec.pcm == 0)
        return
    assert snr_db(ref, dec.pcm.astype(np.float64) / 32767.0) >= 30.0


def test_garbage_bytes_fail_gracefully():
    st = audio_stats(b"\x00\x01garbage" + bytes(64), "pcm_s16le")
    assert st == AudioStats(False, 0, 0, 0.0, 0.0, True)


def test_unknown_codec_stubbed():
    raw = encode_wav_pcm16(np.zeros(100, dtype=np.int16), 16000)
    with pytest.raises(NotImplementedError):
        decode_clip(raw, "mp3")
    assert not audio_stats(raw, "mp3").decode_ok


def test_mulaw_codebook_value_idempotent():
    """Every int16 code maps to a mu-law byte whose decoded value re-encodes
    to itself (value-level idempotency; the lone byte-level exception is the
    -0 code, which decodes to 0 and re-encodes as +0 — same value)."""
    from dataquality_spark.functions.audio import mulaw_compress, mulaw_expand

    x = np.arange(-32768, 32768, dtype=np.int16)
    y = mulaw_expand(mulaw_compress(x))
    np.testing.assert_array_equal(mulaw_expand(mulaw_compress(y)), y)
    # max companding error is one top-segment step
    assert np.abs(x.astype(np.int32) - y.astype(np.int32)).max() <= 1024


def test_mulaw_wav_roundtrip_and_dispatch():
    from dataquality_spark.functions.audio import (
        decode_wav_mulaw,
        encode_wav_mulaw,
        mulaw_expand,
        mulaw_compress,
    )

    pcm = (np.sin(np.linspace(0, 40, 1600)) * 20000).astype(np.int16)
    raw = encode_wav_mulaw(pcm, 16000)
    dec = decode_wav_mulaw(raw)
    assert dec.sr_hz == 16000
    np.testing.assert_array_equal(dec.pcm, mulaw_expand(mulaw_compress(pcm)))
    # codec dispatch routes pcm_mulaw to the same decode
    d2 = decode_clip(raw, "pcm_mulaw")
    np.testing.assert_array_equal(d2.pcm, dec.pcm)
    # a PCM16 container is NOT a valid mu-law clip (fmt code differs)
    with pytest.raises(ValueError):
        decode_clip(encode_wav_pcm16(pcm, 16000), "pcm_mulaw")


def test_mulaw_snr_over_30db():
    """G.711 companding error ~35-38 dB SNR on speech-level signals —
    above the input_hint's 30 dB per-row floor (the mixed-codec catalog
    query asserts this per row; here the unit-level check)."""
    from dataquality_spark.functions.audio import encode_wav_mulaw

    for i in (1, 2, 50, 226, 999):
        ref = reference_waveform(i, 800)
        dec = decode_clip(encode_wav_mulaw(ref, 16000), "pcm_mulaw")
        sig = dec.pcm.astype(np.float64) / 32767.0
        assert snr_db(ref, sig) >= 30.0, f"clip {i}"


def test_mixed_codec_rows_deterministic():
    from dataquality_spark.datagen.clips import mixed_codec_row_for

    r2 = mixed_codec_row_for(2)
    assert r2["codec"] == "pcm_mulaw"
    assert decode_clip(r2["bytes"], "pcm_mulaw").pcm.size > 0
    assert mixed_codec_row_for(2)["bytes"] == r2["bytes"]
    # planted failure rows keep their payloads
    assert mixed_codec_row_for(23)["codec"] == "pcm_s16le"
    assert mixed_codec_row_for(24)["codec"] == "mp3"
    # non-mulaw indices unchanged vs the base corpus
    assert mixed_codec_row_for(1) == row_for(1)


def test_silent_and_clipped_detection():
    silent = encode_wav_pcm16(np.zeros(1000, dtype=np.int16), 16000)
    assert audio_stats(silent, "pcm_s16le").is_silent
    clipped = encode_wav_pcm16(np.full(1000, 1.4), 16000)
    st = audio_stats(clipped, "pcm_s16le")
    assert st.clip_ratio > 0.9 and not st.is_silent
