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


def test_silent_and_clipped_detection():
    silent = encode_wav_pcm16(np.zeros(1000, dtype=np.int16), 16000)
    assert audio_stats(silent, "pcm_s16le").is_silent
    clipped = encode_wav_pcm16(np.full(1000, 1.4), 16000)
    st = audio_stats(clipped, "pcm_s16le")
    assert st.clip_ratio > 0.9 and not st.is_silent
