"""Multimodal plumbing: real WAV leaf, deterministic-fake image/video
leaves, error routing, and stub behavior without decoder libs."""

from __future__ import annotations

import numpy as np
import pytest

from dataquality_spark.functions.audio import encode_wav_pcm16
from dataquality_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image_real,
    extract_features,
    try_import_pillow,
)


def _media_rows():
    wav = encode_wav_pcm16(np.sin(np.linspace(0, 30, 8000)) * 0.4, 8000)
    return [
        ("a1", "audio", bytearray(wav), "audio/wav", 0, 0, 1000),
        ("i1", "image", bytearray(b"\x89PNG fake image payload 123"), "image/png", 0, 0, 0),
        ("v1", "video", bytearray(b"\x00\x00ftypmp42 fake video" * 4), "video/mp4", 0, 0, 2000),
        ("x1", "hologram", bytearray(b"??"), "application/octet-stream", 0, 0, 0),
        ("b1", "audio", bytearray(b"not a wav"), "audio/wav", 0, 0, 0),
    ]


def test_extract_features_routes_and_decodes(spark):
    df = spark.createDataFrame(_media_rows(), schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(df).collect()}
    assert out["a1"]["decode_ok"] and out["a1"]["n_frames"] == 8000
    assert out["i1"]["decode_ok"] and out["i1"]["n_frames"] == 1
    assert out["i1"]["width"] >= 16 and out["i1"]["height"] >= 16
    assert out["v1"]["decode_ok"] and out["v1"]["n_frames"] >= 1
    assert not out["x1"]["decode_ok"] and "ValueError" in out["x1"]["error"]
    assert not out["b1"]["decode_ok"]  # malformed wav -> error row, no crash
    assert len(out["a1"]["feature"]) == 16


def test_feature_extraction_is_deterministic(spark):
    df = spark.createDataFrame(_media_rows(), schema=MEDIA_SCHEMA)
    a = extract_features(df).orderBy("media_id").collect()
    b = extract_features(df).orderBy("media_id").collect()
    assert [r["content_hash"] for r in a] == [r["content_hash"] for r in b]
    assert [r["feature"] for r in a] == [r["feature"] for r in b]


def test_real_decode_stub_raises_without_pillow():
    if try_import_pillow() is not None:
        pytest.skip("Pillow unexpectedly present")
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_real(b"\x89PNG...")


def test_real_decode_mode_routes_stub_to_error_rows(spark):
    df = spark.createDataFrame(_media_rows(), schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           extract_features(df, deterministic_fake=False).collect()}
    assert out["a1"]["decode_ok"]  # audio leaf is real either way
    if try_import_pillow() is None:
        assert not out["i1"]["decode_ok"]
        assert "NotImplementedError" in out["i1"]["error"]
