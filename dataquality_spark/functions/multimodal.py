"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schemas, batch shapes, UDF signatures,
partitioning discipline (binary never crosses a shuffle) — is real and
tested. The codec leaves split by what this container can actually do:

* **audio (WAV/PCM16)**: fully real (``functions/audio.py``).
* **image decode / resize, video frame-sample**: the decoder libraries
  (PIL/ffmpeg) are not installed here, so these are stubbed — by default a
  clearly-marked :class:`NotImplementedError`, or (for pipeline/shape
  tests) a deterministic fake extractor derived from the byte content.

The reference's analog is per-file text extraction with a per-type
dispatcher (``backend/app/services/metadata.py:33-80``, type map
``s3.py:268-294``); same shape: binary in, typed features out, errors
routed to a status column instead of failing the run.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, bytes binary, mime string, "
    "width int, height int, dur_ms int"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, decode_ok boolean, error string, "
    "width int, height int, n_frames int, content_hash bigint, "
    "feature array<float>"
)

FEATURE_DIM = 16


def try_import_pillow():
    """Real-decoder gate: returns the PIL.Image module or None."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image_real(raw: bytes):
    """Real image decode — requires Pillow, absent in this container."""
    mod = try_import_pillow()
    if mod is None:
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed in this "
            "container; use deterministic_fake=True for plumbing tests"
        )
    import io as _io

    return mod.open(_io.BytesIO(raw))


def _fake_decode(raw: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder for plumbing tests: derives (width,
    height, n_frames) purely from the byte content, so every process
    agrees and no real codec is needed."""
    h = zlib.crc32(raw)
    return 16 + h % 512, 16 + (h >> 9) % 512, 1 + (h >> 18) % 32


def _fake_feature(raw: bytes) -> list[float]:
    """Deterministic 16-dim 'embedding' of the bytes (per-chunk CRC32,
    scaled to [0,1]) — the stand-in for a real feature extractor."""
    step = max(1, len(raw) // FEATURE_DIM)
    out = []
    for i in range(FEATURE_DIM):
        chunk = raw[i * step : (i + 1) * step] or b"\x00"
        out.append((zlib.crc32(chunk) % 10_000) / 10_000.0)
    return out


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """binary media table -> per-item features via one Arrow-batched pass.

    With ``deterministic_fake=False`` the image/video leaves raise
    NotImplementedError (converted to error rows, never task failures) —
    the production configuration once decoder libs exist on executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, raw in zip(pdf["media_id"], pdf["kind"], pdf["bytes"]):
                raw = bytes(raw) if raw is not None else b""
                try:
                    if kind == "audio":
                        from .audio import decode_wav_pcm16

                        dec = decode_wav_pcm16(raw)
                        rows.append((mid, kind, True, "", 0, 0,
                                     int(dec.pcm.size), zlib.crc32(raw),
                                     _fake_feature(raw)))
                    elif kind in ("image", "video"):
                        if not deterministic_fake:
                            decode_image_real(raw)  # raises in-container
                        w, hgt, nf = _fake_decode(raw)
                        nf = 1 if kind == "image" else nf
                        rows.append((mid, kind, True, "", w, hgt, nf,
                                     zlib.crc32(raw), _fake_feature(raw)))
                    else:
                        raise ValueError(f"unknown media kind {kind!r}")
                except (ValueError, NotImplementedError, struct.error) as e:
                    # F2 error routing (metadata.py:284-299): record, not raise
                    rows.append((mid, kind, False, f"{type(e).__name__}: {e}",
                                 0, 0, 0, 0, []))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "decode_ok", "error", "width",
                         "height", "n_frames", "content_hash", "feature"],
            )

    # Column pruning discipline: only what the pass needs crosses into Arrow.
    return media.select("media_id", "kind", "bytes").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )
