"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batching,
mapInPandas signature, partitioning — is real and tested, and the decode
seam has three kinds of backend:

  - REAL pure-numpy decoders for library-free formats: PPM (P6) images
    (decode_ppm -> pixel array + width/height/channel stats) and PCM WAV
    audio (decode_wav via stdlib `wave` -> samples + duration/RMS) —
    image_features / audio_features run these end-to-end, tested;
  - decoder="stub": deterministic byte-level features (the seam check);
  - decoder="real": the PIL/librosa/ffmpeg-backed path for compressed
    formats (JPEG/MP3/H.264) — those libraries are absent in this
    container, so it raises NotImplementedError at the exact call site
    rather than faking a decode.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_chars bigint, first_byte int, "
    "decoder string"
)


def to_binary_payload(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap a column as the canonical multimodal payload:
    (doc_id, payload:binary, meta:struct<mime,n_chars>)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.encode(F.col(payload_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(payload_col)).cast("bigint").alias("n_chars"),
        ).alias("meta"),
    )


def extract_features(blobs: DataFrame, decoder: str = "stub") -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas
    (Arrow-batched; one pandas frame per batch, vectorized inner ops).

    decoder="stub": deterministic byte-level fake (marks the seam where a
    real image/audio decode would run). decoder="real": NotImplementedError
    — the container has no media libraries.
    """
    if decoder not in ("stub", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg — not "
                    "available in this environment; use decoder='stub'"
                )
            payloads = pdf["payload"]
            # vectorized pandas string/struct ops — no per-row lambdas
            n_bytes = payloads.str.len().astype("int64")
            first = payloads.str[0]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "n_chars": pd.DataFrame(list(pdf["meta"]))["n_chars"]
                    .astype("int64"),
                    "first_byte": first.where(n_bytes > 0, -1)
                    .astype("int32"),
                    "decoder": decoder,
                }
            )

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


# ------------------------------------------------------- real decoders


def decode_ppm(buf: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) image to a (h, w, 3) uint8 array — pure
    numpy, no imaging library. Raises ValueError on malformed input."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <w> <h> <maxval> followed by one whitespace byte
    parts, i, tok = [], 2, b""
    while len(parts) < 3 and i < len(buf):
        c = buf[i:i + 1]
        if c.isspace():
            if tok:
                parts.append(int(tok))
                tok = b""
        elif c == b"#":  # comment to end of line
            while i < len(buf) and buf[i:i + 1] != b"\n":
                i += 1
        else:
            tok += c
        i += 1
    if len(parts) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = parts
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Inverse of decode_ppm (for test/synthesis)."""
    h, w, _ = arr.shape
    return b"P6 %d %d 255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV (8/16-bit) to (samples float64 in [-1,1] shaped
    (n, channels), sample_rate) — stdlib `wave` + numpy only."""
    with wave.open(io.BytesIO(buf)) as f:
        nch, sw, rate, nframes = (
            f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes()
        )
        raw = f.readframes(nframes)
    if sw == 2:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return s.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of decode_wav for 16-bit PCM (test/synthesis)."""
    s = np.clip(samples, -1.0, 1.0)
    pcm = (s * 32767.0).astype("<i2")
    out = io.BytesIO()
    with wave.open(out, "wb") as f:
        f.setnchannels(pcm.shape[1] if pcm.ndim == 2 else 1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return out.getvalue()


IMAGE_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, n_channels int, "
    "mean_r double, mean_g double, mean_b double, std double, ok boolean"
)


def image_features(blobs: DataFrame, resize_to: int | None = None) -> DataFrame:
    """REAL image decode + feature extraction over binary PPM payloads
    (Arrow-batched mapInPandas; numpy decode — no Python per pixel).
    resize_to: optional nearest-neighbor downsample (the resize stage of
    a training-data pipe) applied before the stats. Malformed payloads
    yield ok=false rows instead of failing the job (poison-pill safety at
    100 TB)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    arr = decode_ppm(bytes(buf))
                    if resize_to:
                        h, w, _ = arr.shape
                        yi = np.linspace(0, h - 1, resize_to).astype(int)
                        xi = np.linspace(0, w - 1, resize_to).astype(int)
                        arr = arr[np.ix_(yi, xi)]
                    m = arr.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (int(doc_id), arr.shape[1], arr.shape[0], 3,
                         float(m[0]), float(m[1]), float(m[2]),
                         float(arr.std()), True)
                    )
                except (ValueError, struct.error, EOFError):
                    rows.append(
                        (int(doc_id), -1, -1, -1, 0.0, 0.0, 0.0, 0.0, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_channels",
                         "mean_r", "mean_g", "mean_b", "std", "ok"],
            )

    return blobs.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_rate int, n_channels int, "
    "duration_sec double, rms double, peak double, ok boolean"
)


def audio_features(blobs: DataFrame, frame_sample: int | None = None) -> DataFrame:
    """REAL audio decode + features over binary PCM-WAV payloads.
    frame_sample: optionally keep every Nth sample before the stats (the
    frame-sampling stage). Malformed payloads yield ok=false rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    s, rate = decode_wav(bytes(buf))
                    full_n = s.shape[0]
                    if frame_sample:
                        s = s[::frame_sample]
                    rows.append(
                        (int(doc_id), full_n, rate, s.shape[1],
                         full_n / rate if rate else 0.0,
                         float(np.sqrt((s ** 2).mean())) if len(s) else 0.0,
                         float(np.abs(s).max()) if len(s) else 0.0, True)
                    )
                except (ValueError, wave.Error, struct.error, EOFError):
                    rows.append((int(doc_id), -1, -1, -1, 0.0, 0.0, 0.0, False))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "n_channels",
                         "duration_sec", "rms", "peak", "ok"],
            )

    return blobs.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
