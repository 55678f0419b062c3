"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batching,
mapInPandas signature, partitioning — is real and tested; the actual
media decode is STUBBED (the decode libraries are not in this container):
``extract_features(..., decoder="stub")`` computes deterministic
byte-level features, and ``decoder="real"`` raises NotImplementedError at
the point where PIL/librosa/ffmpeg would be invoked.
"""

from __future__ import annotations

from collections.abc import Iterator

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
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "n_chars": pdf["meta"].map(lambda m: m["n_chars"]).astype(
                        "int64"
                    ),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "decoder": decoder,
                }
            )

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)
