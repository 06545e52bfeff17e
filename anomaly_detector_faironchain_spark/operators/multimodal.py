"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via mapInPandas.

The decode step for real media (image/audio/video) is STUBBED — the
sandbox has no codec libraries — but everything Spark-side is real and
tested: the binary schema, the mapInPandas batch shape, deterministic
metadata extraction (byte length, sha256, magic byte), and the partition
strategy (payloads never shuffle; metadata extraction is map-only).

At 100 TB of media: keep payloads in their own parquet column chunk
(Spark reads only projected columns), extract features map-side, and
carry only the small feature columns into shuffles/joins.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BINARY_META_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256_hex", T.StringType()),
    T.StructField("head_byte", T.IntegerType()),
])


def to_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, payload binary) — models an opaque media column; here the
    bytes are the utf-8 encoding of a text column so tests/oracles have
    ground truth."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def binary_metadata(payloads: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    mapInPandas: each batch is a pandas DataFrame whose 'payload' column
    holds bytes objects; output is the small typed metadata table. This is
    the decode-free half of any media pipeline and runs map-only — no
    shuffle, no payload movement.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame({
                "id": pdf["id"].astype("int64"),
                "n_bytes": payload.map(len).astype("int64"),
                "sha256_hex": payload.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
                "head_byte": payload.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
            })

    return payloads.mapInPandas(extract, BINARY_META_SCHEMA)


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])


def decode_image_features(payloads: DataFrame, fake: bool = False) -> DataFrame:
    """Image decode + feature extraction (STUB).

    The real implementation would decode each payload (PIL/opencv) inside
    the same mapInPandas shape. fake=True substitutes a deterministic
    pseudo-decode (dimensions/luma derived from the byte stream) so the
    Spark plumbing — schema, batching, partitioning — is testable in this
    environment.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "use fake=True for the deterministic pseudo-decoder"
                )
            payload = pdf["payload"]
            n = payload.map(len)
            yield pd.DataFrame({
                "id": pdf["id"].astype("int64"),
                "width": (n % 640 + 1).astype("int32"),
                "height": (n % 480 + 1).astype("int32"),
                "mean_luma": payload.map(
                    lambda b: (sum(b[:64]) / max(min(len(b), 64), 1)) if len(b) else 0.0
                ).astype("float64"),
            })

    return payloads.mapInPandas(extract, IMAGE_FEATURE_SCHEMA)
