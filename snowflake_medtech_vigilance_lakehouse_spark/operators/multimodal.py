"""Multimodal column plumbing (north-star addition, SURVEY.md §2.9).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; the decode/feature steps run as Arrow-batched
``mapInPandas`` so executors stream batches without materializing the
whole partition. The actual media decoding libraries are not in this
container, so ``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic byte-statistics
"feature" — the Spark-side plumbing (schema, batching, partitioning)
is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),    # image|audio|video
    StructField("payload", BinaryType()),        # opaque encoded bytes
    StructField("meta", StructType([
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(DoubleType())),
])


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive the typed metadata struct from the raw payload column —
    pure built-ins (octet_length), no Python."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def extract_features(media: DataFrame, *, fake: bool = False,
                     feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    With ``fake=True`` the "decoder" computes deterministic byte
    statistics (bucketed byte-value means) standing in for a real
    image/audio feature extractor; the batch shape, Arrow transfer,
    and output schema are exactly what a real extractor would use.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decoding libraries (PIL/torchaudio/av) are not "
                    "available in this environment; pass fake=True for the "
                    "deterministic byte-statistics extractor"
                )
            feats, sizes = [], []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                sizes.append(len(b))
                if len(b) == 0:
                    feats.append([0.0] * feature_dim)
                    continue
                pad = (-len(b)) % feature_dim
                arr = np.pad(b, (0, pad)).reshape(feature_dim, -1).astype(np.int64)
                # integer floor-mean per bucket: exact in float64, so the
                # DuckDB oracle reproduces values bit-for-bit (a real
                # extractor would emit float features; the driver-parity
                # fake stays in integers on purpose)
                feats.append((arr.sum(axis=1) // arr.shape[1]).astype(np.float64).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "feature": feats,
            })

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Test fixture adapter: treat each document's UTF-8 bytes as an
    opaque media payload (the container ships no media files)."""
    return attach_media_meta(
        docs.select(
            F.col(id_col).cast("long").alias("media_id"),
            F.lit("image").alias("media_type"),
            F.encode(F.col(text_col), "UTF-8").alias("payload"),
        )
    )
