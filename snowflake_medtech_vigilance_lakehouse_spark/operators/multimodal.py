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


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("n_bytes", LongType()),
    StructField("frame_md5", StringType()),
])

RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes_in", LongType()),
    StructField("n_bytes_out", LongType()),
    StructField("resized_md5", StringType()),
])


def sample_frames(media: DataFrame, *, fake: bool = False,
                  frame_size: int = 256, stride: int = 1) -> DataFrame:
    """Frame sampling over video-shaped payloads: ONE input row fans
    out to its sampled frames — the 1→many Arrow plumbing a real
    ``av``-based sampler uses (each output row carries the frame's
    bytes onward; here summarized as md5 + length so results hash
    across engines). ``stride`` keeps every stride-th frame (the
    sample-every-Nth-frame knob); the real decoder is gated like
    :func:`extract_features`, with ``fake=True`` slicing the payload
    into ``frame_size``-byte "frames" deterministically — byte-true
    (the fixtures' ASCII payloads make the DuckDB oracle expressible,
    but the operator slices BYTES, unit-tested on non-UTF8 input)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video decoding libraries (av) are not available in "
                    "this environment; pass fake=True for the "
                    "deterministic byte-slicing sampler")
            ids, idxs, sizes, digests = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                n_frames = -(-len(b) // frame_size) if b else 0
                for i in range(0, n_frames, stride):
                    frame = b[i * frame_size:(i + 1) * frame_size]
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(frame))
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "frame_md5": pd.Series(digests, dtype=object),
            })

    return media.mapInPandas(_batches, FRAME_SCHEMA)


def resize_media(media: DataFrame, *, fake: bool = False,
                 factor: int = 4) -> DataFrame:
    """Resize/downsample plumbing: binary in, smaller binary out
    through Arrow batches (summarized as md5 + sizes). The real
    resampler (PIL/torchaudio) is gated; ``fake=True`` truncates the
    payload to ``ceil(n/factor)`` bytes — a deterministic stand-in
    with the same batch shape and output contract."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media resampling libraries (PIL/torchaudio) are not "
                    "available in this environment; pass fake=True for "
                    "the deterministic truncating resizer")
            n_in, n_out, digests = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload or b"")
                out = b[:-(-len(b) // factor)] if b else b""
                n_in.append(len(b))
                n_out.append(len(out))
                digests.append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes_in": pd.Series(n_in, dtype="int64"),
                "n_bytes_out": pd.Series(n_out, dtype="int64"),
                "resized_md5": pd.Series(digests, dtype=object),
            })

    return media.mapInPandas(_batches, RESIZE_SCHEMA)


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
