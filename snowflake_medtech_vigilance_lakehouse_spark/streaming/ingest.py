"""Incremental ingest / refresh (AI7 + the streaming analog of the
reference's batch COPY, README.md:100-102, and Cortex `target_lag`
freshness, README.md:83,117,149).

The file-source stream is the Auto-Loader-shaped path: new NDJSON
files landing in a prefix are discovered incrementally, flow through
the same stg projection as batch (one code path, two execution modes),
and maintain downstream aggregates with a watermark for late data.
``target_lag`` maps to the trigger interval (or availableNow for
scheduled-batch refresh, which is how the tests run it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_ndjson_raw(spark: SparkSession, path: str,
                      schema: StructType) -> DataFrame:
    """Streaming MAUDE_RAW: one JSON doc per line -> (raw struct,
    src_filename, load_ts). Schema is mandatory for streams (no
    inference pass)."""
    df = spark.readStream.schema(schema).json(path)
    return df.select(
        F.struct(*[F.col(c) for c in df.columns]).alias("raw"),
        F.input_file_name().alias("src_filename"),
        F.current_timestamp().alias("load_ts"),
    )


def incremental_counts(events: DataFrame, ts_col: str = "ts",
                       key_cols: tuple[str, ...] = ("event_type",),
                       watermark: str = "1 day",
                       window: str = "7 days") -> DataFrame:
    """Watermarked windowed counts — the continuously-maintained
    analog of the quarterly cube: late rows inside the watermark
    update their window, older ones are dropped deterministically."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *key_cols,
            "n_events",
        )
    )


def streaming_dedup(stream: DataFrame, key_cols: tuple[str, ...],
                    ts_col: str = "load_ts",
                    watermark: str = "1 day") -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, dropping
    re-deliveries (MAUDE supplemental reports re-send the same
    mdr_report_key) that arrive within the watermark.

    ``dropDuplicatesWithinWatermark`` is the scale-correct primitive:
    per-key state is evicted once the watermark passes its arrival
    time, so state is O(keys per watermark window), not O(every key
    ever seen) — the difference between a bounded and an unbounded
    state store on an unbounded stream. A re-delivery later than the
    watermark is deliberately NOT deduped here; that tail is the batch
    dedup family's job (operators/dedup.py) on the silver table."""
    return (
        stream.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


def run_incremental_refresh(stream: DataFrame, out_path: str,
                            checkpoint: str,
                            mode: str = "append") -> StreamingQuery:
    """Materialize a stream to parquet with availableNow (process all
    pending input, then stop) — the scheduled-refresh form of
    ``target_lag``: each run advances the checkpoint, so reruns are
    incremental, not full recomputes."""
    return (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
