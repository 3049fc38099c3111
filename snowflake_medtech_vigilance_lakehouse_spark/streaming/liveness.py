"""The ONE tombstone-liveness filter (round 13 — VERDICT r12 #2).

The churn tier (round 12) publishes each commit's dead keys as a
``{layout}_tombstones/tick=<commit_version>`` sidecar; every reader
and maintainer of a churn-capable layout then applies the same rule:
a row is DEAD iff some tombstone for its key is NEWER than the row's
own publication epoch (``max(tomb.tick) > row_epoch``), so a copy
re-ingested at the tombstone's own commit version — the update path —
survives while every older copy dies. Round 12 grew six hand-rolled
copies of the sidecar-read → per-key-max-tick → broadcast-left-join →
filter pipeline (``apply_ivf_tombstones``, ``read_postings``,
``_refuse_reingested_docs``, ``compact_index_ticks``,
``_rewrite_docids_live``, ``_chunk_index_append_batch``) with
different key/epoch sources; this module is the single implementation
they all call — a protocol fix lands once, and the round-13 curation
stores add their liveness sites against the shared helper instead of
a seventh copy.

Scale shape: the tombstone frame is churn-sized by construction (one
row per dead key since the last physical apply), so it BROADCASTS;
the filtered frame itself never shuffles and its scan/pruning
characteristics are untouched (the epoch expression is evaluated in
the scan projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def live_filter(df: DataFrame, tomb_dir: str, key: Column,
                epoch: Column, *, applied_through: int = -1,
                pending: tuple[DataFrame, int] | None = None
                ) -> DataFrame:
    """Rows of ``df`` LIVE under the tombstone sidecar at
    ``tomb_dir`` (plus, optionally, a commit's not-yet-published dead
    keys).

    ``key``
        Column expression producing the row's tombstone key (the
        sidecar's ``key`` column joins against it).
    ``epoch``
        Column expression producing the row's publication epoch —
        a ``tick`` partition column, a ``_tick`` sidecar column, or
        ``input_file_name()`` arithmetic; build-time rows read as
        ``-1`` (older than every commit version).
    ``applied_through``
        Ignore tombstone ticks at or below this epoch: they were
        PHYSICALLY applied by a compaction/rebuild whose crash window
        left the sidecar behind, and must not re-kill the rewritten
        (epoch ``-1``) copies of the keys they already killed (the
        round-12 ``_tombstones_applied.json`` marker).
    ``pending``
        ``(keys_frame, epoch)`` — a commit's in-memory dead keys,
        treated as a tombstone tick at ``epoch`` BEFORE it is
        published. This is how a refresher vets a batch against its
        own commit's churn without publishing first (round-13 ADVICE:
        publish-then-vet left a refused commit half-absorbed).

    No sidecar directory and no ``pending`` → identity: the
    churn-free steady state pays nothing.
    """
    import os

    spark = df.sparkSession
    src = None
    if os.path.isdir(tomb_dir):
        src = (spark.read.parquet(tomb_dir)
               .select("key", F.col("tick").cast("long").alias("tick"))
               .filter(F.col("tick") > F.lit(int(applied_through))))
    if pending is not None:
        keys, at = pending
        pend = (keys.toDF("key").distinct()
                .select("key",
                        F.lit(int(at)).cast("long").alias("tick")))
        src = pend if src is None else src.unionByName(pend)
    if src is None:
        return df
    tomb = (src.groupBy("key")
            .agg(F.max("tick").alias("_tmb_tick"))
            .select(F.col("key").alias("_tmb_key"), "_tmb_tick"))
    return (
        df.withColumn("_lv_epoch", epoch.cast("long"))
        .join(F.broadcast(tomb), key == F.col("_tmb_key"), "left")
        .filter(F.col("_tmb_tick").isNull()
                | (F.col("_tmb_tick") <= F.col("_lv_epoch")))
        .drop("_tmb_key", "_tmb_tick", "_lv_epoch")
    )
