"""Incremental search-index maintenance (AI7 -> AI5): the Cortex
`target_lag` analog for the BM25 index specifically.

New documents stream in; each refresh appends their postings
(doc_id, term, tf, dl) to the index table via the checkpointed file
stream, so a scheduled availableNow run processes only the delta.
Scoring then runs off the postings table with corpus stats computed
at query time (one tiny aggregate) — the index grows append-only and
never needs a full rebuild. At 100 TB the postings table is
partitioned/bucketed by term so a query touches only its terms'
buckets."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def postings_stream(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Streaming docs -> (doc_id, term, tf, dl) postings delta."""
    toks = F.split(F.col(text_col), " ")
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("term"),
    )
    return exploded.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def refresh_postings(stream_docs: DataFrame, out_path: str,
                     checkpoint: str) -> StreamingQuery:
    """Append the pending documents' postings to the index table
    (availableNow = one scheduled refresh tick; the checkpoint makes
    reruns incremental). Aggregation inside a streaming query needs
    complete/update mode, so the per-doc grouping runs in foreachBatch
    — each batch is a closed set of whole documents."""

    def _append(batch: DataFrame, _epoch: int) -> None:
        postings_stream(batch).write.mode("append").parquet(out_path)

    return (
        stream_docs.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def bm25_from_postings(postings: DataFrame, terms: tuple[str, ...],
                       k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Score documents against query terms from the postings table —
    no access to raw text; this is what serves after incremental
    refreshes. Returns (doc_id, bm25)."""
    n_and_avg = postings.select("doc_id", "dl").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    rel = postings.filter(F.col("term").isin(*terms))
    df_per_term = rel.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = (
        rel.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(n_and_avg))
        .select(
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                      / (F.col("df") + F.lit(0.5)))
                * F.col("tf").cast("double") * F.lit(k1 + 1.0)
                / (F.col("tf").cast("double") + F.lit(k1) * (
                    F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
            ).alias("_s"),
        )
    )
    return scored.groupBy("doc_id").agg(F.round(F.sum("_s"), 6).alias("bm25"))
