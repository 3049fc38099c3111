"""Batched AI-enrichment surface (AI1-AI3; README.md:59-60,70-72,
109,114-116 — AISQL classify/summarize/embed).

The reference batches 10-20k records per AISQL call for cost control
(README.md:83,115); here the same surface is an Arrow-batched
``mapInPandas`` hook: plug a model-endpoint callable in production,
keep the deterministic rule-based defaults for offline correctness —
exactly the reference's own posture, whose shipped classifier is a
keyword CASE "until AISQL" (models/marts/fact_adverse_events.sql:76-86).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import FAILURE_MODE_RULES, keyword_classifier


def classify_keywords(text: Column,
                      rules: Sequence[tuple[str, str]] = FAILURE_MODE_RULES) -> Column:
    """Deterministic rule classifier (the AISQL stand-in) — JVM-side."""
    return keyword_classifier(text, rules)


def summarize_rule(text: Column, max_tokens: int = 16) -> Column:
    """Deterministic extractive 'summary': first max_tokens whitespace
    tokens. JVM-side; a model endpoint drops in via enrich_batched."""
    return F.array_join(F.slice(F.split(text, " "), 1, max_tokens), " ")


def embed_hashing(text: Column, dim: int = 64) -> Column:
    """Deterministic hashing-trick embedding: each token adds +/-1 to
    the bucket xxhash64(token) % dim, sign from the next hash bit,
    then L2-normalized. Pure built-ins -> reproducible everywhere;
    swap for a model UDF in production (same column contract,
    array<float>)."""
    toks = F.split(text, " ")
    buckets = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.lit(0.0),
    )
    # explode-free formulation would re-scan tokens per bucket; for the
    # hashing embedder we accept one pass per row over tokens with an
    # aggregate that folds into a fixed-size array
    def _fold(acc, t):
        idx = F.pmod(F.xxhash64(t), F.lit(dim)).cast("int")
        sign = F.when(
            F.pmod(F.shiftright(F.xxhash64(t), 32), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))
        return F.transform(
            acc, lambda v, i: F.when(i == idx, v + sign).otherwise(v)
        )

    raw = F.aggregate(toks, buckets, _fold)
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm == 0, raw.cast("array<float>")).otherwise(
        F.transform(raw, lambda x: (x / norm)).cast("array<float>")
    )


def embed_hashing_md5_long(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", dim: int = 32) -> DataFrame:
    """Distributed hashing-trick embedder in long form: one
    ``(id, idx, val)`` row per (document, dimension), L2-normalized.

    Two deliberate differences from :func:`embed_hashing`:

    * **explode -> groupBy**, not a per-row array fold — the fold
      rebuilds a dim-length array per token (O(tokens*dim) array
      copies per row), while this shape is one explode, one hash per
      token and a partial-aggregating groupBy — the plan that holds at
      100 TB (same lesson as the minhash explode rewrite).
    * **md5-derived buckets/signs**, not xxhash64 — md5 is the one
      hash both Spark and DuckDB evaluate identically, so the driver
      oracle verifies actual embedding values, not just row counts.

    All arithmetic stays exact (integer-valued double sums, one final
    division), so the DuckDB twin hash-matches bit-for-bit.
    """
    tok = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    base = df.filter(F.col(text_col).isNotNull())
    toks = base.select(F.col(id_col), tok)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    sgn = F.when(
        F.conv(F.substring(F.md5(F.col("tok")), 9, 1), 16, 10).cast("int") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    sums = (
        toks.select(F.col(id_col), F.pmod(h, F.lit(dim)).alias("idx"), sgn.alias("sgn"))
        .groupBy(id_col, "idx")
        .agg(F.sum("sgn").alias("s"))
    )
    scaffold = base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(dim - 1)).cast("array<bigint>")).alias("idx"),
    )
    dense = (
        scaffold.join(sums, [id_col, "idx"], "left")
        .select(id_col, "idx", F.coalesce(F.col("s"), F.lit(0.0)).alias("s"))
    )
    from pyspark.sql import Window
    l2 = F.sqrt(F.sum(F.col("s") * F.col("s")).over(Window.partitionBy(id_col)))
    return dense.select(
        F.col(id_col),
        F.col("idx"),
        F.when(l2 == 0, F.lit(0.0)).otherwise(F.round(F.col("s") / l2, 6)).alias("val"),
    )


def enrich_batched(df: DataFrame,
                   fn: Callable[[pd.Series], pd.Series],
                   out_col: str, out_type: str = "string",
                   text_col: str = "text",
                   batch_size: int = 10_000) -> DataFrame:
    """Generic batched enrichment hook: ``fn`` maps a pandas Series of
    texts to a Series of labels/summaries — the shape a remote model
    endpoint needs (README.md batching: 10-20k rows per call).

    Batch sizing rides Arrow's ``maxRecordsPerBatch``; each executor
    slot streams batches independently, so endpoint concurrency scales
    with executors, not with the driver."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} {out_type}"]
    )

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = fn(pdf[text_col])
            yield pdf

    return df.mapInPandas(_run, out_schema)
