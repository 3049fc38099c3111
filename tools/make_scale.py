"""Derive a larger scale factor from the driver fixture by disjoint
replication: ``python tools/make_scale.py [SRC] [DST] [COPIES]``
(defaults: /root/testdata/sf0.1 -> .scale/sf1, 10 copies).

Every 100 TB claim in PLANS.md is extrapolated from sf0.1, where the
skew threshold never triggers and ngram dedup is stage-overhead-bound.
This tool manufactures the sf1 evidence (VERDICT r5 task #3): each
copy c in 0..C-1 is the sf0.1 table with every entity key shifted by
``c * STRIDE`` so the copies occupy disjoint key spaces and every
foreign-key relationship (orders->customer, lineitem->orders/part/
supplier) survives the shift. Copy 0 is byte-identical to the source,
so id-pinned bench queries (HYBRID_QUERY_VEC_ID, probe vec_id < 8)
still hit their rows. STRIDE is a multiple of 10 so ``l_orderkey % 10``
— the 30%%-hot manufacturer skew used by the bench skew pair — is
invariant under the shift and the skew is preserved at 10x volume.

Two tables need more than a key shift to scale *realistically*:

- ``documents``: verbatim replication would make every doc an exact
  near-dup of its 9 copies — the pair count of the dedup family would
  grow quadratically in C instead of linearly in corpus size, which is
  not what a 10x corpus looks like. Instead each copy perturbs tokens
  VALUE-wise: token w becomes ``w_c`` iff ``(xxhash64(w)+c) % 3 == 0``.
  Within one copy the rewrite is a consistent token-level mapping, so
  intra-copy Jaccard relationships (the driver's planted near-dups)
  are preserved exactly; across copies ~1/3 of tokens differ, so
  3-gram shingles survive with p~(2/3)^3~0.3 and cross-copy Jaccard
  lands far below the 0.5 threshold. Net: near-dup structure x10,
  shingle doc-frequency ~3x — a corpus that *grew*, not one that was
  photocopied.
- ``embeddings``: copy c rotates each vector left by c positions —
  norm-preserving (recall math unchanged) while cross-copy cosine
  decays to background, so kNN/IVF see 10 disjoint replicas of the
  cluster structure rather than 10 stacked duplicates.

``nation`` and ``region`` are fixed-size dimensions (as in TPC-H) and
are copied through unchanged.

Output layout matches the driver fixture: ``DST/<table>.parquet``
(written as a directory; ``spark.read.parquet`` and the bench treat it
identically), sized to a handful of files per table so the sf1 bench
read path is not file-count-bound.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

STRIDE = 100_000_000  # > any sf0.1 key; % 10 == 0 keeps the skew mod invariant

# table -> (int64 key columns to shift, output file count)
KEY_SHIFTS = {
    "region": ([], 1),
    "nation": ([], 1),
    "customer": (["c_custkey"], 4),
    "supplier": (["s_suppkey"], 1),
    "part": (["p_partkey"], 4),
    "orders": (["o_orderkey", "o_custkey"], 8),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 16),
    "events": (["event_id", "user_id"], 4),
    "documents": (["doc_id"], 4),
    "embeddings": (["vec_id"], 2),
}


def _replicate(df: DataFrame, keys: list[str], copies: int) -> DataFrame:
    """Cross-join with the copy index and shift the key columns. The
    copies frame is 1 row per copy — Spark broadcasts it, so the plan
    is a single pass over the source with a C-way fan-out, no shuffle."""
    c = F.col("__copy")
    out = df.crossJoin(F.broadcast(
        SparkSession.active().range(copies).select(F.col("id").alias("__copy"))))
    for k in keys:
        out = out.withColumn(k, (F.col(k) + c * F.lit(STRIDE)).cast("long"))
    return out


def _perturb_text(df: DataFrame, copies: int) -> DataFrame:
    """Token-value perturbation, consistent within a copy (see module
    doc). Whitespace runs collapse to single spaces — shingle-level
    semantics (the dedup operators split on \\s+) are unaffected."""
    df = _replicate(df, ["doc_id"], copies)
    perturbed = F.expr(
        "array_join(transform(split(text, '\\\\s+'), w -> "
        "if(pmod(xxhash64(w) + __copy, 3) = 0, "
        "concat(w, '_', __copy), w)), ' ')")
    return (df.withColumn(
        "text", F.when(F.col("__copy") == 0, F.col("text")).otherwise(perturbed))
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("__copy"))


def _rotate_embeddings(df: DataFrame, copies: int) -> DataFrame:
    df = _replicate(df, ["vec_id"], copies)
    n = F.size("embedding")
    rot = F.concat(
        F.slice("embedding", F.col("__copy") + 1, n - F.col("__copy")),
        F.slice("embedding", F.lit(1), F.col("__copy")))
    return (df.withColumn(
        "embedding",
        F.when(F.col("__copy") == 0, F.col("embedding")).otherwise(rot))
        .drop("__copy"))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from snowflake_medtech_vigilance_lakehouse_spark.session import get_spark
    spark = get_spark("make_scale")
    spark.sparkContext.setLogLevel("ERROR")

    from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import read_events

    for table, (keys, files) in KEY_SHIFTS.items():
        if table == "events":
            # one shipped fixture shape stores ts as TIMESTAMP(NANOS),
            # which the vanilla parquet reader rejects — go through the
            # normalizing reader every other consumer uses
            df = read_events(spark, src)
        else:
            df = spark.read.parquet(f"{src}/{table}.parquet")
        if not keys:  # fixed dimensions: pass through
            out = df
        elif table == "documents":
            out = _perturb_text(df, copies)
        elif table == "embeddings":
            out = _rotate_embeddings(df, copies)
        else:
            out = _replicate(df, keys, copies)
        (out.repartition(files)
            .write.mode("overwrite").parquet(f"{dst}/{table}.parquet"))
        print(f"{table}: {spark.read.parquet(f'{dst}/{table}.parquet').count()} rows")


if __name__ == "__main__":
    main()
