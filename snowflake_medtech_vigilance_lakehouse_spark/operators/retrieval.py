"""Hybrid retrieval: BM25 + vector fusion with metadata filters (AI6;
README.md:61,73,81,117 — the Cortex-Search-shaped capability).

Pipeline: metadata filter -> BM25 lexical score + cosine vector score
over the *filtered* candidates -> score fusion (weighted min-max or
reciprocal-rank) -> top-k. Filter-first mirrors the reference's
"hybrid search with metadata filters": predicate pushdown prunes the
candidate set before any scoring work, which is what keeps the
interactive SLO (<1.5s over ~200k docs, README.md:87) reachable —
scoring cost is proportional to the filtered set, not the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_similarity
from .text import bm25_scores


def _minmax(c: Column, lo: Column, hi: Column) -> Column:
    return F.when(hi == lo, F.lit(0.5)).otherwise((c - lo) / (hi - lo))


def hybrid_search(docs: DataFrame, *, query_terms: Sequence[str],
                  query_vec: Sequence[float] | None = None,
                  metadata_filter: Column | str | None = None,
                  k: int = 20, w_lexical: float = 0.5,
                  fusion: str = "weighted",
                  id_col: str = "doc_id", text_col: str = "text",
                  vec_col: str = "embedding") -> DataFrame:
    """Filtered hybrid top-k.

    ``docs`` carries text + (optionally) an embedding column plus
    arbitrary metadata columns; ``metadata_filter`` is any boolean
    Column/SQL string over them. ``fusion``: 'weighted' (min-max
    normalize each score over the candidate set, weighted sum) or
    'rrf' (reciprocal rank fusion, 1/(60+rank)). Returns
    (id, score, rank), rank 1..k, ties broken by id.
    """
    cand = docs
    if metadata_filter is not None:
        cand = cand.filter(metadata_filter)

    lex = bm25_scores(cand, query_terms, text_col=text_col, id_col=id_col)

    if query_vec is not None:
        qv = F.lit([float(x) for x in query_vec]).cast("array<double>")
        vec = cand.select(
            F.col(id_col), cosine_similarity(F.col(vec_col), qv).alias("_vs")
        )
        scored = (
            cand.select(id_col)
            .join(lex, id_col, "left")
            .join(vec, id_col, "left")
            .select(
                id_col,
                F.coalesce("bm25", F.lit(0.0)).alias("_ls"),
                F.coalesce("_vs", F.lit(-1.0)).alias("_vs"),
            )
        )
    else:
        scored = lex.select(id_col, F.col("bm25").alias("_ls"), F.lit(0.0).alias("_vs"))

    if fusion == "rrf":
        w_l = Window.orderBy(F.col("_ls").desc(), F.col(id_col))
        w_v = Window.orderBy(F.col("_vs").desc(), F.col(id_col))
        fused = (
            F.lit(w_lexical) / (F.lit(60.0) + F.row_number().over(w_l))
            + F.lit(1.0 - w_lexical) / (F.lit(60.0) + F.row_number().over(w_v))
        )
        scored = scored.select(F.col(id_col), fused.alias("_score"))
    elif fusion == "weighted":
        stats = scored.agg(
            F.min("_ls").alias("_ls_lo"), F.max("_ls").alias("_ls_hi"),
            F.min("_vs").alias("_vs_lo"), F.max("_vs").alias("_vs_hi"),
        )
        scored = scored.crossJoin(F.broadcast(stats)).select(
            F.col(id_col),
            (
                F.lit(w_lexical) * _minmax(F.col("_ls"), F.col("_ls_lo"), F.col("_ls_hi"))
                + F.lit(1.0 - w_lexical) * _minmax(F.col("_vs"), F.col("_vs_lo"), F.col("_vs_hi"))
            ).alias("_score"),
        )
    else:
        raise ValueError(f"unknown fusion: {fusion}")

    w = Window.orderBy(F.col("_score").desc(), F.col(id_col).asc())
    return (
        scored.select(
            id_col,
            F.round("_score", 6).alias("score"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
