"""Graph centrality over derived document/vector graphs.

The dedup family already runs one iterative graph algorithm
(connected components, operators/dedup.py) to form duplicate
clusters; PageRank is its ranking counterpart: given a similarity
graph (k-NN edges over embeddings, near-dup pairs, citation/link
edges), score each node's centrality so cluster REPRESENTATIVES can
be chosen by importance rather than by min-id — the curation step
between "found the duplicate cluster" and "kept the best copy".

Deterministic and fully oracle-checkable: the fixed-iteration power
method unrolls into SQL (the DuckDB twin chains one CTE per
iteration — recursive CTEs cannot GROUP BY in the recursive term, so
unrolling IS the portable formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _eager_checkpoint, _release_persistent

__all__ = ["pagerank"]


def pagerank(edges: DataFrame, *, damping: float = 0.85, iters: int = 5,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``r_{t+1}(v) = (1-d)/N + d * sum_{u->v} r_t(u) / outdeg(u)`` for
    ``iters`` power iterations from the uniform start ``1/N``; nodes
    are everything appearing as a source OR destination. Dangling
    nodes (no out-edges) simply contribute nothing — the "removed
    dangling mass" variant; total mass is then not conserved, which
    is fine for RANKING (the per-node ordering is what callers use)
    and keeps both engines' formulations identical. Returns
    (node, pagerank) rounded to 6.

    Loop discipline — same as :func:`~.dedup.connected_components`
    (and learned from its measured history): the edge list, node set,
    and out-degree table are materialized ONCE via eager
    localCheckpoint — a lazily-unrolled loop re-executes the entire
    upstream edge derivation (for a kNN graph, the full cosine
    cross-join) on EVERY reference, which the plan audit caught as 68
    file scans / 57 exchanges for 5 iterations — and each round's
    rank vector is checkpointed eagerly with the superseded round's
    blocks released immediately; on every exit path only the final
    rank checkpoint survives, backing the returned lineage-truncated
    frame. Each iteration is then exactly one shuffle-join of the
    materialized edges with the current ranks plus one
    partial-agg groupBy(dst) — a hub's in-degree collapses map-side,
    not in a window buffer. N reaches the driver as ONE scalar (the
    same bounded-metadata class as the components loop's convergence
    count). Consequently the operator runs Spark jobs at
    plan-construction time — bench with ``timed_build``, like
    ``semantic_dedup``."""
    jsc = edges.sparkSession.sparkContext._jsc

    def _checkpoint(df: DataFrame) -> tuple[DataFrame, list[int]]:
        return _eager_checkpoint(df, jsc)

    base_ids: list[int] = []
    prev_ids: list[int] = []
    last_ids: list[int] = []
    ok = False
    try:
        e, ids = _checkpoint(
            edges.select(F.col(src_col).alias("_s"),
                         F.col(dst_col).alias("_d")))
        base_ids += ids
        nodes, ids = _checkpoint(
            e.select(F.col("_s").alias("node"))
            .union(e.select(F.col("_d").alias("node")))
            .distinct())
        base_ids += ids
        outdeg, ids = _checkpoint(
            e.groupBy("_s").agg(
                F.count(F.lit(1)).cast("double").alias("_deg")))
        base_ids += ids

        n = nodes.count()  # ONE driver scalar, bounded
        if n == 0:
            ok = True
            return nodes.select("node", F.lit(0.0).alias("pagerank"))

        ranks, last_ids = _checkpoint(
            nodes.select("node", F.lit(1.0 / n).alias("_r")))
        for _ in range(iters):
            contrib = (
                e.join(ranks, e["_s"] == ranks["node"])
                .join(outdeg, "_s")
                .groupBy(F.col("_d").alias("node"))
                .agg(F.sum(F.col("_r") / F.col("_deg")).alias("_m"))
            )
            updated = nodes.join(contrib, "node", "left").select(
                "node",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping) * F.coalesce(F.col("_m"), F.lit(0.0))
                 ).alias("_r"),
            )
            updated, new_ids = _checkpoint(updated)
            # `updated` is fully materialized, so the superseded
            # round's blocks are unreachable — release
            _release_persistent(jsc, prev_ids)
            prev_ids = last_ids
            ranks, last_ids = updated, new_ids
        ok = True
        return ranks.select("node", F.round("_r", 6).alias("pagerank"))
    finally:
        # inputs and every superseded round are dead on all exit
        # paths; on failure the last round's blocks go too — only a
        # successfully returned frame keeps its final checkpoint
        _release_persistent(jsc, base_ids + prev_ids)
        if not ok:
            _release_persistent(jsc, last_ids)
