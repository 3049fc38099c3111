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

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _eager_checkpoint, _release_persistent, connected_components

__all__ = ["pagerank", "keep_representatives"]


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
        # out-degree ATTACHED to the edge row once (it is loop
        # static): each power iteration then joins ranks alone
        # instead of ranks AND a separate degree table — one join,
        # one exchange fewer per iteration (guide §2.4). The per-edge
        # term stays the identical expression _r / _deg, so the
        # contribution sums are the same values in either formulation.
        deg = e.groupBy("_s").agg(
            F.count(F.lit(1)).cast("double").alias("_deg"))
        ed, ids = _checkpoint(e.join(deg, "_s"))
        base_ids += ids

        n = nodes.count()  # ONE driver scalar, bounded
        if n == 0:
            ok = True
            return nodes.select("node", F.lit(0.0).alias("pagerank"))

        ranks, last_ids = _checkpoint(
            nodes.select("node", F.lit(1.0 / n).alias("_r")))
        for _ in range(iters):
            contrib = (
                ed.join(ranks, ed["_s"] == ranks["node"])
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


def keep_representatives(pairs: DataFrame | None,
                         scores: DataFrame | None = None,
                         *, components: DataFrame | None = None,
                         damping: float = 0.85, iters: int = 5,
                         left_col: str = "doc_id_1",
                         right_col: str = "doc_id_2") -> DataFrame:
    """The composition :func:`pagerank` exists for (module doc):
    duplicate clusters from :func:`~.dedup.connected_components`, the
    KEPT copy of each cluster chosen by IMPORTANCE — its PageRank
    centrality within the near-dup graph — rather than by min-id.
    The cluster hub (the copy most other copies point at / most
    connected) is usually the canonical, best-formatted instance;
    min-id keeps whichever happened to be crawled first.

    ``pairs`` is a near-dup pair list (e.g. from
    :func:`~.dedup.ngram_jaccard_pairs` or
    :func:`~.dedup.minhash_lsh_pairs`). ``scores`` is an optional
    (node, pagerank) frame; when omitted it is computed here — 5
    power iterations over the symmetrized pair graph. A node missing
    from a caller-supplied ``scores`` sorts last (never the keeper of
    a cluster with any scored member). ``components`` (round 10) is
    an optional precomputed (doc_id, component_id) label frame —
    the symmetric twin of ``leakage_safe_split(components=)``, so a
    pipeline that already paid for either iterative loop passes its
    output in and only the missing loop runs; a graph node missing
    from the supplied labels falls back to its own singleton cluster
    (never silently dropped). With BOTH supplied, ``pairs`` may be
    None (no loop runs at all — the function is then one join + one
    window over the label frame's nodes). Whenever ``pairs`` IS
    given, it defines the node universe — even beside both ``scores``
    and ``components`` — so the singleton fallback applies uniformly
    and a stale label frame can never silently drop pair endpoints
    (round-11 ADVICE fix: the old three-argument path took the label
    frame as the universe and contradicted this contract).

    Returns (doc_id, component_id, score, keep): every graph node,
    its cluster label, its centrality, and keep = True on exactly one
    row per cluster — the max-score member, ties broken by min
    doc_id (deterministic, engine-reproducible).

    100 TB shape: the pair list is eagerly checkpointed ONCE and
    feeds both iterative loops (each would otherwise re-run the
    entire upstream pair derivation while materializing its own edge
    checkpoint); the blocks are released as soon as both loops'
    checkpoint-backed outputs exist. The final composition is one
    node-keyed shuffle join (components x scores) plus one
    cluster-partitioned row_number window — per-cluster state, no
    corpus-sized buffers; both loop outputs are node-sized.
    """
    from pyspark.sql.window import Window

    need_cc, need_pr = components is None, scores is None
    if pairs is None and (need_cc or need_pr):
        raise ValueError(
            "keep_representatives needs pairs unless BOTH scores= and "
            "components= are supplied")
    labels = None if components is None else \
        components.select("doc_id", "component_id")
    if pairs is not None:
        jsc = pairs.sparkSession.sparkContext._jsc
        # checkpointed ONCE even when only one loop runs: each loop
        # would otherwise re-derive the upstream pair list while
        # materializing its own edge checkpoint
        p, pair_ids = _eager_checkpoint(
            pairs.select(F.col(left_col).alias("doc_id_1"),
                         F.col(right_col).alias("doc_id_2")), jsc)
        try:
            if need_cc and need_pr:
                # the two iterative loops are INDEPENDENT given the
                # checkpointed pair list (CC reads p; PageRank reads
                # its own symmetrized edge view of p) — run them
                # concurrently so each loop's small per-round jobs
                # back-fill the other's task tails (guide §2.6; both
                # loops are driver-job-bound at bench scale). Safe
                # since _eager_checkpoint attributes block ids off the
                # checkpointed frame itself (round 14) — the old
                # global-diff bookkeeping would cross-attribute the
                # two loops' concurrent checkpoints and release blocks
                # the other loop still needs.
                edges = p.select(
                    F.col("doc_id_1").alias("src"),
                    F.col("doc_id_2").alias("dst"),
                ).union(p.select(
                    F.col("doc_id_2").alias("src"),
                    F.col("doc_id_1").alias("dst")))
                with ThreadPoolExecutor(max_workers=1) as pool:
                    pr_f = pool.submit(pagerank, edges,
                                       damping=damping, iters=iters)
                    comps = connected_components(p)
                    scores = pr_f.result()
            elif need_cc:
                comps = connected_components(p)
            else:
                # a stale or filtered caller label frame must not
                # silently DROP graph nodes (the documented contract
                # is a row for every pair endpoint): nodes missing
                # from the labels fall back to their own singleton
                # cluster, the same coalesce convention
                # leakage_safe_split uses
                nodes = (p.select(F.col("doc_id_1").alias("doc_id"))
                         .union(p.select(F.col("doc_id_2")
                                         .alias("doc_id")))
                         .distinct())
                comps = nodes.join(labels, "doc_id", "left").select(
                    "doc_id",
                    F.coalesce("component_id", F.col("doc_id"))
                    .alias("component_id"))
                # node-sized, and it must survive the pair-checkpoint
                # release below (it reads p's blocks) — truncate its
                # lineage like connected_components' own output
                comps, _ = _eager_checkpoint(comps, jsc)
            if need_pr and not need_cc:
                edges = p.select(
                    F.col("doc_id_1").alias("src"),
                    F.col("doc_id_2").alias("dst"),
                ).union(p.select(
                    F.col("doc_id_2").alias("src"),
                    F.col("doc_id_1").alias("dst")))
                scores = pagerank(edges, damping=damping, iters=iters)
        finally:
            # both loop outputs are checkpoint-backed
            # (lineage-truncated), so the pair checkpoint is dead even
            # on error paths
            _release_persistent(jsc, pair_ids)
    else:
        # no pairs (both scores= and components= supplied): the label
        # frame IS the node universe (documented)
        comps = labels
    scored = comps.join(
        scores.select(F.col("node").alias("doc_id"),
                      F.col("pagerank").alias("score")),
        "doc_id", "left")
    w = Window.partitionBy("component_id").orderBy(
        F.desc_nulls_last("score"), F.asc("doc_id"))
    return scored.select(
        "doc_id", "component_id", "score",
        (F.row_number().over(w) == 1).alias("keep"))
