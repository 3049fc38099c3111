"""Similarity search over embedding columns (AI4; README.md:60,72,116 —
k-NN "similar cases", SLO Recall@20 >= 0.7 vs brute force).

- knn_bruteforce        : exact top-k by cosine. The query set is
                          broadcast; the corpus is never shuffled —
                          score + per-query top-k window. This is the
                          recall ground truth.
- embedding_neardup_pairs: probe-set near-dup join at a cosine
                          threshold.
- For 100 TB, the scale path is LSH bucketing
                          (``pyspark.ml.feature.BucketedRandomProjectionLSH``)
                          or an IVF-style coarse quantizer; the
                          brute-force operator stays as the
                          recall-evaluation oracle.

Scores are computed in double (float32 inputs cast first) with a
sequential fold so they reproduce bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_from_norms, l2_norm


def knn_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); ties broken
    by neighbor id so ranking is total. Self-matches (same id) are
    excluded. Returns (query_id, neighbor_id, rank, cosine).
    """
    # norms are hoisted to per-row projections on each join side
    # (cosine_from_norms): the three folds per PAIR become one —
    # HOF lambdas run interpreted, so this is the per-pair hot cost
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).alias("rank"),
            F.round(F.col("_cos"), 6).alias("cosine"),
        )
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(corpus: DataFrame, probes: DataFrame,
                            threshold: float = 0.9,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs between a probe set and the
    corpus (probe broadcast; id_1 < id_2 to emit each pair once).

    At 100 TB the probe side comes from LSH buckets instead of a
    broadcast — the scoring expression is identical."""
    p = probes.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("_pv"),
                      l2_norm(F.col(vec_col)).alias("_pn"))
    c = corpus.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("_cv"),
                      l2_norm(F.col(vec_col)).alias("_cn"))
    return (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            F.round(cosine_from_norms(
                F.col("_pv"), F.col("_cv"), F.col("_pn"), F.col("_cn")
            ), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs_blocked(corpus: DataFrame, probes: DataFrame,
                                    threshold: float = 0.9,
                                    id_col: str = "vec_id",
                                    vec_col: str = "embedding") -> DataFrame:
    """Arrow-blocked GEMM variant of ``embedding_neardup_pairs`` —
    same contract (id_1 < id_2, cosine rounded to 6 dp, >= threshold),
    ~15x faster on wide pair spaces: the fold variant pays an
    interpreted higher-order-function dot per PAIR, this one scores a
    whole Arrow batch against the probe matrix with one numpy float64
    matrix product (semantic_dedup's 20M-pair stage at sf1: 119 s
    fold / 36 s norm-hoisted fold / ~2 s blocked).

    Data movement is IDENTICAL to the fold variant: there the probe
    side is the build side of a broadcast nested-loop join (Spark
    collects it to the driver and re-ships it per executor); here the
    same rows are collected and shipped through an explicit broadcast
    variable. The corpus side streams through ``mapInPandas`` and is
    never shuffled. At 100 TB the probe side must already be
    bucket-bounded (LSH/IVF) for either variant — the GEMM kernel is
    how each bucket's block should be scored.

    Numerics: the GEMM accumulates in a different order than the
    sequential fold, so raw cosines can differ in the last ulp. The
    batch therefore pre-filters with 1e-6 slack and emits RAW scores;
    the exact ``F.round(_, 6) >= threshold`` contract is applied
    JVM-side on top, so rounding semantics (HALF_UP decimal) are
    Spark's own, not numpy's. Fold-vs-blocked equality is
    pytest-gated on the fixtures; a disagreement would need a true
    cosine within ~1e-10 of a 0.5e-6 decimal boundary.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = probes.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        # the kernel casts ids through np.int64 and declares a long
        # output schema; a string/decimal id that works in the fold
        # variant would crash or coerce wrongly here — refuse loudly
        raise ValueError(
            f"embedding_neardup_pairs_blocked requires an integral id "
            f"column, got {id_col}: {id_type.simpleString()}; use "
            f"embedding_neardup_pairs (id-type generic) or "
            f"embedding_neardup_pairs_bucketed")

    rows = [r for r in probes.select(id_col, vec_col).collect()
            if r[1] is not None]  # NULL probe vector = NULL cosine = dropped
    spark = corpus.sparkSession
    out_schema = "id_1 long, id_2 long, _raw double"
    if not rows:
        return spark.createDataFrame([], out_schema).select(
            "id_1", "id_2", F.round("_raw", 6).alias("cosine"))
    dims = {len(r[1]) for r in rows}
    if len(dims) != 1:
        # the fold variant silently drops length-mismatched PAIRS;
        # a single probe matrix cannot reproduce that per-pair rule,
        # so refuse loudly instead of diverging quietly
        raise ValueError(
            f"blocked variant requires uniform probe dims, got {sorted(dims)};"
            f" use embedding_neardup_pairs")
    b_pids = np.array([r[0] for r in rows], dtype=np.int64)
    P = np.array([list(r[1]) for r in rows], dtype=np.float64)
    b_pn = np.sqrt((P * P).sum(axis=1))
    b_Pt = P.T.copy()
    slack = float(threshold) - 1.001e-6

    # the probe matrix travels in the UDF closure, NOT a
    # SparkContext.broadcast: an explicit broadcast created per call
    # has session lifetime and no owner to destroy it (destroying at
    # function exit would break the lazy plan), so repeated calls
    # leak probe-matrix copies; the closure is serialized into the
    # plan and garbage-collected with it
    def score_blocks(batches):
        d = b_Pt.shape[0]
        for pdf in batches:
            # fold-path parity on dirty rows: a NULL vector or a
            # dimension mismatch yields NULL cosine there (zip_with
            # pads, the fold propagates NULL) and the row is dropped —
            # here they must be filtered, not np.stack crashes
            vecs = pdf[vec_col].to_numpy()
            ok = np.array([v is not None and len(v) == d for v in vecs])
            if not ok.all():
                pdf = pdf[ok]
                vecs = vecs[ok]
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.stack(vecs).astype(np.float64)
            cn = np.sqrt((C * C).sum(axis=1))
            denom = np.outer(cn, b_pn)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (C @ b_Pt) / denom
            keep = (denom != 0) & (cos >= slack) & (
                b_pids[np.newaxis, :] < cids[:, np.newaxis])
            ci, pi = np.nonzero(keep)
            yield pd.DataFrame({
                "id_1": b_pids[pi], "id_2": cids[ci], "_raw": cos[ci, pi]})

    raw = corpus.select(id_col, vec_col).mapInPandas(score_blocks, out_schema)
    return (
        raw.select("id_1", "id_2", F.round("_raw", 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _kmeans_fit(X, k: int, seed: int, iters: int = 15):
    """Driver-side Lloyd's k-means with k-means++ seeding over a small
    numpy sample — the coarse quantizer for the bucketed pair stage.
    Deterministic for a given (sample, k, seed)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    first = int(rng.randint(len(X)))
    idx = [first]
    d2 = ((X - X[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2.sum()
        if total > 0:
            nxt = int(rng.choice(len(X), p=d2 / total))
        else:
            nxt = int(rng.randint(len(X)))
        idx.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    C = X[idx].copy()
    for _ in range(iters):
        dist = ((X * X).sum(axis=1)[:, np.newaxis]
                - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[np.newaxis, :])
        a = np.argmin(dist, axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def auto_n_lists(count: int, parallelism: int, *,
                 target_list_rows: int = 512,
                 max_lists: int = 512) -> int:
    """The IVF list-count sizing rule, as code (round 8 — previously
    prose): enough lists that (a) every core has work —
    ``n_lists >= parallelism`` — and (b) per-list HOME volume stays
    ~``target_list_rows`` as the corpus grows, so the per-list Arrow
    group (and the GEMM block against it) is corpus-INDEPENDENT.
    Capped at ``max_lists`` = sample_rows/8: the driver-side k-means
    quantizer fits on a bounded 4096-row sample, and fewer than ~8
    sample points per centroid stops estimating anything. Beyond
    ``max_lists * target_list_rows`` rows (~262k at the defaults),
    pass explicit ``centroids`` from a distributed
    :func:`build_ivf_index` fit — the same lever, without the
    driver-sample ceiling."""
    import math

    return max(1, min(max(math.ceil(count / target_list_rows),
                          parallelism), max_lists))


def embedding_neardup_pairs_bucketed(corpus: DataFrame,
                                     threshold: float = 0.9, *,
                                     probes: DataFrame | None = None,
                                     n_lists: int | None = None,
                                     n_probe: int | None = None,
                                     id_col: str = "vec_id",
                                     vec_col: str = "embedding",
                                     seed: int = 42,
                                     centroids: list | None = None,
                                     block_rows: int = 4096,
                                     target_list_rows: int = 512,
                                     max_partners: int | None = None
                                     ) -> DataFrame:
    """FULL-CORPUS embedding near-dup pairs, bucket-bounded — the
    100 TB shape of the SemDedup pair stage (reference
    /root/reference/README.md:60,72,116): every vector is assigned to
    one of ``n_lists`` IVF lists by the k-means coarse quantizer, and
    pairs are scored only WITHIN a list's block (plus each vector's
    ``n_probe`` nearest lists, for boundary recall) — never across the
    whole corpus.

    Contract matches :func:`embedding_neardup_pairs` run corpus-vs-
    corpus (id_1 < id_2, cosine rounded to 6 dp, >= threshold).
    ``n_probe=None`` (default-exact mode) derives each vector's probe
    set from the triangle inequality instead of a fixed count: in
    L2-normalized space ``cos(u,v) >= t  <=>  ||u^-v^|| <= r`` with
    ``r = sqrt(2-2t)``, and any partner v of u satisfies
    ``||u^-c_home(v)|| <= ||u^-c_home(u)|| + 2r`` — so probing every
    list within that radius provably covers ALL qualifying pairs.
    EXACT at any threshold; the probe fan-out (and therefore cost)
    adapts to how tight the threshold is — at production near-dup
    thresholds (~0.9, r~0.45) the bound prunes hard, while a loose
    threshold honestly degrades toward all-pairs because the
    qualifying pairs really are spread across every bucket. An
    integer ``n_probe`` caps the probe set at the n nearest lists
    instead: fixed cost, approximate recall (missed pairs are
    exactly those whose endpoints never share a probed list).

    Plan shape — the fix for the probe-slice driver collect this
    replaces (``embedding_neardup_pairs_blocked`` collects its whole
    probe side; ``q_semantic_dedup`` fed it corpus/20):

    1. quantizer: a driver-side k-means fit over a BOUNDED 4096-row
       sample (pass ``centroids`` — e.g. the ``build_ivf_index``
       sidecar — to skip it). Only that fixed-size sample and the
       n_lists centroids ever reach the driver, never a
       corpus-proportional slice.
    2. assignment: ``mapInPandas`` — each Arrow batch computes
       distances to all centroids with one GEMM and emits the row's
       home list + its n_probe nearest lists. Narrow, no shuffle.
    3. ONE shuffle: home rows + exploded probe rows groupBy(list_id).
    4. per-list scoring: ``applyInPandas`` runs the same chunked
       float64 GEMM as the blocked variant between the list's probe
       rows and home rows (``block_rows`` bounds the score-matrix
       block so memory is O(p·block_rows), not O(p·h)).
    5. a pair probed from both sides lands in both home buckets:
       groupBy(id_1,id_2).max dedupes deterministically.

    Per-list row volume must fit one Arrow group — and the sizing
    lever is CODE, not prose (round 8): ``n_lists=None`` (default)
    derives the list count from one cheap corpus count via
    :func:`auto_n_lists` — ceil(count / target_list_rows), floored at
    the session parallelism (no idle cores on small corpora; a 16-list
    layout on 32 cores wastes half the machine), capped at
    sample_rows/8 (the driver-sample quantizer's estimation floor).
    Correctness never depends on the choice (the triangle bound is
    exact under ANY centroids); only throughput moves. Pass an
    explicit ``n_lists`` to pin the layout, or ``centroids`` (e.g.
    the ``build_ivf_index`` sidecar from a distributed fit) when the
    corpus outgrows the driver-sample ceiling.
    Ids may be any integral or string type (carried opaquely through
    Arrow; normalized with elementwise min/max). Rows with NULL
    vectors, NULL elements, or a dimension != the quantizer's are
    dropped — the fold contract drops those pairs anyway (NULL
    cosine), but mixed-dimension corpora diverge: the fold scores
    same-length pairs among them, this refuses them entirely.

    Numerics: identical discipline to the blocked variant — float64
    GEMM, 1e-6 slack prefilter in numpy, exact ``round(_,6) >=
    threshold`` applied JVM-side.

    ``max_partners`` bounds the one regime where the pair CONTRACT
    itself is quadratic (round 10): a duplicate mega-cluster of C
    members has C(C-1)/2 qualifying pairs, so emission — not the
    bucketing — dominates at scale (the measured 23x wall for 30x
    data on the clustered-corpus bench entry). With ``max_partners=m``
    each row emits only its top-``m``-by-cosine qualifying partners
    per scored block (ties at the m-th value all kept, so the cut is
    a pure deterministic function of the cosine values — no
    row-order dependence), bounding output at O(rows * m * blocks)
    instead of O(C^2). The result is a SUBSET of the uncapped
    contract — the same recall trade as
    ``ngram_jaccard_pairs(max_doc_freq=)`` — with the guarantee that
    matters for dedup clustering: in default exact mode every vector
    with >= 1 qualifying partner keeps at least its best-cosine pair
    (its probe set provably covers the partner's home list, and the
    best partner is never below the m-th value), so every duplicate
    still attaches to a copy; clusters may split into star-shaped
    fragments rather than full cliques, which "keep one per cluster"
    consumers tolerate by construction. Default None = exact contract.

    ``probes`` switches to PROBE-SET semantics — the distributed twin
    of :func:`embedding_neardup_pairs` (and the collect-free
    replacement for the blocked variant's driver-collected probe
    matrix): pairs are (probe, corpus) with ``id_1 < id_2``, probe
    rows fan out to their triangle-bound (or n_probe-capped) lists
    while corpus rows land only in their home list — the same
    coverage guarantee applies with u := the probe, so exact mode
    stays exact. Both frames must share the id/vec column names; a
    probe that also appears in the corpus contributes each pair once
    (strict ``id_1 < id_2``, fold-identical).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType, StringType)

    if max_partners is not None and max_partners < 1:
        raise ValueError(f"max_partners must be >= 1, got {max_partners}")
    id_type = corpus.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType,
                                LongType, StringType)):
        raise ValueError(
            f"embedding_neardup_pairs_bucketed requires an integral or "
            f"string id column, got {id_col}: {id_type.simpleString()}")
    if probes is not None and probes.schema[id_col].dataType != id_type:
        raise ValueError(
            f"probes.{id_col} type "
            f"{probes.schema[id_col].dataType.simpleString()} must match "
            f"corpus ({id_type.simpleString()})")
    id_sql = id_type.simpleString()

    # zero-norm vectors can't be placed in normalized space and score
    # NaN cosine against everything (always dropped) — exclude with
    # the NULL/NULL-element rows
    def _clean(df: DataFrame) -> DataFrame:
        return df.filter(
            F.col(vec_col).isNotNull()
            & ~F.exists(F.col(vec_col), lambda x: x.isNull())
        ).select(F.col(id_col).alias("_id"),
                 F.col(vec_col).cast("array<double>").alias("_v"),
                 ).filter(l2_norm(F.col("_v")) > 0)

    clean = _clean(corpus)

    if centroids is None and n_lists is None:
        # the sizing rule needs one cheap count job — the RAW corpus
        # count (for a parquet scan, a footer-metadata aggregate),
        # NOT clean.count(), whose null/zero-norm filters would fold
        # every vector just to size a layout whose exact value is
        # irrelevant (correctness never depends on it)
        n_lists = auto_n_lists(
            corpus.count(),
            corpus.sparkSession.sparkContext.defaultParallelism,
            target_list_rows=target_list_rows)

    if centroids is None:
        # quantizer fit on a BOUNDED driver sample (4096 rows, not
        # corpus-proportional), in NORMALIZED space — the geometry the
        # probe bound (and cosine itself) lives in. A numpy Lloyd's
        # fit here, not MLlib: at this sample size the MLlib fit is
        # pure per-iteration job overhead (~4 s vs ~ms), and the
        # quantizer's QUALITY only moves the probe fan-out — the
        # triangle bound keeps the pair set exact under ANY centroids,
        # so a sample-biased fit costs throughput, never correctness.
        sample = [r[0] for r in clean.select("_v").limit(4096).collect()]
        if not sample:
            # nothing survived the clean filter (empty corpus, or all
            # vectors NULL / zero-norm): the fold contract yields an
            # empty pair frame, not a numpy crash in the fit
            return corpus.sparkSession.createDataFrame(
                [], f"id_1 {id_sql}, id_2 {id_sql}, cosine double")
        sizes = {len(v) for v in sample}
        if len(sizes) > 1:
            raise ValueError(
                f"embedding_neardup_pairs_bucketed requires uniform "
                f"vector dims, got {sorted(sizes)}")
        X = np.array(sample, dtype=np.float64)
        X = X / np.sqrt((X * X).sum(axis=1))[:, np.newaxis]
        Ctr = _kmeans_fit(X, min(n_lists, len(X)), seed)
    else:
        Ctr = np.array([[float(x) for x in c] for c in centroids],
                       dtype=np.float64)
    n_lists = Ctr.shape[0]
    probe_cap = None if n_probe is None else min(int(n_probe), n_lists)
    d = Ctr.shape[1]
    ctr_sq = (Ctr * Ctr).sum(axis=1)                    # ||c||^2, (L,)
    # effective raw threshold under the round(_,6) contract, minus
    # GEMM rounding fuzz — mirrors the score-side slack
    r2 = max(0.0, 2.0 - 2.0 * (float(threshold) - 1.001e-6))
    two_r = 2.0 * (r2 ** 0.5)

    assign_schema = f"_id {id_sql}, _v array<double>, _home int, _probes array<int>"

    def assign(batches):
        for pdf in batches:
            vecs = pdf["_v"].to_numpy()
            ok = np.array([len(v) == d for v in vecs], dtype=bool)
            if not ok.all():
                pdf = pdf[ok]
                vecs = vecs[ok]
            if not len(pdf):
                continue
            X = np.stack(vecs).astype(np.float64)       # (n, d)
            X = X / np.sqrt((X * X).sum(axis=1))[:, np.newaxis]
            # ||x^-c||^2 = 1 - 2 x^.c + ||c||^2 (x^ is unit)
            d2 = np.maximum(
                1.0 + ctr_sq[np.newaxis, :] - 2.0 * (X @ Ctr.T), 0.0)
            dist = np.sqrt(d2)                          # (n, L)
            if probe_cap is None:
                # exact mode: probe every list whose centroid is
                # within d_home + 2r (+ float fuzz) — the triangle
                # bound that covers every pair with cos >= threshold
                bound = dist.min(axis=1)[:, np.newaxis] + two_r + 1e-9
                mask = dist <= bound
                homes = np.argmin(dist, axis=1).astype(np.int32)
                probes = [np.nonzero(m)[0].astype(np.int32) for m in mask]
            else:
                # stable sort ties by column index = list_id ascending,
                # the same tie-break as assign_ivf_lists / MLlib
                order = np.argsort(dist, axis=1, kind="stable")[:, :probe_cap]
                homes = order[:, 0].astype(np.int32)
                probes = list(order.astype(np.int32))
            yield pd.DataFrame({
                "_id": pdf["_id"].to_numpy(),
                "_v": [np.asarray(v) for v in vecs],
                "_home": homes,
                "_probes": probes,
            })

    home_schema = f"_id {id_sql}, _v array<double>, _home int"

    def assign_home(batches):
        # argmin-only assignment for the h side of probe mode: the
        # corpus never needs the probe-set mask (mapInPandas is a
        # black box, so Spark could not prune it away if computed)
        for pdf in batches:
            vecs = pdf["_v"].to_numpy()
            ok = np.array([len(v) == d for v in vecs], dtype=bool)
            if not ok.all():
                pdf = pdf[ok]
                vecs = vecs[ok]
            if not len(pdf):
                continue
            X = np.stack(vecs).astype(np.float64)
            X = X / np.sqrt((X * X).sum(axis=1))[:, np.newaxis]
            d2 = ctr_sq[np.newaxis, :] - 2.0 * (X @ Ctr.T)
            yield pd.DataFrame({
                "_id": pdf["_id"].to_numpy(),
                "_v": [np.asarray(v) for v in vecs],
                "_home": np.argmin(d2, axis=1).astype(np.int32),
            })

    probe_mode = probes is not None
    if probe_mode:
        # probe-set semantics: corpus rows land in their HOME list
        # only (each pair can then be scored in at most one bucket —
        # the h side appears once — so no dedupe shuffle is needed);
        # probe rows fan out to their triangle-bound/n_probe lists
        home_rows = clean.mapInPandas(assign_home, home_schema).select(
            F.col("_home").alias("list_id"), "_id", "_v",
            F.lit("h").alias("_role"))
        probe_rows = _clean(probes).mapInPandas(assign, assign_schema).select(
            F.explode("_probes").alias("list_id"), "_id", "_v",
            F.lit("p").alias("_role"))
    else:
        assigned = clean.mapInPandas(assign, assign_schema)
        home_rows = assigned.select(
            F.col("_home").alias("list_id"), "_id", "_v",
            F.lit("h").alias("_role"))
        probe_rows = assigned.select(
            F.explode("_probes").alias("list_id"), "_id", "_v",
            F.lit("p").alias("_role"))
    slack = float(threshold) - 1.001e-6
    pair_schema = f"id_1 {id_sql}, id_2 {id_sql}, _raw double"

    def score(pdf):
        out1, out2, outc = [], [], []
        hm = pdf["_role"].to_numpy() == "h"
        H = pdf[hm]
        P = pdf[~hm]
        if len(H) and len(P):
            Hm = np.stack(H["_v"].to_numpy()).astype(np.float64)
            Pm = np.stack(P["_v"].to_numpy()).astype(np.float64)
            hid = H["_id"].to_numpy()
            pid = P["_id"].to_numpy()
            hn = np.sqrt((Hm * Hm).sum(axis=1))
            pn = np.sqrt((Pm * Pm).sum(axis=1))
            # block BOTH sides: a loose threshold fans the whole
            # corpus into every bucket as probes, so a one-sided
            # block still allocates |P| x block_rows score matrices
            # (~2 GB per block at 60k probes) — double blocking caps
            # every temporary at block_rows^2 doubles
            for plo in range(0, len(P), block_rows):
                phi = min(plo + block_rows, len(P))
                pblk = pid[plo:phi]
                for lo in range(0, len(H), block_rows):
                    hi = min(lo + block_rows, len(H))
                    denom = np.outer(pn[plo:phi], hn[lo:hi])
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = (Pm[plo:phi] @ Hm[lo:hi].T) / denom
                    hblock = hid[np.newaxis, lo:hi]
                    if probe_mode:
                        # fold contract for probe queries: emit
                        # strictly (probe, corpus) ordered pairs —
                        # id_1 IS the probe
                        keep = (denom != 0) & (cos >= slack) & (
                            pblk[:, np.newaxis] < hblock)
                    else:
                        keep = (denom != 0) & (cos >= slack) & (
                            pblk[:, np.newaxis] != hblock)
                    if max_partners is not None and hi - lo > max_partners:
                        # degree cap: keep each row's top-m qualifying
                        # partners in this block, ties at the m-th
                        # value included — the cut is a function of
                        # the cosine values alone, so it is stable
                        # under any row order / retry
                        masked = np.where(keep, cos, -np.inf)
                        kth = np.partition(
                            masked, hi - lo - max_partners,
                            axis=1)[:, hi - lo - max_partners]
                        keep &= masked >= kth[:, np.newaxis]
                    pi, ci = np.nonzero(keep)
                    if probe_mode:
                        out1.append(pblk[pi])
                        out2.append(hid[lo + ci])
                    else:
                        a = pblk[pi]
                        b = hid[lo + ci]
                        lt = a < b
                        out1.append(np.where(lt, a, b))
                        out2.append(np.where(lt, b, a))
                    outc.append(cos[pi, ci])
        if not out1:
            return pd.DataFrame({"id_1": pd.Series([], dtype=object),
                                 "id_2": pd.Series([], dtype=object),
                                 "_raw": pd.Series([], dtype="float64")})
        return pd.DataFrame({"id_1": np.concatenate(out1),
                             "id_2": np.concatenate(out2),
                             "_raw": np.concatenate(outc)})

    raw = (home_rows.unionByName(probe_rows)
           .groupBy("list_id").applyInPandas(score, pair_schema))
    if not probe_mode:
        # a full-mode pair probed from both endpoints lands in both
        # home buckets; dedupe deterministically. Probe mode scores
        # each pair in exactly one bucket (the h side's home), so the
        # extra shuffle would be pure cost there.
        raw = raw.groupBy("id_1", "id_2").agg(F.max("_raw").alias("_raw"))
    return (
        raw.select("id_1", "id_2", F.round("_raw", 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def knn_lsh(corpus: DataFrame, queries: DataFrame, k: int = 10,
            id_col: str = "vec_id", vec_col: str = "embedding",
            num_hash_tables: int = 8, bucket_length: float = 1.0,
            distance_threshold: float = 1.4, seed: int = 42) -> DataFrame:
    """Approximate top-k cosine neighbors via bucketed random
    projection LSH (``pyspark.ml.feature.BucketedRandomProjectionLSH``)
    — the 100 TB path: candidates come from hash-bucket joins, never a
    cross join.

    Vectors are L2-normalized first, so Euclidean distance is monotone
    in cosine (||a-b||^2 = 2 - 2cos) and the distance threshold maps to
    a cosine floor (1.4 ~ cos > 0.02). Output schema matches
    ``knn_bruteforce`` (query_id, neighbor_id, rank, cosine) so
    ``recall_at_k`` can grade it against the exact operator — the
    reference SLO is Recall@20 >= 0.7 (README.md:86,138)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def _unit(df: DataFrame, out: str) -> DataFrame:
        arr = F.col(vec_col).cast("array<double>")
        # materialize the norm in its own projection: Catalyst does no
        # CSE inside HOF lambdas, so an inline norm expression would be
        # re-aggregated per element (O(dim^2) per row)
        base = df.select(
            F.col(id_col), arr.alias("_arr"),
            F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)).alias("_nrm"),
        )
        # approxSimilarityJoin re-plans its inputs and can evaluate this
        # projection before the row filter, so array_to_vector must get
        # a valid array on EVERY row (x/0 -> NULL elements NPE the UDF;
        # a NULL array NPEs it too): fall back to the raw array for
        # zero-norm rows, which the filter then drops
        unit = F.when(
            F.col("_nrm") > 0,
            F.transform(F.col("_arr"), lambda x: x / F.col("_nrm")),
        ).otherwise(F.col("_arr"))
        return base.filter(F.col("_nrm") > 0).select(
            F.col(id_col), array_to_vector(unit).alias(out)
        )

    c = _unit(corpus, "features")
    q = _unit(queries, "features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, bucketLength=bucket_length, seed=seed,
    )
    model = lsh.fit(c)
    pairs = model.approxSimilarityJoin(c, q, distance_threshold, distCol="dist")
    scored = pairs.select(
        F.col(f"datasetB.{id_col}").alias("query_id"),
        F.col(f"datasetA.{id_col}").alias("neighbor_id"),
        (F.lit(1.0) - F.col("dist") * F.col("dist") / F.lit(2.0)).alias("_cos"),
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.select(
            "query_id", "neighbor_id",
            F.row_number().over(w).alias("rank"),
            F.round(F.col("_cos"), 6).alias("cosine"),
        )
        .filter(F.col("rank") <= k)
    )


def knn_ivf(corpus: DataFrame, queries: DataFrame, k: int = 10,
            n_lists: int = 16, n_probe: int = 8,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42) -> DataFrame:
    """IVF-style approximate kNN: a k-means coarse quantizer assigns
    every corpus vector to one of ``n_lists`` inverted lists; each
    query scores only the ``n_probe`` nearest lists instead of the
    whole corpus — the classic FAISS-IVF shape on DataFrames.

    At 100 TB the corpus is written bucketed by list id, so a query
    touches n_probe/n_lists of the data (with partition pruning doing
    the skipping); recall/cost trades via n_probe. Output schema
    matches ``knn_bruteforce`` for ``recall_at_k`` grading."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    def _vec(df: DataFrame, keep: str) -> DataFrame:
        # NULL vectors AND vectors carrying a NULL element NPE
        # array_to_vector inside the KMeans fit — drop them here; the
        # fold contract drops them anyway (NULL-propagating cosine)
        return df.filter(
            F.col(vec_col).isNotNull()
            & ~F.exists(F.col(vec_col), lambda x: x.isNull())
        ).select(
            F.col(id_col).alias(keep),
            F.col(vec_col).cast("array<double>").alias(f"_arr_{keep}"),
            l2_norm(F.col(vec_col)).alias(f"_nrm_{keep}"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        )

    # materialize the cleaned corpus projection ONCE: the MLlib fit
    # persists its own internal copy only for the fit's duration, so
    # without this the corpus lineage (for chunked_retrieval_ann, the
    # entire chunk->embed pipeline) executed a second time in the
    # scoring scan below (guide §2.4). Same memory class as the fit's
    # own cache; the direct op is the no-index tier by contract — the
    # production path is the persisted index.
    c = _vec(corpus, "neighbor_id").localCheckpoint(eager=True)
    km = KMeans(k=n_lists, seed=seed, featuresCol="features", predictionCol="list_id")
    model = km.fit(c)
    assigned = model.transform(c).select(
        "neighbor_id", "_arr_neighbor_id", "_nrm_neighbor_id", "list_id")

    # broadcastable centroid table -> each query ranks lists, keeps n_probe
    centroids = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    cdf = corpus.sparkSession.createDataFrame(centroids, f"list_id int, _ctr array<double>")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    probed = (
        q.crossJoin(F.broadcast(
            cdf.withColumn("_ctrn", l2_norm(F.col("_ctr")))))
        .select(
            "query_id", "_qv", "_qn", "list_id",
            cosine_from_norms(
                F.col("_qv"), F.col("_ctr"), F.col("_qn"), F.col("_ctrn")
            ).alias("_cs"),
        )
    )
    w_lists = Window.partitionBy("query_id").orderBy(F.col("_cs").desc(), F.col("list_id"))
    probe_lists = probed.select(
        "query_id", "_qv", "_qn", "list_id", F.row_number().over(w_lists).alias("_pr")
    ).filter(F.col("_pr") <= n_probe).drop("_pr")

    scored = (
        assigned.join(F.broadcast(probe_lists), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine_from_norms(
                F.col("_qv"), F.col("_arr_neighbor_id"),
                F.col("_qn"), F.col("_nrm_neighbor_id"),
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.select(
            "query_id", "neighbor_id",
            F.row_number().over(w).alias("rank"),
            F.round(F.col("_cos"), 6).alias("cosine"),
        )
        .filter(F.col("rank") <= k)
    )


def with_sq8_codes(rows: DataFrame) -> DataFrame:
    """Append the symmetric per-row int8 code columns to rows carrying
    a ``_v array<double>`` vector: scale ``_qs`` = max|x|/127, codes
    ``_v8`` = round(x/_qs) clamped to [-127, 127], and ``_n8`` = the
    norm of the DEQUANTIZED vector so approximate cosines normalize by
    the geometry actually scored. Quantization is row-local (no global
    state), so the SAME expressions serve both the build
    (``build_ivf_index(quantize_int8=True)``) and the refresh
    appenders (``streaming/index_refresh._ivf_append_batch``) — an
    appended tick that lacked the code columns would be silently
    invisible to :func:`knn_ivf_indexed_compressed`'s code-only scan."""
    scale = F.greatest(
        F.aggregate(F.col("_v"), F.lit(0.0),
                    lambda a, x: F.greatest(a, F.abs(x))) / F.lit(127.0),
        F.lit(1e-30))
    return rows.withColumn("_qs", scale).withColumn(
        "_v8", F.transform(
            F.col("_v"),
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(x / F.col("_qs"))
                        .cast("int"))).cast("tinyint"))
    ).withColumn(
        "_n8", F.col("_qs") * F.sqrt(F.aggregate(
            F.col("_v8"), F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"))))


def build_ivf_index(corpus: DataFrame, path: str, *, n_lists: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42, quantize_int8: bool = False) -> None:
    """Persist an IVF index for :func:`knn_ivf_indexed` — the
    vector-side analog of the maintained BM25 postings index
    (streaming/index_refresh.py): pay the coarse quantizer once at
    build time, serve every query from a partition-pruned scan.

    Layout: corpus rows land in one parquet directory per inverted
    list (``partitionBy(list_id)``), each row carrying its
    ``l2_norm`` precomputed at WRITE time so query-time scoring is a
    single dot-product fold per row; a ``{path}_centroids`` sidecar
    (n_lists tiny rows) holds the quantizer. At 100 TB this is the
    layout where ``n_probe``/``n_lists`` of the data is all a query
    can touch — the skipping is directory-level metadata, not a
    filter over a full scan.

    ``quantize_int8=True`` additionally stores a scalar-quantized
    copy of every vector (``_v8 array<tinyint>`` with a per-row
    ``_qs`` scale = max|x|/127 and ``_n8`` = the dequantized norm) —
    the FAISS IVF+SQ8 shape: :func:`knn_ivf_indexed_compressed` then
    generates candidates from a scan that reads ONE byte per
    dimension instead of eight (column pruning keeps ``_v`` out of
    the candidate stage entirely) and re-ranks only the top
    candidates at full precision. Quantization is symmetric per row,
    so dequantization is one multiply and the stored codes are
    engine-portable."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # NULL vectors (and vectors carrying a NULL element) NPE
    # array_to_vector inside the KMeans fit and could never be
    # retrieved (NULL cosine) — excluded from the index
    c = corpus.filter(
        F.col(vec_col).isNotNull()
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
    ).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        l2_norm(F.col(vec_col)).alias("_nrm"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_lists, seed=seed, featuresCol="features",
                   predictionCol="list_id").fit(c)
    rows = model.transform(c).select(id_col, "_v", "_nrm", "list_id")
    if quantize_int8:
        rows = with_sq8_codes(rows)
    (rows.write.mode("overwrite").partitionBy("list_id").parquet(path))
    centroids = [(i, [float(x) for x in ctr])
                 for i, ctr in enumerate(model.clusterCenters())]
    # driver-direct sidecar write (n_lists rows already on the
    # driver as the fitted model's centers) — the
    # createDataFrame+coalesce(1) route pays a serial Python-runner
    # round-trip per defaultParallelism slice (see
    # sources.writers.write_local_sidecar)
    from ..sources.writers import write_local_sidecar
    write_local_sidecar(
        corpus.sparkSession, centroids,
        [("list_id", "int"), ("_ctr", "array<double>")],
        path + "_centroids")
    ctr_df = corpus.sparkSession.read.parquet(path + "_centroids")
    # per-list normalized-space radius sidecar (n_lists rows): the
    # exactness lever of embedding_neardup_indexed's probe bound —
    # computed from the WRITTEN rows so it describes exactly what
    # serves. _ivf_append_batch keeps it fresh across refresh ticks.
    (_ivf_radii_frame(corpus.sparkSession.read.parquet(path), ctr_df)
     .coalesce(1).write.mode("overwrite").parquet(path + "_radii"))


def _ivf_radii_frame(idx_rows: DataFrame, centroids: DataFrame) -> DataFrame:
    """(list_id, rad): each list's max normalized-space distance
    ``||v/||v|| - c/||c||||`` over its members — the per-list radius
    :func:`embedding_neardup_indexed` needs for an EXACT probe bound
    under the index's raw-space assignment (any member v of list L and
    any query u satisfy ``||u^-c^_L|| <= ||u^-v^|| + rad_L``, so every
    list that could hold a qualifying partner is provably probed).

    Zero-norm members can't be placed in normalized space (their
    cosine is NULL everywhere, so they never qualify) — excluded. A
    zero-norm CENTROID yields rad NULL; the serving op probes such
    lists unconditionally rather than guess. A list absent from the
    frame has no scorable member at all."""
    cn = l2_norm(F.col("_ctr"))
    chat = F.when(cn > 0, F.transform(F.col("_ctr"), lambda x: x / cn))
    diff2 = F.zip_with(
        F.col("_v"), F.col("_chat"),
        lambda v, c: (v / F.col("_nrm") - c) * (v / F.col("_nrm") - c))
    d = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda a, x: a + x))
    return (
        idx_rows.filter(F.col("_nrm") > 0)
        .join(F.broadcast(centroids.select(
            "list_id", chat.alias("_chat"))), "list_id")
        .select("list_id", d.alias("_d"))
        .groupBy("list_id").agg(F.max("_d").alias("rad"))
    )


def _ivf_list_radii(spark, path: str) -> dict[int, float | None]:
    """The radius sidecar as a dict (n_lists entries, bounded driver
    traffic). Prefers the persisted ``{path}_radii``; a missing or
    unreadable sidecar (pre-radii index, or a crash mid-rewrite)
    recomputes from the index rows — one column-pruned corpus scan,
    correct but corpus-proportional, so the sidecar is the steady
    state."""
    try:
        rows = spark.read.parquet(path + "_radii").collect()
    except Exception:
        rows = _ivf_radii_frame(
            spark.read.parquet(path).select("list_id", "_v", "_nrm"),
            spark.read.parquet(path + "_centroids")).collect()
    return {r["list_id"]: r["rad"] for r in rows}


def knn_ivf_indexed(spark, path: str, queries: DataFrame | list,
                    k: int = 10,
                    n_probe: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding", *,
                    max_driver_queries: int = 4096) -> DataFrame:
    """Serve IVF kNN from a :func:`build_ivf_index` table. Scores and
    ranking are identical to :func:`knn_ivf` at the same
    (n_lists, seed) — same quantizer, same cosine folds — but the
    corpus scan reads ONLY the probed lists' parquet directories:
    the probe-list ids are resolved against the centroid sidecar
    (n_lists rows — a metadata-scale lookup, like Delta's touched-file
    listing) and pushed into the partitioned read as a static IN
    predicate, so pruning happens at file-listing time
    (plan-asserted in tests).

    The probe ASSIGNMENT — (query, list) pairs bounded by
    |queries| x n_probe, a metadata-scale set like the touched-file
    listing — is ranked DRIVER-side over the collected centroid
    sidecar (n_lists rows) and query set (small by contract) with the
    exact same sequential-fold arithmetic as the in-plan
    ``cosine_from_norms`` (same IEEE-754 accumulation order, so the
    chosen lists are bit-identical to :func:`knn_ivf`'s window plan —
    served≡direct stays pytest-pinned), then shipped as one literal
    broadcast frame. Serving therefore runs exactly two metadata-scale
    collect jobs before the single pruned-scan job. An empty query set
    short-circuits to an empty frame with the contract schema (the
    degenerate ``isin([])`` plan never builds).

    The driver ranking is only safe for interactively-sized query
    frames, so it is CAPPED: a frame larger than
    ``max_driver_queries`` rows (e.g. a recall sweep using the corpus
    as queries) falls back to the fully distributed
    broadcast-centroid window plan — same arithmetic, same ranking
    tiebreaks, no driver materialization — at the price of a
    full-discovery index read (probe lists are then data-dependent,
    so no static directory pruning). A query with a NULL vector
    yields k null-cosine rows (first-n_probe lists by id, the NULLS-
    LAST window order), identical to :func:`knn_ivf` on the same
    input."""
    scored = _ivf_indexed_scored(spark, path, queries, n_probe,
                                 id_col, vec_col,
                                 max_driver_queries=max_driver_queries)
    if scored is None:
        from pyspark.sql.types import (DoubleType, IntegerType,
                                       StructField, StructType)
        idx_schema = _idx_schema(spark, path)  # cached per (path, mtime)
        if idx_schema is None:
            idx_schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], StructType([
            StructField("query_id", _query_id_type(queries, id_col)),
            StructField("neighbor_id", idx_schema[id_col].dataType),
            StructField("rank", IntegerType(), False),
            StructField("cosine", DoubleType()),
        ]))
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.select(
            "query_id", "neighbor_id",
            F.row_number().over(w).alias("rank"),
            F.round(F.col("_cos"), 6).alias("cosine"),
        )
        .filter(F.col("rank") <= k)
    )


def _query_id_type(queries, id_col: str):
    """Spark type of the query id — from the frame's schema, or
    inferred (str -> string, else long) for a literal query list."""
    from pyspark.sql.types import LongType, StringType

    if isinstance(queries, (list, tuple)):
        if any(isinstance(q[0], str) for q in queries):
            return StringType()
        return LongType()
    return queries.schema[id_col].dataType


_IDX_SCHEMA_CACHE: dict[tuple[str, float], object] = {}


def _idx_schema(spark, path: str):
    """Schema of a build_ivf_index layout, cached per (path, dir
    mtime). None when the path can't be statted driver-side (remote
    FS) — the caller falls back to Spark's own inference."""
    import os

    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        return None
    if key not in _IDX_SCHEMA_CACHE:
        for stale in [k for k in _IDX_SCHEMA_CACHE if k[0] == path]:
            del _IDX_SCHEMA_CACHE[stale]  # superseded build of this path
        _IDX_SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _IDX_SCHEMA_CACHE[key]


def _ivf_indexed_scored_distributed(spark, path: str, queries: DataFrame,
                                    n_probe: int, id_col: str,
                                    vec_col: str) -> DataFrame:
    """Distributed twin of :func:`_ivf_indexed_scored` for
    corpus-scale query frames (the pre-driver-ranking served shape):
    queries stay a DataFrame, the n_lists-row centroid sidecar is the
    broadcast side of a crossJoin, and a per-query window keeps the
    n_probe best lists. Arithmetic and tiebreaks (``_cs`` desc NULLS
    last, ``list_id`` asc) are identical to the driver ranking, so
    results match the fast path exactly (pytest-pinned). The index
    scan is a full-discovery read joined on ``list_id`` — probe lists
    are data-dependent here, so static directory pruning is
    impossible, which is the honest cost of a query side too big to
    materialize; the n_lists-key join shuffle is AQE-skew territory
    and the plan leaves it to AQE."""
    cdf = spark.read.parquet(path + "_centroids")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    probed = (
        q.crossJoin(F.broadcast(cdf.withColumn("_ctrn", l2_norm(F.col("_ctr")))))
        .select(
            "query_id", "_qv", "_qn", "list_id",
            cosine_from_norms(
                F.col("_qv"), F.col("_ctr"), F.col("_qn"), F.col("_ctrn")
            ).alias("_cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cs").desc(), F.col("list_id").asc())
    probe_lists = (
        probed.select("query_id", "_qv", "_qn", "list_id",
                      F.row_number().over(w).alias("_pr"))
        .filter(F.col("_pr") <= n_probe).drop("_pr")
    )
    idx = apply_ivf_tombstones(spark, path, spark.read.parquet(path))
    return (
        idx.join(probe_lists, "list_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"),
            cosine_from_norms(
                F.col("_qv"), F.col("_v"), F.col("_qn"), F.col("_nrm")
            ).alias("_cos"),
        )
    )


def _ivf_probe_base(spark, path: str, queries: DataFrame,
                    n_probe: int, id_col: str,
                    vec_col: str, *,
                    max_driver_queries: int = 4096):
    """Shared FRONT HALF of the served-IVF paths: driver-side probe
    ranking + the pruned index read. Returns ``(probe_lists, idx)``
    — the broadcast-ready (query, list) assignment frame carrying
    ``_qv``/``_qn`` and the directory-pruned index frame — or
    ``None`` (no probeable query), or the sentinel ``"distributed"``
    (query frame over the cap; the caller picks its distributed
    plan). :func:`_ivf_indexed_scored` joins the halves into exact
    cosines; :func:`knn_ivf_indexed_compressed` scores the same
    probe assignment against the int8 code columns instead.

    The centroid sidecar is read driver-side through pyarrow when the
    path allows (no Spark job for n_lists tiny rows), falling back to
    a Spark collect; ranking uses the exact sequential-fold arithmetic
    of the in-plan ``cosine_from_norms`` (same IEEE-754 accumulation
    order), so probed lists are bit-identical to :func:`knn_ivf`'s
    window plan — served≡direct stays pytest-pinned.

    The query collect is capped at ``max_driver_queries`` rows; a
    larger frame routes to
    :func:`_ivf_indexed_scored_distributed` (result-identical, no
    driver materialization) instead of risking a driver OOM on a
    contract violation. NULL-vector queries probe the first n_probe
    lists with a NULL cosine everywhere — the NULLS-LAST/list_id-asc
    order the window plan produces — so degenerate inputs keep the
    k-null-rows output contract instead of vanishing.

    ``queries`` may also be a LITERAL list of ``(id, vector)`` tuples
    — the true serving shape, where the query embedding is already in
    the application's hand: plan construction then runs ZERO Spark
    jobs before the single pruned-scan job (no collect, no scan of a
    query frame). Literal queries are interactive-sized by
    construction, so the distributed fallback does not apply."""
    import math

    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   StructField, StructType)

    def _fold_dot(a, b) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    try:
        import pyarrow.parquet as pq
        tbl = pq.read_table(path + "_centroids")
        centroids = list(zip(tbl.column("list_id").to_pylist(),
                             tbl.column("_ctr").to_pylist()))
    except Exception:
        centroids = [(r["list_id"], r["_ctr"]) for r in
                     spark.read.parquet(path + "_centroids").collect()]
    ctr = sorted((lid, [float(x) for x in c]) for lid, c in centroids)
    ctr_norms = [(lid, c, math.sqrt(_fold_dot(c, c))) for lid, c in ctr]
    if isinstance(queries, (list, tuple)):
        if len(queries) > max_driver_queries:
            # the cap protects the driver on BOTH entry shapes: a
            # literal list this large is already a driver-side object,
            # but expanding it |Q| x n_probe and shipping it through
            # createDataFrame multiplies the footprint — route
            # corpus-scale query sets through a DataFrame instead,
            # which falls back to the distributed plan
            raise ValueError(
                f"literal query list has {len(queries)} entries, over "
                f"max_driver_queries={max_driver_queries}; pass the "
                f"queries as a DataFrame so corpus-scale sets route to "
                f"the distributed plan")
        q_rows = [(q[0], q[1]) for q in queries]
    else:
        q_rows = (queries.select(F.col(id_col), F.col(vec_col))
                  .limit(max_driver_queries + 1).collect())
        if len(q_rows) > max_driver_queries:
            return "distributed"

    probe_rows = []
    for r in q_rows:
        qid, qv = r[0], r[1]
        if qv is None:
            # window-plan parity for degenerate queries: every list
            # scores NULL, desc puts NULLs last, ties break list_id
            # asc — so the first n_probe list ids are probed and every
            # emitted cosine is NULL (ctr_norms is list_id-sorted)
            for lid, _c, _cn in ctr_norms[:n_probe]:
                probe_rows.append((qid, None, 0.0, lid))
            continue
        qv = [float(x) for x in qv]
        qn = math.sqrt(_fold_dot(qv, qv))

        def _cs(c, cn):
            # cosine_from_norms semantics: NULL on zero denom, NULL on
            # length mismatch (zip_with pads -> NULL-propagating fold)
            if len(c) != len(qv) or qn * cn == 0:
                return None
            return _fold_dot(qv, c) / (qn * cn)

        scored_lists = [(_cs(c, cn), lid) for lid, c, cn in ctr_norms]
        # window orderBy(_cs desc, list_id asc); desc puts NULLs last
        ranked = sorted(scored_lists,
                        key=lambda t: (t[0] is None,
                                       -t[0] if t[0] is not None else 0.0,
                                       t[1]))
        for _cs_v, lid in ranked[:n_probe]:
            probe_rows.append((qid, qv, qn, lid))

    if not probe_rows:
        return None
    probe_lists = spark.createDataFrame(probe_rows, StructType([
        StructField("query_id", _query_id_type(queries, id_col)),
        StructField("_qv", ArrayType(DoubleType())),
        StructField("_qn", DoubleType()),
        StructField("list_id", IntegerType()),
    ]))
    touched = sorted({r[3] for r in probe_rows})
    idx = _pruned_index_read(spark, path, touched)
    if idx is None:
        return None
    return probe_lists, idx


def _tombstones_applied_through(path: str) -> int:
    """Read the ``{path}/_tombstones_applied.json`` marker a
    compaction/rebuild stamps into the layout it swaps in (round 12
    review fix): rewritten files read as epoch -1, so if a crash lands
    between the swap and the sidecar rmtree, the already-APPLIED
    tombstones would re-kill the live rows they were applied to.
    The marker records the highest tombstone tick physically applied;
    serve-time filtering ignores ticks at or below it. -1 = no marker
    (every tombstone is live). Underscore-prefixed files are invisible
    to the parquet reader, so the marker travels atomically with the
    directory swap."""
    import json
    import os

    marker = os.path.join(path, "_tombstones_applied.json")
    if not os.path.isfile(marker):
        return -1
    with open(marker) as f:
        return int(json.load(f)["applied_through"])


def _write_tombstones_applied(stage_dir: str, applied_through: int) -> None:
    """Stamp the applied-through marker into a STAGED index layout
    (before its swap — see :func:`_tombstones_applied_through`)."""
    import json
    import os

    with open(os.path.join(stage_dir, "_tombstones_applied.json"),
              "w") as f:
        json.dump({"applied_through": int(applied_through)}, f)


def apply_ivf_tombstones(spark, path: str, idx: DataFrame) -> DataFrame:
    """Serve-time liveness filter for a :func:`build_ivf_index` layout
    with a ``{path}_tombstones`` sidecar (round 12 — the churn tier:
    the reference's Cortex Search keeps serving CHANGED documents
    within target_lag, /root/reference/README.md:83,117, where the
    r11 CDF loops refused update/delete feeds outright).

    Contract: the sidecar holds one ``tick=<commit_version>`` dir per
    churn commit, each row a ``key`` killed AS OF that commit. A row
    of the index is dead iff some tombstone for its key is NEWER than
    the row's own refresh epoch — the epoch is derived from the file
    name the row was published under (``tick<N>-…`` by
    :func:`~..streaming.index_refresh._ivf_append_batch`; build-time
    files carry no prefix and read as epoch -1), so an updated vector
    re-appended at the tombstone's own commit version survives
    (tick == epoch) while every earlier copy dies. No schema change,
    no read of unprobed data: the epoch is ``input_file_name()``
    arithmetic inside the scan projection, and the tombstone frame is
    churn-sized by construction (broadcast).

    ``key`` is the index's id column; for a chunk index
    (``{path}_chunkmeta`` present) tombstones are doc-level, keyed by
    ``_dkey = vec_id div chunk_key_scale``, so one tombstone kills
    every chunk of the dead document. Without a sidecar the filter is
    the identity — the steady state pays nothing."""
    import json
    import os

    tomb_dir = path + "_tombstones"
    if not os.path.isdir(tomb_dir):
        return idx
    reserved = {"_v", "_nrm", "list_id", "_v8", "_qs", "_n8"}
    id_cols = [c for c in idx.columns if c not in reserved]
    if len(id_cols) != 1:
        raise ValueError(
            f"cannot infer the id column of {path} for tombstone "
            f"filtering: non-reserved columns {id_cols}")
    key = F.col(id_cols[0])
    meta_f = os.path.join(path + "_chunkmeta", "meta.json")
    if os.path.isfile(meta_f):
        with open(meta_f) as f:
            scale = int(json.load(f)["chunk_key_scale"])
        key = F.expr(f"`{id_cols[0]}` div {scale}").cast("long")
    # ticks at or below the applied-through marker were PHYSICALLY
    # applied by a compaction/rebuild whose crash window left the
    # sidecar behind — they must not re-kill the rewritten (epoch -1)
    # copies of the keys they already killed (round-12 review fix)
    from ..streaming.liveness import live_filter

    return live_filter(
        idx, tomb_dir, key, ivf_row_epoch(),
        applied_through=_tombstones_applied_through(path))


def ivf_row_epoch() -> Column:
    """Publication epoch of an IVF-layout row, derived from the
    ``tick<N>-`` file-name prefix the refreshers publish under —
    ``input_file_name()`` arithmetic inside the scan projection, no
    schema change. The when() guard keeps the cast off the no-match
    "" (ANSI mode would throw); prefix-less (build/compaction-written)
    files read as epoch -1, older than every commit version. Shared
    by :func:`apply_ivf_tombstones` and the curation loop's
    re-insert guard (round 13)."""
    m = F.regexp_extract(F.input_file_name(), r"tick(\d+)-\d+\.parquet$", 1)
    return F.when(m != F.lit(""), m.cast("long")) \
        .otherwise(F.lit(-1).cast("long"))


def _pruned_index_read(spark, path: str,
                       touched: list[int]) -> DataFrame | None:
    """The directory-pruned index scan shared by the served paths:
    list ONLY the probed lists' directories (basePath keeps list_id
    as a partition column); the isin filter stays on top so the plan
    records the pruning predicate in PartitionFilters either way —
    at serve time the driver never even stats the unprobed dirs.
    An EMPTY inverted list writes no directory (partitionBy emits
    dirs only for present values) while its centroid still exists in
    the sidecar — probing it must contribute zero rows, not a
    path-not-found error, so only existing dirs are listed; when the
    path isn't driver-statable (remote FS) fall back to the full
    discovery read, which tolerates missing lists by construction.
    The index schema is cached per (path, mtime) so repeat queries
    skip the footer-inference read — index metadata caching, the
    serving-system steady state (a rebuild swaps the directory and
    so changes its mtime, invalidating the entry). Returns None when
    no probed list has a directory."""
    import os

    reader = spark.read.option("basePath", path)
    cached = _idx_schema(spark, path)
    if cached is not None:
        reader = reader.schema(cached)
    if os.path.isdir(path):
        dirs = [f"{path}/list_id={t}" for t in touched
                if os.path.isdir(os.path.join(path, f"list_id={t}"))]
        if not dirs:
            return None
        return apply_ivf_tombstones(
            spark, path,
            reader.parquet(*dirs).filter(F.col("list_id").isin(touched)))
    # not driver-statable (remote FS): full-discovery read
    return apply_ivf_tombstones(
        spark, path,
        spark.read.parquet(path).filter(F.col("list_id").isin(touched)))


def _ivf_indexed_scored(spark, path: str, queries: DataFrame,
                        n_probe: int, id_col: str,
                        vec_col: str, *,
                        max_driver_queries: int = 4096) -> DataFrame | None:
    """Exact-cosine scoring subplan of the served-IVF paths
    (:func:`_ivf_probe_base` + the broadcast join), returning RAW
    (query_id, neighbor_id, _cos) — :func:`knn_ivf_indexed` windows
    it into per-query ranks; :func:`~.retrieval.hybrid_search_ann`
    cuts it with orderBy+limit. None = no probeable query; an
    over-cap query frame routes to the distributed window plan."""
    base = _ivf_probe_base(spark, path, queries, n_probe, id_col,
                           vec_col, max_driver_queries=max_driver_queries)
    if base is None:
        return None
    if base == "distributed":
        return _ivf_indexed_scored_distributed(
            spark, path, queries, n_probe, id_col, vec_col)
    probe_lists, idx = base
    return (
        idx.join(F.broadcast(probe_lists), "list_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"),
            cosine_from_norms(
                F.col("_qv"), F.col("_v"), F.col("_qn"), F.col("_nrm")
            ).alias("_cos"),
        )
    )


def knn_ivf_indexed_compressed(spark, path: str, queries: DataFrame | list,
                               k: int = 10, n_probe: int = 8,
                               rerank: int | None = 100,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """Serve IVF kNN from the int8-quantized code columns of a
    ``build_ivf_index(quantize_int8=True)`` layout — the FAISS
    IVF+SQ8 serving shape on DataFrames. The CANDIDATE stage scores
    approximate cosines against ``_v8``/``_qs``/``_n8`` only, so
    column pruning keeps the full-precision ``_v`` (8 bytes/dim) out
    of the ranking scan entirely — one byte per dimension read where
    the exact path reads eight (plan-asserted via ReadSchema in
    pytest). Two modes:

    - ``rerank=None`` — fully compressed: ranks and returns the
      approximate cosines; ``_v`` is never read anywhere in the plan.
      Recall is gated in pytest (int8 symmetric quantization loses
      <1e-2 cosine on unit-scale vectors, so the SLO holds with
      margin).
    - ``rerank=R`` — refine: the top-R approximate candidates per
      query re-score at full precision (one broadcast join of the
      R-row cut back to the pruned index's ``_v``), then the exact
      top-k is cut. With R >= the probed lists' row count this equals
      :func:`knn_ivf_indexed` exactly (pytest-pinned).

    Output contract matches :func:`knn_ivf_indexed`:
    (query_id, neighbor_id, rank, cosine)."""
    # validate the layout BEFORE probe resolution: an empty query set
    # (or probes landing only on absent lists) must still refuse a
    # non-quantized index loudly — a well-shaped empty result would
    # mask the misconfiguration until the first non-empty query
    idx_schema = _idx_schema(spark, path)
    if idx_schema is None:
        idx_schema = spark.read.parquet(path).schema
    if "_v8" not in idx_schema.fieldNames():
        raise ValueError(
            f"{path} carries no int8 codes — build it with "
            f"build_ivf_index(..., quantize_int8=True)")
    base = _ivf_probe_base(spark, path, queries, n_probe, id_col, vec_col)
    if base == "distributed":
        raise ValueError(
            "knn_ivf_indexed_compressed is the interactive serving "
            "tier (driver-ranked probes); for corpus-scale query "
            "frames use knn_ivf_indexed's distributed fallback")
    if base is None:
        from pyspark.sql.types import (DoubleType, IntegerType,
                                       StructField, StructType)
        return spark.createDataFrame([], StructType([
            StructField("query_id", _query_id_type(queries, id_col)),
            StructField("neighbor_id", idx_schema[id_col].dataType),
            StructField("rank", IntegerType(), False),
            StructField("cosine", DoubleType()),
        ]))
    probe_lists, idx = base
    # approximate cosine from the codes: dot(q, dequant(c)) =
    # _qs * fold(q * c8); normalized by the DEQUANTIZED norm _n8 so
    # the geometry scored is exactly the stored approximation
    dot8 = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_v8"),
                   lambda q, c: q * c.cast("double")),
        F.lit(0.0), lambda a, x: a + x)
    denom = F.col("_qn") * F.col("_n8")
    cand = (
        idx.select("list_id", id_col, "_v8", "_qs", "_n8")
        .join(F.broadcast(probe_lists), "list_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", "_qv", "_qn",
                F.col(id_col).alias("neighbor_id"),
                F.when(denom != 0, F.col("_qs") * dot8 / denom)
                .alias("_cos8"))
    )
    w8 = Window.partitionBy("query_id").orderBy(
        F.col("_cos8").desc(), F.col("neighbor_id").asc())
    if rerank is None:
        return (
            cand.select(
                "query_id", "neighbor_id",
                F.row_number().over(w8).alias("rank"),
                F.round(F.col("_cos8"), 6).alias("cosine"))
            .filter(F.col("rank") <= k)
        )
    top_r = (cand.withColumn("_r8", F.row_number().over(w8))
             .filter(F.col("_r8") <= int(rerank))
             .select("query_id", "_qv", "_qn", "neighbor_id"))
    # broadcast the |Q| x R candidate cut (the SMALL side) against the
    # pruned index's full-precision columns
    exact = (
        idx.select(F.col(id_col).alias("neighbor_id"), "_v", "_nrm")
        .join(F.broadcast(top_r), "neighbor_id")
        .select("query_id", "neighbor_id",
                cosine_from_norms(F.col("_qv"), F.col("_v"),
                                  F.col("_qn"), F.col("_nrm"))
                .alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        exact.select(
            "query_id", "neighbor_id",
            F.row_number().over(w).alias("rank"),
            F.round(F.col("_cos"), 6).alias("cosine"))
        .filter(F.col("rank") <= k)
    )


# the GEMM-path increment bound of embedding_neardup_indexed — module
# constant so the CDF curation loop's prefetch collects with exactly
# the cap the op itself would use
_MAX_DRIVER_QUERIES = 16384


def _indexed_query_rows(new_vecs: DataFrame, id_col: str, vec_col: str,
                        cap: int) -> list:
    """The GEMM path's bounded increment collect (cap + 1 rows to
    detect overflow), factored out of :func:`embedding_neardup_indexed`
    so the CDF curation loop can PREFETCH it concurrently with the
    previous commit's absorb — it reads ONLY the batch, none of the
    index state the rest of the construction consults (round 14,
    guide §2.6)."""
    return (new_vecs.filter(
        F.col(vec_col).isNotNull()
        & ~F.exists(F.col(vec_col), lambda x: x.isNull()))
        .select(id_col, F.col(vec_col).cast("array<double>"))
        .limit(cap + 1).collect())


def embedding_neardup_indexed(spark, path: str, new_vecs: DataFrame,
                              threshold: float = 0.9, *,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              max_driver_queries: int = _MAX_DRIVER_QUERIES,
                              _q_rows: list | None = None) -> DataFrame:
    """INCREMENTAL embedding near-dup against a persisted
    :func:`build_ivf_index` corpus — the vector twin of
    :func:`~.dedup.minhash_neardup_incremental`: an arriving batch is
    checked for near-duplicates (cosine >= threshold, rounded to 6 dp)
    of the already-indexed corpus at increment-proportional cost. The
    corpus is NEVER re-scanned from source, never shuffled, and only
    its probed list directories are even listed — the SemDedup
    steady-state where a daily batch dedupes against 100 TB of
    history through the index's directory metadata.

    EXACT, not approximate: each increment row probes every list whose
    normalized centroid lies within ``r + rad_L`` of the row's
    normalized vector (``r = sqrt(2-2t)``; ``rad_L`` from the
    ``{path}_radii`` sidecar maintained by build and refresh ticks) —
    the triangle inequality guarantees any list holding a qualifying
    partner is probed, under the index's raw-space assignment or any
    other. Cost adapts to threshold tightness exactly like the
    bucketed pair stage's default-exact mode.

    Plan shape: increments up to ``max_driver_queries`` rows take the
    GEMM path — the increment is collected (the same movement the
    blocked variant's broadcast makes), probe sets resolve in one
    driver numpy product against the centroid matrix (ZERO Spark jobs
    before the single scan), and the pruned index STREAMS through
    ``mapInPandas`` scoring each Arrow batch against its list's probe
    matrix in one float64 GEMM (the fold variant pays an interpreted
    HOF dot per PAIR — measured 10.6 s vs sub-second on the sf1 bench
    increment at the loose threshold). Numerics follow the blocked
    kernel's discipline: 1e-6 slack prefilter in numpy, the exact
    ``round(_, 6) >= threshold`` contract applied JVM-side. A larger
    increment falls back to the fully in-plan shape — broadcast
    crossJoin probe resolution (codegen folds), one bounded collect
    (distinct probed list ids), broadcast scoring join — identical
    results (fold≡GEMM pytest-pinned), no driver materialization; a
    corpus-scale "increment" belongs in
    :func:`embedding_neardup_pairs_bucketed` over the union.

    Output (id_1, id_2, cosine): id_1 < id_2 with BOTH orientations
    kept (an increment id bears no order relation to corpus ids —
    unlike the probe-slice ops' strict probe<corpus filter); self-ids
    excluded; increment rows with NULL vectors, NULL elements, or zero
    norm can never qualify and are dropped."""
    idx_schema = _idx_schema(spark, path)
    if idx_schema is None:
        idx_schema = spark.read.parquet(path).schema
    id_type = new_vecs.schema[id_col].dataType
    if idx_schema[id_col].dataType != id_type:
        raise ValueError(
            f"new_vecs.{id_col} type {id_type.simpleString()} must "
            f"match the index ({idx_schema[id_col].dataType.simpleString()})")
    id_sql = id_type.simpleString()

    def _empty() -> DataFrame:
        return spark.createDataFrame(
            [], f"id_1 {id_sql}, id_2 {id_sql}, cosine double")

    import math

    try:
        import pyarrow.parquet as pq
        tbl = pq.read_table(path + "_centroids")
        centroids = list(zip(tbl.column("list_id").to_pylist(),
                             tbl.column("_ctr").to_pylist()))
    except Exception:
        centroids = [(r["list_id"], r["_ctr"]) for r in
                     spark.read.parquet(path + "_centroids").collect()]
    radii = _ivf_list_radii(spark, path)
    r2 = max(0.0, 2.0 - 2.0 * (float(threshold) - 1.001e-6))
    r = math.sqrt(r2)
    lists = []
    for lid, c in centroids:
        if lid not in radii:
            continue  # no scorable member in this list
        rad = radii[lid]
        cn = math.sqrt(sum(float(x) * float(x) for x in c))
        always = rad is None or cn == 0.0
        chat = ([float(x) / cn for x in c] if cn > 0
                else [0.0] * len(c))
        bound2 = 0.0 if always else (r + float(rad)) ** 2
        lists.append((int(lid), chat, float(bound2), bool(always)))
    if not lists:
        return _empty()

    # GEMM path for bounded increments: collect the cleaned increment
    # (cap + 1 to detect overflow — or take the caller's prefetched
    # rows, see _indexed_query_rows), resolve probe sets in one driver
    # numpy product, stream the pruned index through mapInPandas
    q_rows = (_q_rows if _q_rows is not None else _indexed_query_rows(
        new_vecs, id_col, vec_col, max_driver_queries))
    if len(q_rows) <= max_driver_queries:
        return _indexed_pairs_gemm(spark, path, q_rows, lists,
                                   threshold, id_col, id_sql, _empty)

    ctr_lit = spark.createDataFrame(
        lists, "list_id int, _chat array<double>, _bound2 double, "
               "_always boolean")

    q = new_vecs.filter(
        F.col(vec_col).isNotNull()
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
    ).select(
        F.col(id_col).alias("_qid"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    ).filter(F.col("_qn") > 0)
    # ||u^ - c^||^2 = 2 - 2*(u.c^)/||u|| — one codegen fold per
    # (row, list); a dimension-mismatched row folds NULL and drops,
    # same as its (NULL-cosine) pairs would
    dot = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_chat"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    d2 = F.lit(2.0) - F.lit(2.0) * dot / F.col("_qn")
    # increment-bounded probe fan-out, referenced twice (the touched-
    # list collect and the scoring join): localCheckpoint materializes
    # it once instead of re-running the crossJoin folds per reference
    probe_rows = (
        q.crossJoin(F.broadcast(ctr_lit))
        .filter(F.col("_always") | (d2 <= F.col("_bound2")))
        .select("list_id", "_qid", "_qv", "_qn")
        .localCheckpoint(eager=True)
    )
    touched = sorted(
        r[0] for r in probe_rows.select("list_id").distinct().collect())
    if not touched:
        return _empty()
    idx = _pruned_index_read(spark, path, touched)
    if idx is None:
        return _empty()
    return (
        idx.join(F.broadcast(probe_rows), "list_id")
        .filter(F.col(id_col) != F.col("_qid"))
        .select(
            F.least(F.col("_qid"), F.col(id_col)).alias("id_1"),
            F.greatest(F.col("_qid"), F.col(id_col)).alias("id_2"),
            F.round(cosine_from_norms(
                F.col("_qv"), F.col("_v"), F.col("_qn"), F.col("_nrm")
            ), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _indexed_pairs_gemm(spark, path: str, q_rows, lists,
                        threshold: float, id_col: str, id_sql: str,
                        empty) -> DataFrame:
    """GEMM half of :func:`embedding_neardup_indexed`: driver-side
    probe resolution over the collected increment, then one
    ``mapInPandas`` pass over the directory-pruned index — each Arrow
    batch scores against its list's probe matrix in a single float64
    product. Numerics are the blocked kernel's: 1e-6 slack prefilter
    in numpy against RAW scores, the exact ``round(_, 6) >=
    threshold`` decimal contract applied JVM-side on top
    (fold≡GEMM is pytest-pinned). The corpus-side norm is the STORED
    ``_nrm`` (the build-time sequential fold), so the denominator
    matches the fold path bit-for-bit on that side."""
    import numpy as np
    import pandas as pd

    d = len(lists[0][1])
    clean = [(r[0], r[1]) for r in q_rows if len(r[1]) == d]
    if not clean:
        return empty()
    qids = [c[0] for c in clean]
    Q = np.array([c[1] for c in clean], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    ok = qn > 0
    if not ok.all():
        qids = [qid for qid, k in zip(qids, ok) if k]
        Q, qn = Q[ok], qn[ok]
    if not len(qids):
        return empty()
    U = Q / qn[:, np.newaxis]
    lids = [e[0] for e in lists]
    Chat = np.array([e[1] for e in lists], dtype=np.float64)
    bound2 = np.array([e[2] for e in lists], dtype=np.float64)
    always = np.array([e[3] for e in lists], dtype=bool)
    d2 = 2.0 - 2.0 * (U @ Chat.T)
    mask = always[np.newaxis, :] | (d2 <= bound2[np.newaxis, :])
    per_list = {}
    for j, lid in enumerate(lids):
        sel = np.nonzero(mask[:, j])[0]
        if len(sel):
            per_list[lid] = ([qids[i] for i in sel],
                             Q[sel].T.copy(), qn[sel])
    if not per_list:
        return empty()
    idx = _pruned_index_read(spark, path, sorted(per_list))
    if idx is None:
        return empty()
    slack = float(threshold) - 1.001e-6

    def score(batches):
        for pdf in batches:
            for lid, grp in pdf.groupby("list_id"):
                ent = per_list.get(int(lid))
                if ent is None:
                    continue
                qids_l, Pt, pn = ent
                C = np.stack(grp["_v"].to_numpy()).astype(np.float64)
                cn = grp["_nrm"].to_numpy(dtype=np.float64)
                cids = grp[id_col].to_numpy()
                qarr = np.array(qids_l, dtype=object)
                denom = np.outer(cn, pn)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = (C @ Pt) / denom
                keep = (denom != 0) & (cos >= slack) & (
                    qarr[np.newaxis, :] != cids[:, np.newaxis])
                ci, pi = np.nonzero(keep)
                if not len(ci):
                    continue
                yield pd.DataFrame({
                    "_qid": [qids_l[p] for p in pi],
                    "_cid": cids[ci], "_raw": cos[ci, pi]})

    raw = (idx.select("list_id", id_col, "_v", "_nrm")
           .mapInPandas(score, f"_qid {id_sql}, _cid {id_sql}, _raw double"))
    return (
        raw.select(
            F.least(F.col("_qid"), F.col("_cid")).alias("id_1"),
            F.greatest(F.col("_qid"), F.col("_cid")).alias("id_2"),
            F.round(F.col("_raw"), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 20) -> float:
    """Recall@k of an approximate kNN result against the brute-force
    ground truth (both shaped (query_id, neighbor_id, rank)). Driver-side
    scalar — evaluation metric, not a pipeline operator."""
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hits = a.join(e, ["query_id", "neighbor_id"]).count()
    total = e.count()
    return hits / total if total else 1.0
