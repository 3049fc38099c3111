"""Hybrid retrieval (AI6): filters, fusion, and vector-recall sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
from snowflake_medtech_vigilance_lakehouse_spark.operators.retrieval import hybrid_search


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    df = docs.join(emb, "doc_id")
    df.cache().count()
    return df


def test_metadata_filter_is_honored(corpus):
    out = hybrid_search(
        corpus, query_terms=("spark", "merge"),
        metadata_filter=F.col("source") == "src0", k=10,
    )
    allowed = {r["doc_id"] for r in corpus.filter(F.col("source") == "src0").select("doc_id").collect()}
    got = [r["doc_id"] for r in out.collect()]
    assert got and set(got) <= allowed


def test_pure_vector_mode_matches_bruteforce_knn(corpus, spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 3).first()
    qvec = list(qrow["embedding"])
    hybrid = hybrid_search(
        corpus, query_terms=("spark",), query_vec=qvec, w_lexical=0.0, k=10,
    )
    ground = sim.knn_bruteforce(emb, emb.filter(F.col("vec_id") == 3), k=10)
    # hybrid with w_lexical=0 ranks purely by cosine; the query doc
    # itself (cosine 1.0) leads, then the kNN order follows
    h_ids = [r["doc_id"] for r in hybrid.orderBy("rank").collect()]
    g_ids = [r["neighbor_id"] for r in ground.orderBy("rank").collect()]
    assert h_ids[0] == 3
    assert h_ids[1:6] == g_ids[:5]


def test_rrf_and_weighted_fusion_return_k(corpus):
    for fusion in ("weighted", "rrf"):
        out = hybrid_search(
            corpus, query_terms=("spark", "window"), k=7, fusion=fusion,
        ).collect()
        assert len(out) == 7
        assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(range(1, 8))


def test_deterministic_across_runs(corpus):
    a = hybrid_search(corpus, query_terms=("spark", "batch"), k=15).collect()
    b = hybrid_search(corpus, query_terms=("spark", "batch"), k=15).collect()
    assert a == b


def test_rrf_exact_ranks_match_bruteforce_on_random_scores(corpus, spark):
    """Property check of the distributed RRF algorithm (bounded
    survivor cut + conditional-count rank backfill): for random score
    profiles the fused top-k must equal a brute-force global-rank
    computation done driver-side."""
    import random

    rng = random.Random(1234)
    for trial, w_lex in [(0, 0.5), (1, 0.3), (2, 0.8)]:
        n = 400
        # adversarial score ties: quantize so many docs share scores
        rows = [
            (i,
             "spark merge " * rng.randint(0, 3) + "filler " * rng.randint(1, 4),
             [round(rng.uniform(-1, 1), 1)] * 4)
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, embedding array<double>"
        )
        qv = [1.0, 0.5, -0.25, 0.125]
        out = hybrid_search(
            df, query_terms=("spark", "merge"), query_vec=qv,
            k=25, w_lexical=w_lex, fusion="rrf",
        ).collect()

        # brute force: replicate lexical + vector scores, rank globally
        from snowflake_medtech_vigilance_lakehouse_spark.operators.text import bm25_scores
        lex = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ("spark", "merge")).collect()}
        import math
        def cos(v):
            # mirror functions/vectors.py fold order exactly so doubles
            # are bit-identical (ulp differences reshuffle tie groups)
            num = 0.0
            for a, b in zip(v, qv):
                num += a * b
            sa = 0.0
            for a in v:
                sa += a * a
            sb = 0.0
            for b in qv:
                sb += b * b
            denom = math.sqrt(sa) * math.sqrt(sb)
            return None if denom == 0 else num / denom
        ls = {i: lex.get(i, 0.0) for i, _, _ in rows}
        vs = {i: (cos(v) if cos(v) is not None else -1.0) for i, _, v in rows}
        rank_l = {d: r + 1 for r, (_, d) in enumerate(
            sorted(((-ls[d], d) for d in ls)))}
        rank_v = {d: r + 1 for r, (_, d) in enumerate(
            sorted(((-vs[d], d) for d in vs)))}
        fused = sorted(
            ((-(w_lex / (60 + rank_l[d]) + (1 - w_lex) / (60 + rank_v[d])), d)
             for d in ls))
        want = [(d, r + 1) for r, (_, d) in enumerate(fused[:25])]
        got = [(r["doc_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
        assert got == want, f"trial {trial} w={w_lex}"


def test_query_vec_dataframe_must_have_exactly_one_row(corpus, spark, sf_dir):
    """The 1-row probe contract is enforced in-plan: a 0-row probe must
    raise (not silently return an empty result via crossJoin
    annihilation) and a multi-row probe must raise (not duplicate and
    corrupt every candidate's score)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ok = hybrid_search(
        corpus, query_terms=("spark",),
        query_vec=emb.filter(F.col("vec_id") == 3).select("embedding"), k=5,
    )
    assert ok.count() == 5

    empty = emb.filter(F.col("vec_id") < 0).select("embedding")
    with pytest.raises(Exception, match="exactly 1 row"):
        hybrid_search(corpus, query_terms=("spark",), query_vec=empty, k=5).collect()

    two = emb.filter(F.col("vec_id").isin(3, 4)).select("embedding")
    with pytest.raises(Exception, match="exactly 1 row"):
        hybrid_search(corpus, query_terms=("spark",), query_vec=two, k=5).collect()


def test_hybrid_plan_keeps_topk_cuts_and_no_global_window(corpus):
    """Plan-regression guard (round-2 task #7): every cut in
    hybrid_search must compile to TakeOrderedAndProject (per-partition
    heaps), the only Window allowed is the final rank over the <=k
    survivors, every crossJoin must be a broadcast, and no
    materialization node (persist/checkpoint scan) may appear. Fails
    if the round-1 global-sort-window shape or the round-3 checkpoint
    reappears."""
    qv = [1.0] * 8
    for fusion, min_cuts in (("weighted", 1), ("rrf", 3)):
        out = hybrid_search(
            corpus, query_terms=("spark", "merge"), query_vec=qv,
            k=20, fusion=fusion,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # rrf: two survivor cuts + final top-k; weighted: final top-k
        assert plan.count("TakeOrderedAndProject") >= min_cuts, fusion
        # the only Window is the final row_number over <=k rows
        assert plan.count("Window") <= 1, fusion
        # probe/stats crossJoins must broadcast, never nested-loop the
        # candidate set
        assert "CartesianProduct" not in plan, fusion
        # no localCheckpoint inside the operator: shared work comes
        # from ReuseExchange, not storage blocks (the round-3 leak; a
        # checkpointed candidate set scans as ExistingRDD). The
        # user-cached corpus fixture legitimately appears as
        # InMemoryTableScan, so only the checkpoint shape is banned —
        # operator-internal persist() is covered by the leak test.
        assert "ExistingRDD" not in plan, fusion


def test_rrf_does_not_leak_cached_dataframes(corpus, spark):
    """The rrf path must not register ANY storage (persist or
    localCheckpoint — both leaked in earlier rounds): repeated
    interactive calls must leave the cache manager untouched. Shared
    work across the multi-pass plan comes from ReuseExchange, not
    materialization.

    The assertion is a DELTA against the session's pre-call baseline,
    not an absolute count: in a full-suite session earlier modules
    legitimately hold persistent entries (cached fixtures, operators
    whose contract includes checkpointing like connected_components),
    and those are not this test's business. rrf adding zero entries
    is."""
    import gc
    import time as _time

    def settled_count() -> int:
        """Persistent-RDD count once forced GC + ContextCleaner stop
        shrinking it (two consecutive stable samples or 30s)."""
        last = None
        deadline = _time.time() + 30
        while _time.time() < deadline:
            gc.collect()
            spark._jvm.System.gc()
            _time.sleep(0.5)
            n = len(spark.sparkContext._jsc.getPersistentRDDs())
            if n == last or n == 0:
                return n
            last = n
        return last

    baseline = settled_count()
    for _ in range(3):
        hybrid_search(corpus, query_terms=("spark", "merge"),
                      fusion="rrf", k=5).collect()
    after = settled_count()
    assert after <= baseline, (
        f"rrf added {after - baseline} persistent RDDs "
        f"(baseline {baseline}, after {after})"
    )


def test_hybrid_ann_overlaps_exact_and_scans_no_text(corpus, spark, sf_dir, tmp_path):
    """The fully index-served hybrid (postings + persisted IVF) must
    (a) honor the materialized metadata filter, (b) overlap the exact
    hybrid's top-k at >= 0.7 — the reference's recall SLO applied to
    the approximate serving tier — and (c) plan no scan of the
    documents parquet: both sides come from index tables."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.retrieval import (
        hybrid_search_ann)
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        similarity as sim_ops)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        corpus_stats_from_sidecar, postings_stream, prune_term_buckets,
        with_term_buckets, write_corpus_stats)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = str(tmp_path / "ivf")
    sim_ops.build_ivf_index(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), ivf,
        n_lists=8, id_col="doc_id", seed=42)
    terms = ("spark", "merge")
    # the bench configuration exactly: bucket-partitioned postings
    # pruned to the query terms, corpus stats from a sidecar (never
    # derived from the pruned frame — that would distort idf)
    (with_term_buckets(postings_stream(docs)).write.mode("overwrite")
     .partitionBy("tb").parquet(str(tmp_path / "postings")))
    postings = prune_term_buckets(
        spark.read.parquet(str(tmp_path / "postings")), terms)
    write_corpus_stats(docs, str(tmp_path / "stats"))
    doc_stats = corpus_stats_from_sidecar(spark, str(tmp_path / "stats"))
    qvec = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("doc_id"), "embedding")
    # the metadata filter is served from its own materialized index
    # too (filterable attributes of a search service live in index
    # tables, not in a text scan)
    docs.filter(F.col("source").isin("src0", "src1", "src2", "src3"))\
        .select("doc_id").write.mode("overwrite")\
        .parquet(str(tmp_path / "meta_idx"))
    allowed = spark.read.parquet(str(tmp_path / "meta_idx"))

    served = hybrid_search_ann(
        spark, ivf, postings, query_terms=terms, query_vec=qvec,
        allowed_ids=allowed, doc_stats=doc_stats, k=20, n_probe=8, m_vec=100)
    got = served.collect()
    assert len(got) == 20
    allowed_set = {r["doc_id"] for r in allowed.collect()}
    assert {r["doc_id"] for r in got} <= allowed_set
    assert [r["rank"] for r in got] == list(range(1, 21))

    exact = hybrid_search(
        corpus, query_terms=terms,
        query_vec=emb.filter(F.col("vec_id") == 3).select("embedding"),
        metadata_filter=F.col("source").isin("src0", "src1", "src2", "src3"),
        k=20)
    overlap = len({r["doc_id"] for r in got}
                  & {r["doc_id"] for r in exact.collect()}) / 20
    assert overlap >= 0.7, overlap

    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan  # index tables only

    # the served tier cannot tell pruned from full postings, so it
    # must refuse to derive corpus stats itself rather than compute
    # idf over the query terms' bucket survivors
    with pytest.raises(ValueError, match="doc_stats"):
        hybrid_search_ann(
            spark, ivf, postings, query_terms=terms, query_vec=qvec,
            allowed_ids=allowed, k=20, n_probe=8, m_vec=100)


def test_hybrid_ann_null_query_vector_serves_lexical_only(
        spark, sf_dir, tmp_path):
    """A NULL query vector must leave the served tier's vector side
    EMPTY (the lexical side carries the query), not flood the m_vec
    cut with arbitrary null-cosine candidates at score 0 — the shared
    scored subplan emits k-null-rows for knn_ivf_indexed's contract,
    and this tier must filter them."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        similarity as sim_ops)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.retrieval import (
        hybrid_search_ann)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        bm25_from_postings, corpus_stats_from_sidecar, postings_stream,
        prune_term_buckets, with_term_buckets, write_corpus_stats)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = str(tmp_path / "ivf")
    sim_ops.build_ivf_index(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), ivf,
        n_lists=8, id_col="doc_id", seed=42)
    terms = ("spark", "merge")
    (with_term_buckets(postings_stream(docs)).write.mode("overwrite")
     .partitionBy("tb").parquet(str(tmp_path / "p")))
    postings = prune_term_buckets(spark.read.parquet(str(tmp_path / "p")),
                                  terms)
    write_corpus_stats(docs, str(tmp_path / "stats"))
    doc_stats = corpus_stats_from_sidecar(spark, str(tmp_path / "stats"))
    null_q = spark.createDataFrame(
        [(0, None)], "doc_id long, embedding array<float>")

    served = hybrid_search_ann(
        spark, ivf, postings, query_terms=terms, query_vec=null_q,
        doc_stats=doc_stats, k=50, n_probe=8, m_vec=100).collect()
    lexical_ids = {r["doc_id"] for r in bm25_from_postings(
        postings, terms, doc_stats=doc_stats).collect()}
    assert served  # lexical side still serves
    assert {r["doc_id"] for r in served} <= lexical_ids  # no padding


def test_chunked_retrieval_tiers_overlap_and_compose(spark, sf_dir):
    """Chunk-level RAG composition (round 10): the exact tier's
    contract is oracle-checked (chunked_retrieval registry query);
    here the COMPOSITION claims are pinned. (a) whole-doc retrieval
    (one giant chunk) and chunked retrieval rank correlated but not
    identical top-20 sets — chunking genuinely re-ranks by best
    passage; (b) the IVF ANN tier probing EVERY list recovers the
    exact tier's doc set (the plumbing adds no error of its own —
    only list pruning does); (c) a pruned probe set keeps overlap
    above the recall floor, the knn_ivf_direct-style gate; (d) both
    tiers share the output schema."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        retrieval as rt)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = "spark merge join window agg table scan fast"
    flt = F.col("source").isin("src0", "src1", "src2", "src3")
    kw = dict(k=20, chunk_tokens=32, stride=24, dim=32,
              metadata_filter=flt)

    exact = rt.chunked_retrieval(docs, q, **kw)
    e = {r["doc_id"] for r in exact.collect()}
    assert len(e) == 20

    whole = rt.chunked_retrieval(docs, q, k=20, chunk_tokens=10**6,
                                 stride=10**6, dim=32,
                                 metadata_filter=flt)
    w = {r["doc_id"] for r in whole.collect()}
    assert len(e & w) >= 10            # correlated...
    assert e != w                      # ...but chunking re-ranks

    allprobe = rt.chunked_retrieval_ann(docs, q, n_lists=8, n_probe=8,
                                        m_chunks=400, **kw)
    a_all = {r["doc_id"] for r in allprobe.collect()}
    assert len(e & a_all) >= 18        # exhaustive probe ~= exact

    pruned = rt.chunked_retrieval_ann(docs, q, n_lists=8, n_probe=4,
                                      m_chunks=200, **kw)
    a = {r["doc_id"] for r in pruned.collect()}
    assert len(e & a) >= 10            # recall floor at half the lists

    assert exact.columns == pruned.columns == \
        ["doc_id", "best_chunk_id", "score", "rank"]
    # deterministic across runs
    again = {r["doc_id"] for r in rt.chunked_retrieval(docs, q,
                                                       **kw).collect()}
    assert again == e


def test_embed_query_text_matches_inplan_recipe(spark):
    """The served tier's driver-side query embedding must be
    bit-identical to the in-plan md5 recipe (integer sums), or the
    full-probe served ≡ exact contract silently breaks."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.retrieval import (
        _dense_from_sums, _md5_bucket_sums, embed_query_text)

    for q in ("spark merge join window agg table scan fast",
              "", "a  b", "unicode naïve café"):
        qdoc = spark.range(1).select(F.lit(q).alias("q"))
        inplan = _dense_from_sums(
            _md5_bucket_sums(qdoc, [], "q", 32), [], 32,
            F.lit(-1).cast("long")).first()["embedding"]
        assert list(inplan) == embed_query_text(q, 32), q


def test_chunked_retrieval_served_matches_exact_and_prunes(
        spark, sf_dir, tmp_path):
    """The persisted chunk index (round 11): full-probe serving over
    a build_chunk_index store equals the exact brute-force tier
    bit-for-bit (same rows, same rounded scores, same ranks); a
    pruned probe keeps the recall-floor overlap; the served plan
    never rescans the documents table (no re-chunk / re-embed); and
    allowed_ids post-filters like hybrid_search_ann."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        retrieval as rt)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = "spark merge join window agg table scan fast"
    flt = F.col("source").isin("src0", "src1", "src2", "src3")
    idx = str(tmp_path / "chunkidx")
    rt.build_chunk_index(docs.filter(flt), idx, chunk_tokens=32,
                         stride=24, dim=32, n_lists=8)

    exact = rt.chunked_retrieval(docs, q, k=20, chunk_tokens=32,
                                 stride=24, dim=32, metadata_filter=flt)
    served = rt.chunked_retrieval_served(spark, idx, q, k=20,
                                         n_probe=8, m_chunks=10**6)
    e = sorted(tuple(r) for r in exact.collect())
    s = sorted(tuple(r) for r in served.collect())
    assert e == s and len(e) == 20

    # the serving plan reads the index layout only — a plan that
    # mentions the documents fixture is re-chunking at query time
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan

    pruned = rt.chunked_retrieval_served(spark, idx, q, k=20,
                                         n_probe=4, m_chunks=200)
    p = {r["doc_id"] for r in pruned.collect()}
    assert len({t[0] for t in e} & p) >= 10

    some = [t[0] for t in e][:7]
    allowed = spark.createDataFrame([(i,) for i in some], "doc_id long")
    gated = rt.chunked_retrieval_served(spark, idx, q, k=20, n_probe=8,
                                        m_chunks=10**6,
                                        allowed_ids=allowed)
    got = [r["doc_id"] for r in gated.orderBy("rank").collect()]
    assert set(got) <= set(some) and len(got) == 7
    # ranks re-densify after the filter
    assert [r["rank"] for r in gated.orderBy("rank").collect()] == \
        list(range(1, len(got) + 1))


def test_chunk_tiers_bridge_string_and_negative_ids(spark, tmp_path):
    """Round-11 id bridge (VERDICT #5 + ADVICE): string-keyed and
    negative-integer corpora run through BOTH ANN chunk tiers and
    reproduce the exact tier at full probe — the old tier silently
    credited hits to the wrong document for negative ids and could
    not serve strings at all."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        retrieval as rt)

    words = ["alpha", "beta", "gamma", "delta", "spark", "join",
             "merge", "window", "scan", "fast"]
    rows = [(f"doc-{i:03d}",
             " ".join(words[(i + j) % len(words)]
                      for j in range(20 + i % 13)))
            for i in range(60)]
    sdocs = spark.createDataFrame(rows, "doc_id string, text string")
    q = "spark join merge fast"
    kw = dict(k=10, chunk_tokens=8, stride=6, dim=16)

    exact = sorted(tuple(r) for r in
                   rt.chunked_retrieval(sdocs, q, **kw).collect())
    assert len(exact) == 10
    ann = sorted(tuple(r) for r in rt.chunked_retrieval_ann(
        sdocs, q, n_lists=4, n_probe=4, m_chunks=10**6, **kw).collect())
    assert ann == exact

    idx = str(tmp_path / "stridx")
    rt.build_chunk_index(sdocs, idx, chunk_tokens=8, stride=6, dim=16,
                         n_lists=4)
    served = sorted(tuple(r) for r in rt.chunked_retrieval_served(
        spark, idx, q, k=10, n_probe=4, m_chunks=10**4).collect())
    assert served == exact

    # negative integral ids route through the hash bridge too — the
    # truncating-div/pmod decode disagreement never happens
    ndocs = spark.createDataFrame(
        [(i - 30, t) for i, (_, t) in enumerate(rows)],
        "doc_id long, text string")
    n_exact = sorted(tuple(r) for r in
                     rt.chunked_retrieval(ndocs, q, **kw).collect())
    n_ann = sorted(tuple(r) for r in rt.chunked_retrieval_ann(
        ndocs, q, n_lists=4, n_probe=4, m_chunks=10**6, **kw).collect())
    assert n_ann == n_exact
    assert any(t[0] < 0 for t in n_exact)


def test_chunked_retrieval_served_many_equals_singles(spark, tmp_path):
    """Batch serving (round 12 — VERDICT r11 #4): N query texts in
    one pruned scan reproduce N single chunked_retrieval_served calls
    EXACTLY, per query — identical rows, scores, ranks — through both
    id bridges, with m_chunks cuts and allowed_ids applied per
    query."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        retrieval as rt)

    words = ["alpha", "beta", "gamma", "delta", "spark", "join",
             "merge", "window", "scan", "fast"]
    texts = ["spark join merge fast", "alpha beta gamma",
             "window scan agg", "", "spark spark spark"]

    for id_type, mk in (("long", lambda i: i),
                        ("string", lambda i: f"doc-{i:03d}")):
        rows = [(mk(i), " ".join(words[(i + j) % len(words)]
                                 for j in range(20 + i % 13)))
                for i in range(60)]
        docs = spark.createDataFrame(rows, f"doc_id {id_type}, text string")
        idx = str(tmp_path / f"idx_{id_type}")
        rt.build_chunk_index(docs, idx, chunk_tokens=8, stride=6,
                             dim=16, n_lists=4)
        for kw in (dict(k=7, n_probe=4, m_chunks=10**4),
                   dict(k=7, n_probe=2, m_chunks=25)):
            batch = rt.chunked_retrieval_served_many(
                spark, idx, texts, **kw).collect()
            for qi, text in enumerate(texts):
                single = sorted(tuple(r) for r in rt.chunked_retrieval_served(
                    spark, idx, text, **kw).collect())
                got = sorted(tuple(r)[1:] for r in batch
                             if r["query_id"] == qi)
                assert got == single, (id_type, kw, qi)

    # allowed_ids applies per query over the unioned hit set
    allowed = spark.createDataFrame([(i,) for i in range(0, 60, 2)],
                                    "doc_id long")
    idx = str(tmp_path / "idx_long")
    batch = rt.chunked_retrieval_served_many(
        spark, idx, texts, k=7, n_probe=4, m_chunks=10**4,
        allowed_ids=allowed).collect()
    assert all(r["doc_id"] % 2 == 0 for r in batch)
    for qi, text in enumerate(texts):
        single = sorted(tuple(r) for r in rt.chunked_retrieval_served(
            spark, idx, text, k=7, n_probe=4, m_chunks=10**4,
            allowed_ids=allowed).collect())
        got = sorted(tuple(r)[1:] for r in batch if r["query_id"] == qi)
        assert got == single

    # the driver-hit cap guards the hash-bridge decode collect on the
    # ACTUAL hit count (round-13 ADVICE), not the worst-case
    # |Q| x m_chunks product: the registry's full-equality
    # configuration (m_chunks=10**6) must stay servable on a
    # hash-bridged store whose real hits are tiny
    import pytest as _pytest
    sidx = str(tmp_path / "idx_string")
    assert rt.chunked_retrieval_served_many(
        spark, sidx, texts, k=7, n_probe=4, m_chunks=10**6).count() > 0
    assert rt.chunked_retrieval_served(
        spark, sidx, texts[0], k=7, n_probe=4, m_chunks=10**6).count() > 0
    # but real hits past the cap refuse, on both tiers
    with _pytest.raises(ValueError, match="max_driver_hits"):
        rt.chunked_retrieval_served_many(
            spark, sidx, texts, k=7, n_probe=4, m_chunks=10**4,
            max_driver_hits=10)
    with _pytest.raises(ValueError, match="max_driver_hits"):
        rt.chunked_retrieval_served(
            spark, sidx, texts[0], k=7, n_probe=4, m_chunks=10**4,
            max_driver_hits=10)


def test_served_many_query_ids_never_collide_with_chunk_keys(
        spark, tmp_path):
    """Round-12 review catch: under the identity bridge doc 0's chunk
    0 has composite key 0, and 0-based batch query ids fed it into
    _ivf_indexed_scored's kNN self-exclusion filter (neighbor_id !=
    query_id) — silently dropping exactly the best chunk when it is
    the query's top hit. Batch ids are now negative sentinels; this
    fixture makes the colliding chunk the argmax so the drop would be
    visible as a wrong best_chunk_id/score, not just a missing
    also-ran."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        retrieval as rt)

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),
         (1, "omega psi chi phi upsilon tau")],
        "doc_id long, text string")
    idx = str(tmp_path / "collide_idx")
    rt.build_chunk_index(docs, idx, chunk_tokens=4, stride=3, dim=16,
                         n_lists=2)
    texts = ["alpha beta gamma delta", "omega psi chi phi"]
    kw = dict(k=2, n_probe=2, m_chunks=100)
    batch = rt.chunked_retrieval_served_many(spark, idx, texts,
                                             **kw).collect()
    for qi, text in enumerate(texts):
        single = sorted(tuple(r) for r in rt.chunked_retrieval_served(
            spark, idx, text, **kw).collect())
        got = sorted(tuple(r)[1:] for r in batch if r["query_id"] == qi)
        assert got == single, (qi, got, single)
    # and the collision row itself: query 0's rank-1 hit is doc 0 via
    # its FIRST chunk (composite key 0 — the row the bug dropped)
    top0 = [r for r in batch if r["query_id"] == 0 and r["rank"] == 1]
    assert len(top0) == 1
    assert top0[0]["doc_id"] == 0 and top0[0]["best_chunk_id"] == 0
