"""Scale-design assertions: LSH kNN recall SLO, partitioned
publication with partition pruning, broadcast join strategy, query
tagging."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
from snowflake_medtech_vigilance_lakehouse_spark.plans import analytics
from snowflake_medtech_vigilance_lakehouse_spark.session import query_tag
from snowflake_medtech_vigilance_lakehouse_spark.sources.writers import write_table


def test_lsh_knn_meets_recall_slo(spark, sf_dir):
    # the reference SLO: similar-cases Recall@20 >= 0.7 vs ground truth
    # (README.md:86,138); brute force IS the ground truth
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    exact = sim.knn_bruteforce(emb, q, k=20)
    approx = sim.knn_lsh(emb, q, k=20)
    assert sim.recall_at_k(approx, exact, k=20) >= 0.7


def test_ivf_knn_meets_recall_slo(spark, sf_dir):
    # IVF coarse-quantizer path: probing half the lists must clear the
    # reference Recall@20 >= 0.7 SLO even on unclustered random
    # vectors. The gate sits at 0.72, ABOVE the SLO floor: measured
    # recall is 0.756 (bench, every round), so a centroid-seeding or
    # list-assignment regression large enough to eat the 0.036 margin
    # fails HERE rather than silently drifting across the 0.7 SLO
    # between rounds (n_probe/recall curve: PLANS.md "Top-k").
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    exact = sim.knn_bruteforce(emb, q, k=20)
    approx = sim.knn_ivf(emb, q, k=20, n_lists=16, n_probe=8)
    assert sim.recall_at_k(approx, exact, k=20) >= 0.72


def test_ivf_index_serving_matches_direct_and_prunes(spark, sf_dir, tmp_path):
    # the persisted-IVF serving path must (a) return exactly what the
    # in-session knn_ivf computes at the same (n_lists, seed) — same
    # quantizer, same cosine folds, write-time norms — and (b) read
    # ONLY the probed lists' directories: the list filter must land in
    # the scan's PartitionFilters (directory-level skipping), not as a
    # post-scan data filter
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, idx, n_lists=8, seed=42)
    served = sim.knn_ivf_indexed(spark, idx, q, k=10, n_probe=3)
    direct = sim.knn_ivf(emb, q, k=10, n_lists=8, n_probe=3, seed=42)
    assert served.exceptAll(direct).count() == 0
    assert direct.exceptAll(served).count() == 0

    plan = served._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters"):].split("]")[0]
    assert "list_id" in pf and "IN" in pf.upper()

    # an EMPTY query frame must short-circuit to an empty result with
    # the contract schema — not a degenerate isin([]) plan
    none = sim.knn_ivf_indexed(
        spark, idx, q.filter(F.col("vec_id") < 0), k=10, n_probe=3)
    assert none.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    assert none.count() == 0
    assert [f.dataType.simpleString() for f in none.schema.fields] == [
        "bigint", "bigint", "int", "double"]

    # an EMPTY inverted list (k-means can leave a cluster empty;
    # partitionBy writes no dir for it while the centroid survives in
    # the sidecar) must contribute zero rows, not a path-not-found
    # crash — probe EVERY list so the empty one is always touched
    import shutil
    shutil.rmtree(f"{idx}/list_id=3")
    served_all = sim.knn_ivf_indexed(spark, idx, q.limit(2), k=5, n_probe=8)
    assert served_all.count() == 10  # 2 queries x top-5, crash-free


def test_neardup_bucketed_empty_corpus(spark):
    # all vectors NULL/zero-norm -> the fold contract yields an empty
    # frame; the bucketed quantizer fit must not crash in numpy
    df = spark.createDataFrame(
        [(1, None), (2, [0.0, 0.0])], "vec_id long, embedding array<float>")
    out = sim.embedding_neardup_pairs_bucketed(df, threshold=0.5, n_lists=4)
    assert out.columns == ["id_1", "id_2", "cosine"]
    assert out.count() == 0


def test_ivf_index_tolerates_null_vectors(spark, sf_dir, tmp_path):
    # a NULL embedding must not NPE the KMeans fit at build time, must
    # not enter the index, and must be dropped (not filed into list 0)
    # by the streaming assigner
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        assign_ivf_lists,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = emb.select(F.size("embedding")).first()[0]
    null_elem = [0.5] * dim
    null_elem[3] = None  # a NULL ELEMENT also NPEs array_to_vector
    dirty = emb.unionByName(spark.createDataFrame(
        [(888888, None, 0), (888887, null_elem, 0)], emb.schema))
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(dirty, idx, n_lists=8, seed=42)
    stored = spark.read.parquet(idx)
    assert stored.count() == emb.count()
    assert stored.filter(F.col("vec_id") == 888888).count() == 0
    centroids = spark.read.parquet(idx + "_centroids")
    assert assign_ivf_lists(dirty, centroids).filter(
        F.col("vec_id") == 888888).count() == 0


def test_lsh_knn_tolerates_zero_vectors(spark, sf_dir):
    # regression: approxSimilarityJoin re-plans inputs so the
    # unit-vector projection can run before the row filter — a
    # zero-norm vector must not NPE array_to_vector nor appear in
    # results
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    zero = spark.createDataFrame([(777777, [0.0] * 64, 0)], emb.schema)
    out = sim.knn_lsh(emb.unionByName(zero), emb.filter(F.col("vec_id") == 1), k=5).collect()
    assert len(out) == 5
    assert 777777 not in [r["neighbor_id"] for r in out]


def test_partitioned_publication_prunes(spark, sf_dir, tmp_path):
    # facts publish partitioned by quarter; a quarter-filtered read
    # must prune to that partition's files (the Snowflake
    # micro-partition-pruning analog, SURVEY.md §4)
    out = str(tmp_path / "orders_pub")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "yyyy", F.year("o_orderdate")
    ).withColumn("q", F.quarter("o_orderdate"))
    write_table(o, out, partition_by=["yyyy", "q"])

    back = spark.read.parquet(out)
    pruned = back.filter((F.col("yyyy") == 1997) & (F.col("q") == 2))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the quarter predicate must land in PartitionFilters (metadata
    # pruning), not as a post-scan data filter
    pf = plan[plan.index("PartitionFilters"):].split("]")[0]
    assert "1997" in pf and "= 2" in pf
    assert pruned.count() == o.filter((F.col("yyyy") == 1997) & (F.col("q") == 2)).count()


def test_iceberg_routes_to_metadata_lite_writer(spark, sf_dir, tmp_path):
    # without iceberg jars, fmt='iceberg' publishes through
    # iceberg_lite (round-4; was a NotImplementedError gate) — full
    # behavior coverage lives in tests/test_iceberg_lite.py
    from snowflake_medtech_vigilance_lakehouse_spark.sources.iceberg_lite import (
        read_iceberg,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(100)
    out = str(tmp_path / "iceberg")
    write_table(o, out, fmt="iceberg")
    assert read_iceberg(spark, out).count() == 100


def test_seed_join_is_broadcast(spark, sf_dir):
    # the 4,788-row manufacturer-style dim must never shuffle the fact
    # side (fact_adverse_events.sql:88-90 -> broadcast hash join)
    plan = (
        analytics.q_orders_enriched(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_approx_distinct_within_tolerance(spark, sf_dir):
    # HLL sketches can't hash-match a DuckDB oracle; the contract is
    # bounded relative error vs the exact distinct count
    import __spark_entry__ as se

    from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import read_events

    rows = se.queries()["approx_distinct"](spark, sf_dir).collect()
    assert rows and all(r["within_tol"] for r in rows), rows
    ev = read_events(spark, sf_dir)
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    got = {r["event_type"]: r["n_users_exact"] for r in rows}
    assert got == exact


def test_queries_survive_ansi_mode(spark, sf_dir):
    # Spark 4 defaults ANSI on; the driver's session may too. The
    # operators must not rely on silent overflow/lenient casts:
    # minhash permutations overflowed longs before coefficient bounds.
    import __spark_entry__ as se

    original = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        q = se.queries()
        assert q["minhash_neardup"](spark, sf_dir).count() > 0
        assert q["parse_dates"](spark, sf_dir).limit(5).count() == 5
        assert q["masked_events"](spark, sf_dir).limit(5).count() == 5
    finally:
        spark.conf.set("spark.sql.ansi.enabled", original)


def test_salted_agg_matches_direct(spark, sf_dir):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.skew import salted_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_extendedprice").alias("mx"),
        ).collect()
    }
    salted = {
        r["l_returnflag"]: r
        for r in salted_agg(
            li, ["l_returnflag"],
            [("sum", "l_quantity", "s"), ("count", "l_quantity", "n"),
             ("max", "l_extendedprice", "mx")],
        ).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        assert direct[k]["n"] == salted[k]["n"]
        assert direct[k]["mx"] == salted[k]["mx"]
        assert abs(direct[k]["s"] - salted[k]["s"]) < 1e-6

    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-mergeable"):
        salted_agg(li, ["l_returnflag"], [("avg", "l_quantity", "a")])


def test_salted_collect_matches_direct(spark, sf_dir):
    """salted_collect (the heavy-state/OOM lever for LISTAGG-shaped
    aggregation over a hot key) must equal sort_array(collect_list)
    of a direct groupBy exactly — the salt spreads state, never
    changes the multiset."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.skew import salted_collect

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    direct = {
        r["source"]: r["items"]
        for r in docs.groupBy("source").agg(
            F.sort_array(F.collect_list("doc_id")).alias("items")
        ).collect()
    }
    salted = {
        r["source"]: r["items"]
        for r in salted_collect(docs, ["source"], "doc_id", num_salts=8).collect()
    }
    assert direct == salted


def test_query_tag_scopes_job_group(spark, sf_dir):
    with query_tag(spark, "medtech:test-tag"):
        assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") == "medtech:test-tag"
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") in ("", None)


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both sides of a recurring join on the key is the
    100 TB lever the operator docstrings point at: bucketed scans
    satisfy the join's hashpartitioning requirement, so the sort-merge
    join runs with ZERO exchanges."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    (o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .option("path", str(tmp_path / "orders_b")).saveAsTable("orders_b"))
    (c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
     .option("path", str(tmp_path / "cust_b")).saveAsTable("cust_b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("cust_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == o.join(c, o["o_custkey"] == c["c_custkey"]).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_salted_join_matches_plain(spark, sf_dir):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hot = orders.agg(F.min("o_orderkey")).first()[0]
    # 30%-heavy-hitter fact side, reference README.md:46 shape
    left = li.select(
        F.when(F.col("l_linenumber") % 10 < 3, F.lit(hot))
        .otherwise(F.col("l_orderkey")).alias("k"),
        "l_quantity", "l_extendedprice")
    right = orders.select(F.col("o_orderkey").alias("k"), "o_custkey")

    for how in ("inner", "left"):
        plain = left.join(right, "k", how)
        salted = salted_join(left, right, "k", how=how, num_salts=8)
        assert salted.exceptAll(plain).count() == 0, how
        assert plain.exceptAll(salted).count() == 0, how

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="full")


def test_aqe_skew_split_fires_on_hot_key(spark):
    """Join-side skew evidence, measured not predicted: under
    production-shaped thresholds a 60%-hot-key sort-merge join gets
    its hot partition SPLIT by AQE's OptimizeSkewedJoin (the
    'skew=true' marker on the final adaptive plan); under the default
    256 MB threshold the same join at this scale does not trigger —
    the default plan absorbs it, which is the PLANS.md claim this
    test pins in both directions."""
    left = spark.range(0, 300_000).select(
        F.when(F.col("id") % 10 < 6, F.lit(7))
        .otherwise(F.col("id") % 1000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 512).alias("rpay"))

    tight = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }

    def run(confs):
        old = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            j = left.hint("merge").join(right, "k").select(
                F.length("payload").alias("x"))
            n = len(j.collect())
            plan = j._jdf.queryExecution().executedPlan().toString()
            return n, plan
        finally:
            for k, v in old.items():
                spark.conf.set(k, v) if v is not None else spark.conf.unset(k)

    n_tight, plan_tight = run(tight)
    assert "isFinalPlan=true" in plan_tight
    assert "skew=true" in plan_tight  # OptimizeSkewedJoin fired
    n_plain, plan_plain = run({})
    assert "skew=true" not in plan_plain  # below default threshold
    assert n_tight == n_plain == 300_000  # split is plan-only


def test_ivf_serving_large_query_frame_falls_back_distributed(
        spark, sf_dir, tmp_path):
    """The driver-side probe ranking is capped: a query frame above
    max_driver_queries (e.g. a recall sweep using the corpus as
    queries) must route to the distributed broadcast-centroid window
    plan and return EXACTLY what the driver fast path returns — no
    driver materialization of a corpus-scale frame, no silent
    divergence."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 12)
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, idx, n_lists=8, seed=42)

    fast = sim.knn_ivf_indexed(spark, idx, q, k=10, n_probe=3)
    # cap of 4 < 12 queries -> distributed fallback
    dist = sim.knn_ivf_indexed(spark, idx, q, k=10, n_probe=3,
                               max_driver_queries=4)
    assert dist.exceptAll(fast).count() == 0
    assert fast.exceptAll(dist).count() == 0
    # and against the non-indexed direct plan too
    direct = sim.knn_ivf(emb, q, k=10, n_lists=8, n_probe=3, seed=42)
    assert dist.exceptAll(direct).count() == 0
    assert direct.exceptAll(dist).count() == 0


def test_ivf_serving_null_query_keeps_k_null_rows(spark, sf_dir, tmp_path):
    """A NULL-vector query emits k null-cosine rows (the window plan's
    NULLS-LAST/list_id-asc shape) on BOTH serving paths — the output
    contract knn_ivf has for degenerate inputs, preserved by the
    driver ranking instead of silently dropping the query."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, idx, n_lists=8, seed=42)
    q = spark.createDataFrame(
        [(900000, None)], "vec_id long, embedding array<float>").unionByName(
        emb.filter(F.col("vec_id") < 2).select("vec_id", "embedding"))

    direct = sim.knn_ivf(emb, q, k=5, n_lists=8, n_probe=3, seed=42)
    served = sim.knn_ivf_indexed(spark, idx, q, k=5, n_probe=3)
    dist = sim.knn_ivf_indexed(spark, idx, q, k=5, n_probe=3,
                               max_driver_queries=1)
    for res in (direct, served, dist):
        nulls = res.filter(F.col("query_id") == 900000)
        assert nulls.count() == 5
        assert nulls.filter(F.col("cosine").isNull()).count() == 5
    assert served.exceptAll(direct).count() == 0
    assert dist.exceptAll(direct).count() == 0


def test_ivf_serving_literal_queries_match_frame(spark, sf_dir, tmp_path):
    """The serving shape: a literal [(id, vector)] query list must
    produce exactly the DataFrame-query result, with ZERO Spark jobs
    during plan construction (no query collect, no query-frame scan)
    — the latency floor of the served path."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, idx, n_lists=8, seed=42)
    vec = [float(x) for x in
           emb.filter(F.col("vec_id") == 7).first()["embedding"]]

    def n_jobs():
        return spark.sparkContext._jsc.sc().statusStore()\
            .jobsList(None).size()

    # warm the (path, mtime) schema cache like a serving process would
    sim.knn_ivf_indexed(spark, idx, [(7, vec)], k=5, n_probe=3)
    before = n_jobs()
    lit = sim.knn_ivf_indexed(spark, idx, [(7, vec)], k=5, n_probe=3)
    assert n_jobs() == before  # plan construction ran no Spark job
    frame = spark.createDataFrame(
        [(7, vec)], "vec_id long, embedding array<double>")
    via_frame = sim.knn_ivf_indexed(spark, idx, frame, k=5, n_probe=3)
    assert sorted(map(tuple, lit.collect())) == \
        sorted(map(tuple, via_frame.collect()))


def test_hybrid_ann_literal_query_matches_frame(spark, sf_dir, tmp_path):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.retrieval import (
        hybrid_search_ann)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        corpus_stats_from_sidecar, postings_stream, prune_term_buckets,
        with_term_buckets, write_corpus_stats)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = str(tmp_path / "ivf")
    sim.build_ivf_index(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), ivf,
        n_lists=8, id_col="doc_id", seed=42)
    terms = ("spark", "merge")
    (with_term_buckets(postings_stream(docs)).write.mode("overwrite")
     .partitionBy("tb").parquet(str(tmp_path / "p")))
    postings = prune_term_buckets(
        spark.read.parquet(str(tmp_path / "p")), terms)
    write_corpus_stats(docs, str(tmp_path / "stats"))
    stats = corpus_stats_from_sidecar(spark, str(tmp_path / "stats"))
    vec = [float(x) for x in
           emb.filter(F.col("vec_id") == 3).first()["embedding"]]

    lit = hybrid_search_ann(
        spark, ivf, postings, query_terms=terms, query_vec=[(3, vec)],
        doc_stats=stats, k=20, n_probe=8, m_vec=100).collect()
    frame = hybrid_search_ann(
        spark, ivf, postings, query_terms=terms,
        query_vec=spark.createDataFrame(
            [(3, vec)], "doc_id long, embedding array<double>"),
        doc_stats=stats, k=20, n_probe=8, m_vec=100).collect()
    assert sorted(map(tuple, lit)) == sorted(map(tuple, frame))


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """write_bucketed's contract measured at the plan: two tables
    bucketed identically on the join key sort-merge-join with NO
    exchange on either side, while the same join over plain parquet
    shuffles both — the co-located-join publication lever for
    repeated fact-to-fact joins at scale. Results are identical."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources.writers import (
        write_bucketed)

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(o, "b_orders", buckets=8, by=["o_orderkey"],
                   path=str(tmp_path / "bo"))
    write_bucketed(li, "b_lineitem", buckets=8, by=["l_orderkey"],
                   path=str(tmp_path / "bl"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffles

        plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan  # the cost bucketing removes
        assert bucketed.count() == plain.count()
        assert bucketed.agg(F.sum("l_quantity")).first()[0] == \
            plain.agg(F.sum("l_quantity")).first()[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_sq8_compressed_serving(spark, sf_dir, tmp_path):
    """The IVF+SQ8 serving tier: candidate ranking reads ONLY the
    int8 code columns (plan-asserted ReadSchema — the full-precision
    _v never enters the ranking scan, an 8x bytes-per-dimension cut),
    recall clears the SLO gate, and refine mode (rerank >= probed
    rows) reproduces the full-precision served result EXACTLY."""
    import re

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "sq")
    sim.build_ivf_index(emb, idx, n_lists=8, seed=42, quantize_int8=True)

    exact = sim.knn_bruteforce(emb, q, k=20)
    served = sim.knn_ivf_indexed(spark, idx, q, k=20, n_probe=4)
    sq = sim.knn_ivf_indexed_compressed(spark, idx, q, k=20, n_probe=4,
                                        rerank=None)
    refined = sim.knn_ivf_indexed_compressed(spark, idx, q, k=20,
                                             n_probe=4, rerank=5000)

    # the same index serves BOTH tiers; SQ8 loses no recall vs the
    # uncompressed path on unit-scale vectors
    assert sim.recall_at_k(sq, exact) >= sim.recall_at_k(served, exact) - 0.02
    assert sim.recall_at_k(sq, exact) >= 0.7  # the reference SLO
    # refine mode == full precision, row for row
    assert refined.exceptAll(served).count() == 0
    assert served.exceptAll(refined).count() == 0

    # fully-compressed plan never touches _v
    plan = sq._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert schemas and all("_v8" in s and "_v:" not in s for s in schemas)

    # a non-quantized index refuses the compressed tier loudly —
    # including on an EMPTY query set, where a well-shaped empty
    # result would mask the misconfiguration until the first real
    # query
    plain = str(tmp_path / "plain")
    sim.build_ivf_index(emb, plain, n_lists=8, seed=42)
    with pytest.raises(ValueError, match="int8 codes"):
        sim.knn_ivf_indexed_compressed(spark, plain, q, k=5)
    with pytest.raises(ValueError, match="int8 codes"):
        sim.knn_ivf_indexed_compressed(spark, plain, [], k=5)


def test_literal_query_list_respects_driver_cap(spark, sf_dir, tmp_path):
    """The max_driver_queries cap guards BOTH entry shapes: a literal
    (id, vector) list over the cap raises (pointing at the DataFrame
    route, which falls back to the distributed plan) instead of
    expanding |Q| x n_probe rows through the driver."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "capped")
    sim.build_ivf_index(emb.limit(64), idx, n_lists=2, seed=42)
    dim = len(emb.first()["embedding"])
    big = [(i, [0.0] * dim) for i in range(11)]
    with pytest.raises(ValueError, match="max_driver_queries"):
        sim.knn_ivf_indexed(spark, idx, big, k=1, max_driver_queries=10)
    # at the cap it serves normally
    ok = sim.knn_ivf_indexed(spark, idx, big[:10], k=1,
                             max_driver_queries=10)
    assert ok.count() >= 0
