"""Operator tests: dedup tiers, similarity, text analysis, multimodal
plumbing, enrichment hooks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators import (
    dedup as dd,
    enrich,
    multimodal as mm,
    similarity as sim,
    text as tx,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.cache().count()
    return df


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    out = {r["text"]: r for r in dd.exact_dedup(df).collect()}
    assert out["same text"]["doc_id"] == 1 and out["same text"]["n_copies"] == 2
    assert out["other"]["n_copies"] == 1


def test_shingles_short_docs(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",), ("",)], "text string")
    vals = df.select(dd.shingles(F.col("text")).alias("s")).collect()
    assert vals[0]["s"] == []
    assert vals[1]["s"] == ["a b c", "b c d"]
    assert vals[2]["s"] == []


def test_mh_expr_built_frames_equal_column_formulation(spark, docs):
    """The F.expr-built signature aggregation and band explode
    (round-13 optimization: plan construction via one parsed string
    instead of hundreds of py4j Column operators) produce EXACTLY the
    rows of the chained-Column formulation they replaced — signatures,
    n_shingles, band struct field names and values."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        _MERSENNE_P, _band_buckets, _hash_coeffs, minhash_exploded_base)

    ex = minhash_exploded_base(docs.limit(50), n=3)
    # the pre-round-13 Column-operator formulation, verbatim
    aggs = [F.count(F.lit(1)).alias("n_shingles")]
    for i, (a, b) in enumerate(_hash_coeffs(16, 42)):
        aggs.append(
            F.min((F.col("_h") * F.lit(a) + F.lit(b))
                  % F.lit(_MERSENNE_P)).alias(f"mh_{i}"))
    old_sig = ex.groupBy("_id").agg(*aggs)
    old_buckets = old_sig.select(
        F.col("_id"),
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band"),
                F.struct(*[F.col(f"mh_{bi * 2 + r}").alias(f"r{r}")
                           for r in range(2)]).alias("bucket"))
            for bi in range(8)])).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))

    new_sig = ex.groupBy("_id").agg(*dd._mh_sig_agg_exprs(16, 42))
    assert new_sig.schema == old_sig.schema
    assert ({tuple(r) for r in new_sig.collect()}
            == {tuple(r) for r in old_sig.collect()})
    new_buckets = _band_buckets(new_sig, 8, 2, "_id")
    assert new_buckets.schema == old_buckets.schema
    assert ({(r["_id"], r["band"], tuple(r["bucket"]))
             for r in new_buckets.collect()}
            == {(r["_id"], r["band"], tuple(r["bucket"]))
                for r in old_buckets.collect()})


def test_simhash_expr_built_equals_column_formulation(spark, docs):
    """The F.expr-built simhash vote/assembly (round-14 optimization:
    one parsed string instead of ~64x7 chained Column operators)
    produces EXACTLY the rows of the chained-Column formulation it
    replaced — every bit of every signature."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        md5_hash32)

    sub = docs.limit(50)
    # the pre-round-14 Column-operator formulation, verbatim
    exploded = sub.select(
        F.col("doc_id"),
        F.explode(F.split(F.col("text"), " ")).alias("_t")
    ).select(
        F.col("doc_id"),
        md5_hash32(F.col("_t"), hex_offset=1).alias("_lo"),
        md5_hash32(F.col("_t"), hex_offset=9).alias("_hi"),
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright(
                    F.col("_lo") if j < 32 else F.col("_hi"), j % 32
                ).bitwiseAND(F.lit(1)) == F.lit(1),
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"v_{j}")
        for j in range(64)
    ]
    with_votes = exploded.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for j in range(64):
        sig = sig.bitwiseOR(
            F.shiftleft(F.when(F.col(f"v_{j}") > 0, F.lit(1))
                        .otherwise(F.lit(0)).cast("long"), j))
    old = with_votes.select(F.col("doc_id"), sig.alias("simhash"))

    new = dd.simhash(sub)
    assert new.schema == old.schema
    assert ({tuple(r) for r in new.collect()}
            == {tuple(r) for r in old.collect()})


def test_minhash_lsh_matches_exact(spark, docs):
    exact = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in dd.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=64, bands=32).collect()
    }
    assert exact, "fixture should contain planted near-dup pairs"
    # LSH verifies candidates with true Jaccard: subset with exact scores
    assert set(lsh) <= set(exact)
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} too low"
    for k, v in lsh.items():
        assert v == exact[k]


def test_connected_components_transitive(spark):
    # chain 1-2-3 plus pair 10-11: transitivity must merge the chain
    # into one component even though (1,3) is not a direct pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_id_1 long, doc_id_2 long"
    )
    comp = {r["doc_id"]: r["component_id"]
            for r in dd.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_delta_rounds_equal_full_propagation(spark):
    """Delta propagation (round 14: only last round's CHANGED nodes
    feed the edge join) reaches the identical fixpoint as full
    propagation on shapes that exercise multi-round frontiers — a long
    chain (max diameter: the frontier is 1-2 nodes per round, the
    regime where delta prunes hardest) and a dense clique overlapping
    a chain (merges arriving from two sides)."""
    # 12-node path: 0-1-2-...-11 (needs ~11 propagation rounds)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_id_1 long, doc_id_2 long")
    comp = {r["doc_id"]: r["component_id"]
            for r in dd.connected_components(chain).collect()}
    assert comp == {i: 0 for i in range(12)}
    # clique {20..23} bridged to chain {23-24-25}, plus a singleton
    # pair: min label must flow across the bridge in both directions
    rows = ([(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
            + [(23, 24), (24, 25), (40, 41)])
    mixed = spark.createDataFrame(rows, "doc_id_1 long, doc_id_2 long")
    comp = {r["doc_id"]: r["component_id"]
            for r in dd.connected_components(mixed).collect()}
    assert comp == {**{i: 20 for i in range(20, 26)}, 40: 40, 41: 40}
    # full-propagation reference, computed inline (the pre-round-14
    # formulation): iterate min over {own} ∪ {ALL neighbors} to the
    # fixpoint and compare label-for-label
    edges = (mixed.select(F.col("doc_id_1").alias("a"),
                          F.col("doc_id_2").alias("b"))
             .union(mixed.select(F.col("doc_id_2").alias("a"),
                                 F.col("doc_id_1").alias("b"))))
    labels = {n: n for n in comp}
    for _ in range(20):
        nxt = dict(labels)
        for e in edges.collect():
            nxt[e["a"]] = min(nxt[e["a"]], labels[e["b"]])
        if nxt == labels:
            break
        labels = nxt
    assert comp == labels


def test_connected_components_releases_superseded_checkpoints(spark):
    """Each round's localCheckpoint registers storage blocks; all but
    the final round's must be explicitly released (the ContextCleaner
    does not reliably reclaim them — the RRF leak class). A 9-node
    path needs ~8 propagation rounds, so without the release this
    would add several persistent RDDs; with it, at most one (the
    final checkpoint backing the returned frame) may remain."""
    jsc = spark.sparkContext._jsc
    baseline = len(jsc.getPersistentRDDs())
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "doc_id_1 long, doc_id_2 long"
    )
    out = dd.connected_components(pairs)
    assert {r["component_id"] for r in out.collect()} == {1}
    after = len(jsc.getPersistentRDDs())
    assert after <= baseline + 1, (
        f"components leaked {after - baseline} persistent RDDs"
    )


def test_connected_components_raises_on_non_convergence(spark):
    # a 6-node path needs ~5 propagation rounds; 1 iteration cannot
    # finish and must raise instead of returning partial labels
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_id_1 long, doc_id_2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(pairs, max_iterations=1)


def test_simhash_flags_near_identical(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(1, base), (2, base + "extra"), (3, "completely different words entirely")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_id_1"], r["doc_id_2"]) for r in dd.simhash_pairs(df, max_hamming=3).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_knn_finds_planted_twin(spark, emb):
    # plant an exact duplicate of vec 0 with a new id; it must be rank 1
    twin = emb.filter(F.col("vec_id") == 0).select(
        F.lit(999999).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(twin)
    out = sim.knn_bruteforce(corpus, corpus.filter(F.col("vec_id") == 999999), k=5)
    top = out.filter(F.col("rank") == 1).first()
    assert top["neighbor_id"] == 0
    assert top["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_recall_at_k_identity(spark, emb):
    ground = sim.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 4), k=20)
    assert sim.recall_at_k(ground, ground, k=20) == 1.0


def test_neardup_blocked_matches_fold(spark, emb):
    # the blocked-GEMM pair stage (semantic_dedup's engine) must emit
    # the exact pair set AND rounded scores of the interpreted-fold
    # contract, across thresholds spanning sparse to dense pair space
    probes = emb.filter(F.col("vec_id") % 20 == 0)
    for th in (0.9, 0.35, 0.1):
        fold = sim.embedding_neardup_pairs(emb, probes, threshold=th)
        blocked = sim.embedding_neardup_pairs_blocked(emb, probes, threshold=th)
        assert blocked.exceptAll(fold).count() == 0, th
        assert fold.exceptAll(blocked).count() == 0, th


def test_neardup_blocked_zero_norm_and_empty_probe(spark):
    # zero-norm vectors are NULL-cosine in the fold contract and must
    # be dropped, not divide-by-zero'd; an empty probe set yields an
    # empty frame with the contract schema
    rows = [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]), (4, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = df.filter(F.col("vec_id") <= 2)
    fold = sim.embedding_neardup_pairs(df, probes, threshold=0.5)
    blocked = sim.embedding_neardup_pairs_blocked(df, probes, threshold=0.5)
    assert sorted(map(tuple, blocked.collect())) == sorted(map(tuple, fold.collect())) == [
        (2, 3, 1.0)]
    empty = sim.embedding_neardup_pairs_blocked(
        df, df.filter(F.col("vec_id") < 0), threshold=0.5)
    assert empty.columns == ["id_1", "id_2", "cosine"] and empty.count() == 0


def test_neardup_blocked_dirty_rows_match_fold(spark):
    # NULL and wrong-dimension corpus vectors are dropped by the fold
    # contract (NULL-propagating zip_with) — the blocked variant must
    # filter them, not crash in np.stack; a NULL probe is dropped; a
    # mixed-dimension PROBE set cannot be represented as one matrix
    # and must refuse loudly rather than silently diverge
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None),
            (4, [1.0, 0.0, 0.0]), (5, [0.6, 0.8])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = df.filter(F.col("vec_id").isin(1, 3))
    fold = sim.embedding_neardup_pairs(df, probes, threshold=0.5)
    blocked = sim.embedding_neardup_pairs_blocked(df, probes, threshold=0.5)
    assert sorted(map(tuple, fold.collect())) == sorted(map(tuple, blocked.collect()))
    assert {r["id_2"] for r in blocked.collect()} == {2, 5}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="uniform probe dims"):
        sim.embedding_neardup_pairs_blocked(
            df, df.filter(F.col("vec_id").isin(1, 4)), threshold=0.5)


def test_neardup_bucketed_exact_mode_matches_fold(spark, emb):
    # the bucket-bounded FULL-CORPUS pair stage (semantic_dedup_full's
    # engine): the triangle-inequality probe bound must cover every
    # qualifying pair, so exact mode reproduces the fold contract's
    # pair set and rounded scores corpus-vs-corpus — at a loose
    # threshold (dense pair space, probe bound degenerates toward
    # all-pairs) and a tight one (sparse, bound prunes)
    for th in (0.45, 0.35):
        fold = sim.embedding_neardup_pairs(emb, emb, threshold=th)
        bucketed = sim.embedding_neardup_pairs_bucketed(
            emb, threshold=th, n_lists=16)
        assert bucketed.exceptAll(fold).count() == 0, th
        assert fold.exceptAll(bucketed).count() == 0, th


def test_neardup_bucketed_probe_mode_matches_fold(spark, emb):
    # probe-set semantics (the collect-free replacement for the
    # blocked tier's driver-collected probe matrix): exact mode must
    # reproduce the fold contract's (probe, corpus) ordered pairs and
    # rounded scores; id type mismatch between frames refuses loudly
    probes = emb.filter(F.col("vec_id") % 20 == 0)
    for th in (0.45, 0.35):
        fold = sim.embedding_neardup_pairs(emb, probes, threshold=th)
        bucketed = sim.embedding_neardup_pairs_bucketed(
            emb, threshold=th, probes=probes, n_lists=16)
        assert bucketed.exceptAll(fold).count() == 0, th
        assert fold.exceptAll(bucketed).count() == 0, th
    with pytest.raises(ValueError, match="must match"):
        sim.embedding_neardup_pairs_bucketed(
            emb, threshold=0.35,
            probes=probes.select(
                F.col("vec_id").cast("string").alias("vec_id"), "embedding"))


def test_neardup_bucketed_capped_probe_is_subset(spark, emb):
    # an integer n_probe trades recall for fixed cost: the result must
    # be a strict SUBSET of the exact pair set (never a wrong pair,
    # never a wrong score), with recall above a sanity floor
    exact = sim.embedding_neardup_pairs(emb, emb, threshold=0.35)
    capped = sim.embedding_neardup_pairs_bucketed(
        emb, threshold=0.35, n_lists=16, n_probe=4)
    assert capped.exceptAll(exact).count() == 0
    n_exact, n_capped = exact.count(), capped.count()
    assert n_capped >= 0.5 * n_exact, (n_capped, n_exact)


def test_neardup_bucketed_max_partners_bounds_megacluster(spark):
    # max_partners (round 10): the one regime where the pair CONTRACT
    # is quadratic — a duplicate mega-cluster of C members has
    # C(C-1)/2 qualifying pairs (the measured 23x wall at 30x data on
    # the clustered-pairs bench entry). The degree cap must (a) emit
    # a strict SUBSET of the uncapped pair set with identical scores,
    # (b) bound the total at ~linear in C instead of C^2, (c) keep
    # every clustered vector attached to >= 1 partner (exact mode
    # probes provably cover the best partner's home list), so "keep
    # one per cluster" dedup still drops every duplicate, and (d) be
    # deterministic across runs (ties cut by cosine value, never row
    # order).
    import numpy as np

    rng = np.random.RandomState(11)
    C, dim = 200, 16
    center = rng.randn(dim)
    center /= np.linalg.norm(center)
    X = center[np.newaxis, :] + 0.03 * rng.randn(C, dim)
    iso = rng.randn(20, dim) * 5  # far-away singletons
    rows = [(i, [float(x) for x in X[i]]) for i in range(C)]
    rows += [(1000 + i, [float(x) for x in iso[i]]) for i in range(20)]
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    full = sim.embedding_neardup_pairs_bucketed(emb2, threshold=0.9,
                                                n_lists=4)
    m = 4
    capped = sim.embedding_neardup_pairs_bucketed(emb2, threshold=0.9,
                                                  n_lists=4, max_partners=m)
    assert capped.exceptAll(full).count() == 0          # subset, same scores
    n_full, n_capped = full.count(), capped.count()
    assert n_full > C * (C - 1) / 4                     # the quadratic regime
    # linear bound: each row emits <= m per scored block from each of
    # its two orientations; with C=200 << block_rows there is one
    # block per bucket, so <= 2*m*C even before the pair dedupe
    assert n_capped <= 2 * m * C, (n_capped, n_full)
    # every clustered vector keeps at least one pair
    attached = {v for r in capped.collect() for v in (r[0], r[1])}
    assert attached >= set(range(C))
    # deterministic across runs
    again = sim.embedding_neardup_pairs_bucketed(emb2, threshold=0.9,
                                                 n_lists=4, max_partners=m)
    assert sorted(map(tuple, capped.collect())) == \
        sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError, match="max_partners"):
        sim.embedding_neardup_pairs_bucketed(emb2, threshold=0.9,
                                             max_partners=0)


def test_neardup_bucketed_dirty_rows_and_string_ids(spark):
    # NULL vectors, NULL elements, and zero-norm vectors drop (the
    # fold's NULL/NaN-cosine rule); ids are carried opaquely, so
    # string ids work — the blocked variant refuses them (it hardcodes
    # int64), which is also pinned here
    rows = [("a", [1.0, 0.0]), ("b", [1.0, 0.0]), ("c", None),
            ("d", [0.0, 0.0]), ("e", [0.6, 0.8])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    got = sorted(map(tuple, sim.embedding_neardup_pairs_bucketed(
        df, threshold=0.5, n_lists=2).collect()))
    assert got == [("a", "b", 1.0), ("a", "e", 0.6), ("b", "e", 0.6)]

    with pytest.raises(ValueError, match="integral id"):
        sim.embedding_neardup_pairs_blocked(df, df, threshold=0.5)
    with pytest.raises(ValueError, match="integral or string id"):
        sim.embedding_neardup_pairs_bucketed(
            df.select(F.col("vec_id").cast("decimal(10,2)").alias("vec_id"),
                      "embedding"),
            threshold=0.5)


def test_neardup_bucketed_probe_bound_prunes_on_clustered_corpus(spark):
    # the triangle probe bound's ADAPTIVITY: on a corpus with real
    # cluster structure (the SemDedup regime — near-dups are tight
    # clusters) at a production threshold, the mean probe fan-out
    # must prune most lists while the pair set stays EXACT. On the
    # driver's random fixture the bound honestly degrades toward
    # all-pairs (no structure to exploit) — that case is covered by
    # the parity tests above; this one pins the pruning claim with a
    # measured fan-out, mirroring the operator's own probe rule.
    import numpy as np

    rng = np.random.RandomState(7)
    K, n, dim = 16, 2500, 32
    centers = rng.randn(K, dim)
    centers /= np.linalg.norm(centers, axis=1)[:, np.newaxis]
    X = centers[rng.randint(0, K, n)] + 0.02 * rng.randn(n, dim)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = sim.embedding_neardup_pairs_bucketed(emb2, threshold=0.95,
                                               n_lists=K)
    fold = sim.embedding_neardup_pairs(emb2, emb2, threshold=0.95)
    assert got.exceptAll(fold).count() == 0
    assert fold.exceptAll(got).count() == 0
    assert fold.count() > 0

    # measured fan-out under the operator's own probe rule
    sample = np.array([r[1] for r in rows[:4096]], dtype=np.float64)
    sample /= np.linalg.norm(sample, axis=1)[:, np.newaxis]
    C = sim._kmeans_fit(sample, K, 42)
    d = np.sqrt(np.maximum(
        1.0 + (C * C).sum(1)[np.newaxis, :] - 2.0 * sample @ C.T, 0.0))
    two_r = 2.0 * (max(0.0, 2.0 - 2.0 * (0.95 - 1.001e-6)) ** 0.5)
    fan = (d <= d.min(1)[:, np.newaxis] + two_r + 1e-9).sum(1)
    assert fan.mean() <= K / 4, fan.mean()  # prunes >= 4x of the lists


def test_neardup_bucketed_no_driver_collect_of_corpus(spark, emb):
    # the plan must stay fully distributed: building it runs no Spark
    # job over the corpus besides the quantizer fit, and the physical
    # plan contains no broadcast of the corpus side (the r6 weak
    # shape was a corpus-proportional driver collect)
    pairs = sim.embedding_neardup_pairs_bucketed(emb, threshold=0.35,
                                                 n_lists=8)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_token_stats_known_values(spark):
    df = spark.createDataFrame([(1, "a b b c")], "doc_id long, text string")
    r = tx.token_stats(df).first()
    assert r["n_tokens"] == 4 and r["n_distinct"] == 3
    assert r["dup_ratio"] == 0.25
    assert r["mean_token_len"] == 1.0


def test_fingerprint_normalizes_whitespace_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "  hello world "), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in tx.doc_fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_bm25_prefers_term_dense_docs(spark):
    df = spark.createDataFrame(
        [(1, "spark spark spark join"), (2, "spark join data"), (3, "join data table")],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["bm25"] for r in tx.bm25_scores(df, ("spark",)).collect()}
    assert set(scores) == {1, 2}
    assert scores[1] > scores[2] > 0


def test_multimodal_feature_extraction(spark):
    df = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    media = mm.documents_as_media(df)
    meta = media.first()
    assert meta["meta"]["n_bytes"] == 8
    feats = mm.extract_features(media, fake=True, feature_dim=8).first()
    assert feats["n_bytes"] == 8
    # 8 bytes / 8 buckets -> width 1; integer floor-mean = the byte value
    assert feats["feature"] == [float(b) for b in b"abcdefgh"]


def test_multimodal_real_decoder_gated(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        mm.extract_features(mm.documents_as_media(df), fake=False).collect()


def test_enrich_classify_and_summarize(spark):
    df = spark.createDataFrame(
        [(1, "massive leak event detected near the seal of the unit ok")],
        "doc_id long, text string",
    )
    r = df.select(
        enrich.classify_keywords(F.col("text")).alias("c"),
        enrich.summarize_rule(F.col("text"), 3).alias("s"),
    ).first()
    assert r["c"] == "LEAK"
    assert r["s"] == "massive leak event"


def test_enrich_batched_hook(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "xy")], "doc_id long, text string")
    out = enrich.enrich_batched(df, lambda s: s.str.upper(), "label")
    got = {r["doc_id"]: r["label"] for r in out.collect()}
    assert got == {1: "ABC", 2: "XY"}


def test_enrich_batched_endpoint_contract(spark, docs):
    """End-to-end mock model endpoint through the batched hook: the
    endpoint must be invoked once per Arrow batch of <= batch_size rows
    (the reference's 10-20k-records-per-AISQL-call cost contract), and
    its labels must agree with the rule-based default classifier."""
    from snowflake_medtech_vigilance_lakehouse_spark.functions.scalar import (
        FAILURE_MODE_RULES,
    )

    n_calls = spark.sparkContext.accumulator(0)
    max_rows = spark.sparkContext.accumulator(0)
    oversize = spark.sparkContext.accumulator(0)

    def mock_endpoint(texts):
        # stands in for one remote model call per batch
        import pandas as pd

        n_calls.add(1)
        max_rows.add(len(texts))  # sum of batch sizes == total rows
        if len(texts) > 100:
            oversize.add(1)
        low = texts.str.lower().fillna("")
        out = pd.Series([None] * len(texts), index=texts.index, dtype=object)
        for kw, label in reversed(FAILURE_MODE_RULES):
            out[low.str.contains(kw.lower(), regex=False)] = label
        return out

    src = docs.select("doc_id", "text").repartition(2)
    batched = enrich.enrich_batched(
        src, mock_endpoint, "label", batch_size=100
    )
    rule = src.select(
        "doc_id", enrich.classify_keywords(F.col("text")).alias("label")
    )
    got = {r["doc_id"]: r["label"] for r in batched.collect()}
    want = {r["doc_id"]: r["label"] for r in rule.collect()}
    assert got == want  # endpoint output parity with the rule default

    total = src.count()
    assert max_rows.value == total  # every row passed through exactly once
    assert oversize.value == 0  # no call exceeded the batch-size cap
    # each call saw <= batch_size rows and the call count is consistent
    # with that cap across 2 partitions
    assert n_calls.value >= math.ceil(total / 100)
    assert n_calls.value <= math.ceil(total / 100) + 2  # partition remainders


def test_embed_hashing_deterministic_unit_norm(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    v1 = df.select(enrich.embed_hashing(F.col("text"), 16).alias("e")).first()["e"]
    v2 = df.select(enrich.embed_hashing(F.col("text"), 16).alias("e")).first()["e"]
    assert v1 == v2 and len(v1) == 16
    assert math.isclose(sum(x * x for x in v1), 1.0, rel_tol=1e-5)


def test_pii_redact_typed_placeholders_and_single_count(spark):
    # one of each kind in one string: the IP must become [IP] (not
    # [PHONE]), and each span must be counted under exactly one kind
    s = ("mail bob.s+1@corp.example.org call +1 (555) 010-4242 "
         "ssn 123-45-6789 from 10.0.142.7 ok")
    df = spark.createDataFrame([(1, s)], "doc_id long, text string")
    row = df.select(
        tx.pii_redact(F.col("text")).alias("red"), *tx.pii_counts(F.col("text"))
    ).first()
    assert row["red"] == "mail [EMAIL] call [PHONE] ssn [SSN] from [IP] ok"
    assert (row["n_email"], row["n_ssn"], row["n_ipv4"], row["n_phone"]) == (1, 1, 1, 1)


def test_pii_redact_ip_not_phone_and_short_digits_survive(spark):
    df = spark.createDataFrame(
        [(1, "ip 10.0.142.7 and v 1.2.3 order 12345 x")],
        "doc_id long, text string",
    )
    row = df.select(
        tx.pii_redact(F.col("text")).alias("red"), *tx.pii_counts(F.col("text"))
    ).first()
    # dotted version strings and short digit runs are untouched
    assert row["red"] == "ip [IP] and v 1.2.3 order 12345 x"
    assert row["n_phone"] == 0 and row["n_ipv4"] == 1


def test_pii_redact_dotted_phone(spark):
    # dot-separated phones redact (round-4 ADVICE: the dotless class
    # was a coverage regression); IPs still win because ipv4 runs
    # before phone on the progressively-redacted text
    df = spark.createDataFrame(
        [(1, "call 555.010.4242 or 555-010-4242 from 10.0.142.7")],
        "doc_id long, text string",
    )
    row = df.select(
        tx.pii_redact(F.col("text")).alias("red"), *tx.pii_counts(F.col("text"))
    ).first()
    assert row["red"] == "call [PHONE] or [PHONE] from [IP]"
    assert row["n_phone"] == 2 and row["n_ipv4"] == 1


def test_scd2_apply_transitions(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [
            # key 1: open current row + one closed history row
            (1, "alice", "A", "2020-01-01", None, True),
            (1, "alice", "OLD", "2019-01-01", "2020-01-01", False),
            # key 2: open row that will NOT change
            (2, "bob", "B", "2020-01-01", None, True),
            # key 3: open row with no update at all
            (3, "carol", "C", "2020-01-01", None, True),
        ],
        "k long, name string, seg string, valid_from string, valid_to string, is_current boolean",
    )
    upd = spark.createDataFrame(
        [
            (1, "alice", "A2", "2024-06-01"),   # tracked change -> close + rebirth
            (2, "bob", "B", "2024-06-01"),      # identical -> no-op
            (9, "zoe", "Z", "2024-06-01"),      # brand-new key
        ],
        "k long, name string, seg string, eff string",
    )
    out = scd2_apply(dim, upd, keys=["k"], tracked=["name", "seg"],
                     effective_col="eff").collect()
    rows = {(r["k"], r["valid_from"]): r for r in out}
    assert len(out) == 6
    # history passthrough
    assert rows[(1, "2019-01-01")]["is_current"] is False
    # closed: old current row ends at eff
    closed = rows[(1, "2020-01-01")]
    assert closed["valid_to"] == "2024-06-01" and closed["is_current"] is False
    assert closed["seg"] == "A"  # closed row keeps the OLD attributes
    # rebirth carries new attrs, open-ended
    reborn = rows[(1, "2024-06-01")]
    assert reborn["seg"] == "A2" and reborn["valid_to"] is None and reborn["is_current"]
    # no-op: bob unchanged, still one open row
    assert rows[(2, "2020-01-01")]["is_current"] and rows[(2, "2020-01-01")]["valid_to"] is None
    # untouched key passes through
    assert rows[(3, "2020-01-01")]["is_current"]
    # new member born at eff
    born = rows[(9, "2024-06-01")]
    assert born["name"] == "zoe" and born["is_current"] and born["valid_to"] is None


def test_scd2_apply_null_safe_tracking(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, None, "2020-01-01", None, True)],
        "k long, seg string, valid_from string, valid_to string, is_current boolean",
    )
    # NULL -> NULL is NOT a change; NULL -> value is
    noop = spark.createDataFrame([(1, None, "2024-06-01")], "k long, seg string, eff string")
    chg = spark.createDataFrame([(1, "S", "2024-06-01")], "k long, seg string, eff string")
    assert scd2_apply(dim, noop, ["k"], ["seg"], effective_col="eff").count() == 1
    assert scd2_apply(dim, chg, ["k"], ["seg"], effective_col="eff").count() == 2


def test_ngram_prefix_filter_is_lossless_vs_bruteforce(spark):
    """The AllPairs prefix filter must be exactly lossless: compare
    against an O(n^2) pure-Python Jaccard over random corpora (seeded).
    Catches any future prefix-length / ordering regression. Thresholds
    0.56 and 0.28 produce overshooting double products (0.56*25 =
    14.000000000000002 -> naive ceil 15, one too high, prefix one too
    short) at shingle-set sizes this corpus contains — they pin the
    exact-ceil fix; 0.5 is the representable control."""
    import random

    for seed, threshold in ((20260813, 0.5), (31337, 0.5),
                            (20260813, 0.56), (31337, 0.28)):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        docs = []
        for i in range(40):
            base = [rng.choice(vocab) for _ in range(rng.randint(3, 32))]
            docs.append((i, " ".join(base)))
            if rng.random() < 0.4:  # planted near-dups
                mut = list(base)
                for _ in range(rng.randint(0, 2)):
                    mut[rng.randrange(len(mut))] = rng.choice(vocab)
                docs.append((1000 + i, " ".join(mut)))

        def sh(text, n=3):
            toks = text.split(" ")
            return {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}

        expected = {}
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                ia, ta = docs[a]
                ib, tb = docs[b]
                sa, sb = sh(ta), sh(tb)
                if not sa or not sb:
                    continue
                inter = len(sa & sb)
                jac = inter / (len(sa) + len(sb) - inter)
                if jac >= threshold:
                    expected[tuple(sorted((ia, ib)))] = round(jac, 6)

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
               for r in dd.ngram_jaccard_pairs(df, threshold=threshold).collect()}
        assert got == expected, f"seed={seed} t={threshold}"


def test_ngram_prefix_exact_threshold_boundary(spark):
    """Deterministic pin for the exact-ceil prefix bound: build a pair
    at EXACTLY J = t = 0.56 with |a| = 25, where double arithmetic
    overshoots (0.56*25 -> ceil 15 instead of 14) and doc a's 11
    unique shingles all hash-sort before its 14 shared ones. A
    one-too-short prefix then contains only unique shingles, generates
    no candidate, and silently drops the pair."""
    vocab = [f"v{i}" for i in range(50)]
    hs = {r["t"]: r["h"] for r in spark.createDataFrame(
        [(t,) for t in vocab], "t string")
        .select("t", F.xxhash64(F.array("t")).alias("h")).collect()}
    by_hash = sorted(vocab, key=lambda t: hs[t])
    unique_a, shared = by_hash[:11], by_hash[11:25]
    df = spark.createDataFrame(
        [(1, " ".join(unique_a + shared)), (2, " ".join(shared))],
        "doc_id long, text string")
    got = {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
           for r in dd.ngram_jaccard_pairs(df, threshold=0.56, n=1).collect()}
    assert got == {(1, 2): round(14 / 25, 6)}


def test_dedup_plans_never_go_quadratic(spark, docs):
    """Plan guards: the pair-generation paths must stay bucketed —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere (all-pairs
    shapes that would melt at 100 TB)."""
    for df in (
        dd.ngram_jaccard_pairs(docs, threshold=0.5),
        dd.ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=64),
        dd.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=32, bands=16),
        dd.simhash_pairs(docs, max_hamming=3),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_fuzz_against_python_model(spark):
    """Differential: random update batches applied through scd2_apply
    must match a plain-Python SCD2 state machine (seeded)."""
    import random

    for seed in (20260813, 4242):
        rng = random.Random(seed)
        from snowflake_medtech_vigilance_lakehouse_spark.operators.scd import scd2_apply

        # model: key -> list of versions [(seg, vf, vt, cur)]
        model = {}
        rows = []
        for k in range(30):
            seg = rng.choice("ABCD")
            model[k] = [(seg, "2020-01-01", None, True)]
            rows.append((k, seg, "2020-01-01", None, True))
        dim = spark.createDataFrame(
            rows, "k long, seg string, valid_from string, valid_to string, is_current boolean")

        for step, eff in enumerate(["2021-06-01", "2022-06-01", "2023-06-01"]):
            keys = rng.sample(range(40), rng.randint(5, 20))  # some brand-new (>=30)
            batch = [(k, rng.choice("ABCD"), eff) for k in keys]
            dim = scd2_apply(
                dim, spark.createDataFrame(batch, "k long, seg string, eff string"),
                keys=["k"], tracked=["seg"], effective_col="eff")
            for k, seg, _ in batch:
                if k not in model:
                    model[k] = [(seg, eff, None, True)]
                    continue
                vers = model[k]
                (cseg, cvf, _, _) = vers[-1]
                if cseg != seg:
                    vers[-1] = (cseg, cvf, eff, False)
                    vers.append((seg, eff, None, True))

            got = {}
            for r in dim.collect():
                got.setdefault(r["k"], []).append(
                    (r["seg"], r["valid_from"], r["valid_to"], r["is_current"]))
            want = {k: sorted(v, key=lambda t: t[1]) for k, v in model.items()}
            got = {k: sorted(v, key=lambda t: t[1]) for k, v in got.items()}
            assert got == want, f"seed={seed} step={step}"


def test_media_frames_and_resize_are_byte_true(spark):
    # the fake sampler/resizer slice BYTES, not characters: non-UTF8
    # payloads must slice and hash correctly, empty payloads yield no
    # frames / a zero-size resize, and the real decoders stay gated
    import hashlib

    payload = bytes(range(256)) * 2 + b"\xff\x00\xfe"  # 515 bytes, non-UTF8
    rows = [(1, "video", payload), (2, "video", b""), (3, "video", None)]
    media = mm.attach_media_meta(spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"))

    frames = {(r["frame_idx"]): r for r in mm.sample_frames(
        media, fake=True, frame_size=256, stride=2).collect()}
    # 515 bytes -> 3 frames (256/256/3), stride 2 keeps idx 0 and 2
    assert set(frames) == {0, 2}
    assert frames[0]["n_bytes"] == 256 and frames[2]["n_bytes"] == 3
    assert frames[0]["frame_md5"] == hashlib.md5(payload[:256]).hexdigest()
    assert frames[2]["frame_md5"] == hashlib.md5(payload[512:]).hexdigest()

    resized = {r["media_id"]: r for r in mm.resize_media(
        media, fake=True, factor=4).collect()}
    assert resized[1]["n_bytes_out"] == 129  # ceil(515/4)
    assert resized[1]["resized_md5"] == hashlib.md5(
        payload[:129]).hexdigest()
    assert resized[2]["n_bytes_out"] == resized[3]["n_bytes_out"] == 0

    for op in (mm.sample_frames, mm.resize_media):
        with pytest.raises(Exception) as e:
            op(media).collect()
        assert "NotImplementedError" in str(e.value) or isinstance(
            e.value, NotImplementedError)


def test_auto_n_lists_sizing_rule():
    # the 100 TB sizing lever as code: per-list HOME volume bounded at
    # ~target_list_rows once the corpus outgrows cores*target; floored
    # at the session parallelism (no idle cores on small corpora);
    # capped at the driver-sample quantizer's estimation floor
    assert sim.auto_n_lists(2000, 32) == 32       # parallelism floor
    assert sim.auto_n_lists(20000, 32) == 40      # count-driven
    assert sim.auto_n_lists(60000, 32) == 118
    assert sim.auto_n_lists(10_000_000, 32) == 512  # sample ceiling
    assert sim.auto_n_lists(0, 32) == 32
    assert sim.auto_n_lists(100, 1) == 1
    for n in (50_000, 100_000, 200_000):          # unclamped regime
        assert n / sim.auto_n_lists(n, 32) <= 512


def test_neardup_bucketed_auto_n_lists_matches_pinned(spark, emb):
    # auto-sizing moves only throughput, never the pair set: the
    # triangle probe bound is exact under ANY quantizer, so the
    # auto-sized layout reproduces the pinned-16 result (and therefore
    # the fold contract) bit-for-bit
    auto = sim.embedding_neardup_pairs_bucketed(emb, threshold=0.35)
    pinned = sim.embedding_neardup_pairs_bucketed(
        emb, threshold=0.35, n_lists=16)
    assert auto.exceptAll(pinned).count() == 0
    assert pinned.exceptAll(auto).count() == 0


def test_repetition_stats_exact_values(spark):
    # hand-computed Gopher-style repetition signals, incl. the
    # degenerate single-token doc (sequence(0,-1) is DESCENDING in
    # Spark — the guard must yield empty bigrams, not index errors)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.text import (
        repetition_stats)

    df = spark.createDataFrame([
        (1, "a b a b a"),   # top tok a=3/5; bigrams [a b,b a,a b,b a]
        (2, "x"),           # no bigrams
        (3, "w w w w"),     # fully repeated
        (4, "p q r s"),     # fully distinct
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert (got[1]["n_tokens"], got[1]["top_token_frac"],
            got[1]["top_bigram_frac"], got[1]["dup_bigram_frac"]) == \
        (5, 0.6, 0.5, 1.0)
    assert (got[2]["top_token_frac"], got[2]["top_bigram_frac"],
            got[2]["dup_bigram_frac"]) == (1.0, None, None)
    assert (got[3]["top_token_frac"], got[3]["top_bigram_frac"],
            got[3]["dup_bigram_frac"]) == (1.0, 1.0, 1.0)
    assert (got[4]["top_token_frac"], got[4]["dup_bigram_frac"]) == \
        (0.25, 0.0)
    assert abs(got[4]["top_bigram_frac"] - 1 / 3) < 1e-6


def test_domain_cap_deterministic_and_capped(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        domain_cap)

    rows = [(i, f"d{i % 3}") for i in range(30)] + [(100, "lonely")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = domain_cap(df, cap=4).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r["domain"], []).append(r)
    assert {d: len(v) for d, v in by_dom.items()} == {
        "d0": 4, "d1": 4, "d2": 4, "lonely": 1}
    for v in by_dom.values():
        assert sorted(r["keep_rank"] for r in v) == list(range(len(v)))
    # deterministic: a rerun keeps the SAME documents (hash rank, not
    # arrival order or rand())
    again = {(r["doc_id"], r["domain"], r["keep_rank"])
             for r in domain_cap(df, cap=4).collect()}
    assert again == {(r["doc_id"], r["domain"], r["keep_rank"])
                     for r in kept}
    import pytest as _pt
    with _pt.raises(ValueError, match="cap"):
        domain_cap(df, cap=0)


def test_minhash_incremental_matches_full_restricted(spark, docs):
    """Incremental dedup against the store == the full-corpus operator
    on corpus ∪ increment restricted to pairs touching the increment:
    the accept/reject decisions made incrementally are exactly what a
    from-scratch rebuild would make."""
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incr = docs.filter(F.col("doc_id") % 10 == 0)
    cb, ch = dd.minhash_store_frames(corpus, num_hashes=64, bands=32)
    inc = dd.minhash_neardup_against(incr, cb, ch, threshold=0.5,
                                     num_hashes=64, bands=32)
    full = dd.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=64,
                                bands=32)
    touching = full.filter((F.col("doc_id_1") % 10 == 0)
                           | (F.col("doc_id_2") % 10 == 0))
    got = {(r[0], r[1], r[2]) for r in inc.collect()}
    want = {(r[0], r[1], r[2]) for r in touching.collect()}
    assert got == want and len(want) > 0


def test_minhash_replayed_increment_emits_each_pair_once(spark, docs):
    """Crash-replay: the increment docs are ALREADY absorbed into the
    store (they exist on both sides). The pairs output must still hold
    one row per surviving pair — the replayed doc's hash set must not
    be carried twice through the verification joins — and the rows
    must equal the pre-absorb run exactly (replay converges)."""
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incr = docs.filter(F.col("doc_id") % 10 == 0)
    cb0, ch0 = dd.minhash_store_frames(corpus, num_hashes=64, bands=32)
    before = dd.minhash_neardup_against(
        incr, cb0, ch0, threshold=0.5, num_hashes=64, bands=32).collect()

    # the post-absorb store = corpus ∪ increment; the same increment
    # replays against it
    cb1, ch1 = dd.minhash_store_frames(docs, num_hashes=64, bands=32)
    replay = dd.minhash_neardup_against(
        incr, cb1, ch1, threshold=0.5, num_hashes=64, bands=32).collect()

    rows = [tuple(r) for r in replay]
    assert len(rows) == len(set(rows)), "duplicate pair rows on replay"
    assert set(rows) == {tuple(r) for r in before} and len(rows) > 0


def test_minhash_store_roundtrip_append_and_refusal(spark, docs, tmp_path):
    """Persisted store: build → query equals the in-plan frames;
    absorbing the increment then querying a SECOND increment sees
    first-increment docs as corpus; re-absorbing an already-present
    doc_id refuses loudly."""
    store = str(tmp_path / "mh_store")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incr = docs.filter(F.col("doc_id") % 10 == 0)
    dd.build_minhash_store(corpus, store, num_hashes=64, bands=32)

    via_store = dd.minhash_neardup_incremental(spark, incr, store,
                                               threshold=0.5)
    cb, ch = dd.minhash_store_frames(corpus, num_hashes=64, bands=32)
    in_plan = dd.minhash_neardup_against(incr, cb, ch, threshold=0.5,
                                         num_hashes=64, bands=32)
    assert ({tuple(r) for r in via_store.collect()}
            == {tuple(r) for r in in_plan.collect()})

    # absorb the increment; a duplicate of an increment doc now
    # surfaces as a (new_doc, absorbed_doc) pair
    dd.append_minhash_store(incr, store)
    probe = incr.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
        *[c for c in incr.columns if c not in ("doc_id", "text")])
    hits = dd.minhash_neardup_incremental(spark, probe, store,
                                          threshold=0.5).collect()
    absorbed = {r["doc_id"] for r in incr.select("doc_id").collect()}
    assert any(r["doc_id_1"] in absorbed for r in hits)

    with pytest.raises(ValueError, match="already present"):
        dd.append_minhash_store(incr, store)


def test_embedding_neardup_indexed_matches_bruteforce(spark, emb, tmp_path):
    """The indexed incremental pair stage is EXACT: equals the
    brute-force cross join (both orientations, round-then-filter) at
    a loose threshold that forces wide probing, and its scoring plan
    never shuffles the corpus (broadcast-only joins over the
    directory-pruned read)."""
    import re

    from snowflake_medtech_vigilance_lakehouse_spark.functions.vectors import (
        cosine_from_norms, l2_norm)

    corpus = emb.filter(F.col("vec_id") % 10 != 0).select(
        "vec_id", "embedding")
    incr = emb.filter(F.col("vec_id") % 10 == 0)
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(corpus, idx, n_lists=8, seed=42)
    got = sim.embedding_neardup_indexed(spark, idx, incr, threshold=0.35)
    # over-cap increments route to the in-plan fold path — identical
    # pairs (the fold≡GEMM pin; numerics differ only past the 6 dp
    # rounding contract)
    fold = sim.embedding_neardup_indexed(spark, idx, incr, threshold=0.35,
                                         max_driver_queries=0)
    assert ({tuple(r) for r in got.collect()}
            == {tuple(r) for r in fold.collect()})

    p = incr.select(F.col("vec_id").alias("_qid"),
                    F.col("embedding").cast("array<double>").alias("_qv"),
                    l2_norm(F.col("embedding")).alias("_qn"))
    c = corpus.select(F.col("vec_id").alias("_cid"),
                      F.col("embedding").cast("array<double>").alias("_cv"),
                      l2_norm(F.col("embedding")).alias("_cn"))
    ref = (c.crossJoin(F.broadcast(p))
           .filter(F.col("_cid") != F.col("_qid"))
           .select(F.least("_qid", "_cid").alias("id_1"),
                   F.greatest("_qid", "_cid").alias("id_2"),
                   F.round(cosine_from_norms(
                       F.col("_qv"), F.col("_cv"),
                       F.col("_qn"), F.col("_cn")), 6).alias("cosine"))
           .filter(F.col("cosine") >= 0.35))
    assert ({tuple(r) for r in got.collect()}
            == {tuple(r) for r in ref.collect()})

    # neither path ever shuffles the corpus: the GEMM plan is a pruned
    # scan + mapInPandas, the fold plan is broadcast-join only
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert not re.findall(r"Exchange (?:hash|range|Single)", plan)
    assert "MapInPandas" in plan
    fplan = fold._jdf.queryExecution().executedPlan().toString()
    assert not re.findall(r"Exchange (?:hash|range|Single)", fplan)
    assert "BroadcastExchange" in fplan


def test_embedding_neardup_indexed_radii_survive_append(spark, emb,
                                                        tmp_path):
    """Appending a vector that EXPANDS its list's radius must expand
    the persisted bound too — with a stale radius the next increment's
    probe set would provably miss the appended vector's list and the
    pair would silently vanish. Exercises the _ivf_update_radii
    max-merge through the CDF refresh path."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_ivf_from_cdf)

    corpus = emb.filter(F.col("vec_id") < 400).select("vec_id", "embedding")
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(corpus, idx, n_lists=4, seed=42)

    # an outlier far outside every list's current radius: its twin
    # arriving later can only be found if the append grew the bound
    dim = len(emb.first()["embedding"])
    outlier = [100.0] * dim
    tbl = str(tmp_path / "delta")
    dl.write_delta(spark.createDataFrame(
        [(900001, outlier)], "vec_id long, embedding array<float>"), tbl)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [0]

    twin = spark.createDataFrame(
        [(900002, [float(x) for x in outlier])],
        "vec_id long, embedding array<double>")
    hits = sim.embedding_neardup_indexed(spark, idx, twin,
                                         threshold=0.9).collect()
    assert {(r["id_1"], r["id_2"]) for r in hits} == {(900001, 900002)}

    # degenerate increment rows can never qualify and are dropped
    dirty = spark.createDataFrame(
        [(1, None), (2, [0.0] * dim), (3, [None] * dim)],
        "vec_id long, embedding array<double>")
    assert sim.embedding_neardup_indexed(
        spark, idx, dirty, threshold=0.9).count() == 0


def test_ivf_append_fused_stats_growth_and_radii_corners(spark, emb,
                                                         tmp_path):
    """Round-13: _ivf_append_batch computes growth counts and the
    radii merge from ONE per-list aggregate. Corner pins: a zero-norm
    appended vector is COUNTED in the growth tick (it serves, and the
    rebuild trigger must see it) but its list is excluded from the
    radii max-merge when it is the only appended member (the old
    _ivf_radii_frame dropped unscorable rows before aggregating — a
    batch-only NULL would otherwise flip the list to
    probe-unconditionally forever)."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_ivf_from_cdf)

    corpus = emb.filter(F.col("vec_id") < 400).select("vec_id", "embedding")
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(corpus, idx, n_lists=4, seed=42)
    rad_before = {r["list_id"]: r["rad"] for r in
                  spark.read.parquet(idx + "_radii").collect()}

    dim = len(emb.first()["embedding"])
    tbl = str(tmp_path / "delta")
    dl.write_delta(spark.createDataFrame(
        [(900001, [0.0] * dim), (900002, [50.0] * dim)],
        "vec_id long, embedding array<float>"), tbl)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [0]

    growth = {r["list_id"]: r["n_appended"] for r in
              spark.read.parquet(idx + "_growth").collect()}
    assert sum(growth.values()) == 2  # zero-norm row counted
    rad_after = {r["list_id"]: r["rad"] for r in
                 spark.read.parquet(idx + "_radii").collect()}
    # the merged sidecar must equal the OLD formulation exactly:
    # max-merge of the build radii with _ivf_radii_frame over the
    # appended rows (which drops the unscorable zero-norm row — so
    # its list, receiving nothing else, keeps its build radius)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.similarity import (
        _ivf_radii_frame)
    appended = (spark.read.parquet(idx)
                .filter(F.col("vec_id").isin(900001, 900002))
                .select("list_id", "_v", "_nrm"))
    batch_rad = {r["list_id"]: r["rad"] for r in _ivf_radii_frame(
        appended, spark.read.parquet(idx + "_centroids")).collect()}
    expected = dict(rad_before)
    for lid, rad in batch_rad.items():
        prev = expected.get(lid)
        if lid not in expected:
            expected[lid] = rad
        elif prev is None or rad is None:
            expected[lid] = None
        else:
            expected[lid] = max(prev, rad)
    assert rad_after == expected
    zero_list = [r["list_id"] for r in
                 spark.read.parquet(idx)
                 .filter(F.col("vec_id") == 900001).collect()]
    assert len(zero_list) == 1  # the zero-norm row SERVES (growth saw it)


def test_duplicated_span_stats_exact_values(spark):
    # hand-computed ExactSubstr coverage, incl. intra-doc repeats and
    # the interval union (overlapping duplicated spans are not
    # double-counted) and the <n-token zero row
    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        duplicated_span_stats)

    df = spark.createDataFrame([
        (1, "a b c d e"),   # "a b c" repeats in doc 2
        (2, "x a b c y"),
        (3, "z z"),         # shorter than the span
        (4, "q q q q"),     # intra-doc repeat: "q q q" at pos 1 and 2
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           duplicated_span_stats(df, n=3).collect()}
    assert (got[1]["n_tokens"], got[1]["dup_ngrams"],
            got[1]["dup_covered"], got[1]["dup_ratio"]) == (5, 1, 3, 0.6)
    assert (got[2]["dup_ngrams"], got[2]["dup_covered"],
            got[2]["dup_ratio"]) == (1, 3, 0.6)
    assert (got[3]["n_tokens"], got[3]["dup_ngrams"],
            got[3]["dup_covered"], got[3]["dup_ratio"]) == (2, 0, 0, 0.0)
    # union of {1,2,3} and {2,3,4} is 4 positions, not 6
    assert (got[4]["n_tokens"], got[4]["dup_ngrams"],
            got[4]["dup_covered"], got[4]["dup_ratio"]) == (4, 2, 4, 1.0)


def test_cut_duplicated_spans_removes_covered_positions(spark):
    """The ExactSubstr ACTION tier: covered positions are cut, the
    interval union handles overlaps, a fully-boilerplate doc becomes
    the EMPTY STRING (not NULL), and dup-free docs pass through
    byte-identical."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        cut_duplicated_spans)

    df = spark.createDataFrame([
        (1, "a b c d e"),   # "a b c" dups with doc 2 -> cut pos 1-3
        (2, "x a b c y"),   # span at pos 2 -> cut pos 2-4
        (3, "z z"),         # < n tokens: untouched
        (4, "q q q q"),     # intra-doc overlap: spans 1,2 cover all
        (5, "unique words entirely here"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in cut_duplicated_spans(df, n=3).collect()}
    assert (got[1]["n_tokens"], got[1]["n_kept"],
            got[1]["text_cut"]) == (5, 2, "d e")
    assert (got[2]["n_kept"], got[2]["text_cut"]) == (2, "x y")
    assert (got[3]["n_kept"], got[3]["text_cut"]) == (2, "z z")
    assert (got[4]["n_kept"], got[4]["text_cut"]) == (0, "")
    assert got[5]["text_cut"] == "unique words entirely here"


def test_duplicated_span_stats_hot_span_skew_path(spark):
    """Adversarial boilerplate: ONE 8-token span carried by 50k of
    60k docs. The dup-span join-back must (a) broadcast the (tiny)
    duplicated-span list under defaults — never ship every hot
    occurrence to one sort-merge task — and (b) when a corpus-scale
    run forces the shuffle join instead, AQE's OptimizeSkewedJoin
    must split the hot partition (production-shaped thresholds, the
    test_scale.py skew pattern). Values are pinned exactly on both
    paths."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        duplicated_span_stats)

    hot = "alpha beta gamma delta epsilon zeta eta theta"
    # 50k docs that ARE the boilerplate span (the hot join key must
    # dominate the 4-partition test session's median partition for
    # the split detector to see it) + 10k clean 12-unique-token docs
    docs = spark.range(0, 60_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 6 == 5, F.concat_ws(" ", *[
            F.concat(F.lit(f"v{j}x"), F.col("id")) for j in range(12)])
        ).otherwise(F.lit(hot)).alias("text"))

    def check(rows):
        got = {r["doc_id"]: r for r in rows}
        assert len(got) == 60_000
        spiked, clean = got[0], got[5]
        # the whole 8-token doc is one corpus-wide duplicated span
        assert (spiked["n_tokens"], spiked["dup_ngrams"],
                spiked["dup_covered"], spiked["dup_ratio"]) == (8, 1, 8, 1.0)
        assert (clean["n_tokens"], clean["dup_ngrams"],
                clean["dup_covered"], clean["dup_ratio"]) == (12, 0, 0, 0.0)

    df = duplicated_span_stats(docs)
    check(df.collect())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "skew=true" not in plan

    tight = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in tight}
    for k, v in tight.items():
        spark.conf.set(k, v)
    try:
        df2 = duplicated_span_stats(docs)
        check(df2.collect())
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan2
        assert "skew=true" in plan2  # OptimizeSkewedJoin split the hot key
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def test_gopher_filter_rules_and_reasons(spark):
    # hand-computed signal values and rule codes, incl. a multi-reason
    # document and the all-pass row
    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        gopher_filter)

    df = spark.createDataFrame([
        (1, "the cat sat on the mat today fine ok yes"),  # 10 toks, pass
        (2, "x y"),                    # too short + short words + no stopwords
        (3, "the the the the the the the the the one"),  # repetition
        (4, "extraordinarily extraordinarily extraordinarily "
            "extraordinarily the antidisestablishmentarian word "
            "word word word"),         # long words
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_filter(
        df, min_tokens=5, min_mean_word_len=2.0, max_mean_word_len=10.0,
        min_stopword_frac=0.05, max_top_token_frac=0.5).collect()}
    assert got[1]["keep"] and got[1]["reasons"] == ""
    assert got[1]["n_tokens"] == 10 and got[1]["stopword_frac"] == 0.2
    assert got[2]["reasons"] == "len_lo,wordlen_lo,stopword"
    assert not got[2]["keep"]
    # doc 3: 'the' 9/10 = 0.9 > 0.5 ceiling; stopwords 9/10 pass
    assert got[3]["reasons"] == "repetition"
    assert got[3]["top_token_frac"] == 0.9
    # doc 4: mean word len > 10 -> wordlen_hi only
    assert got[4]["reasons"] == "wordlen_hi"


def test_weighted_sample_matches_reference_selection(spark):
    # the A-Res selection recomputed independently in Python (hashlib
    # md5 -> uniform -> ln(u)/w) must equal the Spark output exactly,
    # and heavier rows must dominate the sample
    import hashlib
    import math

    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        weighted_sample)

    rows = [(i, 1000.0 if i < 5 else 1.0) for i in range(105)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, 10, weight_col="w").collect()
    assert len(got) == 10

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return math.log((h + 0.5) / 2 ** 32) / w

    expect = sorted(rows, key=lambda r: (-key(*r), r[0]))[:10]
    assert [r["doc_id"] for r in got] == [i for i, _ in expect]
    # inclusion ~ weight: all five heavy rows must be selected
    assert {0, 1, 2, 3, 4} <= {r["doc_id"] for r in got}
    # deterministic across replans
    again = weighted_sample(df, 10, weight_col="w").collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in got]


def test_cohort_retention_hand_matrix(spark):
    from datetime import datetime

    from snowflake_medtech_vigilance_lakehouse_spark.operators.temporal import (
        cohort_retention)

    # Mondays: 2024-01-01 (w0), 2024-01-08 (w1)
    ev = spark.createDataFrame([
        (1, "A", datetime(2024, 1, 2, 10)),   # w0 cohort
        (2, "A", datetime(2024, 1, 9, 11)),   # returns w1
        (3, "A", datetime(2024, 1, 9, 12)),   # same week, same user
        (4, "B", datetime(2024, 1, 3, 9)),    # w0 cohort, never returns
        (5, "C", datetime(2024, 1, 10, 8)),   # w1 cohort
    ], "event_id long, user_id string, ts timestamp")
    got = {(r["cohort_week"], r["week_offset"]): r
           for r in cohort_retention(ev).collect()}
    assert got[("2024-01-01", 0)]["n_users"] == 2
    assert got[("2024-01-01", 0)]["retention"] == 1.0
    assert got[("2024-01-01", 1)]["n_users"] == 1
    assert got[("2024-01-01", 1)]["retention"] == 0.5
    assert got[("2024-01-08", 0)]["n_users"] == 1
    assert len(got) == 3


def test_char_lm_score_short_docs_zero_bigrams(spark):
    # sequence(1, 0) is DESCENDING in Spark -> the bigram transform
    # must be guarded or short docs fabricate junk bigrams that also
    # poison the corpus model totals (round-8 review finding)
    import math

    from snowflake_medtech_vigilance_lakehouse_spark.operators.text import (
        char_lm_score)

    df = spark.createDataFrame(
        [(1, "abcd"), (2, "x"), (3, "")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_lm_score(df).collect()}
    assert (got[2]["n_bigrams"], got[2]["avg_logprob"]) == (0, None)
    assert (got[3]["n_bigrams"], got[3]["avg_logprob"]) == (0, None)
    # doc 1: bigrams ab/bc/cd, each count 1 of total 3 -> avg ln(1/3)
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["avg_logprob"] - round(math.log(1 / 3), 6)) < 1e-9


def test_char_lm_score_single_model_pass_and_widened_parse(spark, tmp_path):
    """Round-9 fusion contract: the model aggregate is computed once
    (lazy localCheckpoint) and serves both the broadcast build and the
    total fold — the outer plan carries exactly ONE text-column scan
    (the scoring pass) plus checkpoint-RDD reads, never a second or
    third corpus parse; and a narrower-than-cores input is widened
    before the CPU-heavy bigram transform. Reads its own parquet copy
    so another test's cached fixture can't replace the FileScan the
    assertions count."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.text import (
        char_lm_score)

    src = str(tmp_path / "clm_docs")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
     .select("doc_id", "text").coalesce(1).write.parquet(src))
    docs = spark.read.parquet(src)
    df = char_lm_score(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReadSchema: struct<doc_id:bigint,text:string>") == 1
    assert plan.count("ExistingRDD") == 2  # model bcast + total fold
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan
    # and it still computes: same values as a direct recompute
    import math

    got = {r["doc_id"]: r for r in char_lm_score(spark.createDataFrame(
        [(1, "aaa"), (2, "ab")], "doc_id long, text string")).collect()}
    # model: aa x2, ab x1 -> doc1 avg = ln(2/3), doc2 = ln(1/3)
    assert got[1]["n_bigrams"] == 2
    assert abs(got[1]["avg_logprob"] - round(math.log(2 / 3), 6)) < 1e-9
    assert abs(got[2]["avg_logprob"] - round(math.log(1 / 3), 6)) < 1e-9


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        weighted_sample)

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, 0.0), (4, None), (5, 2.0)],
        "doc_id long, w double")
    got = weighted_sample(df, 10, weight_col="w").collect()
    assert {r["doc_id"] for r in got} == {1, 5}


def test_pagerank_matches_numpy_power_iteration(spark):
    # independent dense power iteration with the same removed-dangling
    # formulation, incl. a dangling node (only ever a destination) and
    # a zero-in-degree node that must keep its teleport mass
    from snowflake_medtech_vigilance_lakehouse_spark.operators.graph import (
        pagerank)

    edges = [("a", "b"), ("b", "a"), ("c", "a"), ("a", "d"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["pagerank"]
           for r in pagerank(df, damping=0.85, iters=5).collect()}

    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    r = [1.0 / n] * n
    for _ in range(5):
        nxt = [(1 - 0.85) / n] * n
        for s, d in edges:
            nxt[idx[d]] += 0.85 * r[idx[s]] / outdeg[s]
        r = nxt
    for v in nodes:
        assert abs(got[v] - round(r[idx[v]], 6)) < 1e-9, (v, got[v], r[idx[v]])
    # dangling 'd' absorbed mass but contributed none; 'c' has no
    # in-links and sits at pure teleport mass
    assert got["c"] == round((1 - 0.85) / n, 6)
    assert got["d"] > got["c"]


def test_pagerank_releases_superseded_checkpoints(spark):
    # same storage discipline as connected_components: inputs and all
    # superseded rank rounds are released; at most the final rank
    # checkpoint backing the returned frame may remain
    from snowflake_medtech_vigilance_lakehouse_spark.operators.graph import (
        pagerank)

    jsc = spark.sparkContext._jsc
    baseline = len(jsc.getPersistentRDDs())
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "src long, dst long")
    out = pagerank(edges, iters=8)
    # a directed 10-cycle is rank-uniform: every node at 1/10
    assert {r["pagerank"] for r in out.collect()} == {0.1}
    after = len(jsc.getPersistentRDDs())
    assert after <= baseline + 1, (
        f"pagerank leaked {after - baseline} persistent RDDs")


def test_keep_representatives_one_max_score_keeper_per_cluster(spark):
    """CC + PageRank composed into the keep decision: exactly one keep
    per cluster, and it is the max-pagerank member (the hub), with a
    deterministic min-id tiebreak — NOT the min-id member."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.graph import (
        keep_representatives, pagerank)

    # two clusters: a 4-node star centered on 30 (so the hub has the
    # highest centrality but NOT the smallest id), and a 2-node pair
    # (a tie: symmetric ranks -> min-id wins)
    pairs = spark.createDataFrame(
        [(10, 30), (20, 30), (40, 30), (50, 60)],
        "doc_id_1 long, doc_id_2 long")
    rows = keep_representatives(pairs).collect()
    by_id = {r["doc_id"]: r for r in rows}

    assert len(rows) == 6
    # cluster labels are the min-id canonical (the components contract)
    assert {r["component_id"] for r in rows} == {10, 50}
    keepers = {r["component_id"]: r["doc_id"] for r in rows if r["keep"]}
    n_keep = sum(1 for r in rows if r["keep"])
    assert n_keep == 2 and keepers == {10: 30, 50: 50}
    # the star hub outranks every leaf; leaves share the same score
    leaf = {by_id[i]["score"] for i in (10, 20, 40)}
    assert len(leaf) == 1 and by_id[30]["score"] > leaf.pop()

    # caller-supplied scores override the internal pagerank — a leaf
    # can be forced keeper; ties in supplied scores break by min id
    scores = spark.createDataFrame(
        [(10, 0.9), (20, 0.9), (30, 0.1), (40, 0.1),
         (50, 0.5), (60, 0.5)], "node long, pagerank double")
    forced = {r["component_id"]: r["doc_id"]
              for r in keep_representatives(pairs, scores).collect()
              if r["keep"]}
    assert forced == {10: 10, 50: 50}

    # composition consistency: the internal scores equal a direct
    # pagerank over the symmetrized pair edges
    edges = pairs.selectExpr("doc_id_1 AS src", "doc_id_2 AS dst").union(
        pairs.selectExpr("doc_id_2 AS src", "doc_id_1 AS dst"))
    direct = {r["node"]: r["pagerank"]
              for r in pagerank(edges, damping=0.85, iters=5).collect()}
    for i, r in by_id.items():
        assert r["score"] == direct[i]

    # components= (round 10, the leakage_safe_split twin): precomputed
    # labels skip the CC loop and the output is identical; with BOTH
    # scores and components supplied, pairs may be None entirely
    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        connected_components)

    comps = connected_components(pairs)
    via_comps = {tuple(r) for r in
                 keep_representatives(pairs, components=comps).collect()}
    assert via_comps == {tuple(r) for r in rows}
    pr = spark.createDataFrame(
        [(n, direct[n]) for n in direct], "node long, pagerank double")
    no_pairs = {tuple(r) for r in keep_representatives(
        None, pr, components=comps).collect()}
    assert no_pairs == {tuple(r) for r in rows}
    with pytest.raises(ValueError, match="needs pairs"):
        keep_representatives(None, components=comps)
    # a stale label frame missing graph nodes must not silently drop
    # them: the missing node falls back to its own singleton cluster
    stale = comps.filter(F.col("doc_id") != 60)
    with_stale = {r["doc_id"]: r for r in
                  keep_representatives(pairs,
                                       components=stale).collect()}
    assert set(with_stale) == {10, 20, 30, 40, 50, 60}
    assert with_stale[60]["component_id"] == 60      # singleton fallback
    assert with_stale[60]["keep"] is True            # keeper of itself
    assert with_stale[50]["keep"] is True            # now alone in 50
    # round-11 ADVICE fix: with pairs AND scores AND components all
    # supplied, pairs still defines the node universe — the old path
    # took the stale label frame as the universe and silently dropped
    # pair node 60
    three = {r["doc_id"]: r for r in
             keep_representatives(pairs, pr, components=stale).collect()}
    assert set(three) == {10, 20, 30, 40, 50, 60}
    assert three[60]["component_id"] == 60 and three[60]["keep"] is True


def test_temperature_mix_rates_and_membership(spark):
    # rates recomputed by hand ((min/c)^(1-alpha)), membership
    # recomputed independently from the md5 hash
    import hashlib

    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        temperature_mix)

    rows = [(i, "big") for i in range(40)] + [(100 + i, "small")
                                              for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = temperature_mix(df, alpha=0.5).collect()
    rates = {r["lang"]: r["keep_rate"] for r in got}
    assert rates["small"] == 1.0 and rates["big"] == 0.5

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10 ** 6

    expect = {i for i, l in rows
              if bucket(i) < round({"big": 0.5, "small": 1.0}[l] * 10 ** 6)}
    assert {r["doc_id"] for r in got} == expect
    assert all(r["lang"] == "small" for r in got if r["doc_id"] >= 100)


def test_weighted_sample_excludes_nan_weights(spark):
    # NaN passes `> 0` and sorts above every double in a descending
    # order — it must be excluded, not ranked first (round-8 review)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        weighted_sample)

    df = spark.createDataFrame(
        [(1, 5.0), (2, float("nan")), (3, 2.0), (4, 1000.0)],
        "doc_id long, w double")
    got = weighted_sample(df, 2, weight_col="w").collect()
    assert all(r["doc_id"] != 2 for r in got) and len(got) == 2


def test_vocab_topk_null_text_contributes_zero(spark):
    # size(split(NULL)) is -1 under the lenient session; a NULL-text
    # doc must contribute 0 to the coverage denominator, matching the
    # explode side (round-8 review)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.text import (
        vocab_topk)

    df = spark.createDataFrame(
        [(1, "a a b"), (2, None)], "doc_id long, text string")
    got = {r["token"]: r for r in vocab_topk(df, k=10).collect()}
    assert got["a"]["freq"] == 2 and got["a"]["cum_coverage"] == round(2 / 3, 6)
    assert got["b"]["cum_coverage"] == 1.0
