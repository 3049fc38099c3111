"""Unit tests for the curation operators: decontamination,
deterministic stratified sampling, sequence packing. The oracle-gate
test (test_queries_oracle.py) additionally hash-compares the three
driver-facing queries against their DuckDB twins at sf0.001."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators import curation as cu


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_scores_and_flags(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs(spark, [
        # identical 4-token doc: both of its 3-gram shingles leak -> 1.0
        (1, "alpha beta gamma delta"),
        # shares exactly one of its two shingles -> 0.5, flagged at 0.5
        (2, "alpha beta gamma zeta"),
        # no overlap -> 0.0
        (3, "one two three four"),
        # too short to shingle -> drops out
        (4, "only two"),
    ])
    out = {r["doc_id"]: r for r in cu.decontaminate(corpus, bench).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["contamination"] == 1.0 and out[1]["flagged"] == 1
    assert out[2]["contamination"] == 0.5 and out[2]["flagged"] == 1
    assert out[3]["contamination"] == 0.0 and out[3]["flagged"] == 0
    assert out[2]["n_shingles"] == 2 and out[2]["n_contaminated"] == 1


def test_decontaminate_benchmark_is_broadcast(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs(spark, [(1, "alpha beta gamma")])
    plan = cu.decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _md5_bucket(key: str, denom: int = 1_000_000) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % denom


def test_stratified_sample_matches_hash_rule_exactly(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.5, "de": 0.25}
    got = sorted(
        r["doc_id"]
        for r in cu.stratified_sample(df, rates, stratum_col="lang").collect()
    )
    want = sorted(
        i for i, lang in rows
        if _md5_bucket(str(i)) < int(rates[lang] * 1_000_000)
    )
    assert got == want
    # deterministic: a second run returns the identical membership
    again = sorted(
        r["doc_id"]
        for r in cu.stratified_sample(df, rates, stratum_col="lang").collect()
    )
    assert again == got


def test_stratified_sample_default_rate_zero_drops_unknown_strata(spark):
    df = spark.createDataFrame([(1, "xx"), (2, "xx")], "doc_id long, lang string")
    assert cu.stratified_sample(df, {"en": 1.0}, stratum_col="lang").count() == 0


def test_pack_sequences_matches_sequential_cumsum(spark):
    rows = [(i, " ".join(["w"] * (7 + 13 * i % 29))) for i in range(60)]
    df = _docs(spark, rows)
    budget, shards = 32, 4
    out = cu.pack_sequences(df, budget=budget, num_shards=shards).collect()
    got = {r["doc_id"]: r for r in out}
    cum: dict[int, int] = {}
    for i, text in rows:  # ids ascending == within-shard packing order
        shard = i % shards
        start = cum.get(shard, 0)
        n = len(text.split(" "))
        cum[shard] = start + n
        r = got[i]
        assert (r["shard"], r["n_tokens"]) == (shard, n)
        assert r["bin_id"] == start // budget
        assert r["bin_offset"] == start % budget
        assert 0 <= r["bin_offset"] < budget


def test_semantic_dedup_keeps_canonical_and_isolated(spark):
    """Planted cluster {0, 5, 21} (identical vectors, probe stride 20
    hits 0 and 20) collapses to canonical 0; isolated vectors keep."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        dedup as dd,
        similarity as sim,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (5, [1.0, 0.0, 0.0]),
        (20, [0.0, 1.0, 0.0]),
        (21, [0.0, 1.0, 0.0]),
        (7, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = sim.embedding_neardup_pairs(
        emb, emb.filter(F.col("vec_id") % 20 == 0), threshold=0.9
    )
    comps = dd.connected_components(pairs, left_col="id_1", right_col="id_2")
    labeled = (
        emb.select("vec_id")
        .join(comps.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component_id", F.col("vec_id")).alias("component_id"),
        )
        .withColumn("keep", (F.col("component_id") == F.col("vec_id")).cast("long"))
    )
    got = {r["vec_id"]: (r["component_id"], r["keep"]) for r in labeled.collect()}
    assert got == {0: (0, 1), 5: (0, 0), 20: (20, 1), 21: (20, 0), 7: (7, 1)}


def test_hard_negatives_excludes_neardups_and_ranks_by_hardness(spark):
    """The planted duplicate (cosine 1.0) is a positive, not a
    negative — it must be excluded; survivors come back hardest
    (highest-cosine) first."""
    import math

    def v(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [
        (0, v(0.0)),          # query
        (1, v(0.0)),          # exact duplicate -> excluded
        (2, v(1.2)),          # cosine ~0.36 -> excluded at 0.35... (cos 1.2 = 0.362)
        (3, v(1.4)),          # cosine ~0.17 -> hardest survivor
        (4, v(2.0)),          # cosine ~-0.42 -> second survivor
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cu.hard_negatives(
        emb, emb.filter(F.col("vec_id") == 0),
        k_pool=10, k_out=2, dup_threshold=0.35,
    ).collect()
    got = sorted((r["neg_rank"], r["neighbor_id"]) for r in out)
    assert got == [(1, 3), (2, 4)]


def test_pack_sequences_single_exchange(spark):
    df = _docs(spark, [(i, "a b c") for i in range(10)])
    plan = cu.pack_sequences(df, budget=8, num_shards=2)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_chunk_documents_windows_and_edges(spark):
    """Hand-computed sliding windows: overlap, short-doc single chunk,
    exact-boundary doc (no redundant tail chunk), trailing partial
    chunk, NULL text -> one empty chunk, zero exchanges in the plan,
    and invalid params refuse."""
    import pytest as _pt

    toks = lambda a, b: " ".join(f"t{i}" for i in range(a, b))
    df = spark.createDataFrame([
        (1, toks(0, 10)),   # k=10, chunk 4 stride 3 -> ceil(6/3)+1 = 3
        (2, toks(0, 4)),    # k=4 == chunk -> exactly 1 chunk
        (3, toks(0, 3)),    # k<chunk -> 1 short chunk
        (4, None),          # NULL -> [''] -> 1 chunk of the empty token
    ], "doc_id long, text string")
    out = cu.chunk_documents(df, chunk_tokens=4, stride=3)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert len(rows) == 3 + 1 + 1 + 1
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"   # 1-token overlap
    assert (rows[(1, 2)]["pos"], rows[(1, 2)]["n_tokens"],
            rows[(1, 2)]["chunk_text"]) == (7, 4, "t6 t7 t8 t9")
    assert rows[(2, 0)]["n_tokens"] == 4 and (2, 1) not in rows
    assert rows[(3, 0)]["chunk_text"] == "t0 t1 t2"
    assert (rows[(4, 0)]["n_tokens"], rows[(4, 0)]["chunk_text"]) == (1, "")

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local: scan + generate only
    with _pt.raises(ValueError, match="positive"):
        cu.chunk_documents(df, chunk_tokens=4, stride=0)

    # the GAP regime (stride > chunk_tokens — deliberate sampling):
    # k=12, chunk 4, stride 6 -> starts 1 and 7 ONLY. The uncapped
    # ceil((k-chunk)/stride)+1 formula minted a third chunk at pos 13
    # — an empty window past the text (round-9 review finding; the
    # oracle mirrored the formula so the hash gate couldn't see it)
    gaps = {(r["doc_id"], r["chunk_id"]): r for r in cu.chunk_documents(
        spark.createDataFrame([(1, toks(0, 12)), (2, toks(0, 11))],
                              "doc_id long, text string"),
        chunk_tokens=4, stride=6).collect()}
    assert len(gaps) == 4
    assert (gaps[(1, 1)]["pos"], gaps[(1, 1)]["n_tokens"]) == (7, 4)
    assert (1, 2) not in gaps  # no past-text chunk at pos 13
    assert (gaps[(2, 1)]["pos"], gaps[(2, 1)]["n_tokens"],
            gaps[(2, 1)]["chunk_text"]) == (7, 4, "t6 t7 t8 t9")
    for r in gaps.values():
        assert r["n_tokens"] > 0 and r["pos"] <= 12


def test_leakage_safe_split_clusters_never_straddle(spark, sf_dir):
    """The leakage property itself: every near-dup cluster's members
    carry ONE split; singletons are their own cluster; assignment is
    deterministic across runs; fractions land near target on many
    singleton clusters; invalid fractions refuse."""
    import pytest as _pt
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        dedup as dd)

    # synthetic: two 3-doc near-dup clusters + many singletons
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different words about spark shuffles and joins here"
    rows = [(1, a), (2, a + " extra"), (3, a), (10, b), (11, b), (12, b)]
    rows += [(100 + i, f"unique u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f")
             for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    out = {r["doc_id"]: r for r in
           cu.leakage_safe_split(docs, pairs).collect()}
    assert len(out) == len(rows)
    # cluster members share cluster id AND split
    for grp in ((1, 2, 3), (10, 11, 12)):
        assert {out[i]["cluster_id"] for i in grp} == {grp[0]}
        assert len({out[i]["split"] for i in grp}) == 1
    # singletons: own cluster id
    assert out[100]["cluster_id"] == 100
    # fractions in the right neighborhood over 400 singleton clusters
    from collections import Counter
    c = Counter(r["split"] for r in out.values())
    assert c["train"] > c["val"] and c["train"] > c["test"]
    assert 0.7 < c["train"] / len(out) < 0.9
    assert set(c) == {"train", "val", "test"}
    # deterministic
    again = {r["doc_id"]: r["split"] for r in
             cu.leakage_safe_split(docs, pairs).collect()}
    assert again == {k: v["split"] for k, v in out.items()}
    with _pt.raises(ValueError, match="fractions"):
        cu.leakage_safe_split(docs, pairs, fractions={"train": 0.9,
                                                      "val": 0.2})


def test_leakage_safe_split_precomputed_components_identical(spark):
    """components= (round 10): given the labels the pipeline already
    paid for (keep_representatives output, a prior CC run), the split
    must be hash-identical to the pairs= path — the keep-the-hub +
    split-by-cluster pipeline pays the dominant iterative loop ONCE.
    Also pins the exactly-one-of contract and that bounds are exact
    integers (0.3 + 0.3 accumulates to 600000, not 599999: a bucket
    exactly at the float-truncated boundary must land in the SECOND
    split, verified by independent md5 recompute)."""
    import hashlib

    import pytest as _pt
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        dedup as dd, graph as gx)

    a = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, a), (2, a + " extra"), (3, a)]
    rows += [(100 + i, f"unique u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f")
             for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5, n=3)

    via_pairs = {tuple(r) for r in
                 cu.leakage_safe_split(docs, pairs).collect()}
    comps = dd.connected_components(pairs)
    via_comps = {tuple(r) for r in
                 cu.leakage_safe_split(docs, components=comps).collect()}
    assert via_pairs == via_comps
    # the real composition: keep_representatives' label columns
    kr = gx.keep_representatives(pairs)
    via_kr = {tuple(r) for r in cu.leakage_safe_split(
        docs, components=kr.select("doc_id", "component_id")).collect()}
    assert via_pairs == via_kr

    with _pt.raises(ValueError, match="exactly one"):
        cu.leakage_safe_split(docs)
    with _pt.raises(ValueError, match="exactly one"):
        cu.leakage_safe_split(docs, pairs, components=comps)

    # integer-exact bounds: independent md5 recompute of every doc's
    # bucket against cumulative fractions 0.3/0.3/0.4 — the float
    # running sum would put bucket 599999 in the THIRD split
    out = {r["doc_id"]: r["split"] for r in cu.leakage_safe_split(
        docs, pairs,
        fractions={"s1": 0.3, "s2": 0.3, "s3": 0.4}).collect()}
    for r in cu.leakage_safe_split(docs, pairs).select(
            "doc_id", "cluster_id").collect():
        b = int(hashlib.md5(
            str(r["cluster_id"]).encode()).hexdigest()[:8], 16) % 1_000_000
        want = "s1" if b < 300_000 else "s2" if b < 600_000 else "s3"
        assert out[r["doc_id"]] == want, (r, b)


def test_shuffle_shards_is_deterministic_permutation(spark, sf_dir):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        shuffle_shards)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = shuffle_shards(docs, num_shards=4)
    rows = out.collect()
    # a permutation: every doc exactly once, shards partition the ids
    assert len(rows) == docs.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    assert {r["shard"] for r in rows} <= set(range(4))
    # positions are dense 0..n_shard-1 within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard
    # deterministic across invocations (content-hash order, no rand())
    again = shuffle_shards(docs, num_shards=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # and genuinely shuffled: position order is not id order
    s0 = sorted((r["pos"], r["doc_id"]) for r in rows if r["shard"] == 0)
    assert [d for _, d in s0] != sorted(d for _, d in s0)


def test_subword_stats_known_values(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.text import (
        subword_stats)

    df = spark.createDataFrame(
        [(1, "don't count2x this!"), (2, "plain words here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in subword_stats(df).collect()}
    # don|'|t| count|2|x| this|! -> 8 subwords over 3 ws tokens
    assert out[1]["n_subwords"] == 8 and out[1]["n_ws_tokens"] == 3
    assert out[2]["n_subwords"] == 3 and out[2]["n_ws_tokens"] == 3
    assert out[2]["subwords_per_token"] == 1.0


def test_curate_minhash_from_cdf_end_to_end(spark, tmp_path):
    """Streaming corpus curation from the Delta change feed: each
    commit's docs are deduped against the persisted store, decisions
    land per tick, keeps are absorbed (so later commits dedupe
    against them), maintenance commits are tolerated, replays
    converge, and update feeds refuse."""
    import json

    import pytest
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        dedup as dd)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        curate_minhash_from_cdf)
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)

    store = str(tmp_path / "store")
    tbl = str(tmp_path / "docs_delta")
    base = "the quick brown fox jumps over the lazy dog again and again"
    dd.build_minhash_store(_docs(spark, [(1, base)]), store,
                           num_hashes=64, bands=32)

    # commit 0: a dup of the store doc (10), an in-batch dup pair
    # (11 < 12), and a unique doc (13)
    other = "completely different words about spark shuffles and joins here"
    dl.write_delta(_docs(spark, [
        (10, base), (11, other), (12, other),
        (13, "unique narrative token stream with no partner at all"),
    ]), tbl)
    assert curate_minhash_from_cdf(spark, tbl, store, threshold=0.5) == [0]
    dec0 = {r["doc_id"]: r["keep"] for r in
            spark.read.parquet(f"{store}_decisions/tick=0").collect()}
    assert dec0 == {10: False, 11: True, 12: False, 13: True}

    # commit 1: dup of commit-0 KEEP 11 -> rejected (keeps absorbed)
    dl.write_delta(_docs(spark, [(20, other)]), tbl, mode="append")
    assert curate_minhash_from_cdf(spark, tbl, store, threshold=0.5) == [1]
    dec1 = {r["doc_id"]: r["keep"] for r in
            spark.read.parquet(f"{store}_decisions/tick=1").collect()}
    assert dec1 == {20: False}

    # maintenance commit: tolerated, mark advances, nothing decided
    dl.compact_delta(spark, tbl)
    assert curate_minhash_from_cdf(spark, tbl, store) == []

    # crash replay: rewind the high-water mark to before commit 1 and
    # re-run — identical decisions, store unchanged (no self-pair
    # rejection, no duplicate absorb, no refusal crash)
    n_store = spark.read.parquet(store + "_hashes").count()
    state = f"{store}_cdf_state/state.json"
    with open(state, "w") as f:
        json.dump({"last_commit_version": 0}, f)
    assert curate_minhash_from_cdf(spark, tbl, store) == [1]
    dec1b = {r["doc_id"]: r["keep"] for r in
             spark.read.parquet(f"{store}_decisions/tick=1").collect()}
    assert dec1b == dec1
    assert spark.read.parquet(store + "_hashes").count() == n_store

    # lineage guard: a lost state sidecar over existing decisions
    import shutil
    shutil.rmtree(store + "_cdf_state")
    with pytest.raises(ValueError, match="maintenance lineage"):
        curate_minhash_from_cdf(spark, tbl, store)
    import os
    os.makedirs(store + "_cdf_state", exist_ok=True)
    with open(state, "w") as f:
        json.dump({"last_commit_version": 2}, f)  # post-compact head

    # CHURN (round 13 — VERDICT r12 #1): an update feed now ABSORBS.
    # Doc 13 (a commit-0 keep) is rewritten to near-dup the store's
    # base doc: its old signature retires under a tombstone tick and
    # the postimage gets a FRESH decision — reject, against doc 1.
    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        read_minhash_store)
    dl.merge_delta(spark, tbl, _docs(spark, [(13, base + " exactly")]),
                   on=["doc_id"], when_matched="update",
                   when_not_matched=None, change_data=True)       # v3
    assert curate_minhash_from_cdf(spark, tbl, store) == [3]
    assert {r["doc_id"]: r["keep"] for r in
            spark.read.parquet(f"{store}_decisions/tick=3").collect()} \
        == {13: False}
    # retirement is visible: a NEW doc duplicating 13's ORIGINAL text
    # is now kept (the dead signature generates no candidates)...
    orig13 = "unique narrative token stream with no partner at all"
    dl.write_delta(_docs(spark, [(30, orig13)]), tbl, mode="append")
    assert curate_minhash_from_cdf(spark, tbl, store) == [4]
    assert {r["doc_id"]: r["keep"] for r in
            spark.read.parquet(f"{store}_decisions/tick=4").collect()} \
        == {30: True}
    # ...while the store's LIVE signatures still reject their dups
    dl.write_delta(_docs(spark, [(31, other)]), tbl, mode="append")
    assert curate_minhash_from_cdf(spark, tbl, store) == [5]
    assert {r["doc_id"]: r["keep"] for r in
            spark.read.parquet(f"{store}_decisions/tick=5").collect()} \
        == {31: False}
    # delete commit: keep 30's signature retires; a delete-only
    # commit is its tombstone tick — no decisions land
    dl.merge_delta(spark, tbl, _docs(spark, [(30, orig13)]),
                   on=["doc_id"], when_matched="delete",
                   when_not_matched=None, change_data=True)       # v6
    assert curate_minhash_from_cdf(spark, tbl, store) == [6]
    assert not os.path.isdir(f"{store}_decisions/tick=6")
    live_ids = {r["_id"] for r in
                read_minhash_store(spark, store)[1]
                .select("_id").collect()}
    assert 30 not in live_ids and 13 not in live_ids
    assert 11 in live_ids and 1 in live_ids
    # and a fresh dup of the deleted text keeps again
    dl.write_delta(_docs(spark, [(32, orig13)]), tbl, mode="append")
    assert curate_minhash_from_cdf(spark, tbl, store) == [7]
    assert {r["doc_id"]: r["keep"] for r in
            spark.read.parquet(f"{store}_decisions/tick=7").collect()} \
        == {32: True}

    # at-least-once replay of the last churn-era commit converges:
    # identical decisions, identical live rows (tick overwrite, no
    # self-pair rejection against the absorbed copy)
    n_live = read_minhash_store(spark, store)[1].count()
    with open(state, "w") as f:
        json.dump({"last_commit_version": 6}, f)
    assert curate_minhash_from_cdf(spark, tbl, store) == [7]
    assert {r["doc_id"]: r["keep"] for r in
            spark.read.parquet(f"{store}_decisions/tick=7").collect()} \
        == {32: True}
    assert read_minhash_store(spark, store)[1].count() == n_live

    # an illegal duplicate insert (id 31's partner 11 is LIVE... the
    # id itself: re-insert live id 32) refuses BEFORE publishing any
    # tombstone tick — nothing half-absorbed
    dl.write_delta(_docs(spark, [(32, other)]), tbl, mode="append")
    with pytest.raises(ValueError, match="re-inserts"):
        curate_minhash_from_cdf(spark, tbl, store)
    assert sorted(os.listdir(store + "_tombstones")) == \
        ["tick=3", "tick=6"]
    assert not os.path.isdir(f"{store}_decisions/tick=8")


def test_curate_embeddings_from_cdf_end_to_end(spark, tmp_path):
    """Vector curation from the change feed: decisions against the
    IVF index per commit, keeps absorbed via the shared tick publisher
    (so later commits — and replays — dedupe against them), replay
    converges with no duplicate rows, update feeds refuse."""
    import json

    import pytest
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        similarity as sim)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.curation import (
        curate_embeddings_from_cdf)
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")\
        .select("vec_id", "embedding").filter(F.col("vec_id") < 200)
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, idx, n_lists=4, seed=42)
    base = [float(x) for x in emb.first()["embedding"]]
    far = [100.0] + [0.0] * (len(base) - 1)

    tbl = str(tmp_path / "delta")
    # commit 0: 900 dups an indexed vector (base twin -> reject),
    # 901/902 are an in-batch dup pair (min-id 901 kept), 903 unique
    dl.write_delta(spark.createDataFrame(
        [(900, base), (901, far), (902, far),
         (903, [0.0] * (len(base) - 1) + [50.0])],
        "vec_id long, embedding array<double>"), tbl)
    assert curate_embeddings_from_cdf(spark, tbl, idx,
                                      threshold=0.95) == [0]
    dec0 = {r["vec_id"]: r["keep"] for r in
            spark.read.parquet(f"{idx}_decisions/tick=0").collect()}
    assert dec0 == {900: False, 901: True, 902: False, 903: True}
    n_after0 = spark.read.parquet(idx).count()
    assert n_after0 == emb.count() + 2  # 901 and 903 absorbed

    # commit 1: a dup of absorbed keep 901 -> rejected (and the
    # radius sidecar grew with 901's append, so the probe finds it)
    dl.write_delta(spark.createDataFrame(
        [(910, far)], "vec_id long, embedding array<double>"),
        tbl, mode="append")
    assert curate_embeddings_from_cdf(spark, tbl, idx,
                                      threshold=0.95) == [1]
    dec1 = {r["vec_id"]: r["keep"] for r in
            spark.read.parquet(f"{idx}_decisions/tick=1").collect()}
    assert dec1 == {910: False}

    # replay: rewind the mark, re-run commit 0+1 — identical
    # decisions, no duplicate index rows (tick overwrite idempotency)
    state = f"{idx}_curate_cdf_state/state.json"
    with open(state, "w") as f:
        json.dump({"last_commit_version": -1}, f)
    assert curate_embeddings_from_cdf(spark, tbl, idx,
                                      threshold=0.95) == [0, 1]
    dec0b = {r["vec_id"]: r["keep"] for r in
             spark.read.parquet(f"{idx}_decisions/tick=0").collect()}
    assert dec0b == dec0
    assert spark.read.parquet(idx).count() == n_after0

    # one maintenance source per index: refresh_ivf_from_cdf over the
    # curated index (no refresh-owned _cdf_state) refuses
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_ivf_from_cdf)
    with pytest.raises(ValueError, match="maintenance lineage"):
        refresh_ivf_from_cdf(spark, tbl, idx)

    # CHURN (round 13 — VERDICT r12 #1): an update feed now ABSORBS.
    # Keep 903's vector is rewritten to a scaled copy of absorbed keep
    # 901's: the old 903 retires under a tombstone tick and the
    # postimage gets a FRESH decision — reject, against 901 (cosine
    # is scale-invariant, so the dup is exact)
    import os
    n_rows = spark.read.parquet(idx).count()
    dl.merge_delta(spark, tbl, spark.createDataFrame(
        [(903, [2.0 * x for x in far])],
        "vec_id long, embedding array<double>"),
        on=["vec_id"], when_matched="update", when_not_matched=None,
        change_data=True)                                         # v2
    assert curate_embeddings_from_cdf(spark, tbl, idx,
                                      threshold=0.95) == [2]
    assert {r["vec_id"]: r["keep"] for r in
            spark.read.parquet(f"{idx}_decisions/tick=2").collect()} \
        == {903: False}
    assert spark.read.parquet(idx).count() == n_rows  # no absorb
    # retirement is visible through the probe: old 903's vector no
    # longer has a live partner...
    probe903 = spark.createDataFrame(
        [(999, [0.0] * (len(base) - 1) + [50.0])],
        "vec_id long, embedding array<double>")
    assert sim.embedding_neardup_indexed(
        spark, idx, probe903, 0.95).count() == 0
    # ...while live rows still match
    probe_far = spark.createDataFrame(
        [(998, far)], "vec_id long, embedding array<double>")
    assert sim.embedding_neardup_indexed(
        spark, idx, probe_far, 0.95).count() == 1
    # delete 901 (delete-only commit: tombstone tick, no decisions)
    dl.merge_delta(spark, tbl, spark.createDataFrame(
        [(901, far)], "vec_id long, embedding array<double>"),
        on=["vec_id"], when_matched="delete", when_not_matched=None,
        change_data=True)                                         # v3
    assert curate_embeddings_from_cdf(spark, tbl, idx,
                                      threshold=0.95) == [3]
    assert not os.path.isdir(f"{idx}_decisions/tick=3")
    # a fresh dup of the deleted vector now KEEPS (dead vectors
    # generate no candidates)
    dl.write_delta(spark.createDataFrame(
        [(920, far)], "vec_id long, embedding array<double>"),
        tbl, mode="append")                                       # v4
    assert curate_embeddings_from_cdf(spark, tbl, idx,
                                      threshold=0.95) == [4]
    assert {r["vec_id"]: r["keep"] for r in
            spark.read.parquet(f"{idx}_decisions/tick=4").collect()} \
        == {920: True}
    # at-least-once replay of the churn-era commit converges
    n_rows = spark.read.parquet(idx).count()
    with open(state, "w") as f:
        json.dump({"last_commit_version": 3}, f)
    assert curate_embeddings_from_cdf(spark, tbl, idx,
                                      threshold=0.95) == [4]
    assert {r["vec_id"]: r["keep"] for r in
            spark.read.parquet(f"{idx}_decisions/tick=4").collect()} \
        == {920: True}
    assert spark.read.parquet(idx).count() == n_rows
    # an illegal duplicate insert of a LIVE id refuses BEFORE any
    # tombstone tick publishes
    dl.write_delta(spark.createDataFrame(
        [(920, base)], "vec_id long, embedding array<double>"),
        tbl, mode="append")                                       # v5
    with pytest.raises(ValueError, match="re-inserts"):
        curate_embeddings_from_cdf(spark, tbl, idx, threshold=0.95)
    assert sorted(os.listdir(idx + "_tombstones")) == \
        ["tick=2", "tick=3"]


def test_split_store_sticky_under_cluster_merge(spark, tmp_path):
    """The incremental split-stability contract (round 10): cluster
    ids are min-labels, so a naive full re-split after an increment
    MERGES two clusters would rehash the losing cluster's bucket and
    silently migrate its docs across splits — the across-time leak.
    The sticky store pins: (1) no stored doc EVER changes split;
    (2) a merging increment doc inherits the oldest member cluster's
    split and is flagged straddling; (3) a doc joining one existing
    cluster inherits ITS split — even when the naive rebuild would
    now hash it elsewhere; (4) fresh clusters/singletons hash exactly
    the leakage_safe_split rule (independent md5 recompute);
    (5) replays converge (identical output, store unchanged)."""
    import hashlib

    store = str(tmp_path / "splits")
    # clusters A={1,2,3} (label 1 -> train) and B={4,5} (label 4 ->
    # test); md5("1")%1e6=589560, md5("4")%1e6=958457
    base = spark.createDataFrame([(i,) for i in range(1, 14)],
                                 "doc_id long")
    base_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_id_1 long, doc_id_2 long")
    cu.build_split_store(base, base_pairs, store)
    before = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
              spark.read.parquet(store).collect()}
    assert before[1][1] == "train" and before[4][1] == "test"
    assert before[5] == (4, "test")

    # increment 1: doc 100 bridges A and B -> MERGE across splits
    inc1 = spark.createDataFrame([(100,)], "doc_id long")
    inc1_pairs = spark.createDataFrame(
        [(100, 2), (100, 5)], "doc_id_1 long, doc_id_2 long")
    out1 = {r["doc_id"]: r for r in cu.assign_splits_incremental(
        spark, inc1, store, inc1_pairs).collect()}
    # (2) bridge inherits the OLDEST member cluster's split, flagged
    assert out1[100]["split"] == "train"          # cluster A, oldest doc 1
    assert out1[100]["cluster_id"] == 1
    assert out1[100]["straddling"] is True
    # (1) no stored doc moved
    after1 = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
              spark.read.parquet(store).collect()}
    assert all(after1[k] == v for k, v in before.items())

    # increment 2: 200 joins ONLY cluster B (sticky: inherits test,
    # though a naive rebuild would now hash the merged cluster under
    # label 1 -> train); 20+21 form a fresh cluster; 14 is a singleton
    inc2 = spark.createDataFrame([(200,), (20,), (21,), (14,)],
                                 "doc_id long")
    inc2_pairs = spark.createDataFrame(
        [(200, 5), (20, 21)], "doc_id_1 long, doc_id_2 long")
    out2 = {r["doc_id"]: r for r in cu.assign_splits_incremental(
        spark, inc2, store, inc2_pairs).collect()}
    assert out2[200]["split"] == "test"           # (3) stays with B
    assert out2[200]["cluster_id"] == 4
    assert out2[200]["straddling"] is False
    # (4) fresh cluster + singleton follow the md5 rule exactly
    for did, cl in ((20, 20), (21, 20), (14, 14)):
        b = int(hashlib.md5(str(cl).encode()).hexdigest()[:8],
                16) % 1_000_000
        want = "train" if b < 800_000 else "val" if b < 900_000 else "test"
        assert out2[did]["cluster_id"] == cl
        assert out2[did]["split"] == want, (did, b)

    # (5) replay of increment 2 converges: identical output, store
    # row count unchanged, still no stored doc moved
    n_store = spark.read.parquet(store).count()
    out2_again = {r["doc_id"]: r for r in cu.assign_splits_incremental(
        spark, inc2, store, inc2_pairs).collect()}
    assert {k: tuple(v) for k, v in out2.items()} == \
        {k: tuple(v) for k, v in out2_again.items()}
    assert spark.read.parquet(store).count() == n_store
    final = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
             spark.read.parquet(store).collect()}
    assert all(final[k] == v for k, v in before.items())

    # all-singleton increment (no pairs at all) survives the empty
    # contracted graph and hashes fresh
    inc3 = spark.createDataFrame([(300,)], "doc_id long")
    no_pairs = spark.createDataFrame([], "doc_id_1 long, doc_id_2 long")
    out3 = cu.assign_splits_incremental(spark, inc3, store,
                                        no_pairs).collect()
    got = {r["doc_id"]: r for r in out3}
    assert got[300]["cluster_id"] == 300 and got[300]["split"] == "train"

    # update_store=False leaves the store untouched
    n_store = spark.read.parquet(store).count()
    inc4 = spark.createDataFrame([(400,)], "doc_id long")
    cu.assign_splits_incremental(spark, inc4, store, no_pairs,
                                 update_store=False).collect()
    assert spark.read.parquet(store).count() == n_store


def test_split_store_lifecycle_quarantine_and_compaction(spark, tmp_path):
    """Round-11 split-store lifecycle (VERDICT #3/#4): the straddling
    flag gets a CONSUMER — split_store_quarantine marks the bridging
    doc AND every doc of every implicated stored cluster (their
    near-copies provably span splits now) — and compact_split_store
    collapses the per-increment file accumulation while preserving
    the sticky assignments byte-identically."""
    store = str(tmp_path / "splits")
    base = spark.createDataFrame([(i,) for i in range(1, 14)],
                                 "doc_id long")
    base_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_id_1 long, doc_id_2 long")
    cu.build_split_store(base, base_pairs, store)
    st = spark.read.parquet(store)
    assert "straddling" in st.columns
    assert not any(r["straddling"] for r in st.collect())
    q0 = cu.split_store_quarantine(spark, store)
    assert q0.columns == ["doc_id", "cluster_id", "split", "quarantined"]
    assert not any(r["quarantined"] for r in q0.collect())

    # doc 100 bridges cluster A={1,2,3} (train) and B={4,5} (test):
    # the merge implicates BOTH stored clusters
    inc1 = spark.createDataFrame([(100,)], "doc_id long")
    inc1_pairs = spark.createDataFrame(
        [(100, 2), (100, 5)], "doc_id_1 long, doc_id_2 long")
    cu.assign_splits_incremental(spark, inc1, store, inc1_pairs).collect()
    q1 = {r["doc_id"]: r["quarantined"] for r in
          cu.split_store_quarantine(spark, store).collect()}
    assert {d for d, q in q1.items() if q} == {1, 2, 3, 4, 5, 100}
    assert all(not q1[d] for d in range(6, 14))

    # a LATER doc joining an implicated cluster is quarantined too —
    # the bridged neighborhood stays suspect, not just the bridge
    inc2 = spark.createDataFrame([(200,), (20,), (21,)], "doc_id long")
    inc2_pairs = spark.createDataFrame(
        [(200, 5), (20, 21)], "doc_id_1 long, doc_id_2 long")
    cu.assign_splits_incremental(spark, inc2, store, inc2_pairs).collect()
    q2 = {r["doc_id"]: r["quarantined"] for r in
          cu.split_store_quarantine(spark, store).collect()}
    assert q2[200] is True          # joined implicated cluster B
    assert q2[20] is False and q2[21] is False   # fresh cluster: clean

    # compaction: rows byte-identical, file count collapses, sticky
    # behavior and the quarantine verdict survive
    import glob
    import os

    rows_before = sorted(tuple(r) for r in
                         spark.read.parquet(store).collect())
    # a replay of increment 1 appends duplicate straddle rows — the
    # round-12 compaction target
    cu.assign_splits_incremental(spark, inc1, store, inc1_pairs).collect()
    straddle_rows = spark.read.parquet(store + "_straddle").count()
    assert straddle_rows > 2        # duplicates accumulated
    n_files = len(glob.glob(os.path.join(store, "*.parquet")))
    assert n_files >= 3             # build + increments (+ replay)
    stats = cu.compact_split_store(spark, store)
    assert stats["files_before"] == n_files and stats["files_after"] == 1
    assert sorted(tuple(r) for r in
                  spark.read.parquet(store).collect()) == rows_before
    assert {r["doc_id"]: r["quarantined"] for r in
            cu.split_store_quarantine(spark, store).collect()} == q2
    # straddle sidecar collapsed to its distinct cluster set, one file
    assert sorted(r["cluster_id"] for r in
                  spark.read.parquet(store + "_straddle").collect()) \
        == [1, 4]
    assert len(glob.glob(os.path.join(store + "_straddle",
                                      "*.parquet"))) == 1
    # replay of increment 2 against the compacted store converges
    n_store = spark.read.parquet(store).count()
    out = {r["doc_id"]: r for r in cu.assign_splits_incremental(
        spark, inc2, store, inc2_pairs).collect()}
    assert out[200]["split"] == "test" and out[200]["cluster_id"] == 4
    assert spark.read.parquet(store).count() == n_store

    # the quarantine verdict's consumer (round 12 — VERDICT r11 #6):
    # eval export = test-split rows minus the quarantined
    # neighborhood, joined against the corpus; keep_flags subtracts
    # non-representatives on top
    corpus = spark.createDataFrame(
        [(i, f"text-{i}") for i in list(range(1, 14)) + [20, 21, 100, 200]],
        "doc_id long, text string")
    exp = cu.export_eval_set(spark, store, corpus)
    got = {r["doc_id"]: r for r in exp.collect()}
    # cluster B (test) is implicated -> quarantined; the only test
    # rows left are whichever unclustered singletons hashed to test
    expected = {d for d, q in ({r["doc_id"]: (r["split"], r["quarantined"])
                for r in cu.split_store_quarantine(
                    spark, store).collect()}).items()
                if q[0] == "test" and not q[1]}
    assert set(got) == expected
    assert all(got[d]["text"] == f"text-{d}" for d in got)  # corpus cols
    if expected:
        keep = spark.createDataFrame(
            [(d, d == min(expected)) for d in expected],
            "doc_id long, keep boolean")
        kept = cu.export_eval_set(spark, store, corpus, keep_flags=keep)
        assert {r["doc_id"] for r in kept.collect()} == {min(expected)}
        # column ORDER must not matter, and a frame without a 'keep'
        # column must refuse loudly (round-12 review fix: columns[0]
        # positionally aliased the boolean as the id, silently
        # emptying the export)
        swapped = keep.select("keep", "doc_id")
        kept2 = cu.export_eval_set(spark, store, corpus,
                                   keep_flags=swapped)
        assert {r["doc_id"] for r in kept2.collect()} == {min(expected)}
        import pytest as _pytest
        with _pytest.raises(ValueError, match="two-column"):
            cu.export_eval_set(spark, store, corpus,
                               keep_flags=keep.select("doc_id"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lacks the store's id"):
        cu.export_eval_set(spark, store, corpus.select(
            F.col("doc_id").alias("other"), "text"))


def test_capped_pairs_compose_with_keep_and_split(spark):
    """Round-11 VERDICT #7: the degree cap changes the pair SET, and
    the combination a real curation run uses is cap -> CC ->
    keep/split. Pinned on a clustered fixture with known ground-truth
    clusters: (a) the capped pair graph yields the IDENTICAL
    connected-component partition as the uncapped one (the cap keeps
    every vector attached to its best partner, so true duplicate
    clusters stay connected); therefore (b) keep_representatives over
    capped pairs elects exactly one keeper per true cluster and
    (c) leakage_safe_split(components=) assigns every member of a
    cluster the same split, equal to the uncapped pipeline's
    assignment — the cap cannot migrate docs across splits."""
    import numpy as np

    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        graph as gx)
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        similarity as sim)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
        connected_components)

    rng = np.random.RandomState(7)
    dim, per, n_clusters = 16, 25, 6
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, truth = [], {}
    for c in range(n_clusters):
        for j in range(per):
            vid = c * 100 + j
            v = centers[c] + 0.02 * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = c
    iso = rng.randn(10, dim) * 5
    rows += [(9000 + i, [float(x) for x in iso[i]]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kw = dict(threshold=0.9, n_lists=4)
    full = sim.embedding_neardup_pairs_bucketed(emb, **kw)
    capped = sim.embedding_neardup_pairs_bucketed(emb, max_partners=3,
                                                  **kw)
    assert capped.count() < full.count()      # the cap genuinely cuts

    def _partition(pairs):
        comps = connected_components(
            pairs.selectExpr("id_1 AS doc_id_1", "id_2 AS doc_id_2"))
        return comps, {r["doc_id"]: r["component_id"]
                       for r in comps.collect()}

    comps_c, part_c = _partition(capped)
    _, part_f = _partition(full)
    assert part_c == part_f                                   # (a)
    # the partition is exactly the ground truth on clustered vectors
    for vid, c in truth.items():
        assert part_c[vid] == c * 100, (vid, part_c[vid])

    kr = gx.keep_representatives(
        capped.selectExpr("id_1 AS doc_id_1", "id_2 AS doc_id_2"))
    keepers = [r["doc_id"] for r in kr.collect() if r["keep"]]
    assert len(keepers) == n_clusters                          # (b)
    assert {part_c[k] for k in keepers} == {c * 100
                                            for c in range(n_clusters)}

    docs = emb.select(F.col("vec_id").alias("doc_id"))
    split_c = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
               cu.leakage_safe_split(docs, components=comps_c).collect()}
    split_f = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
               cu.leakage_safe_split(
                   docs, components=_partition(full)[0]).collect()}
    assert split_c == split_f                                  # (c)
    for c in range(n_clusters):
        members = {v for v, t in truth.items() if t == c}
        assert len({split_c[v][1] for v in members}) == 1
    # isolated vectors are their own singleton clusters
    for i in range(10):
        assert split_c[9000 + i][0] == 9000 + i


def test_split_store_churn_retire_and_reinsert(spark, tmp_path):
    """Round 13 — delete churn through the sticky split store: retired
    rows leave every read surface, the min-doc cluster-shrink edge
    case lands in the quarantine surface, a re-inserted doc gets a
    FRESH assignment that outlives the old tombstone, and physical
    compaction applies + clears the sidecar with verdicts unchanged."""
    import os

    import pytest
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        curation as cu)

    docs = spark.createDataFrame([(i,) for i in range(1, 21)],
                                 "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)],
                                  "doc_id_1 long, doc_id_2 long")
    store = str(tmp_path / "splits")
    cu.build_split_store(docs, pairs, store)
    base = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
            spark.read.parquet(store).collect()}
    no_pairs = spark.createDataFrame([], "doc_id_1 long, doc_id_2 long")

    # delete doc 1 (the governing min of cluster {1,2,3}) and
    # singleton doc 6 — both clusters lose their min doc
    dead = spark.createDataFrame([(1,), (6,)], "doc_id long")
    assert cu.retire_split_rows(spark, store, dead, tick=1) == \
        {"retired": 2, "shrunk_clusters": 2}
    q = {r["doc_id"]: r for r in
         cu.split_store_quarantine(spark, store).collect()}
    assert 1 not in q and 6 not in q
    assert q[2]["quarantined"] and q[3]["quarantined"]
    assert not q[4]["quarantined"] and not q[5]["quarantined"]
    assert all((q[i]["cluster_id"], q[i]["split"]) == base[i]
               for i in q)  # sticky for every survivor
    # idempotent replay of the same churn tick
    assert cu.retire_split_rows(spark, store, dead, tick=1) == \
        {"retired": 0, "shrunk_clusters": 0}

    # re-insert doc 6 at a later tick: fresh assignment (same
    # singleton hash bucket), row outlives the tick-1 tombstone, and
    # the shrunk-cluster quarantine verdict still applies to it
    out = cu.assign_splits_incremental(spark, dead.filter(
        F.col("doc_id") == 6), store, no_pairs, tick=2).collect()
    assert len(out) == 1 and out[0]["split"] == base[6][1]
    q2 = {r["doc_id"]: r["quarantined"] for r in
          cu.split_store_quarantine(spark, store).collect()}
    assert q2[6] is True
    # a churned store refuses an epoch-less increment
    with pytest.raises(ValueError, match="tick"):
        cu.assign_splits_incremental(
            spark, spark.createDataFrame([(21,)], "doc_id long"),
            store, no_pairs)

    # compaction physically applies the tombstones, clears the
    # sidecar, and leaves verdicts byte-identical
    before = sorted(tuple(r) for r in
                    cu.split_store_quarantine(spark, store).collect())
    cu.compact_split_store(spark, store)
    assert not os.path.isdir(store + "_tombstones")
    assert sorted(tuple(r) for r in
                  cu.split_store_quarantine(spark, store).collect()) \
        == before
    # post-compaction increments still resolve with preserved epochs
    assert cu.assign_splits_incremental(
        spark, spark.createDataFrame([(22,)], "doc_id long"),
        store, no_pairs, tick=3).count() == 1


def test_compact_minhash_store_applies_churn(spark, tmp_path):
    """Round 13 — the MinHash store's physical churn apply: tick dirs
    fold, retired signatures leave the parquet, spent tombstones
    prune, live reads are byte-identical across the compaction, and
    the loop keeps absorbing afterwards."""
    import os

    from snowflake_medtech_vigilance_lakehouse_spark.operators import dedup as dd
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        _write_tombstone_tick)

    store = str(tmp_path / "mh")
    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words about spark shuffles and joins"
    dd.build_minhash_store(_docs(spark, [(1, base)]), store,
                           num_hashes=64, bands=32)
    # flat store: compaction is a no-op
    st = dd.compact_minhash_store(spark, store)
    assert st == {"merged_bucket_ticks": [], "merged_hash_ticks": [],
                  "pruned_tombstones": []}

    dd.append_minhash_store(_docs(spark, [(2, other)]), store, tick=0)
    # tick 1: doc 2 is updated — old signature tombstoned, new copy
    # absorbed at the tombstone's own tick
    _write_tombstone_tick(
        spark.createDataFrame([(2,)], "id long"), store, 1)
    dd.append_minhash_store(
        _docs(spark, [(2, other + " revised edition")]), store, tick=1)
    dd.append_minhash_store(_docs(spark, [(3, base + " twin")]),
                            store, tick=2)

    def _live():
        b, h = dd.read_minhash_store(spark, store)
        return (sorted(tuple(r) for r in b.collect()),
                sorted((r["_id"], tuple(sorted(r["_h"])))
                       for r in h.collect()))

    before = _live()
    assert {i for i, _ in before[1]} == {1, 2, 3}
    st = dd.compact_minhash_store(spark, store)
    assert st["merged_bucket_ticks"] == [-1, 0, 1]
    assert st["merged_hash_ticks"] == [-1, 0, 1]
    assert st["pruned_tombstones"] == [1]
    assert not os.path.isdir(store + "_tombstones")
    assert _live() == before
    # the dead copy is PHYSICALLY gone: raw hashes hold exactly one
    # row for doc 2 now
    raw = spark.read.parquet(store + "_hashes")
    assert raw.filter(F.col("_id") == 2).count() == 1
    # and later absorbs still work against the consolidated layout
    dd.append_minhash_store(_docs(spark, [(4, "entirely novel words "
                                              "for doc four here")]),
                            store, tick=3)
    assert {r["_id"] for r in
            dd.read_minhash_store(spark, store)[1].collect()} \
        == {1, 2, 3, 4}
