"""Incremental BM25 index refresh: postings grow append-only across
refresh ticks, and scoring from the postings table matches the
batch bm25 operator on the same corpus."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators.text import bm25_scores
from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
    bm25_from_postings, corpus_stats_from_sidecar, prune_term_buckets,
    refresh_postings,
)

DOCS_A = [(1, "spark join table"), (2, "spark spark stream")]
DOCS_B = [(3, "join stream merge spark")]


def _write(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_incremental_index_matches_batch_bm25(spark, tmp_path):
    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "postings"), str(tmp_path / "ckpt")

    def refresh():
        stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ckpt).awaitTermination(120)

    _write(in_dir / "a.ndjson", DOCS_A)
    refresh()
    first = spark.read.parquet(idx)
    assert set(r["doc_id"] for r in first.select("doc_id").distinct().collect()) == {1, 2}

    # tick 2: only the new doc's postings are appended
    _write(in_dir / "b.ndjson", DOCS_B)
    refresh()
    postings = spark.read.parquet(idx)
    assert postings.filter(F.col("doc_id") == 3).count() == 4  # 4 distinct terms
    assert postings.count() == first.count() + 4

    # scoring from the incrementally-built index == batch operator on
    # the full corpus
    from_index = {r["doc_id"]: r["bm25"]
                  for r in bm25_from_postings(postings, ("spark", "merge")).collect()}
    corpus = spark.createDataFrame(DOCS_A + DOCS_B, "doc_id long, text string")
    batch = {r["doc_id"]: r["bm25"]
             for r in bm25_scores(corpus, ("spark", "merge")).collect()}
    assert from_index == batch


def test_bucketed_index_with_sidecar_matches_batch_bm25(spark, tmp_path):
    """The full 100 TB serving shape: bucket-partitioned postings +
    the corpus-stats sidecar. Scoring from only the query terms'
    pruned buckets with sidecar stats must equal the batch operator
    over the whole corpus — across two refresh ticks (the sidecar sums
    deltas)."""
    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "pb"), str(tmp_path / "ckb")

    def refresh():
        stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ckpt, bucketed=True,
                         n_buckets=8).awaitTermination(120)

    _write(in_dir / "a.ndjson", DOCS_A)
    refresh()
    _write(in_dir / "b.ndjson", DOCS_B)
    refresh()

    # layout: one OVERWRITE dir per refresh tick (idempotent under
    # at-least-once batch replay) with hive bucket dirs inside;
    # sidecar has one row per tick
    import os
    ticks = [d for d in os.listdir(idx) if d.startswith("tick=")]
    assert len(ticks) == 2
    assert any(d.startswith("tb=")
               for d in os.listdir(os.path.join(idx, ticks[0])))
    assert spark.read.parquet(idx + "_stats").count() == 2

    terms = ("spark", "merge")
    pruned = prune_term_buckets(spark.read.parquet(idx), terms, n_buckets=8)
    stats = corpus_stats_from_sidecar(spark, idx + "_stats")
    from_index = {r["doc_id"]: r["bm25"]
                  for r in bm25_from_postings(pruned, terms,
                                              doc_stats=stats).collect()}
    corpus = spark.createDataFrame(DOCS_A + DOCS_B, "doc_id long, text string")
    batch = {r["doc_id"]: r["bm25"]
             for r in bm25_scores(corpus, terms).collect()}
    assert from_index == batch
    # pruning is real: the tb predicate reaches the scan as a
    # PARTITION filter (directory-level skip, zero I/O for the rest)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tb" in plan.split(
        "PartitionFilters", 1)[1][:200]
    assert pruned.count() < spark.read.parquet(idx).count()


def test_hybrid_search_indexed_matches_rescan_from_refresh(spark, sf_dir,
                                                           tmp_path):
    """The full serving loop: stream-refresh the postings table, then
    hybrid_search_indexed over it must return EXACTLY what the rescan
    hybrid_search returns — both fusion modes, with a metadata filter
    (which exercises the candidate-set stats restriction)."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.retrieval import (
        hybrid_search, hybrid_search_indexed)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")

    # build the index through the real streaming refresh path
    in_dir = tmp_path / "docs_in"; in_dir.mkdir()
    docs.select("doc_id", "text").coalesce(1).write.json(str(in_dir / "batch"))
    idx, ckpt = str(tmp_path / "idx"), str(tmp_path / "ck")
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(in_dir / "batch"))
    refresh_postings(stream, idx, ckpt).awaitTermination(120)
    postings = spark.read.parquet(idx)

    qvec = emb.filter(F.col("vec_id") == 3).select("embedding")
    common = dict(query_terms=("spark", "merge"), query_vec=qvec,
                  metadata_filter=F.col("source").isin("src0", "src1"),
                  k=15, w_lexical=0.6)
    for fusion in ("weighted", "rrf"):
        rescan = hybrid_search(corpus, fusion=fusion, **common).collect()
        indexed = hybrid_search_indexed(corpus, postings, fusion=fusion,
                                        **common).collect()
        assert indexed == rescan, fusion


def test_ivf_refresh_assigns_appends_and_serves(spark, sf_dir, tmp_path):
    """target_lag analog for the ANN index: new vectors stream into
    the frozen-quantizer layout and are served on the next query with
    no refit. Checks (a) the fold-based assigner agrees with MLlib's
    KMeansModel assignments across the whole build corpus, (b) an
    appended exact twin is found at rank 1 by the indexed search,
    (c) the growth sidecar records the appended mass per list."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
    from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
        assign_ivf_lists, refresh_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx, ckpt = str(tmp_path / "ivf"), str(tmp_path / "ckpt")
    sim.build_ivf_index(emb, idx, n_lists=8, seed=42)

    # (a) assigner parity: re-assigning the build corpus through the
    # frozen centroid sidecar must reproduce the stored list_ids
    centroids = spark.read.parquet(idx + "_centroids")
    ours = assign_ivf_lists(emb, centroids).select("vec_id", "list_id")
    stored = spark.read.parquet(idx).select("vec_id", "list_id")
    assert ours.exceptAll(stored).count() == 0
    assert stored.exceptAll(ours).count() == 0

    # (b)+(c) stream in a twin of vec 0 plus one fresh vector
    new_dir = tmp_path / "new"; new_dir.mkdir()
    base = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    fresh = [float(i % 7 - 3) for i in range(len(base))]
    spark.createDataFrame(
        [(999999, list(base)), (999998, fresh)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(new_dir))
    stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(str(new_dir))
    refresh_ivf_index(stream, idx, ckpt).awaitTermination(120)

    after = spark.read.parquet(idx)
    assert after.count() == emb.count() + 2
    twin_list = after.filter(F.col("vec_id") == 999999).first()["list_id"]
    orig_list = after.filter(F.col("vec_id") == 0).first()["list_id"]
    assert twin_list == orig_list  # identical vector, identical argmin

    served = sim.knn_ivf_indexed(
        spark, idx, emb.filter(F.col("vec_id") == 0), k=5, n_probe=3)
    top = served.filter(F.col("rank") == 1).first()
    assert top["neighbor_id"] == 999999 and top["cosine"] == 1.0

    growth = spark.read.parquet(idx + "_growth")
    assert growth.agg(F.sum("n_appended")).first()[0] == 2


def _uncommit_last_batch(ckpt: str) -> None:
    """Simulate the real at-least-once crash window: the tick's writes
    landed but the checkpoint COMMIT didn't. Offsets survive (the
    checkpoint still owns the index's ticks), only the latest commit
    marker is gone, so the restarted stream re-executes that batch
    with the SAME epoch id."""
    import os

    commits = os.path.join(ckpt, "commits")
    latest = max(f for f in os.listdir(commits) if f.isdigit())
    os.remove(os.path.join(commits, latest))
    crc = os.path.join(commits, f".{latest}.crc")
    if os.path.exists(crc):  # local-FS checksum twin of the marker
        os.remove(crc)


def test_postings_refresh_idempotent_under_replay(spark, tmp_path):
    """At-least-once replay (crash after the tick's writes, before the
    checkpoint commit) must not double-count postings or stats: the
    replayed batch overwrites its own tick directory."""
    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "pr"), str(tmp_path / "ckr")
    _write(in_dir / "a.ndjson", DOCS_A)

    def refresh():
        stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ckpt).awaitTermination(120)

    refresh()
    first = spark.read.parquet(idx)
    n1, s1 = first.count(), spark.read.parquet(idx + "_stats").collect()
    _uncommit_last_batch(ckpt)
    refresh()  # same batch, same epoch -> same tick dir, overwritten
    assert spark.read.parquet(idx).count() == n1
    assert spark.read.parquet(idx + "_stats").collect() == s1


def test_refresh_refuses_fresh_checkpoint_over_existing_ticks(spark, tmp_path):
    """A LOST (not crashed) checkpoint is the one state per-tick
    idempotency cannot survive: epochs restart at 0 and the first tick
    would overwrite/delete the prior lineage's tick-0 output while
    reprocessing everything. Both refresh loops must refuse to start,
    for a missing checkpoint and an empty (created-but-unused) one."""
    import shutil

    from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
    from snowflake_medtech_vigilance_lakehouse_spark.streaming import refresh_ivf_index

    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "pg"), str(tmp_path / "ckg")
    _write(in_dir / "a.ndjson", DOCS_A)

    def refresh(ck):
        stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ck).awaitTermination(120)

    refresh(ckpt)
    shutil.rmtree(ckpt)
    with pytest.raises(ValueError, match="refresh refused"):
        refresh(ckpt)
    with pytest.raises(ValueError, match="refresh refused"):
        refresh(str(tmp_path / "ck_new"))

    # the IVF twin: tick data lives as tickN- file prefixes inside the
    # list_id layout plus the _growth sidecar
    emb = spark.read.parquet(f"/root/testdata/sf0.001/embeddings.parquet")
    ivf, ckv = str(tmp_path / "ivfg"), str(tmp_path / "ckvg")
    sim.build_ivf_index(emb, ivf, n_lists=4, seed=42)
    new_dir = tmp_path / "newv"; new_dir.mkdir()
    emb.limit(1).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    ).write.mode("overwrite").parquet(str(new_dir))

    def vrefresh(ck):
        stream = spark.readStream.schema(
            "vec_id long, embedding array<float>").parquet(str(new_dir))
        refresh_ivf_index(stream, ivf, ck).awaitTermination(120)

    vrefresh(ckv)
    shutil.rmtree(ckv)
    with pytest.raises(ValueError, match="refresh refused"):
        vrefresh(ckv)


def test_ivf_refresh_idempotent_under_replay(spark, sf_dir, tmp_path):
    """The IVF tick publishes under deterministic tick-stamped file
    names inside the list_id layout; a replayed batch replaces its own
    files instead of appending duplicates."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
    from snowflake_medtech_vigilance_lakehouse_spark.streaming import refresh_ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx, ckpt = str(tmp_path / "ivf"), str(tmp_path / "ckpt")
    sim.build_ivf_index(emb, idx, n_lists=4, seed=42)
    new_dir = tmp_path / "new"; new_dir.mkdir()
    base = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    spark.createDataFrame([(999999, list(base))],
                          "vec_id long, embedding array<float>")\
        .write.mode("overwrite").parquet(str(new_dir))

    def refresh():
        stream = spark.readStream.schema(
            "vec_id long, embedding array<float>").parquet(str(new_dir))
        refresh_ivf_index(stream, idx, ckpt).awaitTermination(120)

    refresh()
    n1 = spark.read.parquet(idx).count()
    g1 = spark.read.parquet(idx + "_growth").agg(F.sum("n_appended")).first()[0]
    _uncommit_last_batch(ckpt)
    refresh()  # replay of the same batch, same epoch
    assert spark.read.parquet(idx).count() == n1 == emb.count() + 1
    assert spark.read.parquet(idx + "_growth").agg(
        F.sum("n_appended")).first()[0] == g1 == 1


def test_maintain_ivf_rebuilds_on_growth_and_recall_holds(spark, tmp_path):
    """The rebuild-on-evidence loop end-to-end: build on a third of
    the corpus, stream-append the other two thirds (6x the built mass
    in one list's worth of drift), and maintain_ivf_index must
    (a) not fire below threshold, (b) fire above it, rebuilding with a
    fresh quantizer and clearing _growth, (c) leave the index serving
    the same vector set with recall at the pytest gate."""
    import os

    from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
    from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
        maintain_ivf_index, refresh_ivf_index)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx, ckpt = str(tmp_path / "ivf"), str(tmp_path / "ck")
    built = emb.filter(F.col("vec_id") % 3 == 0)
    sim.build_ivf_index(built, idx, n_lists=16, seed=42)

    # nothing appended yet: no evidence, no rebuild
    assert maintain_ivf_index(spark, idx, ckpt, threshold=0.2) is False

    new_dir = tmp_path / "new"; new_dir.mkdir()
    emb.filter(F.col("vec_id") % 3 != 0).write.mode("overwrite")\
        .parquet(str(new_dir))
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>").parquet(str(new_dir))
    refresh_ivf_index(stream, idx, ckpt).awaitTermination(120)
    assert spark.read.parquet(idx).count() == emb.count()

    # appended mass is ~2x built: far over a 10x threshold? no — but
    # a sky-high threshold must NOT fire (the policy is evidence-led,
    # not unconditional)
    assert maintain_ivf_index(spark, idx, ckpt, threshold=100.0) is False
    assert os.path.isdir(idx + "_growth")

    # the newest refresh batch must be COMMITTED before a rebuild may
    # fold its tick: an uncommitted batch replays after the rebuild
    # and would duplicate its vectors
    _uncommit_last_batch(ckpt)
    with pytest.raises(ValueError, match="uncommitted"):
        maintain_ivf_index(spark, idx, ckpt, threshold=0.2)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>").parquet(str(new_dir))
    refresh_ivf_index(stream, idx, ckpt).awaitTermination(120)  # replay
    assert spark.read.parquet(idx).count() == emb.count()
    with pytest.raises(ValueError, match="is empty"):
        maintain_ivf_index(spark, idx, str(tmp_path / "wrong_ck"),
                           threshold=0.2)

    c_before = spark.read.parquet(idx + "_centroids").collect()
    assert maintain_ivf_index(spark, idx, ckpt, threshold=0.2) is True
    # growth ledger cleared, same vectors, fresh quantizer
    assert not os.path.isdir(idx + "_growth")
    assert spark.read.parquet(idx).count() == emb.count()
    assert spark.read.parquet(idx + "_centroids").count() == 16
    assert spark.read.parquet(idx + "_centroids").collect() != c_before

    # served recall over the rebuilt index clears the IVF gate
    q = emb.filter(F.col("vec_id") < 8)
    exact = sim.knn_bruteforce(emb, q, k=20)
    served = sim.knn_ivf_indexed(spark, idx, q, k=20, n_probe=8)
    assert sim.recall_at_k(served, exact, k=20) >= 0.72


def test_maintain_ivf_preserves_int8_codes(spark, tmp_path):
    """Routine maintenance of a quantize_int8 index must rebuild WITH
    the code columns: before round 9 the rebuild read only (id, _v),
    the staged index lost _v8/_qs/_n8, and the compressed serving tier
    raised 'carries no int8 codes' after the first rebuild."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
    from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
        maintain_ivf_index, refresh_ivf_index)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx, ckpt = str(tmp_path / "ivf8"), str(tmp_path / "ck8")
    sim.build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), idx,
                        n_lists=16, seed=42, quantize_int8=True)

    new_dir = tmp_path / "new8"; new_dir.mkdir()
    emb.filter(F.col("vec_id") % 3 != 0).write.mode("overwrite")\
        .parquet(str(new_dir))
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>").parquet(str(new_dir))
    refresh_ivf_index(stream, idx, ckpt).awaitTermination(120)

    assert maintain_ivf_index(spark, idx, ckpt, threshold=0.2) is True
    cols = spark.read.parquet(idx).columns
    assert {"_v8", "_qs", "_n8"} <= set(cols)

    # the compressed tier still serves, refined rows equal the
    # full-precision tier (the SQ8 candidate/refine contract)
    q = emb.filter(F.col("vec_id") < 4)
    full = sim.knn_ivf_indexed(spark, idx, q, k=10, n_probe=16)
    comp = sim.knn_ivf_indexed_compressed(spark, idx, q, k=10,
                                          n_probe=16, rerank=100_000)
    assert ({tuple(r) for r in comp.collect()}
            == {tuple(r) for r in full.collect()})


def test_compact_index_ticks_preserves_readers_and_respects_newest(
        spark, tmp_path):
    """Compaction across refresh ticks must be invisible to every
    reader: postings rows, BM25 scores (with sidecar stats), and the
    stats sidecar's sums are identical before/after; the newest tick
    (the only replay-eligible one) is never merged."""
    import os

    from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
        compact_index_ticks)

    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "pc"), str(tmp_path / "ckc")

    def refresh():
        stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ckpt, bucketed=True,
                         n_buckets=4).awaitTermination(120)

    for t, rows in enumerate([DOCS_A, DOCS_B,
                              [(4, "merge table scan")],
                              [(5, "spark scan")]]):
        _write(in_dir / f"t{t}.ndjson", rows)
        refresh()
    assert len([d for d in os.listdir(idx) if d.startswith("tick=")]) == 4

    terms = ("spark", "merge")
    stats_before = corpus_stats_from_sidecar(spark, idx + "_stats").collect()
    pruned = prune_term_buckets(spark.read.parquet(idx), terms, n_buckets=4)
    scores_before = sorted(map(tuple, bm25_from_postings(
        pruned, terms, doc_stats=corpus_stats_from_sidecar(
            spark, idx + "_stats")).collect()))
    rows_before = sorted(map(tuple, spark.read.parquet(idx)
                             .drop("tick").collect()))

    merged = compact_index_ticks(spark, idx, keep_ticks=1)
    assert merged == [0, 1, 2]
    merged_stats = compact_index_ticks(spark, idx + "_stats", keep_ticks=1)
    assert merged_stats == [0, 1, 2]
    # idempotent: nothing left to merge
    assert compact_index_ticks(spark, idx, keep_ticks=1) == []

    left = sorted(d for d in os.listdir(idx) if d.startswith("tick="))
    assert left == ["tick=0", "tick=3"]
    assert sorted(map(tuple, spark.read.parquet(idx)
                      .drop("tick").collect())) == rows_before
    assert corpus_stats_from_sidecar(
        spark, idx + "_stats").collect() == stats_before
    pruned2 = prune_term_buckets(spark.read.parquet(idx), terms, n_buckets=4)
    assert sorted(map(tuple, bm25_from_postings(
        pruned2, terms, doc_stats=corpus_stats_from_sidecar(
            spark, idx + "_stats")).collect())) == scores_before

    # a further refresh keeps appending new ticks after compaction
    _write(in_dir / "t4.ndjson", [(6, "stream merge")])
    refresh()
    assert spark.read.parquet(idx).filter(F.col("doc_id") == 6).count() > 0

    with pytest.raises(ValueError, match="keep_ticks"):
        compact_index_ticks(spark, idx, keep_ticks=0)


def test_refresh_refuses_reingested_doc(spark, tmp_path):
    """The (doc_id, term)-unique postings contract is ENFORCED, not
    documented: a later tick that carries an already-ingested doc_id
    (an update this append-only layout cannot express) is refused via
    the _docs sidecar before anything lands — otherwise df/tf/N/avgdl
    silently inflate and stale postings linger."""
    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "pu"), str(tmp_path / "cku")

    def refresh():
        stream = spark.readStream.schema(
            "doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ckpt).awaitTermination(120)

    _write(in_dir / "a.ndjson", DOCS_A)
    refresh()
    n1 = spark.read.parquet(idx).count()

    # doc 1 comes back with changed text — an update, refused loudly
    _write(in_dir / "b.ndjson", [(1, "totally different words"),
                                 (7, "fresh doc")])
    with pytest.raises(Exception, match="already ingested"):
        refresh()
    # nothing from the refused tick landed
    assert spark.read.parquet(idx).count() == n1
    assert spark.read.parquet(idx).filter(F.col("doc_id") == 7).count() == 0


def test_compact_aborts_on_concurrent_tick_commit(spark, tmp_path):
    """The swap guard: a refresh tick that commits while the compacted
    layout is being staged is NOT in the staging root, so the rename
    would strand it in the retired dir and delete it. The re-listing
    immediately before the swap must abort instead, leaving the index
    untouched."""
    import os
    import shutil as _sh

    from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
        compact_index_ticks)

    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "pa"), str(tmp_path / "cka")

    def refresh():
        stream = spark.readStream.schema(
            "doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ckpt).awaitTermination(120)

    for t, rows in enumerate([DOCS_A, DOCS_B, [(4, "merge table scan")]]):
        _write(in_dir / f"t{t}.ndjson", rows)
        refresh()
    rows_before = sorted(map(tuple, spark.read.parquet(idx).collect()))

    # simulate the concurrent commit: the first hardlink placed while
    # staging triggers a new tick dir appearing in the live index
    real_link = os.link
    fired = []

    def racing_link(src, dst):
        if not fired:
            fired.append(True)
            _sh.copytree(os.path.join(idx, "tick=2"),
                         os.path.join(idx, "tick=9"))
        return real_link(src, dst)

    import unittest.mock as mock
    with mock.patch("os.link", side_effect=racing_link):
        with pytest.raises(RuntimeError, match="compact_index_ticks aborted"):
            compact_index_ticks(spark, idx, keep_ticks=1)

    # live index untouched: original ticks + the racing tick, all rows
    ticks = sorted(d for d in os.listdir(idx) if d.startswith("tick="))
    assert ticks == ["tick=0", "tick=1", "tick=2", "tick=9"]
    _sh.rmtree(os.path.join(idx, "tick=9"))
    assert sorted(map(tuple, spark.read.parquet(idx).collect())) == rows_before
    # and with no race, compaction proceeds normally
    assert compact_index_ticks(spark, idx, keep_ticks=1) == [0, 1]


def test_maintain_aborts_on_concurrent_checkpoint_advance(spark, tmp_path):
    """maintain_ivf_index captures the refresh checkpoint state at its
    gate and re-verifies it immediately before the swap: a tick that
    commits during the (slow) rebuild is absent from the staged index,
    so the swap must abort loudly with the live index untouched."""
    import os

    from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
    from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
        index_refresh as ir)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx, ckpt = str(tmp_path / "ivf"), str(tmp_path / "ck")
    sim.build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), idx,
                        n_lists=4, seed=42)
    new_dir = tmp_path / "new"; new_dir.mkdir()
    emb.filter(F.col("vec_id") % 3 != 0).write.mode("overwrite")\
        .parquet(str(new_dir))
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>").parquet(str(new_dir))
    ir.refresh_ivf_index(stream, idx, ckpt).awaitTermination(120)

    real_build = sim.build_ivf_index

    def racing_build(*a, **kw):
        real_build(*a, **kw)
        # a refresh tick commits while the rebuild was staging
        with open(os.path.join(ckpt, "commits", "999"), "w") as f:
            f.write("{}")

    import unittest.mock as mock
    n_before = spark.read.parquet(idx).count()
    with mock.patch.object(sim, "build_ivf_index",
                           side_effect=racing_build):
        with pytest.raises(RuntimeError, match="maintain_ivf_index aborted"):
            ir.maintain_ivf_index(spark, idx, ckpt, threshold=0.2)
    os.remove(os.path.join(ckpt, "commits", "999"))

    # live index untouched, growth ledger intact, then a clean rerun
    # succeeds
    assert spark.read.parquet(idx).count() == n_before
    assert os.path.isdir(idx + "_growth")
    assert ir.maintain_ivf_index(spark, idx, ckpt, threshold=0.2) is True
    assert spark.read.parquet(idx).count() == n_before


def test_refresh_backfills_docs_sidecar_for_legacy_index(spark, tmp_path):
    """A pre-round-8 index (ticks exist, no _docs sidecar) must not
    silently exempt its historical doc_ids from the one-tick-per-doc
    contract: the first guarded refresh backfills tick=-1 from the
    existing postings, so re-ingesting a pre-upgrade document is
    refused exactly like a post-upgrade one."""
    import os
    import shutil

    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "pl"), str(tmp_path / "ckl")

    def refresh():
        stream = spark.readStream.schema(
            "doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ckpt).awaitTermination(120)

    _write(in_dir / "a.ndjson", DOCS_A)
    refresh()
    shutil.rmtree(idx + "_docs")  # simulate the pre-sidecar layout

    # fresh docs pass, and the backfill materializes tick=-1
    _write(in_dir / "b.ndjson", DOCS_B)
    refresh()
    assert os.path.isdir(f"{idx}_docs/tick=-1")
    backfilled = spark.read.parquet(idx + "_docs")
    assert set(r["doc_id"] for r in backfilled.filter(
        F.col("tick") == -1).collect()) == {1, 2}

    # a pre-upgrade doc_id is now refused like any other
    _write(in_dir / "c.ndjson", [(1, "changed text")])
    with pytest.raises(Exception, match="already ingested"):
        refresh()


def test_postings_refresh_from_delta_change_feed(spark, tmp_path):
    """Lakehouse-to-index composition: the documents table is a Delta
    table and the BM25 index maintains itself from the table's change
    feed — per-commit ticks in the SAME layout as the streaming
    refresh (serving, stats, uniqueness guard all shared), a
    high-water-mark sidecar for incremental consumption, and (round
    12) CHURN absorption: an update commit tombstones the preimage
    and re-ingests the postimage, and read_postings + the sidecar
    stats serve the MUTATED corpus exactly."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_postings_from_cdf)

    tbl, idx = str(tmp_path / "docs_delta"), str(tmp_path / "pcdf")
    dl.write_delta(spark.createDataFrame(DOCS_A, "doc_id long, text string"),
                   tbl)
    assert refresh_postings_from_cdf(spark, tbl, idx) == [0]
    assert refresh_postings_from_cdf(spark, tbl, idx) == []  # up to date

    dl.write_delta(spark.createDataFrame(DOCS_B, "doc_id long, text string"),
                   tbl, mode="append")
    assert refresh_postings_from_cdf(spark, tbl, idx) == [1]

    # serving from the CDF-built index == batch bm25 over the table
    postings = spark.read.parquet(idx)
    from_index = {r["doc_id"]: r["bm25"] for r in bm25_from_postings(
        postings, ("spark", "merge"),
        doc_stats=corpus_stats_from_sidecar(
            spark, idx + "_stats")).collect()}
    batch = {r["doc_id"]: r["bm25"] for r in bm25_scores(
        dl.read_delta(spark, tbl), ("spark", "merge")).collect()}
    assert from_index == batch

    # an update in the feed (MERGE with CDF) is ABSORBED (round 12):
    # the preimage lands as a tombstone tick + negative stats delta,
    # the postimage re-ingests, and the live view serves the mutated
    # corpus — bit-identical to a batch rescan of the table head
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        read_postings)

    src = spark.createDataFrame([(1, "totally new words")],
                                "doc_id long, text string")
    dl.merge_delta(spark, tbl, src, on=["doc_id"], when_matched="update",
                   when_not_matched=None, change_data=True)
    assert refresh_postings_from_cdf(spark, tbl, idx) == [2]
    # and a delete commit tombstones without re-ingest
    dl.merge_delta(spark, tbl, spark.createDataFrame(
        [(2, "x")], "doc_id long, text string"), on=["doc_id"],
        when_matched="delete", when_not_matched=None, change_data=True)
    assert refresh_postings_from_cdf(spark, tbl, idx) == [3]

    live = read_postings(spark, idx)
    from_index = {r["doc_id"]: r["bm25"] for r in bm25_from_postings(
        live, ("spark", "new"),
        doc_stats=corpus_stats_from_sidecar(
            spark, idx + "_stats")).collect()}
    batch = {r["doc_id"]: r["bm25"] for r in bm25_scores(
        dl.read_delta(spark, tbl), ("spark", "new")).collect()}
    assert from_index == batch
    # the updated doc scores for its NEW terms only, the deleted doc
    # for none
    assert 1 in {r["doc_id"] for r in bm25_from_postings(
        live, ("new",), doc_stats=corpus_stats_from_sidecar(
            spark, idx + "_stats")).collect()}
    assert 2 not in from_index
    # sidecar stats track the mutated corpus exactly (one plain sum)
    n_docs, avgdl = corpus_stats_from_sidecar(
        spark, idx + "_stats").first()
    head = dl.read_delta(spark, tbl)
    assert n_docs == head.count()
    assert avgdl == pytest.approx(head.select(
        F.avg(F.size(F.split("text", " ")))).first()[0])


def test_ivf_refresh_from_delta_change_feed(spark, tmp_path):
    """Vector twin of the CDF postings refresh: the embeddings table
    is a Delta table; each commit's insert rows append into the
    frozen-quantizer IVF layout (growth sidecar included, so
    rebuild-on-evidence applies unchanged), served immediately by
    knn_ivf_indexed. Update feeds are ABSORBED (round 12): the
    preimage vector dies under a tombstone tick, the postimage
    re-appends at the same commit version and serves; the high-water
    mark makes reruns no-ops."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import similarity as sim
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_ivf_from_cdf)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")\
        .select("vec_id", "embedding")
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, idx, n_lists=4, seed=42)

    tbl = str(tmp_path / "emb_delta")
    base = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    dl.write_delta(spark.createDataFrame(
        [(777001, list(base))], "vec_id long, embedding array<float>"), tbl)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [0]
    assert refresh_ivf_from_cdf(spark, tbl, idx) == []  # up to date
    assert spark.read.parquet(idx).count() == emb.count() + 1

    dl.write_delta(spark.createDataFrame(
        [(777002, list(base))], "vec_id long, embedding array<float>"),
        tbl, mode="append")
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [1]
    assert spark.read.parquet(idx + "_growth").agg(
        F.sum("n_appended")).first()[0] == 2

    # served immediately: the appended twin of vec 0 ranks first for a
    # query at the same point
    q = [(999, [float(x) for x in base])]
    top = sim.knn_ivf_indexed(spark, idx, q, k=3, n_probe=4).collect()
    assert {r["neighbor_id"] for r in top} >= {777001, 777002}

    # an update feed is ABSORBED (round 12): 777001 moves to the
    # opposite of base — its old copy at base dies under the
    # tombstone, the new copy re-appends at the same commit version
    # and serves from the next query
    moved = [-float(x) for x in base]
    dl.merge_delta(spark, tbl, spark.createDataFrame(
        [(777001, moved)], "vec_id long, embedding array<float>"),
        on=["vec_id"], when_matched="update", when_not_matched=None,
        change_data=True)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [2]
    top = sim.knn_ivf_indexed(spark, idx, q, k=2, n_probe=4).collect()
    assert {r["neighbor_id"] for r in top} == {777002, 0}  # not 777001
    anti = sim.knn_ivf_indexed(
        spark, idx, [(998, moved)], k=1, n_probe=4).collect()
    assert anti[0]["neighbor_id"] == 777001  # the UPDATED copy serves

    # a delete feed tombstones without re-append; full-probe serving
    # now equals brute force over the mutated corpus
    dl.merge_delta(spark, tbl, spark.createDataFrame(
        [(777002, list(base))], "vec_id long, embedding array<float>"),
        on=["vec_id"], when_matched="delete", when_not_matched=None,
        change_data=True)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [3]
    mutated = emb.unionByName(spark.createDataFrame(
        [(777001, moved)], "vec_id long, embedding array<float>"))
    served = sim.knn_ivf_indexed(spark, idx, q, k=5, n_probe=4)
    exact = sim.knn_bruteforce(
        mutated, spark.createDataFrame(
            [(999, [float(x) for x in base])],
            "vec_id long, embedding array<double>"), k=5)
    assert sorted(map(tuple, served.collect())) == \
        sorted(map(tuple, exact.collect()))


def test_cdf_refresh_tolerates_maintenance_commits(spark, tmp_path):
    """OPTIMIZE / Z-ORDER commits carry dataChange=false and produce
    no change-feed rows; the CDF refreshers must advance their
    high-water mark past them instead of crashing on a change-free
    range forever after (the commit is maintenance, not data)."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_postings_from_cdf)

    tbl, idx = str(tmp_path / "docs_delta"), str(tmp_path / "pcdf")
    dl.write_delta(spark.createDataFrame(DOCS_A, "doc_id long, text string"),
                   tbl)
    assert refresh_postings_from_cdf(spark, tbl, idx) == [0]

    dl.compact_delta(spark, tbl)  # version 1, dataChange=false
    # change-free range: no crash, nothing ingested, mark advanced
    assert refresh_postings_from_cdf(spark, tbl, idx) == []
    with open(f"{idx}_cdf_state/state.json") as f:
        assert json.load(f)["last_commit_version"] == 1

    # the next DATA commit is still picked up (hwm didn't overshoot)
    dl.write_delta(spark.createDataFrame(DOCS_B, "doc_id long, text string"),
                   tbl, mode="append")
    assert refresh_postings_from_cdf(spark, tbl, idx) == [2]
    # and a mixed tail (another maintenance commit) stays a no-op
    dl.compact_delta(spark, tbl)
    assert refresh_postings_from_cdf(spark, tbl, idx) == []


def test_cdf_refresh_refuses_foreign_tick_lineage(spark, tmp_path):
    """A missing _cdf_state sidecar over an index that already holds
    tick data means another maintenance lineage owns those ticks
    (streaming epochs and Delta commit versions share one tick
    namespace): consuming from commit 0 would overwrite the other
    lineage's tick-0 output. Refused loudly — the CDF twin of
    _require_checkpoint_owns_ticks."""
    import shutil

    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        similarity as sim)
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_ivf_from_cdf, refresh_postings_from_cdf)

    # postings: build a CDF lineage, then lose the sidecar
    tbl, idx = str(tmp_path / "docs_delta"), str(tmp_path / "pcdf")
    dl.write_delta(spark.createDataFrame(DOCS_A, "doc_id long, text string"),
                   tbl)
    assert refresh_postings_from_cdf(spark, tbl, idx) == [0]
    shutil.rmtree(idx + "_cdf_state")
    with pytest.raises(ValueError, match="maintenance lineage"):
        refresh_postings_from_cdf(spark, tbl, idx)

    # ivf: same guard over the growth sidecar / tick-stamped files
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")\
        .select("vec_id", "embedding").limit(64)
    vidx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, vidx, n_lists=2, seed=42)
    vtbl = str(tmp_path / "emb_delta")
    vec = [0.0] * len(emb.first()["embedding"])
    dl.write_delta(spark.createDataFrame(
        [(901, vec)], "vec_id long, embedding array<float>"), vtbl)
    assert refresh_ivf_from_cdf(spark, vtbl, vidx) == [0]
    shutil.rmtree(vidx + "_cdf_state")
    with pytest.raises(ValueError, match="maintenance lineage"):
        refresh_ivf_from_cdf(spark, vtbl, vidx)


def test_ivf_refresh_appends_sq8_codes_to_quantized_index(spark, tmp_path):
    """Appending to a quantize_int8 index must carry the int8 code
    columns: without them the appended vectors would read NULL _cos8
    and silently never surface in the compressed tier while the exact
    tier returns them — a recall divergence between two tiers of the
    SAME index."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        similarity as sim)
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_ivf_from_cdf)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")\
        .select("vec_id", "embedding")
    idx = str(tmp_path / "sq_ivf")
    sim.build_ivf_index(emb, idx, n_lists=4, seed=42, quantize_int8=True)

    base = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    tbl = str(tmp_path / "emb_delta")
    dl.write_delta(spark.createDataFrame(
        [(777001, list(base))], "vec_id long, embedding array<float>"), tbl)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [0]

    # the appended tick parquet itself carries the code columns
    appended = spark.read.parquet(idx).filter(F.col("vec_id") == 777001)
    row = appended.select("_v8", "_qs", "_n8").first()
    assert row["_v8"] is not None and row["_n8"] is not None

    # ... and the compressed tier serves the appended twin of vec 0
    q = [(999, [float(x) for x in base])]
    sq = sim.knn_ivf_indexed_compressed(spark, idx, q, k=3, n_probe=4,
                                        rerank=None).collect()
    assert 777001 in {r["neighbor_id"] for r in sq}
    # refine mode still equals the full-precision served result
    served = sim.knn_ivf_indexed(spark, idx, q, k=3, n_probe=4)
    refined = sim.knn_ivf_indexed_compressed(spark, idx, q, k=3, n_probe=4,
                                             rerank=10_000)
    assert refined.exceptAll(served).count() == 0
    assert served.exceptAll(refined).count() == 0


def test_chunk_index_cdf_refresh_serves_appends(spark, tmp_path):
    """Round-11 chunk-index maintenance: an index built over a base
    corpus absorbs two Delta insert commits through
    refresh_chunk_index_from_cdf, and full-probe serving over the
    refreshed index equals the exact brute-force tier over
    base ∪ increments BIT-FOR-BIT (with every list probed, the frozen
    quantizer's assignment cannot matter — so this pins the whole
    append path: chunking geometry from the meta sidecar, composite
    keys, docids ticks, radii/growth sidecars). Replays are no-ops,
    and a re-inserted document refuses loudly."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        retrieval as rt)
    from snowflake_medtech_vigilance_lakehouse_spark.sources import (
        delta_lite as dl)
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        refresh_chunk_index_from_cdf)

    words = ["alpha", "beta", "gamma", "delta", "spark", "join",
             "merge", "window", "scan", "fast", "slow", "agg"]
    rows = [(i, " ".join(words[(i + j) % len(words)]
                         for j in range(18 + i % 11)))
            for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = "spark join merge fast"
    idx = str(tmp_path / "chunkidx")
    rt.build_chunk_index(docs.filter(F.col("doc_id") % 3 == 0), idx,
                         chunk_tokens=8, stride=6, dim=16, n_lists=4)

    tbl = str(tmp_path / "docs_delta")
    dl.write_delta(docs.filter(F.col("doc_id") % 3 == 1), tbl,
                   mode="overwrite")
    dl.write_delta(docs.filter(F.col("doc_id") % 3 == 2), tbl,
                   mode="append")
    assert refresh_chunk_index_from_cdf(spark, tbl, idx) == [0, 1]

    exact = sorted(tuple(r) for r in rt.chunked_retrieval(
        docs, q, k=15, chunk_tokens=8, stride=6, dim=16).collect())
    served = sorted(tuple(r) for r in rt.chunked_retrieval_served(
        spark, idx, q, k=15, n_probe=4, m_chunks=10**4).collect())
    assert served == exact

    # up to date: the high-water mark holds, nothing re-ingests
    assert refresh_chunk_index_from_cdf(spark, tbl, idx) == []
    # a re-inserted doc id refuses loudly (append-only contract)
    dl.write_delta(docs.filter(F.col("doc_id") == 1), tbl, mode="append")
    with pytest.raises(ValueError, match="re-inserts"):
        refresh_chunk_index_from_cdf(spark, tbl, idx)
