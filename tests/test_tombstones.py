"""Round-12 churn tier: document updates/deletes absorbed through the
served indexes via tombstone sidecars (VERDICT r11 #1 — the reference's
Cortex Search re-serves CHANGED documents within target_lag,
/root/reference/README.md:83,117, where the r11 CDF loops refused
update/delete feeds and forced a full rebuild).

Pins, per index family:
- update feed absorbed; full-probe served ≡ exact over the MUTATED
  corpus (the existing equality gates, post-update);
- tombstone semantics survive compaction, and compaction physically
  applies them (dead rows gone, sidecars collapsed);
- the maintenance rebuild folds only LIVE rows and clears the spent
  tombstones.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators import (
    retrieval as rt, similarity as sim)
from snowflake_medtech_vigilance_lakehouse_spark.sources import delta_lite as dl
from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
    bootstrap_cdf_state, compact_index_ticks, compact_ivf_index,
    corpus_stats_from_sidecar, bm25_from_postings, maintain_ivf_index,
    read_postings, refresh_chunk_index_from_cdf, refresh_ivf_from_cdf,
    refresh_postings_from_cdf)

WORDS = ["alpha", "beta", "gamma", "delta", "spark", "join",
         "merge", "window", "scan", "fast", "slow", "agg"]


def _word_docs(spark, n=90, id_type="long", prefix=None):
    rows = []
    for i in range(n):
        text = " ".join(WORDS[(i + j) % len(WORDS)]
                        for j in range(18 + i % 11))
        rows.append((f"{prefix}{i}" if prefix else i, text))
    return spark.createDataFrame(rows, f"doc_id {id_type}, text string")


QUERY = "spark join merge fast"


def _serve(spark, idx, k=15):
    return sorted(tuple(r) for r in rt.chunked_retrieval_served(
        spark, idx, QUERY, k=k, n_probe=4, m_chunks=10**4).collect())


def _exact(docs, k=15):
    return sorted(tuple(r) for r in rt.chunked_retrieval(
        docs, QUERY, k=k, chunk_tokens=8, stride=6, dim=16).collect())


def test_chunk_index_churn_serves_mutated_corpus(spark, tmp_path):
    """The headline gate: an index built from the documents table's
    snapshot (build + bootstrap_cdf_state) absorbs an update commit
    and a delete commit through the CDF refresher, and full-probe
    serving equals the exact tier over the MUTATED table head —
    bit-for-bit, before and after physical compaction."""
    docs = _word_docs(spark)
    tbl, idx = str(tmp_path / "docs_delta"), str(tmp_path / "chunkidx")
    dl.write_delta(docs, tbl)  # version 0
    rt.build_chunk_index(dl.read_delta(spark, tbl), idx,
                         chunk_tokens=8, stride=6, dim=16, n_lists=4)
    bootstrap_cdf_state(idx + "_cdf_state", 0)

    # update commit: %7==2 docs get materially different text
    upd = (docs.filter(F.col("doc_id") % 7 == 2)
           .select("doc_id", F.concat(F.lit("spark fast fast "),
                                      F.col("text")).alias("text")))
    dl.merge_delta(spark, tbl, upd, on=["doc_id"], when_matched="update",
                   when_not_matched=None, change_data=True)  # v1
    # delete commit: %7==3 docs are gone
    dl.merge_delta(spark, tbl,
                   docs.filter(F.col("doc_id") % 7 == 3)
                   .select("doc_id", "text"),
                   on=["doc_id"], when_matched="delete",
                   when_not_matched=None, change_data=True)  # v2
    assert refresh_chunk_index_from_cdf(spark, tbl, idx) == [1, 2]
    assert refresh_chunk_index_from_cdf(spark, tbl, idx) == []  # hwm

    head = dl.read_delta(spark, tbl)
    assert _serve(spark, idx) == _exact(head)
    # the mutation is visible, not vacuous: results differ from the
    # pre-churn corpus's
    assert _serve(spark, idx) != _exact(docs)

    # physical apply: identical serving, dead rows gone, tombstones
    # cleared, docids sidecar collapsed to live rows
    before = _serve(spark, idx)
    raw_before = spark.read.parquet(idx).count()
    stats = compact_ivf_index(spark, idx)
    assert stats["tombstones_applied"] > 0
    assert not os.path.isdir(idx + "_tombstones")
    assert spark.read.parquet(idx).count() == stats["rows_after"] \
        < raw_before
    assert _serve(spark, idx) == before
    side = spark.read.parquet(idx + "_docids")
    assert side.count() == side.select("doc_id").distinct().count() \
        == head.count()

    # post-compaction churn keeps working: a deleted doc id comes
    # back as a NEW insert commit and serves again
    dl.merge_delta(spark, tbl,
                   docs.filter(F.col("doc_id") == 3).select("doc_id", "text"),
                   on=["doc_id"], when_matched=None,
                   when_not_matched="insert", change_data=True)  # v3
    assert refresh_chunk_index_from_cdf(spark, tbl, idx) == [3]
    assert _serve(spark, idx) == _exact(dl.read_delta(spark, tbl))


def test_chunk_index_churn_hash_bridge(spark, tmp_path):
    """Same gate through the xxhash64 id bridge (string doc ids): the
    doc-level tombstone is keyed by _dkey, the decode join reads only
    live mappings, and an updated doc's re-keyed sidecar rows do not
    fan out hits."""
    docs = _word_docs(spark, n=60, id_type="string", prefix="d-")
    tbl, idx = str(tmp_path / "docs_delta"), str(tmp_path / "chunkidx")
    dl.write_delta(docs, tbl)
    rt.build_chunk_index(dl.read_delta(spark, tbl), idx,
                         chunk_tokens=8, stride=6, dim=16, n_lists=4)
    bootstrap_cdf_state(idx + "_cdf_state", 0)

    upd = (docs.filter(F.col("doc_id").isin("d-2", "d-9", "d-16"))
           .select("doc_id", F.concat(F.lit("spark fast fast "),
                                      F.col("text")).alias("text")))
    dl.merge_delta(spark, tbl, upd, on=["doc_id"], when_matched="update",
                   when_not_matched=None, change_data=True)
    dl.merge_delta(spark, tbl,
                   docs.filter(F.col("doc_id").isin("d-4", "d-11"))
                   .select("doc_id", "text"),
                   on=["doc_id"], when_matched="delete",
                   when_not_matched=None, change_data=True)
    assert refresh_chunk_index_from_cdf(spark, tbl, idx) == [1, 2]

    head = dl.read_delta(spark, tbl)
    assert _serve(spark, idx) == _exact(head)
    got = {r[0] for r in _serve(spark, idx)}
    assert not ({"d-4", "d-11"} & got)

    before = _serve(spark, idx)
    compact_ivf_index(spark, idx)
    assert _serve(spark, idx) == before


def test_compact_ivf_index_guards(spark, tmp_path):
    """The crash-window guard: a tick file newer than the consumed
    high-water mark means an uncommitted refresh could replay after
    its rows were folded — refused. A tick-bearing index with neither
    a CDF state nor a checkpoint also refuses."""
    import json

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding")
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, idx, n_lists=4, seed=42)
    base = emb.first()["embedding"]
    tbl = str(tmp_path / "emb_delta")
    dl.write_delta(spark.createDataFrame(
        [(777001, list(base))], "vec_id long, embedding array<float>"), tbl)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [0]

    state = os.path.join(idx + "_cdf_state", "state.json")
    with open(state, "w") as f:
        json.dump({"last_commit_version": -1}, f)  # simulate crash window
    with pytest.raises(ValueError, match="newer than the consumed"):
        compact_ivf_index(spark, idx)
    os.remove(state)
    with pytest.raises(ValueError, match="no .*state.json"):
        compact_ivf_index(spark, idx)
    with open(state, "w") as f:
        json.dump({"last_commit_version": 0}, f)
    compact_ivf_index(spark, idx)  # committed: folds the tick files
    assert not any(fn.startswith("tick") for _, _, fs in os.walk(idx)
                   for fn in fs)

    # lineage bootstrap refuses to overwrite an existing mark
    with pytest.raises(ValueError, match="already holds"):
        bootstrap_cdf_state(idx + "_cdf_state", 5)


def test_maintain_rebuild_applies_tombstones(spark, tmp_path):
    """A maintenance rebuild over a churned index folds only LIVE
    rows (the old copy of an updated vector must not resurrect — and
    with the fresh files reading as epoch -1, a surviving tombstone
    would otherwise kill the UPDATED copy) and clears the spent
    sidecar."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding")
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx,
                        n_lists=4, seed=42)
    tbl = str(tmp_path / "emb_delta")
    dl.write_delta(emb.filter(F.col("vec_id") % 2 == 1), tbl)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [0]
    base = emb.first()["embedding"]
    moved = [-float(x) for x in base]
    dl.merge_delta(spark, tbl, spark.createDataFrame(
        [(1, moved)], "vec_id long, embedding array<float>"),
        on=["vec_id"], when_matched="update", when_not_matched=None,
        change_data=True)
    assert refresh_ivf_from_cdf(spark, tbl, idx) == [1]
    # vec 1 exists twice physically (old dead + new live) pre-rebuild
    assert spark.read.parquet(idx).filter(
        F.col("vec_id") == 1).count() == 2

    # the CDF state root is the refresh lineage's commit evidence
    # (round 12 — maintain previously required a streaming checkpoint)
    assert maintain_ivf_index(spark, idx, idx + "_cdf_state",
                              threshold=0.0001)
    assert not os.path.isdir(idx + "_tombstones")
    rebuilt = spark.read.parquet(idx)
    assert rebuilt.filter(F.col("vec_id") == 1).count() == 1
    # ... and it is the UPDATED copy that serves
    hit = sim.knn_ivf_indexed(spark, idx, [(999, moved)], k=1,
                              n_probe=4).first()
    assert hit["neighbor_id"] == 1 and hit["cosine"] == 1.0


def test_compact_index_ticks_applies_postings_tombstones(spark, tmp_path):
    """Postings-layout compaction under churn: the merged range drops
    tombstone-dead rows physically, the consolidated dir is re-named
    to the NEWEST merged tick (so surviving re-ingests stay live),
    read_postings results are identical across the compaction, and
    the re-ingest guard still resolves correctly after the _docs
    sidecar is compacted the same way."""
    docs = _word_docs(spark, n=24)
    tbl, idx = str(tmp_path / "docs_delta"), str(tmp_path / "pcdf")
    dl.write_delta(docs.filter(F.col("doc_id") < 12), tbl)           # v0
    dl.write_delta(docs.filter(F.col("doc_id") >= 12), tbl,
                   mode="append")                                    # v1
    upd = (docs.filter(F.col("doc_id") == 1)
           .select("doc_id", F.lit("totally new words").alias("text")))
    dl.merge_delta(spark, tbl, upd, on=["doc_id"], when_matched="update",
                   when_not_matched=None, change_data=True)          # v2
    dl.merge_delta(spark, tbl,
                   docs.filter(F.col("doc_id") == 2)
                   .select("doc_id", "text"),
                   on=["doc_id"], when_matched="delete",
                   when_not_matched=None, change_data=True)          # v3
    assert refresh_postings_from_cdf(spark, tbl, idx) == [0, 1, 2, 3]

    def _scores():
        return sorted(tuple(r) for r in bm25_from_postings(
            read_postings(spark, idx), ("spark", "new"),
            doc_stats=corpus_stats_from_sidecar(
                spark, idx + "_stats")).collect())

    before = _scores()
    merged = compact_index_ticks(spark, idx, keep_ticks=1)
    assert merged == [0, 1, 2]
    # renamed to the NEWEST merged tick, and dead rows physically gone
    assert os.path.isdir(os.path.join(idx, "tick=2"))
    assert not os.path.isdir(os.path.join(idx, "tick=0"))
    merged_rows = spark.read.parquet(idx).filter(F.col("tick") == 2)
    assert merged_rows.filter(F.col("doc_id") == 2).count() == 0
    assert merged_rows.filter(  # doc 1's OLD postings dropped too
        (F.col("doc_id") == 1) & (F.col("term") == "alpha")).count() == 0
    compact_index_ticks(spark, idx + "_docs", keep_ticks=1)
    compact_index_ticks(spark, idx + "_stats", keep_ticks=1)
    assert _scores() == before
    # tombstones spent for BOTH the postings dir and the _docs
    # sidecar (oldest surviving tick >= their tick) prune away;
    # the delete commit's (tick 3, above the floor) stays —
    # conservative until the next cycle — and results are unchanged
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        prune_spent_tombstones)
    assert prune_spent_tombstones(spark, idx) == [2]
    assert os.path.isdir(idx + "_tombstones")  # tick=3 survives
    assert _scores() == before

    # guard behavior after compaction: a live doc still refuses...
    dl.write_delta(docs.filter(F.col("doc_id") == 5)
                   .select("doc_id", "text"), tbl, mode="append")    # v4
    with pytest.raises(ValueError, match="already ingested"):
        refresh_postings_from_cdf(spark, tbl, idx)
    # (the refused commit advanced nothing; rebuild the table head by
    # re-inserting the DELETED doc instead, which must pass)
    tbl2, idx2 = str(tmp_path / "d2"), str(tmp_path / "p2")
    dl.write_delta(docs.filter(F.col("doc_id") < 12), tbl2)
    dl.merge_delta(spark, tbl2,
                   docs.filter(F.col("doc_id") == 2)
                   .select("doc_id", "text"),
                   on=["doc_id"], when_matched="delete",
                   when_not_matched=None, change_data=True)
    assert refresh_postings_from_cdf(spark, tbl2, idx2) == [0, 1]
    compact_index_ticks(spark, idx2, keep_ticks=1)
    compact_index_ticks(spark, idx2 + "_docs", keep_ticks=1)
    dl.merge_delta(spark, tbl2,
                   docs.filter(F.col("doc_id") == 2)
                   .select("doc_id", "text"),
                   on=["doc_id"], when_matched=None,
                   when_not_matched="insert", change_data=True)
    assert refresh_postings_from_cdf(spark, tbl2, idx2) == [2]
    live = read_postings(spark, idx2)
    assert live.filter(F.col("doc_id") == 2).count() > 0


def _churned_chunk_index(spark, tmp_path, name="crash"):
    """Build + CDF-absorb one update and one delete commit; return
    (table path, index path, mutated head)."""
    docs = _word_docs(spark, n=60)
    tbl = str(tmp_path / f"tbl_{name}")
    idx = str(tmp_path / f"idx_{name}")
    dl.write_delta(docs, tbl)
    rt.build_chunk_index(dl.read_delta(spark, tbl), idx,
                         chunk_tokens=8, stride=6, dim=16, n_lists=4)
    bootstrap_cdf_state(idx + "_cdf_state", 0)
    upd = (docs.filter(F.col("doc_id") % 7 == 2)
           .select("doc_id", F.concat(F.lit("spark fast fast "),
                                      F.col("text")).alias("text")))
    dl.merge_delta(spark, tbl, upd, on=["doc_id"], when_matched="update",
                   when_not_matched=None, change_data=True)
    dl.merge_delta(spark, tbl,
                   docs.filter(F.col("doc_id") % 7 == 3)
                   .select("doc_id", "text"),
                   on=["doc_id"], when_matched="delete",
                   when_not_matched=None, change_data=True)
    assert refresh_chunk_index_from_cdf(spark, tbl, idx) == [1, 2]
    return tbl, idx, dl.read_delta(spark, tbl)


def test_stale_tombstones_after_compaction_crash_window(spark, tmp_path):
    """Round-12 review fix: a crash between compact_ivf_index's swap
    and the sidecar rmtree leaves APPLIED tombstones next to the
    rewritten epoch -1 rows — without the applied-through marker they
    re-kill the live copies of every updated key (silent misses, then
    permanent deletion on the compact re-run)."""
    import shutil

    _, idx, head = _churned_chunk_index(spark, tmp_path)
    want = _serve(spark, idx)
    assert want == _exact(head)

    tomb, saved = idx + "_tombstones", str(tmp_path / "tomb_saved")
    shutil.copytree(tomb, saved)
    compact_ivf_index(spark, idx)
    assert not os.path.isdir(tomb)
    shutil.copytree(saved, tomb)  # the crash window, reconstructed

    # updated docs must still serve through the stale sidecar
    assert _serve(spark, idx) == want
    # and the compact re-run converges: nothing wrongly dropped, the
    # sidecar cleared, serving identical
    rows = spark.read.parquet(idx).count()
    stats = compact_ivf_index(spark, idx)
    assert stats["tombstones_applied"] == 0
    assert stats["rows_after"] == rows
    assert not os.path.isdir(tomb)
    assert _serve(spark, idx) == want


def test_maintain_rebuild_crash_window_stale_tombstones(spark, tmp_path):
    """The same window through maintain_ivf_index's rebuild: the
    rebuilt (epoch -1) rows must survive a restored spent sidecar."""
    import shutil

    _, idx, head = _churned_chunk_index(spark, tmp_path, name="mt")
    want = _serve(spark, idx)
    tomb, saved = idx + "_tombstones", str(tmp_path / "tomb_mt")
    shutil.copytree(tomb, saved)
    assert maintain_ivf_index(spark, idx, idx + "_cdf_state",
                              threshold=0.0)
    assert not os.path.isdir(tomb)
    shutil.copytree(saved, tomb)
    assert _serve(spark, idx) == want


def test_compact_aborts_on_tombstone_tick_during_staging(
        spark, tmp_path, monkeypatch):
    """Round-12 review fix: a DELETE-ONLY commit writes a tombstone
    tick but NO index files, so the old last-moment re-verification
    (index tick files only) missed it — compaction would fold from
    the pre-delete frame and then discard the unapplied tombstone,
    resurrecting the deleted doc. The check now compares the
    tombstone listing too."""
    _, idx, _ = _churned_chunk_index(spark, tmp_path, name="race")
    want = _serve(spark, idx)

    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        similarity as sim_mod)
    real = sim_mod._ivf_radii_frame

    def _sneaky(*a, **k):
        # a concurrent delete-only commit lands mid-staging
        os.makedirs(os.path.join(idx + "_tombstones", "tick=99"),
                    exist_ok=True)
        return real(*a, **k)

    monkeypatch.setattr(sim_mod, "_ivf_radii_frame", _sneaky)
    with pytest.raises(RuntimeError, match="tombstone ticks"):
        compact_ivf_index(spark, idx)
    monkeypatch.undo()

    # index untouched, stage cleaned, serving unchanged (the injected
    # tick dir is empty — no tombstone rows — so results are equal)
    assert not os.path.isdir(idx + "_compact_stage")
    assert _serve(spark, idx) == want


def test_compact_all_dead_merged_range(spark, tmp_path):
    """Round-13 ADVICE (medium): when EVERY row of the merged range is
    tombstone-dead, the old code wrote an empty consolidated tick dir
    and inferred tb-partitioning from the oldest merged tick's
    LISTING — a later compaction whose merge[0] was such an empty dir
    would write its consolidated range without tb= partitioning while
    kept ticks keep it, and partition discovery throws on the mixed
    layout. Now: no consolidated dir is written for an all-dead range,
    and tb is inferred from the merged frame's schema."""
    docs = _word_docs(spark, n=8)
    tbl, idx = str(tmp_path / "alldead_tbl"), str(tmp_path / "alldead_idx")
    dl.write_delta(docs, tbl)                                        # v0
    for pfx in ("v2 ", "v3 "):  # two update-ALL commits: v1, v2
        upd = docs.select(
            "doc_id", F.concat(F.lit(pfx), F.col("text")).alias("text"))
        dl.merge_delta(spark, tbl, upd, on=["doc_id"],
                       when_matched="update", when_not_matched=None,
                       change_data=True)
    dl.write_delta(spark.createDataFrame([(100, "fresh spark doc")],
                                         "doc_id long, text string"),
                   tbl, mode="append")                               # v3
    assert refresh_postings_from_cdf(spark, tbl, idx, bucketed=True,
                                     n_buckets=4) == [0, 1, 2, 3]

    def _scores():
        return sorted(tuple(r) for r in bm25_from_postings(
            read_postings(spark, idx), ("spark", "v3"),
            doc_stats=corpus_stats_from_sidecar(
                spark, idx + "_stats")).collect())

    before = _scores()
    # ticks 0 and 1 are ENTIRELY dead (every doc updated twice): the
    # merged range must vanish, not land as an empty tick dir
    assert compact_index_ticks(spark, idx, keep_ticks=2) == [0, 1]
    assert not any(d in ("tick=0", "tick=1") for d in os.listdir(idx))
    assert _scores() == before
    # a LATER compaction over the surviving (live) ticks still infers
    # tb-partitioning from the merged frame's schema and preserves it
    dl.write_delta(spark.createDataFrame([(101, "fresh spark doc two")],
                                         "doc_id long, text string"),
                   tbl, mode="append")                               # v4
    assert refresh_postings_from_cdf(spark, tbl, idx, bucketed=True,
                                     n_buckets=4) == [4]
    before = _scores()
    assert compact_index_ticks(spark, idx, keep_ticks=1) == [2, 3]
    assert any(n.startswith("tb=")
               for n in os.listdir(os.path.join(idx, "tick=3")))
    assert _scores() == before


def test_vet_before_tombstone_publish(spark, tmp_path, monkeypatch):
    """Round-13 ADVICE (low): the CDF refreshers vet a commit's batch
    BEFORE publishing its tombstone tick — the guard sees the dead
    keys as a PENDING tombstone (so a legal update's postimage
    passes), and a refused commit leaves nothing behind. The old
    publish-then-vet order left a refused mixed commit half-absorbed:
    preimages serve-dead, postimages and the negative _stats delta
    never landed."""
    import snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh as ir

    docs = _word_docs(spark, n=10)
    tbl, idx = str(tmp_path / "vet_tbl"), str(tmp_path / "vet_idx")
    dl.write_delta(docs, tbl)                                        # v0
    assert refresh_postings_from_cdf(spark, tbl, idx) == [0]

    # the guard admits an update postimage through the IN-MEMORY
    # pending dead keys (not the published sidecar)...
    batch3 = docs.filter(F.col("doc_id") == 3)
    dead3 = batch3.select("doc_id")
    ir._refuse_reingested_docs(batch3, idx, 1, pending_dead=dead3)
    # ...while refusing it without them, and refusing a duplicate
    # insert mixed into an otherwise-legal churn batch
    with pytest.raises(ValueError, match="already ingested"):
        ir._refuse_reingested_docs(batch3, idx, 1)
    with pytest.raises(ValueError, match="already ingested"):
        ir._refuse_reingested_docs(
            docs.filter(F.col("doc_id").isin(3, 5)), idx, 1,
            pending_dead=dead3)
    assert not os.path.isdir(idx + "_tombstones")  # nothing published

    # order through the real refresher: force a refusal on a legal
    # update commit and assert the tombstone tick was never published.
    # Round 14: the refresher vets clean feeds through the BATCHED
    # upfront pass (_feed_reinsert_hits) and falls back to the
    # per-commit guard only for in-feed repeated-insert ranges — force
    # each mechanism in turn and assert the same nothing-left-behind
    # outcome.
    upd = (docs.filter(F.col("doc_id") == 1)
           .select("doc_id", F.lit("changed words").alias("text")))
    dl.merge_delta(spark, tbl, upd, on=["doc_id"], when_matched="update",
                   when_not_matched=None, change_data=True)          # v1

    def _always_hit(feed, prior, key_col, **k):
        return {1: [1]}, set()

    monkeypatch.setattr(ir, "_feed_reinsert_hits", _always_hit)
    with pytest.raises(ValueError, match="already ingested"):
        refresh_postings_from_cdf(spark, tbl, idx)
    monkeypatch.undo()
    assert not os.path.isdir(idx + "_tombstones")
    assert not os.path.isdir(os.path.join(idx, "tick=1"))

    def _always_infeed(feed, prior, key_col, **k):
        return {}, {1}

    def _always_refuse(*a, **k):
        raise ValueError("already ingested (forced)")

    monkeypatch.setattr(ir, "_feed_reinsert_hits", _always_infeed)
    monkeypatch.setattr(ir, "_refuse_reingested_docs", _always_refuse)
    with pytest.raises(ValueError, match="already ingested"):
        refresh_postings_from_cdf(spark, tbl, idx)
    monkeypatch.undo()
    assert not os.path.isdir(idx + "_tombstones")
    assert not os.path.isdir(os.path.join(idx, "tick=1"))
    # the feed replays cleanly once the guard passes again
    assert refresh_postings_from_cdf(spark, tbl, idx) == [1]
    assert os.path.isdir(idx + "_tombstones")
    live = read_postings(spark, idx)
    assert live.filter((F.col("doc_id") == 1)
                       & (F.col("term") == "changed")).count() == 1


def test_chunk_append_vets_before_publish(spark, tmp_path):
    """Chunk-index twin of the vet-before-publish order: a batch that
    re-inserts a LIVE doc refuses and publishes NO tombstone tick,
    even when the same commit carries dead keys; a delete-only batch
    still publishes its tick."""
    from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
        _chunk_index_append_batch)
    from snowflake_medtech_vigilance_lakehouse_spark.operators.retrieval import (
        _read_chunk_meta)

    docs = _word_docs(spark, n=12)
    idx = str(tmp_path / "vetchunk")
    rt.build_chunk_index(docs, idx, chunk_tokens=8, stride=6, dim=16,
                         n_lists=2)
    meta = _read_chunk_meta(idx)
    dead = spark.createDataFrame([(7,)], "k long")
    with pytest.raises(ValueError, match="re-inserts"):
        _chunk_index_append_batch(
            spark, docs.filter(F.col("doc_id") == 5), idx, 1, meta,
            pending_dead=dead)
    assert not os.path.isdir(idx + "_tombstones")
    # a delete-only commit (empty batch) IS its tombstone tick
    _chunk_index_append_batch(spark, docs.filter(F.lit(False)), idx, 1,
                              meta, pending_dead=dead)
    assert os.path.isdir(os.path.join(idx + "_tombstones", "tick=1"))
    # and with the tombstone live, re-inserting the dead doc is legal
    _chunk_index_append_batch(
        spark, docs.filter(F.col("doc_id") == 7), idx, 2, meta,
        pending_dead=spark.createDataFrame([], "k long"))
