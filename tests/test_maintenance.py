"""Round 13 — declarative target_lag maintenance (VERDICT r12 #5):
maintain_serving_indexes measures each index's commit lag against the
governed Delta table, refreshes past the declared target, compacts on
tick/tombstone debt, and reports freshness. Pins: lag honored (a
loose max_lag SKIPS the refresh and the report says so), idempotent
re-entry, compaction fires exactly once, and serving equals the exact
tier over the mutated head after a maintenance pass."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators import retrieval as rt
from snowflake_medtech_vigilance_lakehouse_spark.sources import delta_lite as dl
from snowflake_medtech_vigilance_lakehouse_spark.streaming.index_refresh import (
    bootstrap_cdf_state)
from snowflake_medtech_vigilance_lakehouse_spark.streaming.maintenance import (
    maintain_serving_indexes)

WORDS = ["alpha", "beta", "gamma", "delta", "spark", "join",
         "merge", "window", "scan", "fast", "slow", "agg"]


def _docs(spark, lo, hi):
    rows = [(i, " ".join(WORDS[(i + j) % len(WORDS)]
                         for j in range(15 + i % 7)))
            for i in range(lo, hi)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _report(df):
    return {r["name"]: r.asDict() for r in df.collect()}


def test_maintain_serving_indexes_end_to_end(spark, tmp_path):
    docs = _docs(spark, 0, 40)
    tbl1, idx1 = str(tmp_path / "t1"), str(tmp_path / "bm25")
    tbl2, idx2 = str(tmp_path / "t2"), str(tmp_path / "chunks")
    dl.write_delta(docs, tbl1)                                   # v0
    dl.write_delta(docs, tbl2)                                   # v0
    rt.build_chunk_index(dl.read_delta(spark, tbl2), idx2,
                         chunk_tokens=8, stride=6, dim=16, n_lists=4)
    bootstrap_cdf_state(idx2 + "_cdf_state", 0)
    specs = [
        {"name": "bm25", "kind": "postings", "delta_path": tbl1,
         "path": idx1},
        {"name": "chunks", "kind": "chunk", "delta_path": tbl2,
         "path": idx2},
    ]

    rep = _report(maintain_serving_indexes(spark, specs))
    assert rep["bm25"]["refreshed_commits"] == 1  # commit 0 ingested
    assert rep["chunks"]["refreshed_commits"] == 0  # bootstrapped at 0
    assert all(r["lag"] == 0 and not r["compacted"]
               for r in rep.values())

    # idempotent re-entry: nothing refreshes, nothing compacts
    rep = _report(maintain_serving_indexes(spark, specs))
    assert all(r["refreshed_commits"] == 0 and not r["compacted"]
               for r in rep.values())

    # lag honored: two new commits, loose target -> refresh SKIPPED
    # and the report shows the real lag
    for t in (tbl1, tbl2):
        dl.write_delta(_docs(spark, 100, 110), t, mode="append")  # v1
        dl.write_delta(_docs(spark, 200, 210), t, mode="append")  # v2
    rep = _report(maintain_serving_indexes(spark, specs, max_lag=5))
    assert all(r["refreshed_commits"] == 0 and r["lag"] == 2
               for r in rep.values())
    # tight target -> both catch up
    rep = _report(maintain_serving_indexes(spark, specs))
    assert all(r["refreshed_commits"] == 2 and r["lag"] == 0
               for r in rep.values())
    # and serving matches the exact tier over the table head
    got = sorted(tuple(r) for r in rt.chunked_retrieval_served(
        spark, idx2, "spark join merge fast", k=10, n_probe=4,
        m_chunks=10**4).collect())
    want = sorted(tuple(r) for r in rt.chunked_retrieval(
        dl.read_delta(spark, tbl2), "spark join merge fast", k=10,
        chunk_tokens=8, stride=6, dim=16).collect())
    assert got == want

    # churn debt: five update commits -> five tombstone ticks; the
    # default threshold tolerates them, a tight one compacts ONCE
    for k in range(5):
        upd = (_docs(spark, 0, 40)
               .filter(F.col("doc_id") % 5 == k)
               .select("doc_id", F.concat(F.lit(f"pass{k} "),
                                          F.col("text")).alias("text")))
        for t in (tbl1, tbl2):
            dl.merge_delta(spark, t, upd, on=["doc_id"],
                           when_matched="update", when_not_matched=None,
                           change_data=True)
    rep = _report(maintain_serving_indexes(spark, specs,
                                           tombstone_ticks=10,
                                           compact_ticks=20))
    assert all(r["refreshed_commits"] == 5 and not r["compacted"]
               for r in rep.values())
    assert os.path.isdir(idx1 + "_tombstones")
    assert os.path.isdir(idx2 + "_tombstones")

    rep = _report(maintain_serving_indexes(spark, specs,
                                           tombstone_ticks=2,
                                           compact_ticks=2))
    assert all(r["compacted"] for r in rep.values())
    assert not os.path.isdir(idx2 + "_tombstones")  # physically applied
    # compaction fired once: the next pass has no debt left
    rep = _report(maintain_serving_indexes(spark, specs,
                                           tombstone_ticks=2,
                                           compact_ticks=2))
    assert all(not r["compacted"] and r["refreshed_commits"] == 0
               for r in rep.values())
    # serving still equals exact over the churned head
    got = sorted(tuple(r) for r in rt.chunked_retrieval_served(
        spark, idx2, "spark join merge fast", k=10, n_probe=4,
        m_chunks=10**4).collect())
    want = sorted(tuple(r) for r in rt.chunked_retrieval(
        dl.read_delta(spark, tbl2), "spark join merge fast", k=10,
        chunk_tokens=8, stride=6, dim=16).collect())
    assert got == want

    # unknown kind refuses loudly
    with pytest.raises(ValueError, match="unknown kind"):
        maintain_serving_indexes(spark, [
            {"name": "x", "kind": "nope", "delta_path": tbl1,
             "path": idx1}])


def test_maintain_curation_stores(spark, tmp_path):
    """The curation-store kinds through the declarative pass: churned
    feeds refresh through the round-13 curate loops, and compaction
    physically applies their tombstones (MinHash pair-fold + prune;
    the embedding store is an IVF layout whose compactor now reads
    the curation lineage's high-water mark)."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators import (
        dedup as dd, similarity as sim)

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [(i, f"{base} variant {i} with words {i * 7 % 13}")
             for i in range(10)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    tbl1, mh = str(tmp_path / "dt"), str(tmp_path / "mh")
    dd.build_minhash_store(docs.filter(F.col("doc_id") % 2 == 1), mh,
                           num_hashes=64, bands=32)
    dl.write_delta(docs.filter(F.col("doc_id") % 2 == 0), tbl1)  # v0
    upd = (docs.filter(F.col("doc_id") == 2)
           .select("doc_id", F.lit("totally rewritten words here "
                                   "for doc two").alias("text")))
    dl.merge_delta(spark, tbl1, upd, on=["doc_id"],
                   when_matched="update", when_not_matched=None,
                   change_data=True)                              # v1
    dl.merge_delta(spark, tbl1,
                   docs.filter(F.col("doc_id") == 4)
                   .select("doc_id", "text"),
                   on=["doc_id"], when_matched="delete",
                   when_not_matched=None, change_data=True)       # v2

    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(8)],
        "vec_id long, embedding array<double>")
    tbl2, iv = str(tmp_path / "et"), str(tmp_path / "iv")
    sim.build_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), iv,
                        n_lists=2)
    dl.write_delta(emb.filter(F.col("vec_id") % 2 == 0), tbl2)    # v0
    dl.merge_delta(spark, tbl2,
                   emb.filter(F.col("vec_id") == 2)
                   .select("vec_id", F.reverse("embedding")
                           .alias("embedding")),
                   on=["vec_id"], when_matched="update",
                   when_not_matched=None, change_data=True)       # v1
    dl.merge_delta(spark, tbl2,
                   emb.filter(F.col("vec_id") == 4)
                   .select("vec_id", "embedding"),
                   on=["vec_id"], when_matched="delete",
                   when_not_matched=None, change_data=True)       # v2

    specs = [
        {"name": "mh", "kind": "minhash_curate", "delta_path": tbl1,
         "path": mh, "threshold": 0.5},
        {"name": "iv", "kind": "embedding_curate", "delta_path": tbl2,
         "path": iv, "threshold": 0.9},
    ]
    rep = {r["name"]: r.asDict() for r in maintain_serving_indexes(
        spark, specs, tombstone_ticks=10, compact_ticks=20).collect()}
    assert all(r["refreshed_commits"] == 3 and r["lag"] == 0
               and not r["compacted"] for r in rep.values())
    assert os.path.isdir(mh + "_tombstones")
    assert os.path.isdir(iv + "_tombstones")

    live_before = sorted(
        r["_id"] for r in
        dd.read_minhash_store(spark, mh)[1].select("_id").collect())
    rep = {r["name"]: r.asDict() for r in maintain_serving_indexes(
        spark, specs, tombstone_ticks=0, compact_ticks=0).collect()}
    assert all(r["compacted"] for r in rep.values())
    # IVF compaction clears its sidecar outright; the MinHash prune
    # is floor-conservative (ticks above the oldest surviving store
    # tick stay until the next fold passes them)
    assert not os.path.isdir(iv + "_tombstones")
    assert sorted(
        r["_id"] for r in
        dd.read_minhash_store(spark, mh)[1].select("_id").collect()) \
        == live_before
    # idempotent: no debt left
    rep = {r["name"]: r.asDict() for r in maintain_serving_indexes(
        spark, specs, tombstone_ticks=0, compact_ticks=0).collect()}
    assert all(not r["compacted"] and r["refreshed_commits"] == 0
               for r in rep.values())


def test_maintain_count_ledger(spark, tmp_path):
    """The 'counts' kind: lag honored, refresh folds commits, tick
    debt triggers compact_count_store exactly once, report rows
    reflect post-maintenance state."""
    from snowflake_medtech_vigilance_lakehouse_spark.operators.sketch import (
        read_count_store)

    tbl, store = str(tmp_path / "t"), str(tmp_path / "cnt")
    rows = [(i, f"k{i % 3}") for i in range(12)]
    base = spark.createDataFrame(rows, "id long, key string")
    for lo in range(0, 12, 4):
        dl.write_delta(base.filter((F.col("id") >= lo)
                                   & (F.col("id") < lo + 4)),
                       tbl, mode="overwrite" if lo == 0 else "append")
    spec = {"name": "cnt", "kind": "counts", "delta_path": tbl,
            "path": store, "key_col": "key"}

    # loose lag: refresh skipped by policy, report says so
    rep = _report(maintain_serving_indexes(spark, [spec], max_lag=99))
    assert rep["cnt"]["refreshed_commits"] == 0
    assert rep["cnt"]["applied_version"] == -1
    assert rep["cnt"]["lag"] == rep["cnt"]["head_version"] + 1

    # tight lag: all three commits fold; counts match the snapshot
    rep = _report(maintain_serving_indexes(spark, [spec]))
    assert rep["cnt"]["refreshed_commits"] == 3
    assert rep["cnt"]["lag"] == 0 and not rep["cnt"]["compacted"]
    got = sorted((r["key"], r["cnt"]) for r in
                 read_count_store(spark, store).collect())
    assert got == [("k0", 4), ("k1", 4), ("k2", 4)]

    # tick debt past the threshold compacts once, then goes quiet
    rep = _report(maintain_serving_indexes(spark, [spec],
                                           compact_ticks=1))
    assert rep["cnt"]["compacted"] is True
    assert sorted(os.listdir(store)) == ["tick=2"]
    rep = _report(maintain_serving_indexes(spark, [spec],
                                           compact_ticks=1))
    assert rep["cnt"]["compacted"] is False
    got2 = sorted((r["key"], r["cnt"]) for r in
                  read_count_store(spark, store).collect())
    assert got2 == got
