"""Heavy-hitters sketch (operators/sketch.py): the two-pass
Misra-Gries candidate + exact-verification operator must equal a full
``groupBy(key).count()`` at every threshold — including the
approximate-sketch regime where the per-partition summaries undercount
and evict (distinct keys >> capacity), which is where the candidate-
completeness guarantee actually carries the result."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators.sketch import (
    heavy_hitter_candidates, heavy_hitters)


def _skewed_df(spark, n=6000, n_tail=800, seed=11, parts=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        key = ("hot" if r < 0.30 else
               "warm" if r < 0.36 else f"k{rng.randrange(n_tail)}")
        rows.append((i, key))
    return spark.createDataFrame(rows, ["id", "key"]).repartition(parts)


def _exact(df, key, cutoff):
    return sorted((r[key], r["cnt"]) for r in
                  df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
                  .filter(F.col("cnt") >= cutoff).collect())


@pytest.mark.parametrize("min_share", [1 / 4, 1 / 64, 1 / 256])
def test_heavy_hitters_equal_exact_groupby(spark, min_share):
    df = _skewed_df(spark)
    n = df.count()
    cutoff = math.ceil(min_share * n)
    got = sorted((r["key"], r["cnt"]) for r in
                 heavy_hitters(df, "key", min_share=min_share).collect())
    assert got == _exact(df, "key", cutoff)
    # the interesting regimes actually occur: at 1/4 only the hot key
    # survives; at 1/256 the tail keys outnumber the default capacity
    if min_share == 1 / 4:
        assert [k for k, _ in got] == ["hot"]
    if min_share == 1 / 256:
        assert math.ceil(2.0 / min_share) < 800  # approximate regime


def test_capacity_at_guarantee_floor(spark):
    """capacity = ceil(2/min_share) is the documented floor; force the
    TIGHTEST capacity the guarantee covers and a hostile partitioning
    (all tail keys interleaved with the hot keys in every partition)
    — the candidate union must still contain every true hitter."""
    df = _skewed_df(spark, n=8000, n_tail=1500, seed=3, parts=13)
    n = df.count()
    min_share = 1 / 50
    cutoff = math.ceil(min_share * n)
    got = sorted((r["key"], r["cnt"]) for r in
                 heavy_hitters(df, "key", min_share=min_share,
                               capacity=100).collect())
    assert got == _exact(df, "key", cutoff)
    assert len(got) >= 2  # hot + warm both above 2%


def test_candidates_bounded_and_n_exact(spark):
    df = _skewed_df(spark, parts=5)
    cap = 40
    sk = heavy_hitter_candidates(df, "key", capacity=cap).collect()
    survivors = [r for r in sk if r["key"] is not None]
    totals = [r for r in sk if r["key"] is None]
    # bounded output: <= partitions * capacity survivor rows, one
    # total row per partition, and N recoverable exactly
    assert len(survivors) <= 5 * cap
    assert len(totals) == 5
    assert sum(r["part_rows"] for r in totals) == df.count()


def test_null_keys_excluded_total_includes_them(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a"), (3, "a"), (4, "a"), (5, "b"), (6, None)],
        ["id", "key"])
    # N = 6 (nulls count toward the denominator), cutoff = ceil(3) = 3
    got = [(r["key"], r["cnt"]) for r in
           heavy_hitters(df, "key", min_share=1 / 2).collect()]
    assert got == [("a", 3)]


def test_integer_keys_and_empty_input(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(9)],
                               ["id", "key"])
    got = sorted((r["key"], r["cnt"]) for r in
                 heavy_hitters(df, "key", min_share=1 / 3).collect())
    assert got == [(0, 3), (1, 3), (2, 3)]
    empty = heavy_hitters(df.filter("id > 100"), "key", min_share=0.5)
    assert empty.columns == ["key", "cnt"] and empty.count() == 0


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "key"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", min_share=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", min_share=1.5)
    with pytest.raises(ValueError):
        heavy_hitter_candidates(df, "key", capacity=0)


def test_plan_shape_no_full_key_shuffle(spark):
    """The verification pass must be a broadcast left-semi into the
    scan (no exchange on the corpus side before the join) — the
    100 TB contract: only candidate keys ever shuffle."""
    df = _skewed_df(spark, n=2000, n_tail=300)
    plan = (heavy_hitters(df, "key", min_share=1 / 20)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


# ---------------------------------------------------------------------------
# CDF-maintained exact count ledger (round 13)
# ---------------------------------------------------------------------------

from snowflake_medtech_vigilance_lakehouse_spark.operators.sketch import (  # noqa: E402
    compact_count_store, heavy_hitters_from_store, read_count_store,
    update_count_store)
from snowflake_medtech_vigilance_lakehouse_spark.sources import (  # noqa: E402
    delta_lite as dl)


def _counts(spark, store):
    return sorted((r["key"], r["cnt"]) for r in
                  read_count_store(spark, store).collect())


def _churn_table(spark, path):
    """Five commits: insert k-heavy batch, insert tail, UPDATE (moves
    'hot' rows to 'warm'), DELETE a slice, insert more — returns the
    per-commit head versions."""
    rows = [(i, "hot" if i % 3 == 0 else f"k{i % 5}") for i in range(60)]
    base = spark.createDataFrame(rows, ["id", "key"])
    dl.write_delta(base.filter(F.col("id") < 30), path)
    dl.write_delta(base.filter((F.col("id") >= 30) & (F.col("id") < 45)),
                   path, mode="append")
    upd = (base.filter((F.col("id") < 30) & (F.col("id") % 3 == 0))
           .select("id", F.lit("warm").alias("key")))
    dl.merge_delta(spark, path, upd, on=["id"], when_matched="update",
                   when_not_matched=None, change_data=True)
    dl.merge_delta(spark, path,
                   base.filter((F.col("id") >= 30) & (F.col("id") % 4 == 1)),
                   on=["id"], when_matched="delete",
                   when_not_matched=None, change_data=True)
    dl.write_delta(base.filter(F.col("id") >= 45), path, mode="append")


def test_count_ledger_equals_snapshot_recount(spark, tmp_path):
    tbl, store = str(tmp_path / "tbl"), str(tmp_path / "cnt")
    _churn_table(spark, tbl)
    assert update_count_store(spark, tbl, store, "key") == [0, 1, 2, 3, 4]
    snap = dl.read_delta(spark, tbl)
    expect = sorted((r["key"], r["cnt"]) for r in
                    snap.groupBy("key").agg(
                        F.count(F.lit(1)).alias("cnt")).collect())
    assert _counts(spark, store) == expect
    # served heavy hitters == rescan operator on the same snapshot
    served = sorted((r["key"], r["cnt"]) for r in
                    heavy_hitters_from_store(
                        spark, store, min_share=1 / 8).collect())
    rescan = sorted((r["key"], r["cnt"]) for r in
                    heavy_hitters(snap, "key", min_share=1 / 8).collect())
    assert served == rescan and served


def test_count_ledger_replay_converges(spark, tmp_path):
    """One call over all five commits == five per-commit calls; a
    re-entrant call after a fake crash (state rolled back one tick)
    overwrites its tick idempotently."""
    import json
    import os

    tbl, tbl2 = str(tmp_path / "tbl"), str(tmp_path / "tbl2")
    _churn_table(spark, tbl)
    all_at_once, stepped = str(tmp_path / "a"), str(tmp_path / "b")
    update_count_store(spark, tbl, all_at_once, "key")
    # genuinely per-commit: replay the same five commits one at a
    # time, calling the ledger after each — the interleaving a live
    # pipeline produces
    rows = [(i, "hot" if i % 3 == 0 else f"k{i % 5}") for i in range(60)]
    base = spark.createDataFrame(rows, ["id", "key"])
    steps = [
        lambda: dl.write_delta(base.filter(F.col("id") < 30), tbl2),
        lambda: dl.write_delta(
            base.filter((F.col("id") >= 30) & (F.col("id") < 45)),
            tbl2, mode="append"),
        lambda: dl.merge_delta(
            spark, tbl2,
            base.filter((F.col("id") < 30) & (F.col("id") % 3 == 0))
            .select("id", F.lit("warm").alias("key")),
            on=["id"], when_matched="update", when_not_matched=None,
            change_data=True),
        lambda: dl.merge_delta(
            spark, tbl2,
            base.filter((F.col("id") >= 30) & (F.col("id") % 4 == 1)),
            on=["id"], when_matched="delete", when_not_matched=None,
            change_data=True),
        lambda: dl.write_delta(base.filter(F.col("id") >= 45), tbl2,
                               mode="append"),
    ]
    for v, step in enumerate(steps):
        step()
        assert update_count_store(spark, tbl2, stepped, "key") == [v]
    assert _counts(spark, all_at_once) == _counts(spark, stepped)
    # crash window: roll the mark back one commit; the replayed tick
    # must overwrite, not double-apply
    state = os.path.join(all_at_once + "_cdf_state", "state.json")
    with open(state, "w") as f:
        json.dump({"last_commit_version": 3}, f)
    assert update_count_store(spark, tbl, all_at_once) == [4]
    assert _counts(spark, all_at_once) == _counts(spark, stepped)


def test_count_ledger_compaction_read_identical(spark, tmp_path):
    import os

    tbl, store = str(tmp_path / "tbl"), str(tmp_path / "cnt")
    _churn_table(spark, tbl)
    update_count_store(spark, tbl, store, "key")
    before = _counts(spark, store)
    assert compact_count_store(spark, store) is True
    assert sorted(os.listdir(store)) == ["tick=4"]
    assert _counts(spark, store) == before
    # idempotent: single consolidated tick folds no further
    assert compact_count_store(spark, store) is False


def test_count_ledger_negative_net_raises(spark, tmp_path):
    """A feed that deletes keys it never inserted folds negative and
    must refuse loudly instead of serving wrong counts."""
    tbl, store = str(tmp_path / "tbl"), str(tmp_path / "cnt")
    base = spark.createDataFrame([(i, "x") for i in range(4)],
                                 ["id", "key"])
    dl.write_delta(base, tbl)
    update_count_store(spark, tbl, store, "key")
    # forge a foreign tick with an over-delete
    forged = spark.createDataFrame([("x", -10)], ["key", "delta"])
    forged.write.mode("overwrite").parquet(store + "/tick=99")
    with pytest.raises(ValueError, match="NEGATIVE"):
        read_count_store(spark, store)


def test_count_ledger_meta_guards(spark, tmp_path):
    tbl, store = str(tmp_path / "tbl"), str(tmp_path / "cnt")
    base = spark.createDataFrame([(1, "x")], ["id", "key"])
    dl.write_delta(base, tbl)
    with pytest.raises(ValueError, match="meta sidecar"):
        update_count_store(spark, tbl, store)  # no key on first call
    update_count_store(spark, tbl, store, "key")
    with pytest.raises(ValueError, match="keyed by"):
        update_count_store(spark, tbl, store, "id")


def test_count_ledger_compaction_crash_window_refused(spark, tmp_path):
    """A tick newer than the consumed high-water mark (crashed
    refresh's uncommitted publish) must refuse compaction: the replay
    overwrites that tick dir, so folding history into it would lose
    every older commit's deltas."""
    import json
    import os

    tbl, store = str(tmp_path / "tbl"), str(tmp_path / "cnt")
    _churn_table(spark, tbl)
    update_count_store(spark, tbl, store, "key")
    good = _counts(spark, store)
    state = os.path.join(store + "_cdf_state", "state.json")
    with open(state, "w") as f:
        json.dump({"last_commit_version": 3}, f)  # tick=4 now "uncommitted"
    with pytest.raises(ValueError, match="crashed refresh"):
        compact_count_store(spark, store)
    # closing the window (replay) makes compaction legal and lossless
    assert update_count_store(spark, tbl, store) == [4]
    assert compact_count_store(spark, store) is True
    assert _counts(spark, store) == good
