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
