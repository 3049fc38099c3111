"""Unit tests for the union-merge as-of join (operators/temporal.py):
tiebreak determinism, both directions, duplicate left rows, NULL
handling, and the no-join/one-shuffle plan contract."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),
            (2, 10, _ts("2024-01-01T10:00:00")),  # duplicate (key, ts)
            (3, 10, _ts("2024-01-03T00:00:00")),
            (4, 20, _ts("2024-01-02T00:00:00")),  # key with no right rows
            (5, 10, _ts("2023-12-31T00:00:00")),  # before any right row
            (6, None, _ts("2024-01-05T00:00:00")),  # NULL key
            (7, 10, None),  # NULL ts
        ],
        "event_id long, user_id long, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (10, _ts("2024-01-01T10:00:00"), 100, 5.0),
            (10, _ts("2024-01-01T10:00:00"), 50, 9.0),  # same ts: tiebreak
            (10, _ts("2024-01-02T00:00:00"), 200, 1.0),
            (10, None, 999, 0.0),  # NULL ts: never matches
            (None, _ts("2024-01-01T00:00:00"), 888, 0.0),  # NULL key
        ],
        "user_id long, rts timestamp, order_id long, amount double",
    )


def test_asof_backward_semantics(spark):
    out = asof_join(
        _left(spark), _right(spark), on="user_id", left_ts="ts", right_ts="rts"
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 7  # every left row survives exactly once
    # equal-ts rows match (inclusive <=); tiebreak = min by right cols
    # asc (user_id, rts equal -> min order_id wins)
    assert rows[1]["order_id"] == 50 and rows[1]["amount"] == 9.0
    assert rows[2]["order_id"] == 50  # duplicate left row, same answer
    assert rows[3]["order_id"] == 200  # latest rts <= ts
    assert rows[4]["order_id"] is None  # key without right rows
    assert rows[5]["order_id"] is None  # ts before any right row
    assert rows[6]["order_id"] is None  # NULL key never matches
    assert rows[7]["order_id"] is None  # NULL ts never matches


def test_asof_forward_semantics(spark):
    out = asof_join(
        _left(spark), _right(spark), on="user_id", left_ts="ts", right_ts="rts",
        direction="forward",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["order_id"] == 50  # equal ts matches forward too
    assert rows[3]["order_id"] is None  # nothing at/after 01-03
    assert rows[5]["order_id"] == 50  # earliest rts >= ts, tiebroken


def test_asof_suffix_on_clashing_columns(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-02T00:00:00"), "L")],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T00:00:00"), "R")],
        "user_id long, ts timestamp, tag string",
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts")
    assert set(out.columns) == {
        "event_id", "user_id", "ts", "tag", "user_id_r", "ts_r", "tag_r"
    }
    row = out.collect()[0]
    assert row["tag"] == "L" and row["tag_r"] == "R"


def test_asof_date_vs_timestamp_axis(spark):
    left = _left(spark)
    right = spark.createDataFrame(
        [(10, dt.date(2024, 1, 1), 1)],
        "user_id long, rd date, order_id long",
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="rd")
    rows = {r["event_id"]: r for r in out.collect()}
    # date widens to midnight: 10:00 event sees the same-day order
    assert rows[1]["order_id"] == 1
    assert rows[5]["order_id"] is None


def test_asof_plan_has_no_join_one_shuffle(spark):
    out = asof_join(
        _left(spark), _right(spark), on="user_id", left_ts="ts", right_ts="rts"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert j not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_semantics(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.temporal import (
        interval_join,
    )

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05T00:00:00")),   # inside
            (2, 10, _ts("2024-01-01T00:00:00")),   # on start boundary
            (3, 10, _ts("2024-01-10T00:00:00")),   # on end boundary
            (4, 10, _ts("2024-01-11T00:00:00")),   # outside
            (5, 20, _ts("2024-01-05T00:00:00")),   # wrong key
            (6, 10, None),                          # NULL ts
        ],
        "pid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T00:00:00"), _ts("2024-01-10T00:00:00")),
            (101, 10, _ts("2024-02-10T00:00:00"), _ts("2024-02-01T00:00:00")),  # inverted
            (102, 10, None, _ts("2024-03-01T00:00:00")),  # NULL start
        ],
        "iid long, k long, s timestamp, e timestamp",
    )
    # band much smaller than the interval: it must explode across bands
    out = interval_join(left, right, left_ts="ts", right_start="s",
                        right_end="e", on="k", band_seconds=86400)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100), (2, 100), (3, 100)]

    # left mode: unmatched left rows null-extend exactly once
    lo = interval_join(left, right, left_ts="ts", right_start="s",
                       right_end="e", on="k", band_seconds=86400, how="left")
    rows = {r["pid"]: r["iid"] for r in lo.collect()}
    assert len(lo.collect()) == 6
    assert rows[1] == 100 and rows[4] is None and rows[5] is None and rows[6] is None


def test_interval_join_keyless_and_plan(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.temporal import (
        interval_join,
    )

    left = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "pid long, x double"
    )
    right = spark.createDataFrame(
        [(1, 2.0, 5.0), (2, 4.5, 11.0)], "iid long, lo double, hi double"
    )
    out = interval_join(left, right, left_ts="x", right_start="lo",
                        right_end="hi", band_seconds=3)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    want = sorted(
        [(p, 1) for p in (2, 3, 4, 5)] + [(p, 2) for p in (5, 6, 7, 8, 9, 10, 11)]
    )
    assert got == want
    # banding must produce a hash join, not a nested-loop cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_funnel_requires_strict_order(spark):
    from snowflake_medtech_vigilance_lakehouse_spark.operators.temporal import funnel_counts

    ev = spark.createDataFrame(
        [
            # u1 completes in order
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            # u2 clicked BEFORE viewing: reaches view only
            (2, "click", 5), (2, "view", 10),
            # u3 view+click, purchase exactly at click time -> not strictly after
            (3, "view", 1), (3, "click", 2), (3, "purchase", 2),
            # u4 only purchases
            (4, "purchase", 7),
        ],
        "user_id long, event_type string, ts long",
    )
    out = {r["step"]: r for r in
           funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 2   # u1 and u3
    assert out["purchase"]["n_users"] == 1  # only u1
    assert out["view"]["conv"] == 1.0
    assert abs(out["purchase"]["conv"] - round(1 / 3, 6)) < 1e-9
