"""Adversarial-session differential: the queries most sensitive to
session state (timestamps, casts, date arithmetic, ordering) must
match their DuckDB oracles under a HOSTILE session — ANSI mode ON,
non-UTC timezone, oversized shuffle width. Round 1 shipped two real
bugs this sweep would have caught (ANSI long overflow, TZ-shifted
year()); this file keeps the gate permanent.

The three confs are runtime-settable, so the shared session is
mutated for the module and restored afterwards (stopping/rebuilding
the session would orphan the session-scoped fixture other modules
hold)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as se

SF = "/root/testdata/sf0.001"
HOSTILE = {
    "spark.sql.ansi.enabled": "true",
    "spark.sql.session.timeZone": "Asia/Tokyo",
    "spark.sql.shuffle.partitions": "64",
}
SENSITIVE = (
    "parse_dates", "stg_event_normalize", "sessionize", "scd2_dim",
    "funnel_steps", "quarterly_event_counts", "gapfill_daily", "asof_join",
    # round 13: key-shift arithmetic + count cutoffs under ANSI
    "heavy_hitters_churn",
)


@pytest.fixture()
def hostile_spark(spark):
    saved = {k: spark.conf.get(k, None) for k in HOSTILE}
    for k, v in HOSTILE.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _key(row):
    out = []
    for v in row:
        if isinstance(v, float):
            out.append((v is None, f"{v:.5f}" if not math.isnan(v) else "nan"))
        else:
            out.append((v is None, str(v)))
    return tuple(out)


@pytest.mark.parametrize("name", SENSITIVE)
def test_query_matches_oracle_under_hostile_session(hostile_spark, name):
    qs, osql = se.queries(), se.oracle_sql()
    sdf = qs[name](hostile_spark, SF)
    cols = sorted(sdf.columns)
    got = sorted(_key(tuple(r)) for r in sdf.select(*cols).collect())

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    o = con.execute(f"SELECT * FROM ({osql[name]})").fetch_df()[cols]
    want = sorted(
        _key(tuple(None if (isinstance(x, float) and math.isnan(x)) else x
                   for x in r))
        for r in o.itertuples(index=False, name=None))
    assert got == want, f"{name}: {len(got)} vs {len(want)} rows"
