"""Local differential harness: run every ``queries()`` entry against
its DuckDB oracle the way the driver does (row count + schema +
order-insensitive value hash) and print a verdict per query.

Usage: python tools/compare.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a driver-style artifact (one object per
query with rows/schema/hash match flags) — the builder-published
companion to CORRECTNESS_r{N}.json, covering ALL queries even when
the driver's snapshot list lags.

Set SPARK_GRAFT_ADVERSARIAL=1 to run the same sweep under a hostile
session (ANSI on, Asia/Tokyo timezone, 200 shuffle partitions) — the
round-1 configuration that surfaced ANSI-overflow and TZ-sensitivity
bugs the default UTC/lenient session hides.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to stable strings (floats via repr of rounded val)
    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "<NULL>"
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return "<NULL>"
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    rows = ["\x1f".join(r) for r in out.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    def record(name: str, *, rows_match: bool, schema_match: bool,
               hash_match: bool, spark_rows: int | None,
               oracle_rows: int | None, err: str | None) -> None:
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    import __spark_entry__ as se
    from snowflake_medtech_vigilance_lakehouse_spark.session import get_spark

    extra = None
    if os.environ.get("SPARK_GRAFT_ADVERSARIAL"):
        extra = {
            "spark.sql.ansi.enabled": "true",
            "spark.sql.session.timeZone": "Asia/Tokyo",
            "spark.sql.shuffle.partitions": "200",
        }
        print("[adversarial session: ANSI on, Asia/Tokyo, 200 partitions]")
    spark = get_spark("compare", extra_conf=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = se.queries(), se.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL-spark] {name}: {type(e).__name__}: {e}")
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, spark_rows=None, oracle_rows=None,
                   err=f"spark: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            record(name, rows_match=len(sdf) >= 0, schema_match=True,
                   hash_match=False, spark_rows=len(sdf), oracle_rows=None,
                   err="rows-only: no oracle_sql entry")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL-duck ] {name}: {type(e).__name__}: {e}")
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, spark_rows=len(sdf), oracle_rows=None,
                   err=f"duckdb: {type(e).__name__}: {e}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"[MISMATCH-n] {name}: spark={len(sdf)} duckdb={len(odf)}")
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, spark_rows=len(sdf),
                   oracle_rows=len(odf), err=None)
            failures += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"[MISMATCH-c] {name}: spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
            record(name, rows_match=True, schema_match=False,
                   hash_match=False, spark_rows=len(sdf),
                   oracle_rows=len(odf), err=None)
            failures += 1
            continue
        s_rows, o_rows = canon(sdf), canon(odf)
        if s_rows != o_rows:
            bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"[MISMATCH-v] {name}: {sum(1 for a, b in zip(s_rows, o_rows) if a != b)}"
                  f"/{len(s_rows)} differing rows; first: {bad}")
            record(name, rows_match=True, schema_match=True,
                   hash_match=False, spark_rows=len(sdf),
                   oracle_rows=len(odf), err=None)
            failures += 1
            continue
        print(f"[OK        ] {name}: {len(sdf)} rows")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(sdf), oracle_rows=len(odf), err=None)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[artifact  ] {len(results)} rows -> {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
