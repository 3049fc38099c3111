"""Local differential harness: run every ``queries()`` entry against
its DuckDB oracle the way the driver does (row count + schema +
order-insensitive value hash) and print a verdict per query.

Usage: python tools/compare.py [sf_dir] [query ...]

Set SPARK_GRAFT_ADVERSARIAL=1 to run the same sweep under a hostile
session (ANSI on, Asia/Tokyo timezone, 200 shuffle partitions) — the
round-1 configuration that surfaced ANSI-overflow and TZ-sensitivity
bugs the default UTC/lenient session hides.
"""

from __future__ import annotations

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL-duck ] {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"[MISMATCH-n] {name}: spark={len(sdf)} duckdb={len(odf)}")
            failures += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"[MISMATCH-c] {name}: spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
            failures += 1
            continue
        s_rows, o_rows = canon(sdf), canon(odf)
        if s_rows != o_rows:
            bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"[MISMATCH-v] {name}: {sum(1 for a, b in zip(s_rows, o_rows) if a != b)}"
                  f"/{len(s_rows)} differing rows; first: {bad}")
            failures += 1
            continue
        print(f"[OK        ] {name}: {len(sdf)} rows")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
