"""The t2 correctness gate, locally: every oracle-backed entry in
__spark_entry__.queries() must match its DuckDB twin at sf0.001
(row count + columns + order-insensitive values)."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

import __spark_entry__ as se

_spec = importlib.util.spec_from_file_location(
    "compare_tool",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "compare.py"),
)
compare_tool = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(compare_tool)


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    for t in compare_tool.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


ORACLE_KEYS = sorted(se.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, ducks, name):
    sdf = se.queries()[name](spark, sf_dir).toPandas()
    odf = ducks.execute(se.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf), f"row count: spark={len(sdf)} duckdb={len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    s_rows, o_rows = compare_tool.canon(sdf), compare_tool.canon(odf)
    diffs = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not diffs, f"{len(diffs)} differing rows, first: {s_rows[diffs[0]]!r} vs {o_rows[diffs[0]]!r}"


def test_rows_only_queries_run_and_are_deterministic(spark, sf_dir):
    qs = se.queries()
    for name in sorted(set(qs) - set(ORACLE_KEYS)):
        a = sorted(map(str, qs[name](spark, sf_dir).collect()))
        b = sorted(map(str, qs[name](spark, sf_dir).collect()))
        assert a == b, f"{name} not deterministic"
        assert a, f"{name} returned no rows"
