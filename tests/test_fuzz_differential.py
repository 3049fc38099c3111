"""Seeded differential fuzzing: random tables + shared ANSI SQL run on
BOTH Spark (via temp view) and DuckDB, results hash-compared — the
property tier of the test strategy (SURVEY.md §5). Deterministic
(seed=20260813) so failures reproduce.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

SEEDS = (20260813, 7, 424242)
N_ROWS = 400

TEMPLATES = [
    # aggregation with filters and arithmetic
    """SELECT g, count(*) AS n, CAST(sum(i) AS BIGINT) AS s_i,
              round(sum(x), 6) AS s_x, round(avg(x), 6) AS a_x
       FROM t WHERE i % 3 <> 0 GROUP BY g""",
    # window frames incl. the signal-view trailing frame; NULLS FIRST
    # is explicit because Spark defaults ASC NULLS FIRST while DuckDB
    # defaults ASC NULLS LAST, and x joins the key to make the total
    # order (hence frame contents) engine-independent
    """SELECT g, i,
              CAST(row_number() OVER (PARTITION BY g ORDER BY i, s NULLS FIRST, x) AS BIGINT) AS rn,
              round(avg(x) OVER (PARTITION BY g ORDER BY i, s NULLS FIRST, x
                    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING), 6) AS m4,
              round(stddev_samp(x) OVER (PARTITION BY g ORDER BY i, s NULLS FIRST, x
                    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING), 6) AS sd4
       FROM t""",
    # case/coalesce/nullif scalar pipeline
    """SELECT i, coalesce(nullif(trim(s), ''), '(blank)') AS s_norm,
              CASE WHEN x > 0.5 THEN 'hi' WHEN x > 0.2 THEN 'mid' ELSE 'lo' END AS band
       FROM t""",
    # self-join aggregation
    """SELECT a.g, count(*) AS pairs
       FROM t a JOIN t b ON a.g = b.g AND a.i < b.i
       GROUP BY a.g""",
    # distinct + having-style filter via subquery
    """SELECT g, n_distinct FROM (
         SELECT g, CAST(count(DISTINCT i) AS BIGINT) AS n_distinct FROM t GROUP BY g
       ) WHERE n_distinct > 3""",
    # FILTER-clause conditional aggregates (pivot building block)
    """SELECT g,
              count(*) FILTER (WHERE i > 0)  AS n_pos,
              count(*) FILTER (WHERE i < 0)  AS n_neg,
              round(sum(x) FILTER (WHERE x > 0), 6) AS s_pos
       FROM t GROUP BY g""",
    # set algebra with distinct semantics
    """SELECT i FROM (
         SELECT i FROM t WHERE g < 5
         INTERSECT
         SELECT i FROM t WHERE g >= 5
       ) EXCEPT SELECT i FROM t WHERE i % 7 = 0""",
    # anti-join via NOT EXISTS (NULL-safe, unlike NOT IN)
    """SELECT g, CAST(count(*) AS BIGINT) AS n
       FROM t a
       WHERE NOT EXISTS (SELECT 1 FROM t b WHERE b.g = a.g AND b.i = -a.i AND b.i <> 0)
       GROUP BY g""",
    # rollup margins with NULL group keys
    """SELECT g, coalesce(s, '(null)') AS s_k, count(*) AS n,
              CAST(sum(i) AS BIGINT) AS s_i
       FROM t GROUP BY ROLLUP (g, coalesce(s, '(null)'))""",
    # uncorrelated scalar subqueries in projection and predicate
    """SELECT g, CAST(count(*) AS BIGINT) AS n,
              (SELECT max(i) FROM t) AS global_max
       FROM t WHERE i > (SELECT min(i) + 5 FROM t) GROUP BY g""",
]


def _random_table(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    strings = ["", " ", "a", "b ", " c", "dd", None]
    return pd.DataFrame({
        "g": [rng.randint(0, 9) for _ in range(N_ROWS)],
        "i": [rng.randint(-50, 50) for _ in range(N_ROWS)],
        "x": [round(rng.uniform(-1, 1), 6) for _ in range(N_ROWS)],
        "s": [rng.choice(strings) for _ in range(N_ROWS)],
    })


@pytest.fixture(scope="module", params=SEEDS, ids=[f"seed{s}" for s in SEEDS])
def engines(spark, request):
    pdf = _random_table(request.param)
    spark.createDataFrame(pdf).createOrReplaceTempView("t")
    con = duckdb.connect()
    con.register("t", pdf)
    yield spark, con
    con.close()


def _canon(df: pd.DataFrame) -> list[str]:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
            return "<N>"
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return "<N>"
        if isinstance(v, float):
            # engines may differ by 1 ulp before their own round(x, 6);
            # canonicalize a level coarser so boundary straddles collapse
            return repr(round(v, 4))
        return str(v)

    rows = ["\x1f".join(cell(v) for v in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows)


@pytest.mark.parametrize("sql", TEMPLATES, ids=[f"tmpl{i}" for i in range(len(TEMPLATES))])
def test_spark_matches_duckdb(engines, sql):
    spark, con = engines
    s = spark.sql(sql).toPandas()
    d = con.execute(sql).fetchdf()
    assert len(s) == len(d)
    cs, cd = _canon(s), _canon(d)
    diffs = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
    assert not diffs, f"{len(diffs)} diffs; first spark={cs[diffs[0]]!r} duckdb={cd[diffs[0]]!r}"
