"""Differential test of the WHOLE medallion DAG against the reference
semantics transcribed to DuckDB SQL (models/stg/stg_maude.sql,
models/marts/fact_adverse_events.sql, ae_counts_q.sql,
v_ae_early_signals.sql) over a shared NDJSON fixture — the strongest
reference-parity check: same input file, reference SQL on one side,
the Spark DAG on the other, order-insensitive value compare."""

from __future__ import annotations

import json

import duckdb
import pandas as pd
import pytest

from snowflake_medtech_vigilance_lakehouse_spark.plans.medallion import (
    ae_counts_q, fact_adverse_events, stg_maude, v_ae_early_signals,
)
from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import (
    read_maude_raw_ndjson,
)

# every stg/fact edge: blank-vs-null, device[] fallbacks, malformed
# dates, all event-type buckets, multi-fragment ordered narrative,
# classifier keywords, duplicate seed keys, multi-quarter series for
# the rolling window
NDJSON_ROWS = [
    {"mdr_report_key": "K1", "report_number": "R1", "date_received": "20230115",
     "event_type": "malfunction", "manufacturer_d_name": "Acme Corp",
     "mdr_text": [{"text": "zzz last"}, {"text": "aaa first"}, {"text": "  "}]},
    {"mdr_report_key": "K2", "report_number": "R2", "date_received": "20230416",
     "event_type": "INJURY", "brand_name": "",
     "device": [{"manufacturer_d_name": " ", "manufacturer_g1_name": "G1X",
                 "brand_name": "BrandZ", "device_name": None},
                {"manufacturer_d_name": "DevCo", "device_name": "Widget"}],
     "mdr_text": [{"text": "a leak was found"}]},
    {"mdr_report_key": "K3", "report_number": "R3", "date_received": "20230720",
     "event_type": "DEATH", "manufacturer_d_name": "Acme Corp",
     "mdr_text": [{"text": "device fracture line"}]},
    {"mdr_report_key": "K4", "report_number": "R4", "date_received": "20231005",
     "event_type": "N/A", "manufacturer_d_name": "Acme Corp", "mdr_text": []},
    {"mdr_report_key": "K5", "report_number": "R5", "date_received": "20240117",
     "event_type": "weird", "manufacturer_d_name": "Acme Corp",
     "mdr_text": [{"text": "thrombus noted"}]},
    {"mdr_report_key": "K6", "report_number": "R6", "date_received": "bad-date",
     "event_type": "", "manufacturer_d_name": "DupCo",
     "mdr_text": [{"text": "migration of the lead"}]},
    {"mdr_report_key": "K7", "report_number": "R7", "date_received": "20240416",
     "event_type": "  injury ", "manufacturer_g1_name": "Acme Corp"},
]

SEED_CSV = "RAW_NAME,CANONICAL_NAME,MANUFACTURER_ID\nAcme Corp,ACME CANON,1\nDupCo,DUP A,2\nDUPCO ,DUP B,3\n"

DUCK_COLUMNS = """{
  'mdr_report_key': 'VARCHAR', 'report_number': 'VARCHAR',
  'date_received': 'VARCHAR', 'event_date': 'VARCHAR',
  'event_type': 'VARCHAR', 'product_problem': 'VARCHAR',
  'device_report_product_code': 'VARCHAR', 'device_name': 'VARCHAR',
  'brand_name': 'VARCHAR', 'manufacturer_d_name': 'VARCHAR',
  'manufacturer_g1_name': 'VARCHAR',
  'device': 'STRUCT(manufacturer_d_name VARCHAR, manufacturer_g1_name VARCHAR, brand_name VARCHAR, device_name VARCHAR)[]',
  'mdr_text': 'STRUCT(text VARCHAR)[]'
}"""

# stg_maude.sql transcribed to DuckDB (outer-flatten via [NULL] pad)
STG_SQL = """
WITH base AS (
  SELECT *,
    CASE WHEN regexp_matches(coalesce(date_received, ''), '^\\d{{8}}$')
         THEN try_strptime(trim(date_received), '%Y%m%d')::DATE END AS date_received_d,
    CASE WHEN regexp_matches(coalesce(event_date, ''), '^\\d{{8}}$')
         THEN try_strptime(trim(event_date), '%Y%m%d')::DATE END AS event_date_d,
    CASE
      WHEN upper(trim(event_type)) IN ('INJURY','MALFUNCTION','DEATH')
        THEN upper(substr(trim(event_type),1,1)) || lower(substr(trim(event_type),2))
      WHEN event_type IS NULL OR trim(event_type) = ''
        OR upper(trim(event_type)) IN ('N/A','NA','UNKNOWN','NOT AVAILABLE')
        THEN 'No Answer Provided'
      ELSE 'Other'
    END AS event_type_n
  FROM read_json('{path}', columns = {cols}, format = 'newline_delimited')
), devices_agg AS (
  SELECT mdr_report_key,
    max(CASE WHEN nullif(trim(d.manufacturer_d_name), '') IS NOT NULL THEN d.manufacturer_d_name END)  AS manufacturer_name_dev,
    max(CASE WHEN nullif(trim(d.manufacturer_g1_name), '') IS NOT NULL THEN d.manufacturer_g1_name END) AS manufacturer_g1_name_dev,
    max(CASE WHEN nullif(trim(d.brand_name), '') IS NOT NULL THEN d.brand_name END)   AS brand_name_dev,
    max(CASE WHEN nullif(trim(d.device_name), '') IS NOT NULL THEN d.device_name END) AS device_name_dev
  FROM (SELECT mdr_report_key, unnest(device) AS d FROM base) GROUP BY 1
), text_flat AS (
  -- OUTER flatten via [NULL] padding: zip-unnest keeps one row for
  -- NULL/empty arrays instead of dropping the report
  SELECT b.*,
    unnest(CASE WHEN b.mdr_text IS NULL OR len(b.mdr_text) = 0
                THEN [NULL::STRUCT(text VARCHAR)] ELSE b.mdr_text END) AS piece,
    unnest(range(1, greatest(len(coalesce(b.mdr_text, [])), 1) + 1)) AS idx
  FROM base b
)
SELECT
  t.mdr_report_key, t.report_number,
  t.date_received_d AS date_received, t.event_date_d AS event_date,
  t.event_type_n AS event_type, t.event_type AS event_type_raw,
  t.product_problem, t.device_report_product_code AS product_code,
  coalesce(t.device_name, d.device_name_dev) AS device_name,
  coalesce(t.brand_name, d.brand_name_dev) AS brand_name,
  coalesce(t.manufacturer_d_name, d.manufacturer_name_dev) AS manufacturer_name,
  coalesce(t.manufacturer_g1_name, d.manufacturer_g1_name_dev) AS manufacturer_g1_name,
  coalesce(string_agg(nullif(trim(t.piece.text), ''), chr(10)
           ORDER BY t.idx, nullif(trim(t.piece.text), '')), '') AS narrative_text,
  length(coalesce(string_agg(nullif(trim(t.piece.text), ''), chr(10)
           ORDER BY t.idx, nullif(trim(t.piece.text), '')), ''))::BIGINT AS narrative_len
FROM text_flat t
LEFT JOIN devices_agg d USING (mdr_report_key)
GROUP BY ALL
"""

FACT_SQL = """
WITH stg AS ({stg}), d AS (
  SELECT upper(trim(raw_name)) AS raw_name_u, canonical_name, manufacturer_id
  FROM read_csv('{seed}', header = true)
), s AS (
  SELECT stg.*, upper(trim(coalesce(manufacturer_name, manufacturer_g1_name, brand_name))) AS manufacturer_name_u
  FROM stg
)
SELECT
  sha256(coalesce(report_number, '') || '|' || coalesce(mdr_report_key, '') || '|' ||
         coalesce(CAST(date_received AS VARCHAR), '')) AS event_id,
  report_number, mdr_report_key,
  d.manufacturer_id::BIGINT AS manufacturer_id,
  coalesce(d.canonical_name, manufacturer_name) AS canonical_mfr,
  product_code, device_name, brand_name, event_type, product_problem,
  CAST(event_date AS VARCHAR) AS event_date,
  CAST(date_received AS VARCHAR) AS date_received,
  CASE WHEN date_received IS NOT NULL THEN
    CAST(year(date_received) AS VARCHAR) || '-Q' || CAST(quarter(date_received) AS VARCHAR) END AS year_quarter,
  narrative_text, narrative_len,
  CASE
    WHEN narrative_text ILIKE '%LEAK%'      THEN 'LEAK'
    WHEN narrative_text ILIKE '%FRACTURE%'  THEN 'FRACTURE'
    WHEN narrative_text ILIKE '%BREAK%'     THEN 'FRACTURE/BREAK'
    WHEN narrative_text ILIKE '%THROMB%'    THEN 'THROMBUS/CLOT'
    WHEN narrative_text ILIKE '%INFECTION%' THEN 'INFECTION'
    WHEN narrative_text ILIKE '%DISLODG%'   THEN 'DISLODGEMENT'
    WHEN narrative_text ILIKE '%MIGRAT%'    THEN 'MIGRATION'
  END AS failure_mode
FROM s LEFT JOIN d ON d.raw_name_u = s.manufacturer_name_u
"""

COUNTS_SQL = """
WITH fact AS ({fact}), src AS (
  SELECT coalesce(canonical_mfr, '(unknown)') AS canonical_mfr,
         coalesce(failure_mode, '(unknown)')  AS failure_mode,
         CAST(date_received AS DATE) AS dr
  FROM fact WHERE date_received IS NOT NULL
)
SELECT canonical_mfr, failure_mode,
       year(dr) AS yyyy, quarter(dr) AS q,
       year(dr) * 4 + quarter(dr) AS quarter_index,
       CAST(year(dr) AS VARCHAR) || '-Q' || CAST(quarter(dr) AS VARCHAR) AS year_quarter,
       count(*) AS n_events
FROM src GROUP BY 1, 2, 3, 4, 5, 6
"""

def _canon(df: pd.DataFrame) -> list[str]:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (pd.api.types.is_scalar(v) and pd.isna(v)):
            return "<N>"
        if isinstance(v, float):
            return repr(round(v, 6))
        if isinstance(v, pd.Timestamp):
            return v.date().isoformat()
        return str(v)

    return sorted("\x1f".join(cell(x) for x in r) for r in df.itertuples(index=False, name=None))


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("medallion_oracle")
    nd = d / "maude.ndjson"
    with open(nd, "w") as f:
        for r in NDJSON_ROWS:
            f.write(json.dumps(r) + "\n")
    seed = d / "manufacturer.csv"
    seed.write_text(SEED_CSV)
    return str(nd), str(seed)


@pytest.fixture(scope="module")
def spark_frames(spark, fixture_paths):
    nd, seed_path = fixture_paths
    from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import read_seed_csv
    raw = read_maude_raw_ndjson(spark, nd)
    stg = stg_maude(raw)
    fact = fact_adverse_events(stg, read_seed_csv(spark, seed_path))
    counts = ae_counts_q(fact)
    signals = v_ae_early_signals(counts)
    return stg, fact, counts, signals


@pytest.fixture(scope="module")
def duck(fixture_paths):
    nd, seed = fixture_paths
    con = duckdb.connect()
    stg = STG_SQL.format(path=nd, cols=DUCK_COLUMNS)
    fact = FACT_SQL.format(stg=stg, seed=seed)
    counts = COUNTS_SQL.format(fact=fact)
    yield con, stg, fact, counts
    con.close()


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame):
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    cs, cd = _canon(sdf), _canon(odf)
    diffs = [(a, b) for a, b in zip(cs, cd) if a != b]
    assert not diffs, f"{len(diffs)} diffs, first: {diffs[0]}"


def test_stg_matches_reference_sql(spark_frames, duck):
    stg_s = spark_frames[0].drop("src_filename", "load_ts").toPandas()
    # dates to ISO strings for comparison
    for c in ("date_received", "event_date"):
        stg_s[c] = stg_s[c].map(lambda v: None if v is None else str(v))
    con, stg_sql, _, _ = duck
    stg_d = con.execute(
        f"SELECT * REPLACE (CAST(date_received AS VARCHAR) AS date_received, "
        f"CAST(event_date AS VARCHAR) AS event_date) FROM ({stg_sql})"
    ).fetchdf()
    _compare(stg_s, stg_d)


def test_fact_matches_reference_sql(spark_frames, duck):
    fact_s = spark_frames[1].toPandas()
    fact_s["event_date"] = fact_s["event_date"].map(lambda v: None if v is None else str(v))
    fact_s["date_received"] = fact_s["date_received"].map(lambda v: None if v is None else str(v))
    con, _, fact_sql, _ = duck
    _compare(fact_s, con.execute(fact_sql).fetchdf())


def test_counts_match_reference_sql(spark_frames, duck):
    con, _, _, counts_sql = duck
    _compare(spark_frames[2].toPandas(), con.execute(counts_sql).fetchdf())


def test_signals_match_reference_sql(spark_frames, duck):
    con, _, _, counts_sql = duck
    signals_sql = f"""
    WITH counts AS ({counts_sql}), seq AS (
      SELECT *, row_number() OVER (PARTITION BY canonical_mfr, failure_mode ORDER BY quarter_index) AS rn
      FROM counts
    ), roll AS (
      SELECT *,
        avg(n_events) OVER (PARTITION BY canonical_mfr, failure_mode ORDER BY rn
                            ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS mean_4,
        stddev_samp(n_events) OVER (PARTITION BY canonical_mfr, failure_mode ORDER BY rn
                            ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS std_4
      FROM seq
    )
    SELECT canonical_mfr, failure_mode, year_quarter, quarter_index, n_events,
           round(mean_4, 6) AS mean_4, round(std_4, 6) AS std_4,
           round(CASE WHEN std_4 IS NULL OR std_4 = 0 THEN NULL
                      ELSE (n_events - mean_4) / std_4 END, 6) AS z_score
    FROM roll
    """
    sig_s = spark_frames[3].toPandas()
    for c in ("mean_4", "std_4", "z_score"):
        sig_s[c] = sig_s[c].map(lambda v: None if v is None else round(v, 6))
    _compare(sig_s, con.execute(signals_sql).fetchdf())
