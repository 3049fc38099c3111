"""Medallion DAG semantics against the MAUDE-shaped fixture — each
assertion cites the reference behavior it locks in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.plans.medallion import (
    ae_counts_q,
    fact_adverse_events,
    stg_maude,
    v_ae_early_signals,
)
from snowflake_medtech_vigilance_lakehouse_spark.quality import (
    MAUDE_STG_CHECKS,
    assert_checks,
    run_checks,
)
from tests.maude_fixture import manufacturer_seed, maude_raw


@pytest.fixture(scope="module")
def stg(spark):
    df = stg_maude(maude_raw(spark))
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def fact(spark, stg):
    df = fact_adverse_events(stg, manufacturer_seed(spark))
    df.cache().count()
    return df


def _by_key(df, key="mdr_report_key"):
    return {r[key]: r for r in df.collect()}


def test_stg_one_row_per_report(stg):
    assert stg.count() == 7
    assert stg.select("mdr_report_key").distinct().count() == 7


def test_stg_narrative_merge_ordered(stg):
    # LISTAGG ... WITHIN GROUP (ORDER BY index) — stg_maude.sql:72
    rows = _by_key(stg)
    assert rows["R1"]["narrative_text"] == "ALPHA first\nsecond part"
    assert rows["R1"]["narrative_len"] == len("ALPHA first\nsecond part")


def test_stg_outer_flatten_keeps_null_and_empty(stg):
    # OUTER => TRUE keeps NULL/empty arrays — stg_maude.sql:43-44,54-55
    rows = _by_key(stg)
    assert rows["R3"]["narrative_text"] == "" and rows["R3"]["narrative_len"] == 0
    assert rows["R4"]["narrative_text"] == "" and rows["R4"]["narrative_len"] == 0


def test_stg_device_array_coalesce(stg):
    # first non-blank from device[], top-level wins when present —
    # stg_maude.sql:31-46,59-71
    rows = _by_key(stg)
    r2 = rows["R2"]
    assert r2["manufacturer_name"] == "DEVMFR"          # NULL top, dev fallback
    assert r2["manufacturer_g1_name"] == "G1 FALLBACK"
    # '' top-level is NOT NULL, so COALESCE keeps it — the reference
    # only NULLIF-blanks the device[] side (stg_maude.sql:35-41,68-71)
    assert r2["brand_name"] == ""
    assert r2["device_name"] == "Widget"
    r1 = rows["R1"]
    assert r1["manufacturer_name"] == "ACME CORP"        # top-level wins


def test_stg_event_type_and_dates(stg):
    rows = _by_key(stg)
    assert rows["R7"]["event_type"] == "Injury"                 # INITCAP(TRIM)
    assert rows["R5"]["event_type"] == "Other"
    assert rows["R4"]["event_type"] == "No Answer Provided"
    assert rows["R6"]["event_type"] == "No Answer Provided"     # blank
    assert rows["R5"]["date_received"] is None                  # malformed -> NULL
    assert str(rows["R1"]["date_received"]) == "2024-01-15"


def test_stg_dq_checks_pass(stg):
    assert_checks(stg, MAUDE_STG_CHECKS)


def test_fact_seed_fanout_preserved(fact):
    # duplicate normalized seed key 'DUPCO' must fan out the R6 row —
    # SURVEY.md §1; left join keeps both matches
    r6 = fact.filter(F.col("mdr_report_key") == "R6").collect()
    assert len(r6) == 2
    assert {r["canonical_mfr"] for r in r6} == {"DUPCO GROUP A", "DUPCO GROUP B"}
    # the DQ unique check on event_id flags the fan-out, exactly as the
    # reference's marts schema test would (marts/schema.yml:7-8)
    from snowflake_medtech_vigilance_lakehouse_spark.quality import Check
    res = run_checks(fact, [Check("unique", "event_id")])
    assert not res[0]["passed"] and res[0]["n_violations"] == 1


def test_fact_canonicalization_and_fallback(fact):
    rows = {r["mdr_report_key"]: r for r in fact.collect() if r["mdr_report_key"] != "R6"}
    assert rows["R1"]["canonical_mfr"] == "ACME CANONICAL"      # seed rename
    assert rows["R7"]["canonical_mfr"] == "G1 CANON"            # g1 fallback join
    assert rows["R2"]["canonical_mfr"] == "DEVMFR"              # no seed match -> raw name
    assert rows["R2"]["manufacturer_id"] is None


def test_fact_failure_mode_classifier(fact):
    rows = {r["mdr_report_key"]: r["failure_mode"] for r in fact.collect()
            if r["mdr_report_key"] != "R6"}
    assert rows["R2"] == "LEAK"
    assert rows["R5"] == "FRACTURE"
    assert rows["R7"] == "MIGRATION"
    assert rows["R3"] is None
    r6_modes = {r["failure_mode"] for r in fact.filter(F.col("mdr_report_key") == "R6").collect()}
    assert r6_modes == {"THROMBUS/CLOT"}


def test_fact_event_id_formula_and_quarter_label(fact):
    r1 = fact.filter(F.col("mdr_report_key") == "R1").first()
    assert r1["year_quarter"] == "2024-Q1"
    assert len(r1["event_id"]) == 64  # sha256 hex
    r5 = fact.filter(F.col("mdr_report_key") == "R5").first()
    assert r5["year_quarter"] is None  # NULL date -> NULL label


def test_counts_and_signals_frame_semantics(spark, fact):
    counts = ae_counts_q(fact)
    row = counts.filter(
        (F.col("canonical_mfr") == "ACME CANONICAL") & (F.col("failure_mode") == "(unknown)")
    ).first()
    assert row["n_events"] == 1 and row["year_quarter"] == "2024-Q1"
    assert row["quarter_index"] == 2024 * 4 + 1
    # malformed-date row (R5) is filtered by date_received IS NOT NULL
    assert counts.agg(F.sum("n_events")).first()[0] == fact.filter(
        F.col("date_received").isNotNull()
    ).count()

    signals = v_ae_early_signals(counts)
    # single-quarter partitions: mean/std/z are NULL (empty trailing frame)
    assert signals.filter(F.col("mean_4").isNotNull()).count() == 0
    assert signals.filter(F.col("z_score").isNotNull()).count() == 0


def test_signals_zscore_multi_quarter(spark):
    # synthetic quarterly series: known trailing mean/std/z —
    # v_ae_early_signals.sql:22-46 edge cases
    counts = spark.createDataFrame(
        [("M", "LEAK", f"202{i//4}-Q{i%4+1}", 8080 + i, n)
         for i, n in enumerate([10, 12, 14, 20, 100])],
        "canonical_mfr string, failure_mode string, year_quarter string, "
        "quarter_index int, n_events long",
    )
    sig = {r["quarter_index"]: r for r in v_ae_early_signals(counts).collect()}
    assert sig[8080]["mean_4"] is None and sig[8080]["std_4"] is None
    assert sig[8081]["mean_4"] == 10.0 and sig[8081]["std_4"] is None  # 1-row stddev_samp
    assert sig[8081]["z_score"] is None
    assert sig[8082]["mean_4"] == 11.0 and round(sig[8082]["std_4"], 6) == round(2 ** 0.5, 6)
    m = (10 + 12 + 14 + 20) / 4
    assert sig[8084]["mean_4"] == m
    assert sig[8084]["z_score"] == pytest.approx((100 - m) / sig[8084]["std_4"])


def test_signals_zero_std_guard(spark):
    counts = spark.createDataFrame(
        [("M", "X", "q", 1, 5), ("M", "X", "q", 2, 5), ("M", "X", "q", 3, 7)],
        "canonical_mfr string, failure_mode string, year_quarter string, "
        "quarter_index int, n_events long",
    )
    sig = {r["quarter_index"]: r for r in v_ae_early_signals(counts).collect()}
    # frame [5,5]: std==0 -> z NULL, not division blowup
    assert sig[3]["std_4"] == 0.0 and sig[3]["z_score"] is None
