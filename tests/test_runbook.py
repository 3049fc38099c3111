"""End-to-end medallion build from NDJSON files on disk through
partitioned publication — the full E2 lifecycle in one call."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.plans.runbook import build_medallion
from tests.maude_fixture import SEED_ROWS


def test_build_medallion_from_files(spark, tmp_path):
    nd = tmp_path / "maude.ndjson"
    with open(nd, "w") as f:
        for i in range(1, 6):
            f.write(json.dumps({
                "mdr_report_key": f"K{i}",
                "report_number": f"N{i}",
                "date_received": f"2024010{i}",
                "event_type": "Malfunction",
                "manufacturer_d_name": "Acme Corp",
                "mdr_text": [{"text": "leak observed"}, {"text": "second note"}],
            }) + "\n")
    seed_csv = tmp_path / "manufacturer.csv"
    with open(seed_csv, "w") as f:
        f.write("RAW_NAME,CANONICAL_NAME,MANUFACTURER_ID\n")
        for raw_name, canonical, mid in SEED_ROWS:
            f.write(f"{raw_name},{canonical},{mid}\n")

    out = tmp_path / "marts"
    res = build_medallion(spark, ndjson_path=str(nd),
                          seed_csv_path=str(seed_csv), out_dir=str(out))
    assert res.dq_passed, res.dq_results
    assert res.stg.count() == 5
    fact = res.fact.collect()
    assert all(r["canonical_mfr"] == "ACME CANONICAL" for r in fact)
    assert all(r["failure_mode"] == "LEAK" for r in fact)
    assert all(r["narrative_text"] == "leak observed\nsecond note" for r in fact)

    # published tables: partition layout + round-trip
    back = spark.read.parquet(str(out / "fact_adverse_events"))
    assert back.count() == 5
    assert any("year_quarter=2024-Q1" in f for f in back.inputFiles())
    counts = spark.read.parquet(str(out / "ae_counts_q"))
    assert counts.agg(F.sum("n_events")).first()[0] == 5
    # signals view computed lazily over the cube
    assert res.signals.count() == counts.count()


def test_incremental_publish_converges_to_full_rebuild(spark, sf_dir, tmp_path):
    """dbt-incremental analog: first run creates, later runs upsert by
    key; re-delivery is idempotent and the result equals a one-shot
    full build of the union."""
    from pyspark.sql import functions as F

    from snowflake_medtech_vigilance_lakehouse_spark.plans.runbook import incremental_publish
    from snowflake_medtech_vigilance_lakehouse_spark.sources import delta_lite as dl

    path = str(tmp_path / "inc_counts")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "yyyy", F.year("o_orderdate"))
    # integer-cents revenue: double summation is order-dependent across
    # plans, and this test compares two independently-computed results
    daily = orders.groupBy("yyyy", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c"))

    years = sorted(r["yyyy"] for r in daily.select("yyyy").distinct().collect())
    early, late = years[:-1], years[-1:]

    v0 = incremental_publish(
        spark, daily.filter(F.col("yyyy").isin(early)), path,
        unique_key=["yyyy", "o_orderpriority"], partition_by=["yyyy"])
    assert v0 == 0
    # second batch: the last year (new keys) + a recomputed early year
    # (same keys, updated values after late data arrived)
    redo = early[-1]
    batch2 = daily.filter(F.col("yyyy").isin([redo] + late)).withColumn(
        "n", F.col("n") + F.lit(0))  # same shape; values recomputed
    v1 = incremental_publish(spark, batch2, path,
                             unique_key=["yyyy", "o_orderpriority"])
    assert v1 == 1

    got = dl.read_delta(spark, path)
    want = daily.select(*got.columns)  # exceptAll compares positionally
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # idempotent re-delivery: same batch again, state unchanged
    incremental_publish(spark, batch2, path, unique_key=["yyyy", "o_orderpriority"])
    again = dl.read_delta(spark, path).select(*got.columns)
    assert again.exceptAll(want).count() == 0 and again.count() == want.count()
