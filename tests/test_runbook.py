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


def test_variant_raw_ingest_twin(spark, tmp_path):
    """Spark 4.x VariantType raw-layer twin (SURVEY §1's alternative
    mapping — the closest engine analog of the reference's VARIANT
    landing column): same (raw, corrupt_record, src_filename, load_ts)
    contract as the struct reader, schemaless raw, typed variant_get
    navigation incl. a device-array ordinal, quarantine parity on a
    corrupt line, and out-of-schema fields SURVIVE (the struct reader
    necessarily drops them)."""
    from pyspark.sql import functions as F

    from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import (
        read_maude_raw_ndjson)

    nd = tmp_path / "maude.ndjson"
    with open(nd, "w") as f:
        f.write(json.dumps({
            "mdr_report_key": "K1",
            "event_type": "Malfunction",
            "device": [{"brand_name": "A"}, {"brand_name": "B"}],
            "extra_field_not_in_schema": 7,
        }) + "\n")
        f.write("\n")                       # blank: skipped, not corrupt
        f.write("{not json at all\n")       # corrupt: quarantined verbatim
        f.write(json.dumps({"mdr_report_key": "K2"}) + "\n")

    v = read_maude_raw_ndjson(spark, str(nd), variant=True)
    assert v.columns == ["raw", "corrupt_record", "src_filename", "load_ts"]
    assert v.count() == 3  # 2 good + 1 corrupt, blank skipped
    assert v.filter(F.col("corrupt_record").isNotNull()).count() == 1
    assert v.filter(F.col("corrupt_record").isNotNull()).first()[
        "corrupt_record"] == "{not json at all"

    good = v.filter(F.col("corrupt_record").isNull()).select(
        F.variant_get("raw", "$.mdr_report_key", "string").alias("key"),
        F.variant_get("raw", "$.device[1].brand_name", "string").alias("b1"),
        F.variant_get("raw", "$.extra_field_not_in_schema",
                      "bigint").alias("extra"),
    )
    rows = {r["key"]: r for r in good.collect()}
    assert set(rows) == {"K1", "K2"}
    assert rows["K1"]["b1"] == "B" and rows["K1"]["extra"] == 7
    assert rows["K2"]["b1"] is None and rows["K2"]["extra"] is None

    # the struct reader on the same file: same good/corrupt split, but
    # the out-of-schema field is gone — the divergence variant=True
    # exists to close
    s = read_maude_raw_ndjson(spark, str(nd))
    # (collect, don't filter on corrupt_record alone: the raw JSON
    # scan disallows corrupt-column-only pruning — see reader docs)
    assert sum(1 for r in s.collect() if r["corrupt_record"] is None) == 2
    assert "extra_field_not_in_schema" not in s.select("raw.*").columns

    # keep_corrupt=False drops the quarantine lane at the scan
    assert read_maude_raw_ndjson(
        spark, str(nd), variant=True, keep_corrupt=False).count() == 2


def test_variant_reader_refuses_contradictory_schema(spark, tmp_path):
    import pytest

    from snowflake_medtech_vigilance_lakehouse_spark.sources.readers import (
        read_maude_raw_ndjson)
    from tests.maude_fixture import RAW_SCHEMA

    nd = tmp_path / "x.ndjson"
    nd.write_text('{"a": 1}\n')
    with pytest.raises(ValueError, match="schemaless by design"):
        read_maude_raw_ndjson(spark, str(nd), schema=RAW_SCHEMA,
                              variant=True)
