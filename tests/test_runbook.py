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
