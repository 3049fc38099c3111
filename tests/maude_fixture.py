"""MAUDE-shaped fixture rows (FIXTURES.md §A1) covering every edge the
reference's staging/fact SQL handles: NULL/empty arrays, blank-vs-NULL
strings, malformed dates, all five event_type buckets, classifier
keywords, duplicate seed join keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType, TimestampType,
)

RAW_SCHEMA = StructType([
    StructField("mdr_report_key", StringType()),
    StructField("report_number", StringType()),
    StructField("date_received", StringType()),
    StructField("event_date", StringType()),
    StructField("event_type", StringType()),
    StructField("product_problem", StringType()),
    StructField("device_report_product_code", StringType()),
    StructField("device_name", StringType()),
    StructField("brand_name", StringType()),
    StructField("manufacturer_d_name", StringType()),
    StructField("manufacturer_g1_name", StringType()),
    StructField("device", ArrayType(StructType([
        StructField("manufacturer_d_name", StringType()),
        StructField("manufacturer_g1_name", StringType()),
        StructField("brand_name", StringType()),
        StructField("device_name", StringType()),
    ]))),
    StructField("mdr_text", ArrayType(StructType([
        StructField("text", StringType()),
    ]))),
])

MAUDE_SCHEMA = StructType([
    StructField("raw", RAW_SCHEMA),
    StructField("src_filename", StringType()),
    StructField("load_ts", TimestampType()),
])


def _r(key, report, date_received="20240115", event_type="Malfunction",
       mfr_top=None, mfr_g1_top=None, brand_top=None, device_top=None,
       devices=None, texts=None, event_date="20240101",
       product_problem="Leak", product_code="ABC"):
    return (
        (key, report, date_received, event_date, event_type, product_problem,
         product_code, device_top, brand_top, mfr_top, mfr_g1_top,
         devices, texts),
        "fixtures/maude_0001.ndjson",
        None,
    )


ROWS = [
    # plain row: top-level manufacturer, ordered multi-fragment narrative
    _r("R1", "RPT-1", mfr_top="ACME CORP",
       texts=[("ALPHA first",), ("second part",)]),
    # device[]-sourced names (top-level blank/NULL), keyword LEAK in narrative
    _r("R2", "RPT-2", mfr_top=None, brand_top="",
       devices=[(" ", "G1 FALLBACK", "BrandX", None),
                ("DEVMFR", None, None, "Widget")],
       texts=[("there is a leak detected",)]),
    # NULL device array + NULL mdr_text (OUTER flatten keeps the row)
    _r("R3", "RPT-3", devices=None, texts=None, event_type="DEATH"),
    # empty arrays, blank narrative pieces only -> narrative '' len 0
    _r("R4", "RPT-4", devices=[], texts=[("",), ("  ",)], event_type="N/A"),
    # malformed date, unknown event type -> 'Other'; FRACTURE keyword
    _r("R5", "RPT-5", date_received="not8chr", event_type="weird",
       texts=[("the device shows a FRACTURE line",)]),
    # event_type blank -> No Answer Provided; duplicate-keyed seed name
    _r("R6", "RPT-6", event_type="", mfr_top="DupCo",
       texts=[("thrombus risk noted",)]),
    # mixed-case known event type -> InitCap; g1 fallback for join name
    _r("R7", "RPT-7", event_type="  inJuRy  ", mfr_top=None,
       mfr_g1_top="G1 Only GmbH", texts=[("migration observed",)]),
]

# seed with a duplicate normalized key ('DUPCO' twice -> fan-out) and a
# canonical rename; R7's name resolves via manufacturer_g1_name.
SEED_ROWS = [
    ("Acme Corp", "ACME CANONICAL", 1),
    ("DupCo", "DUPCO GROUP A", 2),
    ("DUPCO ", "DUPCO GROUP B", 3),
    ("G1 Only GmbH", "G1 CANON", 4),
]


def maude_raw(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROWS, MAUDE_SCHEMA)


def manufacturer_seed(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        SEED_ROWS, "raw_name string, canonical_name string, manufacturer_id int"
    )
