"""Canonical source schemas.

MAUDE_RAW_SCHEMA mirrors the VARIANT fields the reference's staging
layer extracts (models/stg/stg_maude.sql:6-25,35-42,52-55; FIXTURES.md
§A1). Declaring it up front (a) spares the full inference pass a
100 TB NDJSON read would otherwise need and (b) makes absent optional
fields NULL instead of absent — real OpenFDA exports vary per file.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

MAUDE_RAW_SCHEMA = StructType([
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
