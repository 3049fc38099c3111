"""Unit tests for the scalar/aggregate expression helpers — the
Snowflake-dialect semantics the reference relies on (SURVEY.md §2.7)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.functions import (
    first_non_blank,
    keyword_classifier,
    normalize_event_type,
    nullif_blank,
    ordered_listagg,
    parse_yyyymmdd,
    quarter_index,
    quarter_label,
    sha2_key,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_parse_yyyymmdd_valid_and_malformed(spark):
    df = spark.createDataFrame(
        [("20240131",), ("not8chr",), ("2024013",), ("20241340",), (None,), ("  20240229  ",)],
        "s string",
    ).select(parse_yyyymmdd(F.col("s")).cast("string").alias("d"))
    vals = [r["d"] for r in df.collect()]
    assert vals == ["2024-01-31", None, None, None, None, "2024-02-29"]


def test_normalize_event_type_buckets(spark):
    cases = [("INJURY", "Injury"), ("  malfunction ", "Malfunction"),
             ("DEATH", "Death"), ("N/A", "No Answer Provided"),
             ("na", "No Answer Provided"), ("", "No Answer Provided"),
             (" ", "No Answer Provided"), (None, "No Answer Provided"),
             ("UNKNOWN", "No Answer Provided"), ("Recall", "Other")]
    df = spark.createDataFrame([(c[0],) for c in cases], "s string").select(
        normalize_event_type(F.col("s")).alias("b")
    )
    assert [r["b"] for r in df.collect()] == [c[1] for c in cases]


def test_quarter_label_and_index(spark):
    row = (
        spark.createDataFrame([("2024-08-13",)], "d string")
        .select(
            quarter_label(F.col("d").cast("date")).alias("l"),
            quarter_index(F.col("d").cast("date")).alias("i"),
        )
        .first()
    )
    assert row["l"] == "2024-Q3" and row["i"] == 2024 * 4 + 3


def test_sha2_key_matches_reference_formula(spark):
    got = _one(spark, sha2_key(F.lit("a"), F.lit(None).cast("string"), F.lit("c")))
    assert got == hashlib.sha256(b"a||c").hexdigest()


def test_keyword_classifier_first_match_and_null(spark):
    rules = (("LEAK", "LEAK"), ("BREAK", "FRACTURE/BREAK"))
    df = spark.createDataFrame(
        [("a leak and a break",), ("BREAKdown",), ("clean",), (None,)], "s string"
    ).select(keyword_classifier(F.col("s"), rules).alias("c"))
    assert [r["c"] for r in df.collect()] == ["LEAK", "FRACTURE/BREAK", None, None]


def test_nullif_blank(spark):
    df = spark.createDataFrame([("  x  ",), ("   ",), ("",), (None,)], "s string").select(
        nullif_blank(F.col("s")).alias("v")
    )
    assert [r["v"] for r in df.collect()] == ["x", None, None, None]


def test_ordered_listagg_order_null_drop_and_empty(spark):
    df = spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, None), (2, 1, None)],
        "g int, k int, v string",
    )
    out = {
        r["g"]: r["agg"]
        for r in df.groupBy("g")
        .agg(ordered_listagg(F.col("v"), F.col("k")).alias("agg"))
        .collect()
    }
    assert out[1] == "a\nc"      # sorted by k, NULL piece dropped
    assert out[2] == ""           # all-NULL group -> '' (Snowflake LISTAGG)


def test_first_non_blank(spark):
    df = spark.createDataFrame(
        [(1, " "), (1, None), (1, "zz"), (1, "aa"), (2, ""), (2, None)],
        "g int, v string",
    )
    out = {
        r["g"]: r["p"]
        for r in df.groupBy("g").agg(first_non_blank(F.col("v")).alias("p")).collect()
    }
    assert out[1] == "zz" and out[2] is None
