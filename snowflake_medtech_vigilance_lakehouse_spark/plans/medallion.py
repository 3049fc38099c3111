"""The medallion model DAG: raw -> stg -> fact -> quarterly counts ->
early-signal view, as composable ``DataFrame -> DataFrame`` functions.

Semantics mirror the reference dbt models 1:1 (citations inline); the
physical expression is Spark-first:

- the wide VARIANT scan relies on nested-schema pruning, so only the
  ~15 referenced JSON fields are read from parquet;
- the 4,788-row manufacturer seed is broadcast (no shuffle on the fact
  side for the canonicalization join), and the join deliberately
  preserves fan-out on duplicate normalized keys (SURVEY.md §1);
- ordered LISTAGG is the deterministic sort-struct composition from
  ``functions.aggregates`` — collect_list order after a shuffle is not
  reproducible, sorting by the flatten index is.

At 100 TB: raw/stg are partitioned by ingest date, facts by
(year, quarter) so the quarterly cube and signal view prune partitions;
the only wide shuffle is the stg re-group, keyed on mdr_report_key
(high-cardinality, skew-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.aggregates import first_non_blank, ordered_listagg
from ..functions.scalar import (
    FAILURE_MODE_RULES,
    keyword_classifier,
    normalize_event_type,
    nullif_blank,
    norm_upper,
    parse_yyyymmdd,
    quarter_index,
    quarter_label,
    sha2_key,
)


def stg_maude(raw: DataFrame) -> DataFrame:
    """Staging view: flatten + normalize MAUDE_RAW.

    Reference: models/stg/stg_maude.sql:1-88. Input schema is
    ``raw STRUCT<...>, src_filename STRING, load_ts TIMESTAMP``
    (FIXTURES.md §A1); output one row per (report, base-attrs) with the
    narrative fragments merged in mdr_text-array order.
    """
    r = F.col("raw")
    base = raw.select(
        r.getField("device").alias("_device_arr"),
        r.getField("mdr_text").alias("_mdr_text_arr"),
        r.getField("mdr_report_key").cast("string").alias("mdr_report_key"),
        r.getField("report_number").cast("string").alias("report_number"),
        parse_yyyymmdd(r.getField("date_received").cast("string")).alias("date_received"),
        parse_yyyymmdd(r.getField("event_date").cast("string")).alias("event_date"),
        r.getField("event_type").cast("string").alias("event_type_raw"),
        normalize_event_type(r.getField("event_type").cast("string")).alias("event_type"),
        r.getField("product_problem").cast("string").alias("product_problem"),
        r.getField("device_report_product_code").cast("string").alias("product_code"),
        r.getField("device_name").cast("string").alias("device_name_top"),
        r.getField("brand_name").cast("string").alias("brand_name_top"),
        r.getField("manufacturer_d_name").cast("string").alias("manufacturer_name_top"),
        r.getField("manufacturer_g1_name").cast("string").alias("manufacturer_g1_name_top"),
        F.col("src_filename"),
        F.col("load_ts"),
    )

    # devices_agg: first non-blank manufacturer/brand/device name from the
    # device[] array (stg_maude.sql:31-46) — explode_outer ≈ LATERAL
    # FLATTEN(OUTER=>TRUE), conditional MAX ≈ MAX(IFF(...)).
    dev = (
        base.select("mdr_report_key", F.explode_outer("_device_arr").alias("d"))
        .groupBy("mdr_report_key")
        .agg(
            first_non_blank(F.col("d.manufacturer_d_name").cast("string")).alias("manufacturer_name_dev"),
            first_non_blank(F.col("d.manufacturer_g1_name").cast("string")).alias("manufacturer_g1_name_dev"),
            first_non_blank(F.col("d.brand_name").cast("string")).alias("brand_name_dev"),
            first_non_blank(F.col("d.device_name").cast("string")).alias("device_name_dev"),
        )
    )

    # text_flat: one row per narrative fragment, keeping fragment ordinal
    # (stg_maude.sql:49-57); posexplode_outer keeps NULL/empty-array rows.
    text_flat = base.select(
        "*",
        F.posexplode_outer("_mdr_text_arr").alias("idx", "_t"),
    ).withColumn("text_piece", nullif_blank(F.col("_t").getField("text").cast("string")))

    # final re-group mirrors the reference's GROUP BY over the full base
    # tuple + joined device columns (stg_maude.sql:58-88) so duplicate
    # mdr_report_key rows keep the reference's merge behavior exactly.
    group_cols = [
        "mdr_report_key", "report_number", "date_received", "event_date",
        "event_type", "event_type_raw", "product_problem", "product_code",
        "device_name_top", "device_name_dev",
        "brand_name_top", "brand_name_dev",
        "manufacturer_name_top", "manufacturer_name_dev",
        "manufacturer_g1_name_top", "manufacturer_g1_name_dev",
        "src_filename", "load_ts",
    ]
    joined = text_flat.join(dev, "mdr_report_key", "left")
    narrative = ordered_listagg(F.col("text_piece"), F.col("idx"))
    out = (
        joined.groupBy(*group_cols)
        .agg(narrative.alias("narrative_text"))
        .select(
            "mdr_report_key",
            "report_number",
            "date_received",
            "event_date",
            "event_type",
            "event_type_raw",
            "product_problem",
            "product_code",
            F.coalesce("device_name_top", "device_name_dev").alias("device_name"),
            F.coalesce("brand_name_top", "brand_name_dev").alias("brand_name"),
            F.coalesce("manufacturer_name_top", "manufacturer_name_dev").alias("manufacturer_name"),
            F.coalesce("manufacturer_g1_name_top", "manufacturer_g1_name_dev").alias("manufacturer_g1_name"),
            "narrative_text",
            "src_filename",
            "load_ts",
            F.length("narrative_text").alias("narrative_len"),
        )
    )
    return out


def fact_adverse_events(stg: DataFrame, manufacturer_map: DataFrame) -> DataFrame:
    """Fact table: surrogate key + manufacturer canonicalization +
    quarter label + keyword failure-mode classifier.

    Reference: models/marts/fact_adverse_events.sql:1-91.
    ``manufacturer_map`` is the seed (raw_name, canonical_name,
    manufacturer_id); the join key UPPER(TRIM(raw_name)) is NOT unique
    and the left join must preserve the resulting fan-out (SURVEY.md §1).
    """
    d = manufacturer_map.select(
        norm_upper(F.col("raw_name")).alias("raw_name_u"),
        F.col("canonical_name"),
        F.col("manufacturer_id"),
    )
    s = stg.withColumn(
        "manufacturer_name_u",
        norm_upper(F.coalesce("manufacturer_name", "manufacturer_g1_name", "brand_name")),
    )
    joined = s.join(
        F.broadcast(d), d["raw_name_u"] == s["manufacturer_name_u"], "left"
    )
    return joined.select(
        sha2_key(F.col("report_number"), F.col("mdr_report_key"),
                 F.col("date_received")).alias("event_id"),
        "report_number",
        "mdr_report_key",
        "manufacturer_id",
        F.coalesce("canonical_name", "manufacturer_name").alias("canonical_mfr"),
        "product_code",
        "device_name",
        "brand_name",
        "event_type",
        "product_problem",
        "event_date",
        "date_received",
        quarter_label(F.col("date_received")).alias("year_quarter"),
        "narrative_text",
        F.length("narrative_text").alias("narrative_len"),
        keyword_classifier(F.col("narrative_text"), FAILURE_MODE_RULES).alias("failure_mode"),
    )


def ae_counts_q(fact: DataFrame) -> DataFrame:
    """Quarterly aggregation cube by (manufacturer, failure mode, quarter).

    Reference: models/marts/ae_counts_q.sql:1-23.
    """
    src = fact.filter(F.col("date_received").isNotNull()).select(
        F.coalesce("canonical_mfr", F.lit("(unknown)")).alias("canonical_mfr"),
        F.coalesce("failure_mode", F.lit("(unknown)")).alias("failure_mode"),
        "date_received",
    )
    return (
        src.groupBy(
            "canonical_mfr",
            "failure_mode",
            F.year("date_received").alias("yyyy"),
            F.quarter("date_received").alias("q"),
            quarter_index(F.col("date_received")).alias("quarter_index"),
            quarter_label(F.col("date_received")).alias("year_quarter"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def v_ae_early_signals(counts: DataFrame) -> DataFrame:
    """Early-signal view: trailing-4-quarter rolling mean/stddev
    (excluding the current quarter) and a z-score with NULL guards.

    Reference: models/marts/v_ae_early_signals.sql:1-48. Frame edge
    semantics (empty frame -> NULL mean, single-row sample stddev ->
    NULL, std==0 -> NULL z) must hold exactly.
    """
    from pyspark.sql.window import Window

    w_seq = Window.partitionBy("canonical_mfr", "failure_mode").orderBy("quarter_index")
    seq = counts.select(
        "canonical_mfr", "failure_mode", "year_quarter", "quarter_index", "n_events",
        F.row_number().over(w_seq).alias("rn"),
    )
    w_roll = (
        Window.partitionBy("canonical_mfr", "failure_mode")
        .orderBy("rn")
        .rowsBetween(-4, -1)
    )
    roll = seq.select(
        "*",
        F.avg("n_events").over(w_roll).alias("mean_4"),
        F.stddev_samp("n_events").over(w_roll).alias("std_4"),
    )
    z = (
        F.when(F.col("std_4").isNull() | (F.col("std_4") == 0), F.lit(None))
        .otherwise((F.col("n_events") - F.col("mean_4")) / F.col("std_4"))
    )
    return roll.select(
        "canonical_mfr", "failure_mode", "year_quarter", "quarter_index",
        "n_events", "mean_4", "std_4", z.alias("z_score"),
    )
