"""Readers.

- NDJSON raw ingest (the reference's ``COPY INTO MAUDE_RAW`` path,
  README.md:100-102): one JSON document per line into
  ``raw STRUCT, src_filename, load_ts``.
- Seed CSV loader (seeds/manufacturer.csv; dbt_project.yml:17-20).
- Parquet star-schema loader for the driver fixtures (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_maude_raw_ndjson(spark: SparkSession, path: str,
                          schema: StructType | str | None = None,
                          keep_corrupt: bool = True,
                          variant: bool = False) -> DataFrame:
    """NDJSON -> MAUDE_RAW-shaped DataFrame.

    Mirrors the reference's external-stage COPY (README.md:100-102):
    each line is one JSON doc landed as a nested ``raw`` struct with
    file-lineage and load-timestamp columns. Defaults to the canonical
    MAUDE schema — no inference pass, and fields a given export omits
    land as NULL instead of vanishing from the struct.

    Unparseable lines are preserved verbatim in ``corrupt_record``
    (NULL for good rows) so bad input can be quarantined and replayed
    instead of silently becoming all-NULL rows; pass
    ``keep_corrupt=False`` to drop them at the scan.

    ``variant=True`` is the Spark 4.x twin (SURVEY §1's alternative
    raw-layer mapping, and the closest analog of Snowflake's actual
    VARIANT landing column): ``raw`` lands as a ``VariantType`` via
    ``try_parse_json`` — schemaless like the reference's stage, so an
    export carrying fields outside the canonical schema keeps them
    navigable (``variant_get``) instead of silently dropping them at
    the scan. Same column contract (raw, corrupt_record,
    src_filename, load_ts), same quarantine semantics: a line the
    parser rejects lands verbatim in ``corrupt_record`` with a NULL
    ``raw``. Blank lines are skipped, matching the JSON reader."""
    from pyspark.sql.types import StringType, StructField

    from .schemas import MAUDE_RAW_SCHEMA

    if variant:
        if schema is not None:
            raise ValueError(
                "variant=True is schemaless by design (that is the "
                "point of the VARIANT landing column); passing an "
                "explicit schema contradicts it — use one or the "
                "other")
        # parse ONCE per line in its own projection, then derive the
        # quarantine column from the parsed value's nullity — an
        # inline second try_parse_json would double the dominant
        # per-row cost of the ingest path
        parsed = (spark.read.text(path)
                  .filter(F.trim(F.col("value")) != "")
                  .select(
                      F.col("value").alias("_line"),
                      F.try_parse_json(F.col("value")).alias("raw"),
                      F.input_file_name().alias("src_filename"),
                      F.current_timestamp().alias("load_ts"))
                  .select(
                      "raw",
                      F.when(F.col("raw").isNull(),
                             F.col("_line")).alias("corrupt_record"),
                      "src_filename", "load_ts"))
        if not keep_corrupt:
            parsed = parsed.filter(F.col("corrupt_record").isNull())
        return parsed

    base = schema or MAUDE_RAW_SCHEMA
    if not keep_corrupt:
        # reader-level drop: a post-hoc filter on the corrupt column
        # alone trips QUERY_ONLY_CORRUPT_RECORD_COLUMN under pruning
        df = spark.read.schema(base).option("mode", "DROPMALFORMED").json(path)
        return df.select(
            F.struct(*[F.col(c) for c in df.columns]).alias("raw"),
            F.lit(None).cast("string").alias("corrupt_record"),
            F.input_file_name().alias("src_filename"),
            F.current_timestamp().alias("load_ts"),
        )
    with_corrupt = StructType(
        list(base.fields) + [StructField("corrupt_record", StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("columnNameOfCorruptRecord", "corrupt_record")
        .json(path)
    )
    data_cols = [c for c in df.columns if c != "corrupt_record"]
    return df.select(
        F.struct(*[F.col(c) for c in data_cols]).alias("raw"),
        F.col("corrupt_record"),
        F.input_file_name().alias("src_filename"),
        F.current_timestamp().alias("load_ts"),
    )


def read_seed_csv(spark: SparkSession, path: str) -> DataFrame:
    """Seed CSV dimension (header row, inferred types, lower-cased
    column names to match dbt's seed behavior)."""
    df = spark.read.csv(path, header=True, inferSchema=True)
    return df.select([F.col(c).alias(c.lower()) for c in df.columns])


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the `events` fixture, normalizing `ts` to TIMESTAMP_NTZ
    whatever physical type the fixture generation used. Two shapes
    have shipped:

    - parquet TIMESTAMP(MICROS), no timezone — Spark already infers
      TIMESTAMP_NTZ (``inferTimestampNTZInDataSources`` is on in our
      session) and no conversion is needed; if a session reads it as
      session-local TIMESTAMP instead, re-pin the wall time to NTZ.
    - parquet TIMESTAMP(NANOS) — a type the vanilla Spark reader
      rejects outright. Read nanos as long (legacy conf) and truncate
      to microseconds with integer division (ns since epoch exceeds
      double's 2^53 mantissa, so ``DIV``, never float division) — the
      same floor-truncation DuckDB applies, keeping the oracle
      comparable. ``timestamp_micros()`` alone yields a
      session-timezone-sensitive timestamp, so
      convert_timezone(current_timezone(), 'UTC', ...) pins the naive
      UTC wall time regardless of session settings.

    SESSION-WIDE SIDE EFFECT: sets spark.sql.legacy.parquet.nanosAsLong
    for the whole session and deliberately leaves it set — the returned
    DataFrame is lazy, so restoring the conf here would race the actual
    scan. Any later read of a TIMESTAMP(NANOS) parquet column in the
    same session will also surface it as a long. Columns of every other
    parquet type are unaffected; none of the other fixture tables carry
    nanos columns."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.TimestampNTZType):
        return df
    if isinstance(ts_type, T.TimestampType):
        ntz = F.convert_timezone(F.current_timezone(), F.lit("UTC"), F.col("ts"))
    else:  # LongType: nanos surfaced by the legacy conf
        ntz = F.convert_timezone(
            F.current_timezone(), F.lit("UTC"),
            F.timestamp_micros(F.expr("ts DIV 1000")),
        )
    return df.withColumn("ts", ntz)


def register_tables(spark: SparkSession, sf_dir: str,
                    names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Catalog binding (S2): register every fixture table as a temp
    view so the spark.sql(...) surface works against the same names
    the DuckDB oracle uses."""
    for n in names:
        df = read_events(spark, sf_dir) if n == "events" else spark.read.parquet(
            f"{sf_dir}/{n}.parquet"
        )
        df.createOrReplaceTempView(n)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    """Load the driver's synthetic parquet star schema."""
    return {
        n: (read_events(spark, sf_dir) if n == "events"
            else spark.read.parquet(f"{sf_dir}/{n}.parquet"))
        for n in names
    }
