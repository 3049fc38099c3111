"""SparkSession factory.

Defaults are tuned for correctness-reproducibility against a DuckDB
oracle (UTC session timezone, ANSI off so malformed casts yield NULL
like Snowflake's lenient ``TRY_``/``PARSE_YYYYMMDD`` paths) and for
scale (AQE on, skew-join handling on, nested-schema pruning on so the
wide VARIANT-shaped structs prune to the referenced fields).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # deterministic wall-clock-independent semantics
    "spark.sql.session.timeZone": "UTC",
    # lenient casts: bad date strings -> NULL (Snowflake PARSE_YYYYMMDD is NULL-safe)
    "spark.sql.ansi.enabled": "false",
    # runtime re-planning: coalesce small shuffle partitions, split skewed ones
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # prune unread nested struct fields out of the parquet scan
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # Arrow for any pandas_udf / mapInPandas path
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local-mode shuffle width; a real cluster would size this to cores*2-3
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # auto-broadcast small dims (seed join is 4,788 rows ~ a few hundred KB)
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(app_name: str = "snowflake_medtech_vigilance_lakehouse_spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and no
    active session exists; on a real cluster, leave ``master`` to the
    submitter.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


from contextlib import contextmanager


@contextmanager
def query_tag(spark: SparkSession, tag: str):
    """G3 cost-attribution analog of Snowflake QUERY_TAG
    (README.md:63,76,115,131): jobs submitted inside the block carry
    the tag as their job group, visible in the Spark UI / event log /
    listener metrics for per-workload cost accounting."""
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag, interruptOnCancel=False)
    try:
        yield
    finally:
        sc.setJobGroup("", "", interruptOnCancel=False)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (the driver hands us one in ``__spark_entry__.entry``)."""
    for k in ("spark.sql.session.timeZone",
              "spark.sql.ansi.enabled",
              "spark.sql.adaptive.enabled",
              "spark.sql.optimizer.nestedSchemaPruning.enabled",
              "spark.sql.shuffle.partitions"):
        try:
            spark.conf.set(k, _DEFAULTS[k])
        except Exception:
            pass  # immutable in this deployment; keep going
    return spark
