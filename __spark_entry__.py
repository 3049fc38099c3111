"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``snowflake_medtech_vigilance_lakehouse_spark``
(SURVEY.md §2 inventory); this module is just the registry adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snowflake_medtech_vigilance_lakehouse_spark.plans import analytics  # noqa: E402
from snowflake_medtech_vigilance_lakehouse_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the early-signal
    rolling z-score pipeline (v_ae_early_signals analog)."""
    tune_session(spark)
    return analytics.q_early_signals(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(analytics.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys without an entry get the driver's
    rows-only check (non-SQL-expressible operators)."""
    return dict(analytics.ORACLES)
