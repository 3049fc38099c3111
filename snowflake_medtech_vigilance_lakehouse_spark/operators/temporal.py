"""Temporal operators Spark lacks as built-ins: as-of join and
gap-based sessionization, composed from joins + windows (SURVEY.md
"custom operators" tier (a): composition of existing DataFrame ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              left_ts: str, right_ts: str,
              direction: str = "backward",
              suffix: str = "_r") -> DataFrame:
    """As-of join: for each left row, attach the single right row with
    the same key whose timestamp is the latest <= left's timestamp
    ('backward'; 'forward' = earliest >=). Unmatched left rows survive
    with NULLs (left-join semantics).

    Shape: range-condition equi-key join -> per-left-row top-1 window.
    At 100 TB the equi-key join shuffles both sides once on the key;
    the window then runs inside each key partition. For heavily
    repeated keys the refinement is bucketing both tables on `on` so
    the join is shuffle-free — the operator shape stays identical.
    """
    if direction == "backward":
        cond_ts = F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
        order = F.col(f"r.{right_ts}").desc()
    elif direction == "forward":
        cond_ts = F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")
        order = F.col(f"r.{right_ts}").asc()
    else:
        raise ValueError(f"unknown direction: {direction}")

    # synthetic row identity keeps duplicate left rows distinct through
    # the join -> top-1 window (grouping by value columns would merge them)
    l = left.withColumn("_lid", F.monotonically_increasing_id()).alias("l")
    r = right.alias("r")
    lcols = [F.col(f"l.{c}") for c in left.columns]
    rcols = [
        F.col(f"r.{c}").alias(c + suffix if c in left.columns else c)
        for c in right.columns
    ]
    joined = l.join(r, (F.col(f"l.{on}") == F.col(f"r.{on}")) & cond_ts, "left")
    w = Window.partitionBy(F.col("l._lid")).orderBy(
        order, *[F.col(f"r.{c}").asc_nulls_last() for c in right.columns]
    )
    ranked = joined.select(*lcols, *rcols, F.row_number().over(w).alias("_rn"))
    return ranked.filter(F.col("_rn") == 1).drop("_rn")


def sessionize(events: DataFrame, *, key: str, ts: str,
               gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the key's previous event exceeds ``gap``. Adds
    ``session_seq`` (1-based per key) and ``session_id``
    (key || '#' || seq). Lag + cumulative-sum over one per-key window —
    a single shuffle on the (high-cardinality) key.
    """
    w = Window.partitionBy(key).orderBy(ts)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(F.col(ts)).over(w)
    new_session = F.when(
        prev.isNull() | (F.col(ts) > prev + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    seq = F.sum(new_session).over(
        Window.partitionBy(key).orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "*",
        seq.cast("long").alias("session_seq"),
    ).withColumn(
        "session_id",
        F.concat(F.col(key).cast("string"), F.lit("#"), F.col("session_seq").cast("string")),
    )
