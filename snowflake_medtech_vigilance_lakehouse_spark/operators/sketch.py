"""Sketch-based profiling: exact heavy hitters without a full-key
shuffle.

The reference's data model is built around heavy-hitter keys (one
manufacturer owns 30% of events, /root/reference/README.md:46), and a
training-data pipeline's first profiling question at 100 TB is "which
domains/users/types dominate this corpus" — i.e. every key whose
frequency exceeds a share threshold, with its EXACT count.

The naive plan (`groupBy(key).count()` then filter) shuffles one row
per distinct key: at 100 TB with billions of distinct URLs/users that
is a full-corpus-keyed exchange just to find the handful of keys above
1%. The classic two-pass alternative implemented here never shuffles
raw keys at all:

1. **Candidate pass** — one scan, zero exchanges: each input
   partition folds its Arrow batches into a bounded Misra-Gries
   summary (``capacity`` counters; per batch a vectorized
   ``value_counts`` merged into the summary, then MG-truncated by
   subtracting the (capacity+1)-th largest count — the mergeable-
   summaries formulation, Agarwal et al., PODS'12). A per-partition
   summary undercounts any key by at most ``rows_p / (capacity+1)``,
   so by the averaging argument ANY key with global count
   ``> N / (capacity+1)`` survives in at least one partition's
   summary. With ``capacity >= 2 / min_share`` (the default) the
   candidate union provably contains every key at or above
   ``min_share`` — missing a heavy hitter is impossible, not just
   unlikely. Output size is bounded by ``partitions * capacity``
   rows, independent of data size.
2. **Verification pass** — the tiny candidate set broadcast
   left-semi-joins the corpus (a codegen hash filter on the scan, no
   exchange on the big side), and only the surviving rows enter
   ``groupBy(key).count()``: the shuffle carries candidate keys only.
   The final filter applies the EXACT cutoff ``ceil(min_share * N)``,
   so false candidates from pass 1 are eliminated and the result is
   exactly the keys a full groupBy would have produced — deterministic
   and oracle-checkable, unlike a one-pass approximate sketch.

At 1000 executors the driver never sees corpus-sized state: pass 1's
summary frame is ``<= partitions * capacity`` rows (eagerly
localCheckpointed — it is read twice: once for the exact N, once as
the broadcast candidate list), and the only collect is the single-row
N aggregate. Python cost is confined to the per-batch ``value_counts``
+ bounded-dict merge inside ``mapInPandas`` (Arrow-batched, vectorized
counting; the dict never exceeds ``capacity + batch_distinct``).
"""

from __future__ import annotations

import heapq
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _mg_merge(counter: dict, batch: pd.Series, capacity: int) -> None:
    """Fold one Arrow batch's exact ``value_counts`` into the bounded
    summary, then truncate back to ``capacity`` counters by
    subtracting the (capacity+1)-th largest count from every entry and
    dropping the non-positive ones (the Misra-Gries merge step)."""
    for key, cnt in batch.items():
        counter[key] = counter.get(key, 0) + int(cnt)
    if len(counter) > capacity:
        # the (capacity+1)-th largest value is subtracted from all;
        # entries at or below it drop out, leaving <= capacity keys
        kth = heapq.nlargest(capacity + 1, counter.values())[capacity]
        for key in [k for k, v in counter.items() if v - kth <= 0]:
            del counter[key]
        for key in counter:
            counter[key] -= kth


def heavy_hitter_candidates(df: DataFrame, key_col: str, *,
                            capacity: int) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries (zero exchanges).

    Returns ``(key_col, cnt, part_rows)`` — survivor rows carry the
    summary's (under-)count with ``part_rows`` NULL; each partition
    additionally emits exactly one ``key IS NULL`` row whose
    ``part_rows`` is the partition's row count, so the exact corpus
    size is recoverable from the summary frame without a second scan.
    NULL keys are excluded from counting (profiling contract; callers
    wanting NULL as a group should coalesce to a sentinel first).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    key_field = df.schema[key_col]
    out_schema = StructType([
        StructField(key_col, key_field.dataType, True),
        StructField("cnt", LongType(), True),
        StructField("part_rows", LongType(), True),
    ])

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counter: dict = {}
        rows = 0
        for pdf in batches:
            col = pdf[key_col].dropna()
            rows += len(pdf[key_col])
            if len(col):
                _mg_merge(counter, col.value_counts(), capacity)
        out = pd.DataFrame({
            key_col: pd.Series(list(counter.keys()) + [None],
                               dtype="object"),
            "cnt": pd.Series(list(counter.values()) + [None],
                             dtype="Int64"),
            "part_rows": pd.Series([None] * len(counter) + [rows],
                                   dtype="Int64"),
        })
        yield out

    return df.select(key_col).mapInPandas(_summarize, out_schema)


def heavy_hitters(df: DataFrame, key_col: str, *, min_share: float,
                  capacity: int | None = None) -> DataFrame:
    """Exact heavy hitters: every non-NULL ``key_col`` value whose
    count is ``>= ceil(min_share * N)`` with its exact count, without
    ever shuffling the full key population.

    ``min_share`` must be in (0, 1]. Use an exactly-representable
    binary fraction (1/128, 3/256, ...) when the result feeds a
    cross-engine comparison, so ``ceil(min_share * N)`` computes the
    same cutoff everywhere. ``capacity`` defaults to
    ``ceil(2 / min_share)`` — the smallest bound with a 2x safety
    margin over the ``N/(capacity+1)`` miss threshold; raising it only
    shrinks the pass-2 candidate set. The candidate broadcast is
    ``<= partitions * capacity`` keys (~a few hundred thousand at
    1000 executors — well under broadcast limits; the N aggregate is
    the only driver collect, one row).

    Output: ``(key_col, cnt)``, exactly ``groupBy(key).count()``
    filtered at the cutoff — pass 2 recounts candidates exactly, so
    pass 1's undercounts never reach the result.
    """
    if not 0.0 < min_share <= 1.0:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    if capacity is None:
        capacity = math.ceil(2.0 / min_share)
    # tiny frame (<= partitions * capacity rows), read twice below —
    # eager localCheckpoint pays the single corpus scan exactly once
    sketch = heavy_hitter_candidates(
        df, key_col, capacity=capacity).localCheckpoint(eager=True)
    n_total = sketch.agg(F.sum("part_rows")).first()[0] or 0
    if n_total == 0:
        return (df.select(key_col).limit(0)
                .withColumn("cnt", F.lit(None).cast("long")))
    cutoff = math.ceil(min_share * n_total)
    candidates = (sketch.filter(F.col(key_col).isNotNull())
                  .select(key_col).distinct())
    return (df.join(F.broadcast(candidates), on=key_col, how="left_semi")
            .groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= F.lit(int(cutoff))))
