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


# ---------------------------------------------------------------------------
# CDF-maintained exact count ledger (round 13)
#
# The two-pass heavy_hitters above is the right shape for a ONE-OFF
# profile, but it rescans the corpus on every call — at 100 TB a
# pipeline that re-profiles after each ingest pays two full scans per
# commit. Counts are additive, so the change feed maintains them
# EXACTLY at increment cost: insert / update_postimage rows are +1,
# delete / update_preimage rows are -1, and the per-commit net deltas
# land as tick dirs the serve read folds. Churn needs no tombstone
# sidecar here — a retired row's -1 cancels its +1 arithmetically,
# the same freshness discipline the round-12/13 stores enforce
# structurally (/root/reference/README.md:83,117).
# ---------------------------------------------------------------------------


def _count_store_meta(store_dir: str, key_col: str | None) -> str:
    """Resolve (and on first use persist) the ledger's key column.
    The meta sidecar makes the store self-describing so readers and
    later refresh calls cannot silently fold a different column."""
    import json
    import os

    meta_path = store_dir + "_meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = json.load(f)["key_col"]
        if key_col is not None and key_col != stored:
            raise ValueError(
                f"count store {store_dir} is keyed by {stored!r}, "
                f"not {key_col!r}")
        return stored
    if key_col is None:
        raise ValueError(
            f"count store {store_dir} has no meta sidecar; pass "
            f"key_col on the first update_count_store call")
    os.makedirs(os.path.dirname(meta_path) or ".", exist_ok=True)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"key_col": key_col}, f)
    os.replace(tmp, meta_path)
    return key_col


def update_count_store(spark, delta_path: str, store_dir: str,
                       key_col: str | None = None) -> list[int]:
    """Fold new table commits into the persisted count ledger:
    ``{store_dir}/tick=<version>`` holds one commit's NET per-key
    delta (``(key, delta)``; NULL keys count — they carry the
    corpus-size share the heavy-hitter cutoff needs). Protocol
    discipline is the CDF-refresher family's
    (:func:`~..streaming.index_refresh._consume_change_feed`):
    high-water-mark sidecar at ``{store_dir}_cdf_state``,
    maintenance-commit tolerance, lineage-ownership guard, per-tick
    overwrite so an at-least-once replay converges byte-identically.
    Updates and deletes are ABSORBED, not refused: counts are
    additive, so a preimage's -1 retires it exactly.

    Per commit the work is one map-side-combined aggregate over the
    INCREMENT's rows — at 100 TB each tick costs its churn, never the
    table. Returns the commit versions processed."""
    import os

    from pyspark.sql import functions as F

    from ..streaming.index_refresh import _consume_change_feed

    key = _count_store_meta(store_dir, key_col)
    feed, versions, advance = _consume_change_feed(
        spark, delta_path, store_dir + "_cdf_state",
        op="update_count_store", contract="",
        tick_dirs=[store_dir], allow_churn=True)
    done: list[int] = []
    for v in versions:
        commit = feed.filter(F.col("_commit_version") == v)
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1)).otherwise(F.lit(-1))
        tick = (commit.groupBy(F.col(key))
                .agg(F.sum(sign).cast("long").alias("delta"))
                .filter(F.col("delta") != 0))
        # ONE execution of the per-commit aggregate: write it, then
        # drop the tick dir when zero rows survived (the old
        # isEmpty-then-write order ran the aggregate twice per
        # commit; the replay loops are driver-job-bound, guide §2.4).
        # An all-cancelling commit (e.g. updates that only touch
        # other columns) thus still publishes no tick — the mark
        # advances, and a crash replay recomputes the same frame.
        tick_dir = f"{store_dir}/tick={v}"
        tick.write.mode("overwrite").parquet(tick_dir)
        if not any(f.endswith(".parquet") for f in os.listdir(tick_dir)):
            import shutil
            shutil.rmtree(tick_dir, ignore_errors=True)
        advance(v)
        done.append(v)
    return done


def read_count_store(spark, store_dir: str):
    """Current exact per-key counts: fold every tick's deltas. Rows
    with net 0 (fully retired keys) drop out; a NEGATIVE net proves
    the feed deleted rows it never inserted (a torn or foreign
    lineage) and raises loudly rather than serving wrong counts.
    Output ``(key, cnt)`` — the NULL-key row, when present, carries
    the NULL-key corpus share and is retained for cutoff math;
    consumers wanting groups only should drop it.

    One exchange over the store's DISTINCT keys (store rows are
    net-delta sized, never corpus sized); the frame is eagerly
    localCheckpointed because every consumer reads it at least twice
    (cutoff aggregate + filter)."""
    import os

    from pyspark.sql import functions as F

    key = _count_store_meta(store_dir, None)
    if not os.path.isdir(store_dir):
        raise FileNotFoundError(f"no count store at {store_dir}")
    df = spark.read.parquet(store_dir)
    counts = (df.groupBy(F.col(key))
              .agg(F.sum("delta").alias("cnt"))
              .filter(F.col("cnt") != 0)
              .localCheckpoint(eager=True))
    neg = counts.filter(F.col("cnt") < 0).limit(5).collect()
    if neg:
        raise ValueError(
            f"count store {store_dir} folded NEGATIVE counts "
            f"(sample {[r[key] for r in neg]}): the change feed "
            f"deleted keys it never inserted — the ledger does not "
            f"match this table lineage; rebuild the store")
    return counts


def heavy_hitters_from_store(spark, store_dir: str, *,
                             min_share: float):
    """Exact heavy hitters SERVED from the maintained ledger: every
    non-NULL key whose current count is ``>= ceil(min_share * N)``,
    with N the table's current row count (NULL-key rows included,
    matching :func:`heavy_hitters`'s contract). No corpus scan at
    all — the rescan operator's two passes are replaced by one fold
    of the increment-built store, which is what makes per-commit
    re-profiling affordable at 100 TB. The only driver collect is
    the single-row cutoff aggregate."""
    import math

    from pyspark.sql import functions as F

    if not 0.0 < min_share <= 1.0:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    key = _count_store_meta(store_dir, None)
    counts = read_count_store(spark, store_dir)
    n_total = counts.agg(F.sum("cnt")).first()[0] or 0
    if n_total == 0:
        return counts.filter(F.lit(False))
    cutoff = math.ceil(min_share * n_total)
    return counts.filter(F.col(key).isNotNull()
                         & (F.col("cnt") >= F.lit(int(cutoff))))


def compact_count_store(spark, store_dir: str) -> bool:
    """Physically fold the ledger's ticks into one consolidated
    ``tick=<max>`` dir (net-zero keys dropped), so serve-time listing
    and fold cost stay O(live keys) instead of O(commits). Staged
    write + two renames, the index-swap crash discipline; the read
    result is identical across the fold (pytest-pinned). Returns
    False when there is nothing to fold."""
    import os
    import shutil

    from pyspark.sql import functions as F

    import json

    key = _count_store_meta(store_dir, None)
    if not os.path.isdir(store_dir):
        return False
    ticks = sorted(int(d.split("=", 1)[1]) for d in os.listdir(store_dir)
                   if d.startswith("tick="))
    if len(ticks) <= 1:
        return False
    # crash-window guard (the compact_ivf_index discipline): a tick
    # NEWER than the consumed high-water mark is a crashed refresh's
    # uncommitted publish — the replay will OVERWRITE that tick dir,
    # and if compaction had folded the whole history into it first,
    # the overwrite would destroy every older commit's deltas
    state_path = os.path.join(store_dir + "_cdf_state", "state.json")
    if os.path.exists(state_path):
        with open(state_path) as f:
            hwm = json.load(f)["last_commit_version"]
        if ticks[-1] > hwm:
            raise ValueError(
                f"compact_count_store refused: tick {ticks[-1]} of "
                f"{store_dir} is newer than the consumed high-water "
                f"mark {hwm} (a crashed refresh's uncommitted tick) "
                f"— the replay overwrites that tick dir, so folding "
                f"history into it would lose the older commits' "
                f"deltas. Re-run update_count_store, then compact")
    folded = (spark.read.parquet(store_dir)
              .groupBy(F.col(key))
              .agg(F.sum("delta").cast("long").alias("delta"))
              .filter(F.col("delta") != 0)
              # the staged write's lineage reads the dir the swap
              # replaces — same discipline as the index compactors
              .localCheckpoint(eager=True))
    stage = store_dir + "_compact_stage"
    retired = store_dir + "_compact_retired"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(retired, ignore_errors=True)
    # a fully-retired store folds to an EMPTY frame; the write still
    # lands one schema-carrying parquet file, so the consolidated
    # layout stays readable (measured: empty-df parquet writes emit a
    # footer-only part file)
    folded.write.mode("overwrite").parquet(
        os.path.join(stage, f"tick={ticks[-1]}"))
    now = sorted(int(d.split("=", 1)[1]) for d in os.listdir(store_dir)
                 if d.startswith("tick="))
    if now != ticks:
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"compact_count_store aborted: {store_dir} changed while "
            f"the folded layout was being staged — stop the refresh "
            f"loop during maintenance and re-run")
    os.rename(store_dir, retired)
    os.rename(stage, store_dir)
    shutil.rmtree(retired)
    return True
