"""Skew mitigation helpers.

The reference names a 30%-one-manufacturer heavy-hitter distribution
(README.md:46). Where that actually bites in Spark, measured at sf0.1
(see PLANS.md "Skew"):

- **Decomposable aggregates (sum/count/min/max) are already immune.**
  Spark's map-side partial aggregation collapses a single hot group
  key to ONE row per map partition before the shuffle, so the hot
  key's reducer receives #map-partitions partials, not 30% of the
  data. Measured: plain vs salted within noise at 600k and 9.6M rows.
  ``salted_agg`` is therefore NOT a latency lever for these — it is
  kept as (a) the correct formulation when partial aggregation is
  unavailable (RDD-style combineByKey pipelines, foldable state too
  big for the map-side hash table) and (b) the building block for
  heavy-state aggregation below.

- **Heavy-state aggregates (collect_list/collect_set/LISTAGG)** carry
  state proportional to the data: the hot key's reducer must HOLD 30%
  of the corpus even after map-side combine. Salting spreads that
  state ``num_salts`` ways — at 100 TB that is the difference between
  one executor OOMing on a 30 TB buffer and 16 holding ~2 TB each. It
  is a memory/spill lever, not a wall-clock one: per-key ORDERED
  output (the reference's LISTAGG narrative) still serializes on the
  final per-key sort whichever way the collection was built.

- **Join-side skew** is AQE's job first (`skewJoin.enabled`, on in
  our session): the hot partition splits once it exceeds
  ``skewedPartitionThresholdInBytes`` (256 MB default — real at
  100 TB; at bench scale the hot partition is ~90 MB, below the
  trigger, which is itself evidence the default plan absorbs it).
  The split firing is PLAN-ASSERTED in tests (``skew=true`` on the
  sort-merge join under tightened thresholds) and benched against
  :func:`salted_join` — the manual lever for the cases AQE cannot
  touch (a skewed AGGREGATION feeding the join in the same stage, a
  broadcast-ineligible dimension under a streaming micro-batch, or a
  pre-AQE engine reading our tables).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_agg) pairs per supported aggregate
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: Sequence[tuple[str, str, str]],
               num_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` is a list of (fn, column, alias) with fn in
    {sum, count, min, max}. Phase 1 groups by (keys..., salt) — the
    hot key's rows spread over ``num_salts`` reducers — phase 2 merges
    partials per key. Same result as a direct groupBy for mergeable
    aggregates; ~2x shuffle volume of the salted partials, which is
    the price of not having one straggler reducer own the heavy key.

    The salt is a content hash of the aggregated columns (pmod of
    xxhash64), NOT spark_partition_id(): a partition-id salt takes at
    most #input-partitions distinct values (a 3-file scan would fan
    the hot key only 3 ways however large num_salts is) and gives
    every row of a map partition the same salt. The content hash
    spreads within every partition and is deterministic, so the plan
    stays reproducible run-to-run.
    """
    for fn, _, _ in aggs:
        if fn not in _MERGEABLE:
            raise ValueError(f"non-mergeable aggregate: {fn}")
    salt_inputs = [F.col(col) for _, col, _ in aggs]
    salt = F.pmod(F.xxhash64(*salt_inputs), F.lit(num_salts)).alias("_salt")
    partial_exprs = [
        _MERGEABLE[fn][0](F.col(col)).alias(f"_p_{alias}") for fn, col, alias in aggs
    ]
    final_exprs = [
        _MERGEABLE[fn][1](F.col(f"_p_{alias}")).alias(alias) for fn, _, alias in aggs
    ]
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(left: DataFrame, right: DataFrame, on: str, *,
                num_salts: int = 16, how: str = "inner",
                salt_cols: Sequence[str] | None = None) -> DataFrame:
    """Replicated-dimension salted equi-join: the manual skew-join for
    a heavy-hitter key on the ``left`` (fact) side joining a small-ish
    (but non-broadcastable) ``right`` side.

    Each left row gets a deterministic content-hash salt in
    [0, num_salts); every right row is replicated once per salt value,
    and the join runs on (key, salt) — the hot key's rows land on
    ``num_salts`` reducers instead of one. Result equals the plain
    join exactly (each left row still meets each matching right row
    exactly once, on its own salt's replica). Cost: right shuffles
    ``num_salts`` x its size — cheap iff right is much smaller than
    the hot key's mass, the regime where the straggler hurts.

    The salt hashes ``salt_cols`` (default: all left columns) rather
    than using spark_partition_id(), for the same reasons as
    :func:`salted_agg`: per-row spread within every input partition,
    deterministic plans. Prefer AQE's skew split where it applies —
    this operator is for the shapes it can't reach (see module doc).

    ``how``: 'inner' or 'left' (right-side rows never survive
    unmatched under replication, so right/full joins would need an
    anti-join patch — refused instead of silently wrong)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    cols = [F.col(c) for c in (salt_cols or left.columns)]
    l = left.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(num_salts)))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)])))
    return l.join(r, [on, "_salt"], how).drop("_salt")


def salted_collect(df: DataFrame, keys: Sequence[str], col: str,
                   alias: str = "items", num_salts: int = 16,
                   sort: bool = True) -> DataFrame:
    """Heavy-state collection with the per-reducer buffer capped at
    ~1/num_salts of the hot key's data (the OOM lever for LISTAGG /
    collect_list over a 30%-heavy-hitter at scale — see module doc).

    Phase 1 collects per (keys..., salt); phase 2 flattens the salted
    partials. ``sort=True`` sorts the final array so the result is
    deterministic and equals ``sort_array(collect_list(col))`` of a
    direct groupBy; the final sort is per-key serial either way — the
    win here is state distribution, not wall-clock."""
    salt = F.pmod(F.xxhash64(F.col(col)), F.lit(num_salts)).alias("_salt")
    p1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.collect_list(col).alias("_p"))
    )
    merged = F.flatten(F.collect_list("_p"))
    out = F.sort_array(merged) if sort else merged
    return p1.groupBy(*keys).agg(out.alias(alias))
