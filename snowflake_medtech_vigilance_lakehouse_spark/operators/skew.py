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

- **Join-side skew** is AQE's job (`skewJoin.enabled`, on in our
  session): the hot partition splits once it exceeds
  ``skewedPartitionThresholdInBytes`` (256 MB default — real at
  100 TB; at bench scale the hot partition is ~90 MB, below the
  trigger, which is itself evidence the default plan absorbs it).
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
