"""Skew mitigation helpers.

AQE's skew-join splitting handles join-side skew automatically; these
helpers cover the aggregation-side heavy-hitter case (one manufacturer
is 30% of all adverse events): salt the group key so the first
aggregation fans the hot key across the cluster, then combine the
partials. Only valid for associative/commutative aggregates — exactly
the partial-aggregation contract Spark itself uses map-side.
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
    """
    for fn, _, _ in aggs:
        if fn not in _MERGEABLE:
            raise ValueError(f"non-mergeable aggregate: {fn}")
    salt = (F.spark_partition_id() % F.lit(num_salts)).alias("_salt")
    partial_exprs = [
        _MERGEABLE[fn][0](F.col(col)).alias(f"_p_{alias}") for fn, col, alias in aggs
    ]
    final_exprs = [
        _MERGEABLE[fn][1](F.col(f"_p_{alias}")).alias(alias) for fn, _, alias in aggs
    ]
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
