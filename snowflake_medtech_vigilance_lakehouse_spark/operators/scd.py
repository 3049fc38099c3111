"""Slowly-changing-dimension maintenance (type 2).

The reference publishes dimension-shaped marts out of a medallion DAG
(README.md:50-58 — device/manufacturer dims feeding the vigilance
queries); a production lakehouse keeps those dims HISTORIZED so
late-arriving facts join to the attributes that were true at event
time. ``scd2_apply`` is the batch SCD2 transition function: one
DataFrame in, one DataFrame out, expressible end-to-end in joins and
unions, so it is fully oracle-checkable and runs wherever the dim
lives (plain parquet, delta_lite via ``merge_delta``/overwrite).

Scale shape: one equi-join of current rows against the update batch on
the dimension key plus one anti-join for brand-new keys — both shuffle
on the same key so the exchange is reused; history rows pass through
untouched with no shuffle. No windows, no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(dim: DataFrame, updates: DataFrame,
               keys: Sequence[str], tracked: Sequence[str], *,
               effective_col: str = "effective_ts",
               valid_from_col: str = "valid_from",
               valid_to_col: str = "valid_to",
               current_col: str = "is_current") -> DataFrame:
    """Apply one batch of attribute updates to an SCD2 dimension.

    ``dim`` carries ``keys``, attribute columns, ``valid_from_col``,
    ``valid_to_col`` (NULL = open) and boolean ``current_col``.
    ``updates`` carries ``keys``, the same attribute columns, and
    ``effective_col`` — the transition instant. PRECONDITION: at most
    one update row per key (one batch = one state transition; feed
    finer-grained feeds through a per-key latest-row reduction first).

    Transition semantics, per key in ``updates``:

    - attributes in ``tracked`` differ (null-safely) from the current
      row -> the current row is CLOSED (``valid_to = effective``,
      ``is_current = false``) and a new open row with the update's
      attributes is born at ``effective``;
    - attributes identical -> no-op (idempotent re-deliveries don't
      spawn empty versions);
    - key absent from the dim -> new open row (late dimension member).

    History rows and current rows without an update pass through
    unchanged. Returns a frame with exactly ``dim``'s columns.
    """
    keys = list(keys)
    sys_cols = {valid_from_col, valid_to_col, current_col}
    attrs = [c for c in dim.columns if c not in sys_cols and c not in keys]
    out_cols = dim.columns
    vt_type = dict(dim.dtypes)[valid_to_col]

    curr = dim.filter(F.col(current_col))
    hist = dim.filter(~F.col(current_col))
    u = updates.select(
        *keys,
        *[F.col(c).alias(f"_u_{c}") for c in attrs],
        F.col(effective_col).alias("_eff"),
    )

    j = curr.join(u, keys, "left")
    diff: Column = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in tracked],
    )
    changed = F.col("_eff").isNotNull() & diff

    untouched = j.filter(~changed).select(*out_cols)
    closed = j.filter(changed).select(
        *[F.col(c) for c in keys],
        *[F.col(c) for c in attrs],
        F.col(valid_from_col),
        F.col("_eff").cast(vt_type).alias(valid_to_col),
        F.lit(False).alias(current_col),
    ).select(*out_cols)
    reborn = j.filter(changed).select(
        *[F.col(c) for c in keys],
        *[F.col(f"_u_{c}").alias(c) for c in attrs],
        F.col("_eff").cast(vt_type).alias(valid_from_col),
        F.lit(None).cast(vt_type).alias(valid_to_col),
        F.lit(True).alias(current_col),
    ).select(*out_cols)
    born = (
        u.join(curr.select(*keys), keys, "left_anti")
        .select(
            *[F.col(c) for c in keys],
            *[F.col(f"_u_{c}").alias(c) for c in attrs],
            F.col("_eff").cast(vt_type).alias(valid_from_col),
            F.lit(None).cast(vt_type).alias(valid_to_col),
            F.lit(True).alias(current_col),
        ).select(*out_cols)
    )
    return hist.select(*out_cols).unionByName(untouched).unionByName(
        closed).unionByName(reborn).unionByName(born)
