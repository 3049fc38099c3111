"""Aggregate expression helpers.

The only exotic aggregate in the reference is ordered LISTAGG; Spark's
``listagg``/``collect_list`` are order-nondeterministic after a shuffle,
so determinism is restored by collecting (key, value) structs and
sorting the array before joining — a pure built-in composition that
keeps map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_listagg(value: Column, order_by: Column, sep: str = "\n") -> Column:
    """``LISTAGG(value, sep) WITHIN GROUP (ORDER BY order_by)`` with
    deterministic order; NULL values are dropped (LISTAGG semantics) and
    an all-NULL group yields '' (matching Snowflake LISTAGG, which
    returns '' not NULL when every piece is NULL).

    Reference: models/stg/stg_maude.sql:72,75.
    """
    pairs = F.collect_list(
        F.when(value.isNotNull(), F.struct(order_by.alias("k"), value.alias("v")))
    )
    sorted_vals = F.transform(F.array_sort(pairs), lambda s: s["v"])
    return F.array_join(sorted_vals, sep)


def first_non_blank(value: Column, *, trim_blank: bool = True) -> Column:
    """``MAX(IFF(NULLIF(TRIM(v),'') IS NOT NULL, v, NULL))`` — pick one
    non-blank value per group (MAX makes the pick deterministic).

    Reference: models/stg/stg_maude.sql:35-42.
    """
    if trim_blank:
        cond = F.trim(value) != ""
        return F.max(F.when(value.isNotNull() & cond, value))
    return F.max(value)


def max_if(cond: Column, value: Column) -> Column:
    """``MAX(IFF(cond, value, NULL))`` — conditional aggregate (A2)."""
    return F.max(F.when(cond, value))
