"""Data-layout clustering: Z-order (Morton) keys for multi-column
data skipping.

A linear sort concentrates file-level min/max ranges for ONE column;
queries filtering on a second column still touch every file. Z-order
interleaves the bits of equal-depth bucket ranks of k columns so that
files carry narrow ranges on ALL k — the layout half of the
"micro-partition pruning" the managed reference gets implicitly, and
what real lakehouses run as OPTIMIZE ZORDER BY.

Shape at 100 TB: rank boundaries come from ``approxQuantile`` (a
sample-based sketch, one lightweight job, small driver array); the key
itself is a pure column expression (bit arithmetic over codegen'd
comparisons — no UDF, no window, no global sort). Writers range-
partition on the key, so the only shuffle is the one the rewrite
already pays.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def zorder_key(df: DataFrame, cols: Sequence[str], *, bits: int = 8,
               relative_error: float = 0.01) -> Column:
    """Morton key over ``cols`` as a long Column: each column is ranked
    into ``2**bits`` equal-depth buckets (boundaries via
    ``approxQuantile`` on ``df``) and the bucket bits are interleaved.
    Supports numeric, date and timestamp columns (temporal ranks via
    their epoch numbers); NULLs rank into bucket 0.

    ``bits * len(cols)`` must fit a signed long (<= 62). bits=8 i.e.
    256 buckets per column is plenty: skipping granularity is files,
    and a table with more than 256 files per bucket combination should
    raise ``bits``, not expect finer quantiles to matter."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*len(cols) = {bits * len(cols)} exceeds a long")
    dtypes = dict(df.dtypes)
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    buckets: list[Column] = []
    for c in cols:
        t = dtypes[c]
        if t == "date":
            num = F.datediff(F.col(c), F.lit("1970-01-01").cast("date")).cast("double")
            ranked_df = df.select(num.alias("_zq"))
        elif t.startswith("timestamp"):
            num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
            ranked_df = df.select(num.alias("_zq"))
        elif t in _NUMERIC or t.startswith("decimal"):
            num = F.col(c).cast("double")
            ranked_df = df.select(num.alias("_zq"))
        elif t == "string":
            # strings rank by hash: equality predicates (and the
            # equality half of IN-lists) still skip via file min/max
            # of co-located hash buckets, but RANGE predicates on the
            # string don't benefit — document at the call site
            num = F.xxhash64(F.col(c)).cast("double")
            ranked_df = df.select(num.alias("_zq"))
        else:
            raise ValueError(f"zorder_key: unsupported type {t} for {c}")
        qs = ranked_df.stat.approxQuantile("_zq", probs, relative_error)
        # repeated cutpoints (skewed data) are harmless: the bucket
        # expression is monotone in the value either way
        arr = F.array(*[F.lit(float(b)) for b in qs])
        buckets.append(
            F.size(F.filter(arr, lambda b: b <= num)).cast("long")
        )
    z = F.lit(0).cast("long")
    k = len(cols)
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j)
    return z
