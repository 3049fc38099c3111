"""Temporal operators Spark lacks as built-ins: as-of join and
gap-based sessionization, composed from joins + windows (SURVEY.md
"custom operators" tier (a): composition of existing DataFrame ops).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              left_ts: str, right_ts: str,
              direction: str = "backward",
              suffix: str = "_r") -> DataFrame:
    """As-of join: for each left row, attach the single right row with
    the same key whose timestamp is the latest <= left's timestamp
    ('backward'; 'forward' = earliest >=). Unmatched left rows survive
    with NULLs (left-join semantics). Ties on the right timestamp break
    deterministically: first by the right columns ascending (NULLs
    last), in column order.

    Shape: union-merge. Both sides are tagged and unioned on a common
    time axis, then ONE window per key carries the most recent right
    row forward with ``last(struct, ignorenulls=True)``; left rows read
    the carried value. One shuffle (the window partitioning), no join,
    no fan-out — each right row is materialized once regardless of how
    many left rows it matches, so a hot key with n left x m right rows
    costs O((n+m) log(n+m)) sort instead of the O(n*m) intermediate a
    range join produces. This is the plan that survives 100 TB; for
    repeated use, pre-bucketing both tables on `on` makes the shuffle
    free too.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    lt, rt = ltypes[left_ts], rtypes[right_ts]
    if lt == rt:
        common = lt
    elif {lt, rt} == {"date", "timestamp"}:
        common = "timestamp"
    elif {lt, rt} == {"date", "timestamp_ntz"}:
        common = "timestamp_ntz"
    else:
        raise ValueError(f"incompatible as-of types: {lt} vs {rt}")

    lstruct = F.struct(*[F.col(c) for c in left.columns])
    rstruct = F.struct(*[F.col(c) for c in right.columns])
    # NULL key / NULL ts right rows can never match (join condition
    # would be NULL); drop them so the carry never picks one up.
    r_clean = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())

    # _ord<i> columns expose the right payload to the window ORDER BY;
    # they are NULL on left rows (side flag already separates sides).
    ord_names = [f"_ord{i}" for i in range(len(right.columns))]
    lpart = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast(common).alias("_ats"),
        F.lit(1).alias("_side"),
        lstruct.alias("_l"),
        F.lit(None).cast(right.select(rstruct).schema[0].dataType).alias("_r"),
        *[F.lit(None).cast(rtypes[c]).alias(n)
          for c, n in zip(right.columns, ord_names)],
    )
    rpart = r_clean.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast(common).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(lstruct).schema[0].dataType).alias("_l"),
        rstruct.alias("_r"),
        *[F.col(c).alias(n) for c, n in zip(right.columns, ord_names)],
    )
    merged = lpart.unionByName(rpart)

    # Window order: time axis (reversed for 'forward'), right rows
    # before left rows at equal ts (inclusive <=/>= semantics), and
    # same-ts right rows reversed on the tiebreak columns so the
    # deterministic winner (min by right cols asc-nulls-last) is the
    # row last() sees. NULL-ts left rows sort first -> empty frame ->
    # NULL result, matching the join-condition-is-NULL behavior.
    ts_key = (F.col("_ats").asc_nulls_first() if direction == "backward"
              else F.col("_ats").desc_nulls_first())
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_key, F.col("_side").asc(),
                 *[F.col(n).desc_nulls_first() for n in ord_names])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        merged
        .select("_side", "_l", F.last("_r", ignorenulls=True).over(w).alias("_rc"))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_rc.{c}").alias(c + suffix if c in left.columns else c)
        for c in right.columns
    ]
    return carried.select(*out_cols)


def _axis_seconds(df: DataFrame, col: str) -> Column:
    """Monotone numeric axis (seconds since epoch wall time) for a
    timestamp / timestamp_ntz / date / numeric column. timestampdiff
    against an NTZ epoch literal is the one formulation Spark accepts
    for all three temporal types, and it is session-TZ-free for NTZ
    and DATE."""
    dtype = dict(df.dtypes)[col]
    if dtype in ("timestamp", "timestamp_ntz", "date"):
        return F.expr(
            f"timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', `{col}`)"
        )
    return F.col(col).cast("bigint")


def interval_join(left: DataFrame, right: DataFrame, *, left_ts: str,
                  right_start: str, right_end: str,
                  on: str | None = None,
                  band_seconds: int = 7 * 86400,
                  how: str = "inner",
                  suffix: str = "_r") -> DataFrame:
    """Range (interval containment) join: each left row matches right
    rows whose ``[right_start, right_end]`` (inclusive both ends)
    contains ``left_ts``, optionally also keyed on ``on``. ``how`` is
    'inner' or 'left'.

    Spark has no range-join optimization, so a naive non-equi join
    plans as BroadcastNestedLoopJoin (or a per-key cartesian) — the
    O(n*m) cliff. This is the standard banding rewrite instead: the
    time axis is cut into ``band_seconds`` buckets, each right
    interval EXPLODES into every band it covers, the left point joins
    its single band with a plain hash equi-join, and the exact range
    predicate rides along in the join condition. Cost is
    O(n + m * bands_per_interval) shuffled rows — pick ``band_seconds``
    near the typical interval length so intervals explode into ~1-2
    bands. NULL or inverted intervals and NULL points never match
    (and null-extend under 'left'), like the plain non-equi join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    band = F.lit(int(band_seconds))
    l2 = left.withColumn(
        "_band", F.floor(_axis_seconds(left, left_ts) / band).cast("long")
    ).alias("l")
    r2 = (
        right
        .withColumn("_b0", F.floor(_axis_seconds(right, right_start) / band).cast("long"))
        .withColumn("_b1", F.floor(_axis_seconds(right, right_end) / band).cast("long"))
        .filter(F.col("_b1") >= F.col("_b0"))
        .withColumn("_band", F.explode(F.sequence("_b0", "_b1")))
        .drop("_b0", "_b1")
        .alias("r")
    )
    cond = (
        (F.col("l._band") == F.col("r._band"))
        & (F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}"))
        & (F.col(f"l.{left_ts}") <= F.col(f"r.{right_end}"))
    )
    if on is not None:
        cond = cond & (F.col(f"l.{on}") == F.col(f"r.{on}"))
    out_cols = [F.col(f"l.{c}") for c in left.columns]
    out_cols += [
        F.col(f"r.{c}").alias(c + suffix if c in left.columns else c)
        for c in right.columns
    ]
    return l2.join(r2, cond, how).select(*out_cols)


def gapfill_locf(df: DataFrame, *, key: str, day_col: str,
                 value_cols: Sequence[str]) -> DataFrame:
    """Dense daily scaffold per key with last-observation-carried-
    forward (the TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape
    over a sparse per-(key, day) aggregate).

    For every key, days between its first and last observation are
    generated with ``sequence()`` (one array per key, exploded — no
    driver-side calendar), observations left-join back on (key, day),
    and each value column gains a ``<col>_locf`` twin filled by
    ``last(col, ignorenulls=True)`` over the per-key day order. Plan:
    one tiny per-key bounds aggregate, one join, one window — all
    partitioned by the key, no global stage anywhere.
    """
    bounds = df.groupBy(key).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    scaffold = bounds.select(
        key, F.explode(F.sequence("_d0", "_d1")).alias(day_col)
    )
    joined = scaffold.join(df, [key, day_col], "left")
    w = (
        Window.partitionBy(key).orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for c in value_cols:
        out = out.withColumn(f"{c}_locf", F.last(c, ignorenulls=True).over(w))
    return out


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


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Ordered funnel analysis: how many users performed the ``steps``
    event types IN ORDER (each step strictly after the previous one's
    first qualifying occurrence — the standard product-analytics
    funnel). Returns one row per step: (step_idx, step, n_users,
    conv), where conv is the conversion rate from step 1.

    Shape: per step, a filtered aggregation keyed on the user joined
    to the previous step's first-completion time — k-1 equi-joins and
    k aggregations, ALL keyed on the user column, so every exchange
    after the first is reused; no windows over the event stream, no
    per-user sorting of full histories. The per-step count frames are
    k single-row aggregates; the conversion ratio is a window over
    those k rows (driver-scale, not data-scale)."""
    from pyspark.sql.window import Window

    cur = None
    count_frames = []
    for i, st in enumerate(steps):
        e = events.filter(F.col(type_col) == st).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"))
        if cur is None:
            cur = e.groupBy("_u").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                e.join(cur.select("_u", "_t"), "_u")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("_u").agg(F.min("_ts").alias("_t"))
            )
        count_frames.append(cur.agg(
            F.count(F.lit(1)).cast("long").alias("n_users")
        ).select(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(st).alias("step"), "n_users",
        ))
    out = count_frames[0]
    for fr in count_frames[1:]:
        out = out.unionByName(fr)
    w = Window.orderBy("step_idx").rowsBetween(Window.unboundedPreceding, 0)
    return out.select(
        "step_idx", "step", "n_users",
        F.round(F.col("n_users").cast("double")
                / F.first("n_users").over(w).cast("double"), 6).alias("conv"),
    )


def cohort_retention(events: DataFrame, *, key: str = "user_id",
                     ts: str = "ts") -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by first-seen
    week (date_trunc 'week' — Monday start in both Spark and DuckDB),
    counted in every later week they return, with retention as a
    fraction of the cohort's week-0 size.

    Returns (cohort_week ISO date string, week_offset, n_users,
    retention) — one row per (cohort, offset) that has activity.

    100 TB shape: the first-seen week is a MIN window over the user
    partition (one exchange on the user key — no join back to the
    event table), activity collapses to DISTINCT (user, cohort,
    offset) before counting (the count exchange carries user-weeks,
    not raw events), and the week-0 denominator is a window over the
    tiny aggregated matrix, not a second pass."""
    wk = F.date_trunc("week", F.col(ts)).cast("date")
    activity = (
        events.select(F.col(key).alias("_u"), wk.alias("_wk"))
        .withColumn("_cw", F.min("_wk").over(Window.partitionBy("_u")))
        .select(
            "_u", "_cw",
            (F.datediff(F.col("_wk"), F.col("_cw")) / 7)
            .cast("long").alias("_off"),
        )
        .distinct()
    )
    agg = activity.groupBy("_cw", "_off").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"))
    w_cohort = Window.partitionBy("_cw")
    base = F.max(F.when(F.col("_off") == 0, F.col("n_users"))).over(w_cohort)
    return agg.select(
        F.date_format("_cw", "yyyy-MM-dd").alias("cohort_week"),
        F.col("_off").alias("week_offset"),
        "n_users",
        F.round(F.col("n_users").cast("double") / base.cast("double"),
                6).alias("retention"),
    )
