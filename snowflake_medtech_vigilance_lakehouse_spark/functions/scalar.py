"""Scalar expression helpers.

Each helper reproduces a Snowflake-dialect construct used by the
reference (citations are ``file:line`` into ``/root/reference/``),
expressed with built-in ``pyspark.sql.functions`` so Catalyst folds
constants and the whole expression stays in codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullif_blank(c: Column) -> Column:
    """``NULLIF(TRIM(x), '')`` — blank-to-NULL normalization.

    Reference: models/stg/stg_maude.sql:35-41,53.
    """
    t = F.trim(c)
    return F.when(t == "", None).otherwise(t)


def norm_upper(c: Column) -> Column:
    """``UPPER(TRIM(x))`` — the seed-join key normalization.

    Reference: models/marts/fact_adverse_events.sql:25,35.
    """
    return F.upper(F.trim(c))


def parse_yyyymmdd(c: Column) -> Column:
    """``PARSE_YYYYMMDD(s)`` — 'yyyyMMdd' string to DATE, NULL on
    malformed input (never an error).

    Reference: models/stg/stg_maude.sql:8-9 (custom Snowflake UDF in
    MEDTECH.PUBLIC). ``try_to_date`` keeps lenient semantics even under
    ANSI mode; also guard non-8-char strings which some parsers coerce.
    """
    s = F.trim(c)
    return F.when(s.rlike(r"^\d{8}$"), F.try_to_date(s, "yyyyMMdd"))


def quarter_label(d: Column) -> Column:
    """``TO_CHAR(date, 'YYYY-"Q"Q')`` -> e.g. ``2024-Q3``.

    Reference: models/marts/fact_adverse_events.sql:70,
    models/marts/ae_counts_q.sql:19. Spark's date_format has no quarter
    token, so compose year/quarter explicitly.
    """
    return F.concat(F.year(d).cast("string"), F.lit("-Q"), F.quarter(d).cast("string"))


def quarter_index(d: Column) -> Column:
    """``year*4 + quarter`` — monotone numeric sort key for quarters.

    Reference: models/marts/ae_counts_q.sql:18.
    """
    return (F.year(d) * F.lit(4) + F.quarter(d)).cast("int")


# The five normalized event-type buckets (models/stg/schema.yml:21-23).
_EVENT_TYPE_KNOWN = ("INJURY", "MALFUNCTION", "DEATH")
_EVENT_TYPE_MISSING = ("N/A", "NA", "UNKNOWN", "NOT AVAILABLE")


def normalize_event_type(c: Column,
                         known: Sequence[str] = _EVENT_TYPE_KNOWN,
                         missing: Sequence[str] = _EVENT_TYPE_MISSING,
                         missing_label: str = "No Answer Provided",
                         other_label: str = "Other") -> Column:
    """The staging event-type normalizer: known values -> INITCAP, blank/
    NULL/N-A variants -> 'No Answer Provided', everything else -> 'Other'.

    Reference: models/stg/stg_maude.sql:11-18.
    """
    u = F.upper(F.trim(c))
    return (
        F.when(u.isin(*known), F.initcap(F.trim(c)))
        .when(c.isNull() | (F.trim(c) == "") | u.isin(*missing), F.lit(missing_label))
        .otherwise(F.lit(other_label))
    )


def keyword_classifier(c: Column, rules: Sequence[tuple[str, str]],
                       default: str | None = None) -> Column:
    """First-match-wins ``ILIKE '%kw%'`` keyword classifier.

    ``rules`` is an ordered list of ``(keyword, label)``; case-insensitive
    substring match, NULL when nothing matches (like the reference's
    failure-mode CASE, models/marts/fact_adverse_events.sql:77-86).
    """
    expr: Column | None = None
    for kw, label in rules:
        cond = c.ilike(f"%{kw}%")
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None, "keyword_classifier needs at least one rule"
    return expr.otherwise(F.lit(default))


# Reference failure-mode ruleset, models/marts/fact_adverse_events.sql:77-86.
FAILURE_MODE_RULES: tuple[tuple[str, str], ...] = (
    ("LEAK", "LEAK"),
    ("FRACTURE", "FRACTURE"),
    ("BREAK", "FRACTURE/BREAK"),
    ("THROMB", "THROMBUS/CLOT"),
    ("INFECTION", "INFECTION"),
    ("DISLODG", "DISLODGEMENT"),
    ("MIGRAT", "MIGRATION"),
)


def sha2_key(*parts: Column, sep: str = "|") -> Column:
    """Surrogate key: ``SHA2(COALESCE(p1,'') || '|' || ..., 256)``.

    Reference: models/marts/fact_adverse_events.sql:43-49. NULL parts
    collapse to '' before concatenation so the key is total.
    """
    padded = [F.coalesce(p.cast("string"), F.lit("")) for p in parts]
    return F.sha2(F.concat_ws(sep, *padded), 256)
