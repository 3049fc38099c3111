"""Declarative data-quality checks — the dbt schema-test surface
(SURVEY.md §2.12, T1-T5) as a reusable Spark runner.

Reference tests mirrored: models/stg/schema.yml:4-48 and
models/marts/schema.yml:4-16 — unique / not_null / accepted_values /
conditional not_null (``where``) / relationships-to-dim.

Each check compiles to one aggregate-shaped violation query; the
runner unions them so the whole suite is a handful of jobs, not a
driver-side loop per row. At 100 TB every check is a single scan +
(for unique) one hash aggregation — the same cost model dbt tests
have in-warehouse.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declarative expectation over a column (or expression)."""

    kind: str                      # not_null | unique | accepted_values | relationship | expression
    column: str
    values: tuple = ()             # accepted_values
    where: str | None = None       # conditional gate (T4)
    ref: DataFrame | None = field(default=None, compare=False)  # relationship dim
    ref_column: str | None = None
    expression: str | None = None  # expression kind: SQL predicate that must hold

    @property
    def name(self) -> str:
        suffix = f"_where" if self.where else ""
        return f"{self.kind}_{self.column}{suffix}"


def _violations(df: DataFrame, check: Check) -> DataFrame:
    scoped = df.filter(check.where) if check.where else df
    c = F.col(check.column)
    if check.kind == "not_null":
        return scoped.filter(c.isNull())
    if check.kind == "unique":
        return (
            scoped.filter(c.isNotNull())
            .groupBy(check.column).count().filter(F.col("count") > 1)
        )
    if check.kind == "accepted_values":
        return scoped.filter(c.isNotNull() & ~c.isin(*check.values))
    if check.kind == "relationship":
        assert check.ref is not None and check.ref_column is not None
        dim = check.ref.select(F.col(check.ref_column).alias("__k")).distinct()
        return (
            scoped.filter(c.isNotNull())
            .join(F.broadcast(dim), c == F.col("__k"), "left_anti")
        )
    if check.kind == "expression":
        assert check.expression is not None
        return scoped.filter(~F.expr(check.expression))
    raise ValueError(f"unknown check kind: {check.kind}")


def run_checks(df: DataFrame, checks: list[Check]) -> list[dict]:
    """Evaluate all checks; returns [{name, kind, column, passed,
    n_violations}] (counts only — violations never leave the cluster)."""
    results = []
    for check in checks:
        n = _violations(df, check).count()
        results.append({
            "name": check.name,
            "kind": check.kind,
            "column": check.column,
            "passed": n == 0,
            "n_violations": n,
        })
    return results


def assert_checks(df: DataFrame, checks: list[Check]) -> None:
    """Raise AssertionError listing every failed check."""
    failed = [r for r in run_checks(df, checks) if not r["passed"]]
    if failed:
        lines = ", ".join(f"{r['name']} ({r['n_violations']} violations)" for r in failed)
        raise AssertionError(f"data-quality checks failed: {lines}")


# The reference's shipped test suites (citations in module docstring).
MAUDE_STG_CHECKS: list[Check] = [
    Check("not_null", "mdr_report_key"),
    Check("unique", "mdr_report_key"),
    Check("not_null", "report_number"),
    Check("accepted_values", "event_type",
          values=("Injury", "Malfunction", "Death", "Other", "No Answer Provided")),
    Check("not_null", "narrative_text", where="narrative_len > 0"),
]

MAUDE_FACT_CHECKS: list[Check] = [
    Check("not_null", "event_id"),
    Check("unique", "event_id"),
    Check("not_null", "date_received"),
    Check("not_null", "narrative_text", where="narrative_len > 0"),
]
