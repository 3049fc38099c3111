"""Governance policies as reusable view-layer transforms (G1 masking,
G2 row access; README.md:63,128-133 — the Spark analog of Snowflake
policy objects: declarative rules compiled into a projection/filter,
applied when building the published view so no un-policied path
exists).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MaskingRule:
    """Column-level masking: when ``condition`` (a Column or SQL string
    evaluated per row; None = always) does NOT hold, the column is
    replaced by ``masker(col)`` — default: NULL out."""

    column: str
    condition: object = None        # Column | str | None
    masker: Callable[[Column], Column] | None = None

    def apply(self) -> Column:
        c = F.col(self.column)
        masked = self.masker(c) if self.masker else F.lit(None).cast("string")
        if self.condition is None:
            return masked.alias(self.column)
        cond = F.expr(self.condition) if isinstance(self.condition, str) else self.condition
        return F.when(cond, c).otherwise(masked).alias(self.column)


def sha2_pseudonymize(prefix: str = "") -> Callable[[Column], Column]:
    """Masker: stable sha256 pseudonym (joinable, not reversible)."""
    return lambda c: F.sha2(F.concat(F.lit(prefix), c.cast("string")), 256)


def partial_mask(keep_last: int = 4, fill: str = "*") -> Callable[[Column], Column]:
    """Masker: keep the last N characters, star the rest."""
    return lambda c: F.concat(
        F.repeat(F.lit(fill), F.greatest(F.length(c) - keep_last, F.lit(0))),
        F.substring(c, -keep_last, keep_last),
    )


def apply_policies(df: DataFrame, *,
                   row_policy: object = None,
                   masking: Sequence[MaskingRule] = ()) -> DataFrame:
    """Build the governed view: row policy filters first (masked
    columns must not influence row visibility), then masking rules
    rewrite their columns in place; untouched columns pass through."""
    out = df
    if row_policy is not None:
        pred = F.expr(row_policy) if isinstance(row_policy, str) else row_policy
        out = out.filter(pred)
    by_col = {r.column: r for r in masking}
    # a policy naming a missing column must fail loudly — a silently
    # skipped masking rule is a data leak waiting to happen
    unknown = set(by_col) - set(out.columns)
    if unknown:
        raise ValueError(f"masking rules reference unknown columns: {sorted(unknown)}")
    return out.select(
        *[by_col[c].apply() if c in by_col else F.col(c) for c in out.columns]
    )
