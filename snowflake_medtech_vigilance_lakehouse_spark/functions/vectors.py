"""Vector expression helpers over ``array<float|double>`` columns.

All JVM-side (``zip_with`` + ``aggregate``), no Python in the loop:
on a 100 TB table the dot product runs inside codegen per row. Inputs
are cast to double first so scores are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array columns (double)."""
    prod = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column (double)."""
    sq = F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm.

    Backs the k-NN similar-case search the reference declares
    (README.md:60,72,116) and the embedding-cosine near-dup operator.

    Inline form — evaluates THREE interpreted folds per call (HOF
    lambdas are not codegen'd). Inside a pair join, hoist the norms
    to per-row projections on each side and use
    ``cosine_from_norms`` instead: bit-identical (same fold per
    vector, same divide) at a third of the per-pair work.
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def cosine_from_norms(a: Column, b: Column,
                      norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed side norms; NULL on zero norm.

    FP-identical to ``cosine_similarity``: ``norm_a``/``norm_b`` must
    be ``l2_norm`` of the same vectors, so the product and divide see
    the exact same doubles — only *where* the norm fold runs moves
    (once per row pre-join instead of once per pair post-join)."""
    denom = norm_a * norm_b
    return F.when(denom != 0, dot(a, b) / denom)
