"""Vector functions over ``array<float>`` columns.

Parity target: the reference's ``vector`` type (variable-length float
list, andb/catalog/type.py:237-280) and its single builtin
``cosine_distance`` (andb/catalog/buitin_functions.py:3-12, numpy
``dot/(norm*norm)``). Spark has no cosine builtin, so these are column
*expressions* built from ``zip_with``/``aggregate`` — they stay JVM-side
(whole-stage codegen), no Python UDF in the hot path, and vectorize over
100 TB exactly like any other Catalyst expression.

All arithmetic is performed in double precision regardless of the input
element type, which matches numpy's behavior in the reference and keeps
the DuckDB oracle bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double)."""
    a, b = _to_col(a), _to_col(b)
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column (double)."""
    a = _to_col(a)
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = dot / (|a| * |b|); NULL when either vector has zero
    norm (an all-zero embedding — padding rows, empty docs — is
    similarity-undefined). try_divide, because a plain `/` under Spark
    4's default ANSI mode would abort the whole query with
    DIVIDE_BY_ZERO on the first zero vector anywhere in the data."""
    a, b = _to_col(a), _to_col(b)
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """1 - cosine similarity — the reference's builtin
    (buitin_functions.py:12 returns similarity; its docstring says
    distance; we expose both names with conventional semantics)."""
    return F.lit(1.0) - cosine_similarity(a, b)
