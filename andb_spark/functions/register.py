"""SQL-side registration of the engine's extra functions.

The Spark analog of the reference's function catalog
(andb/catalog/function.py:14-136): builtin + user-defined functions
resolvable by name from SQL. We register the vector/text expressions so
``spark.sql("SELECT cosine_distance(a, b) ...")`` works like the
reference's ``SELECT cosine_distance(...)`` (its only builtin).

Registration uses DataFrame-expression-backed SQL functions where the
API allows; otherwise a tiny wrapper. All stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


_SQL_FUNCTION_DEFS = {
    # name -> (argument list, SQL body) — registered as SQL temp functions
    # so they stay pure Catalyst expressions (no Python round-trip).
    "vec_dot": (
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>",
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "vec_norm": (
        "a ARRAY<FLOAT>",
        "sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))",
    ),
    "cosine_similarity": (
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>",
        # try_divide: NULL (not an ANSI DIVIDE_BY_ZERO abort) for a
        # zero-norm vector — mirrors functions/vector.py
        "try_divide(vec_dot(a, b), vec_norm(a) * vec_norm(b))",
    ),
    "cosine_distance": (
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>",
        "1.0 - cosine_similarity(a, b)",
    ),
}


# Each engine open used to re-issue all four CREATE OR REPLACE
# statements — ~0.35 s of driver time per open, paid by every
# lifecycle bench row (r15 ctor profile). The defs never change within
# a process, so one registration per session is equivalent. The flag
# lives ON the session object (r15 verdict #6: a module-level set
# keyed by session pinned every session alive forever; an attribute
# dies with its session).
_REGISTERED_ATTR = "_andb_sql_fns_registered"


def register_all(spark: SparkSession) -> None:
    """Register the engine's SQL functions on the session (once)."""
    if getattr(spark, _REGISTERED_ATTR, False):
        return
    for name, (args, body) in _SQL_FUNCTION_DEFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS DOUBLE RETURN {body}"
        )
    setattr(spark, _REGISTERED_ATTR, True)


def register_udf(
    spark: SparkSession,
    name: str,
    fn,
    return_type: str = "string",
    vectorized: bool = True,
):
    """User-defined function registration — the surface the reference
    declares but never implemented (FunctionKinds.USER_DEFINED='u',
    andb/catalog/function.py:16; lookup raises NotImplementedError,
    function.py:111-121). After registration the function is callable
    from both SQL and the DataFrame API.

    ``vectorized=True`` registers an Arrow-batched pandas UDF
    (``fn(pd.Series, ...) -> pd.Series``) — the only Python-function
    shape acceptable in a hot path at scale. ``vectorized=False``
    registers a row-at-a-time UDF (``fn(*scalars) -> scalar``) for
    convenience parity with the reference's per-tuple ``perform_function``
    (function.py:123-136); its plan shows BatchEvalPython and should
    never sit under a 100 TB scan."""
    if vectorized:
        from pyspark.sql.functions import pandas_udf

        wrapped = pandas_udf(return_type)(fn)
    else:
        from pyspark.sql.functions import udf

        wrapped = udf(fn, return_type)
    spark.udf.register(name, wrapped)
    return wrapped


def register_udaf(spark: SparkSession, name: str, fn, return_type: str = "double"):
    """User-defined AGGREGATE function (absent in the reference — its
    only aggregates are the five builtins, andb/sql/optimizer/logical.py
    :41-46). Registered as an Arrow grouped-agg pandas UDF: ``fn``
    receives each group's column as a pandas Series and returns one
    scalar. Callable from SQL under GROUP BY and from ``df.agg``.

    Scale caveat: a grouped-agg pandas UDF has NO partial aggregation —
    every raw row of a group crosses the shuffle to one task (fine for
    bounded groups, wrong for power-law group sizes). Prefer composing
    builtin aggregates when the math allows; this is the escape hatch
    for genuinely custom math."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    # pandas_udf infers GROUPED_AGG from a Series -> scalar signature;
    # assign annotation OBJECTS directly (this module's `from __future__
    # import annotations` would stringify inline hints, which the
    # inference rejects)
    def _agg(v):
        return fn(v)

    _agg.__annotations__ = {"v": pd.Series, "return": float}

    wrapped = pandas_udf(return_type)(_agg)
    spark.udf.register(name, wrapped)
    return wrapped


def register_udtf(spark: SparkSession, name: str, cls, return_type: str):
    """User-defined TABLE function (the reference stubs FunctionScan
    with ``pass``, physical/select.py:454-455). ``cls`` is a class with
    an ``eval(self, ...)`` generator yielding tuples; after registration
    it is callable in FROM position: ``SELECT * FROM name(args)``.
    Rows stream out via Arrow batches — lateral-join fan-out happens
    executor-side, never on the driver."""
    from pyspark.sql.functions import udtf

    wrapped = udtf(cls, returnType=return_type)
    spark.udtf.register(name, wrapped)
    return wrapped
