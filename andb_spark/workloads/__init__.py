"""Workload registry.

Each submodule defines ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB-runnable ANSI SQL). The
driver contract (``__spark_entry__.py``) aggregates them here. Every row
of SURVEY.md §2's operator inventory maps to at least one named query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from andb_spark.workloads import relational, tpch_extra, pipeline, vectors, streaming_q


_MODULES = (relational, tpch_extra, pipeline, vectors, streaming_q)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
