"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``andb_spark`` package (see SURVEY.md §7);
this file is the thin aggregation layer.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from andb_spark.workloads import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from andb_spark.workloads.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    north-star LLM-pipeline/vector/streaming ops."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins — one per ``queries()`` entry.
    Every exported name is oracle-gradeable: the seven ops whose
    results are engine-specific by nature (sketch estimates, Bloom
    screens, iterative training — q_approx_distinct, q_approx_quantile,
    q_hll_distinct, t_approx_topk, d_bloom_dedup, v_kmeans, v_pq_topk)
    live in the workloads LIBRARY instead (r7 verdict #4 registry
    hygiene: `workloads.LIBRARY_ONLY`), graded through their
    deterministic oracle-backed invariant-bound twins here plus
    accuracy unit tests (tests/test_operators.py); bench.py still
    times them via ``workloads.library_queries()``."""
    return all_oracles()
