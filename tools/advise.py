"""Workload reuse advisor CLI (plans/reuse.py — SparkCruise-style).

Fingerprints every registered query's parquet scans from the static
optimized plan and prints ranked materialization recommendations.
Fingerprinting itself never executes a plan; a few query BUILDERS do
run driver-side setup (k-means iterations, the Bloom build, streaming
entries), so expect a handful of small jobs. Usage:

    python tools/advise.py [sf_dir] [min_queries]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    min_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import SparkSession

    from andb_spark.plans.reuse import analyze_workload, recommendations
    from andb_spark.session import tune_for_session
    from andb_spark.workloads import library_queries as all_queries

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_session(spark)

    report = analyze_workload(all_queries(), spark, sf_dir)
    n_sigs = len(report.scans)
    n_queries = len({q for qs in report.scans.values() for q in qs})
    print(f"fingerprinted {n_sigs} scan signatures across {n_queries} queries")
    if report.errors:
        # surface builder failures in the CLI output — the whole point
        # of recording them (plans/reuse.py) is that a silent skip
        # would hide genuine regressions
        print(f"{len(report.errors)} query builder(s) FAILED:")
        for name, err in sorted(report.errors.items()):
            print(f"    {name}: {err}")
    for rec in recommendations(report, min_queries=min_queries):
        cols = ", ".join(rec["columns"])
        print(
            f"[{rec['kind']}] {rec['table']}({cols}) — "
            f"serves {rec['n_queries']} queries"
        )
        if rec.get("filters"):
            print(f"    filters: {', '.join(rec['filters'])}")
        print(f"    queries: {', '.join(rec['queries'][:8])}"
              + (" …" if len(rec["queries"]) > 8 else ""))
    spark.stop()


if __name__ == "__main__":
    main()
