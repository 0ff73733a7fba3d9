"""Dump ``explain("formatted")`` for registry queries to files.

    python tools/explain_dump.py --out plans/r15 --suffix before [name ...]

With no names, dumps every bench HEADLINE query. Engine-lifecycle rows
(u_*) execute their DDL/DML while the builder constructs the returned
DataFrame; the captured plan is the final SELECT the bench collects —
the same object the driver hashes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from andb_spark.session import build_session  # noqa: E402
from andb_spark.workloads import library_queries  # noqa: E402


def explain_formatted(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    args = sys.argv[1:]
    out_dir, suffix, names = "plans/r15", "before", []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("andb_explain")
    qs = library_queries()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    for name in names:
        try:
            df = qs[name](spark, sf)
            txt = explain_formatted(df)
        except Exception as e:  # capture the failure instead of dying
            txt = f"EXPLAIN FAILED: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
        from andb_spark.operators.dedup import release_caches

        release_caches()


if __name__ == "__main__":
    main()
