"""Per-statement profiler for engine-lifecycle (u_*) bench rows.

    python tools/profile_engine_row.py u_constraints u_returning ...

Monkeypatches ``AnalyticsEngine.execute`` with a timing wrapper, runs
the named builder exactly as bench.py does (construction executes the
DDL/DML; the trailing collect is timed separately), and reports per-
statement wall seconds plus the Spark job count each statement issued
(REST API) — the measurement that separates driver-side rewrite cost
from many-small-jobs cost (guide §1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from andb_spark import api  # noqa: E402
from andb_spark.session import build_session  # noqa: E402
from andb_spark.workloads import library_queries  # noqa: E402
from andb_spark.caching import release_caches  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        "andb_engine_profile",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = library_queries()
    base = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]

    def n_jobs() -> int:
        try:
            return len(
                json.load(
                    urllib.request.urlopen(
                        f"{base}/api/v1/applications/{app['id']}/jobs"
                    )
                )
            )
        except Exception:
            return -1

    qs["q1_pricing_summary"](spark, sf).collect()  # warm-up
    release_caches()

    orig = api.AnalyticsEngine.execute
    log: list[tuple[str, float, int]] = []

    def timed(self, sql):
        j0 = n_jobs()
        t0 = time.perf_counter()
        r = orig(self, sql)
        log.append(
            (sql.strip()[:72].replace("\n", " "), time.perf_counter() - t0,
             n_jobs() - j0)
        )
        return r

    api.AnalyticsEngine.execute = timed
    try:
        for name in names:
            log.clear()
            jb0, t0 = n_jobs(), time.perf_counter()
            df = qs[name](spark, sf)
            t_build = time.perf_counter() - t0
            jb1 = n_jobs()
            t1 = time.perf_counter()
            nrows = len(df.collect())
            t_collect = time.perf_counter() - t1
            jb2 = n_jobs()
            print(f"\n=== {name}: build {t_build:.3f}s ({jb1-jb0} jobs), "
                  f"collect {t_collect:.3f}s ({jb2-jb1} jobs), {nrows} rows")
            for stmt, dt, nj in log:
                print(f"  {dt:7.3f}s  {nj:3d} jobs  {stmt}")
            release_caches()
    finally:
        api.AnalyticsEngine.execute = orig


if __name__ == "__main__":
    main()
