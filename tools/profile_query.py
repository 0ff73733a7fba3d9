"""Stage-level profiler for registry queries — the feedback loop behind
SCALE.md's plan audits.

    python tools/profile_query.py d_minhash_lsh [more names...] \
        [--sf /root/testdata/sf0.1] [--runs 3]

Runs each named query bench-faithfully (best-of-N wall time with the
shared operator caches released between runs, exactly like bench.py),
then prints the top completed stages by executor run time from the
Spark UI REST API — the measurement that located the r6 minhash
1-task-stage bottleneck (SCALE.md §7 "Minhash drift, root-caused").
A stage with tasks=1 under a multi-core session is the thing to look
for: data too small to split (single parquet row group) pinning a
CPU-bound stage to one core.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from andb_spark.session import build_session  # noqa: E402
from andb_spark.workloads import library_queries as all_queries  # noqa: E402
from andb_spark.caching import release_caches  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {
        a.split("=", 1)[0]: a.split("=", 1)[1]
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    }
    sf = flags.get("--sf", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    runs = int(flags.get("--runs", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not args:
        print(__doc__)
        sys.exit(2)

    spark = build_session(
        "andb_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "true",  # the REST API is the product here
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = all_queries()
    unknown = [n for n in args if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        sys.exit(2)

    qs["q1_pricing_summary"](spark, sf).collect()  # JVM/codegen warm-up
    release_caches()

    for name in args:
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, sf).collect()
            times.append(round(time.perf_counter() - t0, 3))
            release_caches()
        print(f"{name}: best-of-{runs} {min(times)}s  runs={times}")

    base = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app['id']}/stages?status=COMPLETE"
        )
    )
    print("\ntop stages by executor run time (all runs above):")
    for s in sorted(stages, key=lambda x: -x.get("executorRunTime", 0))[:15]:
        flag = "  <-- 1-task stage" if s["numCompleteTasks"] == 1 else ""
        print(
            f"  stage {s['stageId']:>4}: "
            f"execRunTime={s['executorRunTime'] / 1000:6.1f}s "
            f"tasks={s['numCompleteTasks']:>3} "
            f"shufW={s.get('shuffleWriteBytes', 0) >> 20:>4}MB "
            f"shufR={s.get('shuffleReadBytes', 0) >> 20:>4}MB{flag}"
        )


if __name__ == "__main__":
    main()
