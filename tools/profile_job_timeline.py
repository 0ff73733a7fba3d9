"""Job-timeline profiler for registry queries — finds ZERO-JOB driver
gaps (Catalyst analysis, py4j plan construction, collect conversion)
that stage-level profiling cannot see.

    python tools/profile_job_timeline.py d_incremental_minhash [...] \
        [--runs 3]

Runs each named query bench-faithfully (caches released between runs),
then prints the per-job timeline of the LAST run: job id, description
prefix, submission offset, wall, task count — and the gap since the
previous job finished. The sum of gaps is the driver-side time no
executor was working; large single gaps before the first job are plan
construction + analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from andb_spark.session import build_session  # noqa: E402
from andb_spark.workloads import library_queries  # noqa: E402
from andb_spark.caching import release_caches  # noqa: E402


def _iso_ms(s: str) -> float:
    from datetime import datetime

    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {
        a.split("=", 1)[0]: a.split("=", 1)[1]
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    }
    runs = int(flags.get("--runs", "3"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        "andb_timeline",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = library_queries()
    base = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]

    def jobs_after(jid0: int):
        js = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app['id']}/jobs?status=succeeded"
            )
        )
        return sorted(
            (j for j in js if j["jobId"] >= jid0), key=lambda j: j["jobId"]
        )

    qs["q1_pricing_summary"](spark, sf).collect()  # warm-up
    release_caches()

    for name in names:
        times = []
        for i in range(runs):
            all_before = json.load(
                urllib.request.urlopen(
                    f"{base}/api/v1/applications/{app['id']}/jobs"
                )
            )
            jid0 = 1 + max((j["jobId"] for j in all_before), default=-1)
            t0 = time.perf_counter()
            df = qs[name](spark, sf)
            t_build = time.perf_counter() - t0
            n = len(df.collect())
            wall = time.perf_counter() - t0
            times.append(round(wall, 3))
            release_caches()
        print(
            f"\n=== {name}: best-of-{runs} {min(times)}s runs={times} "
            f"(last build {t_build:.3f}s, {n} rows)"
        )
        js = jobs_after(jid0)
        if not js:
            print("  (no jobs)")
            continue
        origin = _iso_ms(js[0]["submissionTime"])
        prev_end = t0 and origin  # gaps measured from first submission
        total_gap = 0.0
        for j in js:
            sub = _iso_ms(j["submissionTime"]) - origin
            end = _iso_ms(j["completionTime"]) - origin
            gap = max(0.0, sub - (prev_end - origin))
            total_gap += gap
            prev_end = _iso_ms(j["completionTime"])
            desc = (j.get("description") or j["name"])[:60]
            print(
                f"  job {j['jobId']:>4} sub+{sub:6.3f}s wall "
                f"{end - sub:6.3f}s gap {gap:6.3f}s "
                f"tasks={j['numCompletedTasks']:>3}  {desc}"
            )
        span = prev_end - origin
        print(
            f"  jobs span {span:.3f}s, inter-job gaps {total_gap:.3f}s, "
            f"pre-first-job {wall - span:.3f}s of the {wall:.3f}s wall"
        )


if __name__ == "__main__":
    main()
