"""Benchmark harness — run the headline queries and print ONE JSON line.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Output: {"metric": "headline_total_sec", "value": N, "unit": "sec",
         "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute + collect) after a single
warm-up action that absorbs JVM/session startup. The headline set spans
the engine's pillars: scan+agg, star join, window, dedup (exact + LSH),
vector top-k, text scoring, as-of join, streaming-window batch twin.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from andb_spark.session import build_session  # noqa: E402
from andb_spark.workloads import library_queries  # noqa: E402

# The r1 headline set (BENCH_r01 baseline: 13.915 s total at sf0.1).
# Kept intact so the 2x BASELINE.md rule compares like for like — the
# JSON line reports their subtotal separately as r01_subset_sec.
HEADLINE_R01 = (
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q10_returned_revenue",
    "q14_type_revenue_ratio",
    "q18_large_orders",
    "q_window_funcs",
    "q_topk_per_group",
    "q_sessionize",
    "d_exact_dedup",
    "d_minhash_lsh",
    "d_bloom_dedup",
    "t_lang_quality",
    "t_chunking",
    "v_cosine_topk",
    "a_asof_join",
    "s_tumbling",
    "s_session",
)

# Queries promoted into the driver's correctness spotlight in r2
# (workloads/__init__.py::DRIVER_SPOTLIGHT) — tracked from the start so
# every driver-graded family has a wall-time history. Streaming
# readStream queries stay out (their fixed micro-batch startup swamps
# data throughput; the batch twins above time the same plans).
HEADLINE_R02 = (
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "q_window_navigation",
    "q_cte",
    "a_range_join",
    "d_dup_components",
    "d_incremental_minhash",
    "v_ivf_topk",
    "v_knn_join",
    "p_split",
    "p_pipeline_e2e",
    "m_image_meta",
)

# Queries promoted into the driver spotlight in r3: real-codec decode
# round trips, the DML write path, the system catalog — plus the LSH
# recall audit (ADVICE r2: it had no standing execution anywhere).
HEADLINE_R03 = (
    "m_image_decode",
    "m_audio_decode",
    "u_dml_roundtrip",
    "u_matview_refresh",
    "u_clone_snapshot",
    "c_catalog_tables",
    "d_lsh_recall_audit",
    "v_hybrid_rrf",
)

# Queries rotated into the driver spotlight in r4 (first-time driver
# evidence — VERDICT r3 #2). Streaming readStream queries stay out, as
# before.
HEADLINE_R04 = (
    "q4_priority_exists",
    "q13_customer_distribution",
    "q19_or_of_ands",
    "q22_idle_customers",
    "d_simhash_pairs",
    "d_passage_scrub",
    "t_bm25_topk",
    "t_tfidf",
    "t_pii_scrub",
    "p_sample_weighted",
    "v_lsh_topk",
    "v_rerank_topk",
    "m_audio_meta",
    # engine-surface rows added mid-r4 (oracle-checked statement
    # lifecycles: TRUNCATE+INSERT OVERWRITE+RESTORE, BEGIN..ROLLBACK/
    # COMMIT, metadata-only ALTER)
    "u_restore_timetravel",
    "u_txn_rollback",
    "u_alter_schema",
)

# Queries rotated into the driver spotlight in r5/r6 that carry no
# wall-time history yet — one representative per new surface (the rest
# of those rotations are variants of already-tracked plans). Timed and
# reported in the per-query map like everything else, but kept OUT of
# headline_total_sec / the spread-vs-previous-rounds comparison: the
# cross-round total must sum the SAME query set or every extension
# reads as a regression. Their subtotal is r06_extension_sec.
HEADLINE_R06 = (
    "q2_min_ship_supplier",     # correlated scalar-min join-back
    "q20_excess_suppliers",     # nested-subquery semi-join
    "a_asof_forward",           # forward as-of walk
    "a_asof_tolerance",         # tolerance-masked as-of
    "d_ngram_jaccard",          # inverted-index exact Jaccard
    "d_dedup_survivors",        # pairs -> components -> anti-join
    "v_pairwise_near_dup",      # threshold near-dup pairs
    "v_filtered_topk",          # metadata-filtered ANN
    "m_resize",                 # real decode->resize->re-encode chain
    "m_image_embed",            # real pixel-moment embedding
    "m_embed_topk",             # decode->embed->cosine-topk bridge
    "p_pack_shards",            # two-phase prefix-sum shard packing
    "t_heavy_hitters",          # exact heavy hitters
)

# r7 additions (same rule as HEADLINE_R06: timed and reported, OUT of
# the cross-round comparable total; subtotal r07_extension_sec): the
# ASOF tolerance SQL spelling and the three identical-SQL parser
# surfaces (GROUP BY ALL, LATERAL, standard PIVOT).
HEADLINE_R07 = (
    "u_asof_tolerance_sql",
    "q_group_by_all",
    "q_lateral_join",
    "q_pivot_sql",
)

# r8 additions (same rule: timed and reported, OUT of the cross-round
# comparable total; subtotal r08_extension_sec): the subquery-source
# ASOF spelling and the eight parser surfaces landed with native
# differentials this round.
HEADLINE_R08 = (
    "u_asof_subquery_sql",
    "q_values_list",
    "q_grouping_id",
    "q_select_except",
    "q_tablesample_bound",
    "q_unpivot_sql",
    "q_named_window",
    "q_is_distinct",
    "q_try_cast",
    "q_quantified_subquery",
    "q_agg_filter",
    "a_asof_nearest",
    "u_insert_by_name",
    "u_update_from",
)

# r9 additions (same rule: timed and reported, OUT of the cross-round
# comparable total; subtotal r09_extension_sec): DISTINCT ON + QUALIFY
# composed in one statement (the r8 named refusal, now a two-stage
# QUALIFY-first rewrite).
HEADLINE_R09 = (
    "u_distinct_on_qualify",
    "u_union_by_name",
    "u_select_replace",
)

# r10 additions (same rule: timed and reported, OUT of the cross-round
# comparable total; subtotal r10_extension_sec): the five r9 surfaces
# promoted to driver rows plus the two r10 surfaces (WITH TIES, the
# set-level-OFFSET subquery-lifted BY NAME union).
HEADLINE_R10 = (
    "q_fetch_first",
    "u_fetch_with_ties",
    "u_union_offset",
    "u_create_or_replace",
    "u_copy_export",
    "u_insert_by_position",
    "u_update_from_subquery",
    "u_limit_percent",
    "u_columns",
)

# r11 additions (same rule: timed and reported, OUT of the cross-round
# comparable total; subtotal r11_extension_sec): logical views, the
# positional-join zip, the macro lifecycle, and the late-r11 driver
# rows — the constraint family, the PIVOT statement, sequences and
# RETURNING.
HEADLINE_R11 = (
    "u_create_view",
    "u_positional_join",
    "u_create_macro",
    "u_insert_or_replace",
    "u_constraints",
    "u_pivot_stmt",
    "u_sequences",
    "u_returning",
)

# Queries added with the r12 surfaces (kept OUT of the cross-round
# comparable total; subtotal r12_extension_sec): the DuckDB
# list/struct expression dialect and window EXCLUDE TIES/GROUP.
HEADLINE_R12 = (
    "u_list_ops",
    "u_window_exclude",
)

# r13 driver rows (kept OUT of the cross-round comparable total;
# subtotal r13_extension_sec): the NULLS LAST ordering parity row,
# ordered first/last, the ordered/DISTINCT aggregate batch, and the
# time_bucket rollup.
HEADLINE_R13 = (
    "u_order_nulls",
    "u_first_last_ord",
    "u_string_agg_ord",
    "a_time_bucket",
)

# r14 driver rows (subtotal r14_extension_sec): the string-cast
# spelling/alias row and the function-parity batch (3-arg
# time_bucket, list-form quantile_disc, stepless generate_series).
HEADLINE_R14 = (
    "u_cast_spellings",
    "u_fn_parity_r14",
)

HEADLINE = (
    HEADLINE_R01 + HEADLINE_R02 + HEADLINE_R03 + HEADLINE_R04
    + HEADLINE_R06 + HEADLINE_R07 + HEADLINE_R08 + HEADLINE_R09
    + HEADLINE_R10 + HEADLINE_R11 + HEADLINE_R12 + HEADLINE_R13
    + HEADLINE_R14
)
COMPARABLE = HEADLINE_R01 + HEADLINE_R02 + HEADLINE_R03 + HEADLINE_R04

# Below this per-query floor a max/min ratio measures GC pauses, not
# the query (a 200 ms stall at 0.28 s reads as 1.7x): such queries are
# excluded from the spread map and report absolute max−min seconds in
# sub_floor_jitter_abs_sec instead (VERDICT r4 #3 / SCALE.md §7).
SPREAD_FLOOR_SEC = 0.5


def _calibration_probes(spark) -> dict[str, float]:
    """Fixed-cost box-drift probes (VERDICT r8 #4): every snapshot
    records the same three SF-independent measurements, so cross-round
    per-query ratios can be divided by the probe median to separate
    code drift from shared-box drift (r7→r8 moved ~+20% uniformly on
    UNTOUCHED code). Probes, best-of-5 each:

    - ``cpu_sum_100m``: sum over spark.range(1e8) — pure JVM
      whole-stage-codegen arithmetic, no I/O, no shuffle; tracks raw
      CPU/JIT speed of the box.
    - ``shuffle_fixed_2m``: a 1000-key groupBy over spark.range(2e6)
      — exercises the shuffle write/read machinery at a fixed size.
    - ``engine_lifecycle``: AnalyticsEngine open/close on an empty
      scratch warehouse — the fixed per-statement engine overhead
      (catalog read, lock acquire/release) that pads every u_* row.
    """
    import shutil
    import tempfile

    from andb_spark.api import AnalyticsEngine

    def _best(fn, n=5):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    probes = {
        "cpu_sum_100m": _best(
            lambda: spark.range(100_000_000)
            .selectExpr("sum(id)").collect()
        ),
        "shuffle_fixed_2m": _best(
            lambda: spark.range(2_000_000)
            .selectExpr("id % 1000 as k", "id as v")
            .groupBy("k").sum("v").collect()
        ),
    }

    def _lifecycle():
        wh = tempfile.mkdtemp(prefix="andb_probe_")
        try:
            eng = AnalyticsEngine(wh, spark=spark)
            eng.execute("select 1 as one")
            eng.close()
        finally:
            shutil.rmtree(wh, ignore_errors=True)

    probes["engine_lifecycle"] = _best(_lifecycle)
    vals = sorted(probes.values())
    probes["median"] = vals[len(vals) // 2]
    return probes


def _probe_normalized_vs_prev(
    calibration: dict[str, float], timings: dict[str, float]
) -> dict | None:
    """Cross-round comparison normalized by the fixed-cost probes
    (VERDICT r9 #6 — first round with a prior snapshot carrying a
    calibration block): per-probe ratio this-round/previous, and the
    common-query wall-time ratio both RAW and divided by the probe
    median ratio. A normalized ratio near 1.0 with a raw ratio far
    from 1.0 is shared-box drift, not code drift."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prev, prev_round = None, -1
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:
            continue
        parsed = data.get("parsed", data)
        if not isinstance(parsed, dict) or not parsed.get("calibration"):
            # the driver's 2000-char tail window truncates the full
            # per-query line (r09: parsed=null) — recover the
            # calibration block and whatever query pairs survive in
            # the tail text
            tail = data.get("tail") or ""
            cm = re.search(r'"calibration":\s*(\{[^}]*\})', tail)
            if not cm:
                continue
            sfm = re.search(r'"sf":\s*([0-9.]+)', tail)
            parsed = {
                "calibration": json.loads(cm.group(1)),
                "sf": float(sfm.group(1)) if sfm else None,
                "queries": {
                    k: float(v)
                    for k, v in re.findall(
                        r'"([a-z]\w+)":\s*([0-9.]+)', tail[: cm.start()]
                    )
                    if k
                    not in (
                        "sf", "value", "n_runs", "spread_floor_sec",
                        "r01_subset_sec",
                    )
                    and not k.endswith("_extension_sec")
                },
            }
        if parsed.get("queries"):
            rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
            if rnd > prev_round:
                prev_round, prev = rnd, parsed
    if prev is None:
        return None
    probe_ratios = {
        k: round(calibration[k] / prev["calibration"][k], 3)
        for k in ("cpu_sum_100m", "shuffle_fixed_2m", "engine_lifecycle")
        if prev["calibration"].get(k)
    }
    if not probe_ratios:  # unrecognizable calibration block: no basis
        return None
    probe_median = sorted(probe_ratios.values())[len(probe_ratios) // 2]
    common = [
        n for n in timings
        if isinstance(prev["queries"].get(n), (int, float))
        and prev["queries"][n] > 0
    ]
    raw = (
        round(
            sum(timings[n] for n in common)
            / sum(prev["queries"][n] for n in common), 3
        )
        if common else None
    )
    return {
        "prev_round": prev_round,
        # ratios are only like-for-like when the scale factor matches
        # the previous snapshot's (the driver always runs sf0.1)
        "prev_sf": prev.get("sf"),
        "probe_ratios": probe_ratios,
        "probe_median_ratio": probe_median,
        "common_n": len(common),
        "common_total_ratio_raw": raw,
        "common_total_ratio_probe_normalized": (
            round(raw / probe_median, 3)
            if raw is not None and probe_median else None
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_session("andb_bench")
    qs = library_queries()  # incl. library-only sketch ops

    # Warm-up: touch the fact table (JVM + scan paths), then run each
    # headline query once at the smallest scale factor so plan analysis
    # + Janino codegen compile outside the timed region — the timings
    # then measure steady-state data throughput at the bench SF, which
    # is the quantity that extrapolates to a warm cluster.
    from andb_spark.catalog import load_table

    load_table(spark, sf_dir, "lineitem").count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != sf_dir.rstrip("/"):
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).collect()
            except Exception as e:  # never let warm-up kill the bench
                print(f"# warm-up {name} failed: {e}", file=sys.stderr)

    from andb_spark.operators.dedup import release_caches

    release_caches()  # drop warm-up caches before the timed region
    calibration = _calibration_probes(spark)
    print(f"# calibration: {calibration}", file=sys.stderr)
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    jitter_abs: dict[str, float] = {}
    for name in HEADLINE:
        # best-of-n (default 3): report the steady-state time, not
        # whichever run a GC pause / OS scheduling hiccup landed on
        # (run-to-run spread on a shared box is ~20%; the min is the
        # reproducible number). The max/min ratio is reported per query
        # so drift can be told apart from noise across rounds.
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            # collect() (not count()) so the measured plan includes the
            # full projection, exactly what the correctness gate executes
            n = len(df.collect())
            runs.append(time.perf_counter() - t0)
            # Release caches after EVERY run, not after the loop: the
            # r3 "variance" (4.2x spread on d_incremental_minhash) was
            # runs 2-3 silently reusing run 1's persisted frames —
            # warm-cache timings don't represent running the query
            # once over new data, which is what a pipeline does. Each
            # run now builds (and pays for) its own caches.
            release_caches()
        timings[name] = round(min(runs), 3)
        # Spread (max/min) is only meaningful once the query is long
        # enough to dominate a single GC pause / scheduling hiccup: at
        # ~0.3 s a 200 ms stall reads as 1.7x "drift" (VERDICT r4 #3's
        # q19/q22 false alarm). Queries under the floor report absolute
        # jitter (max−min seconds) instead of a ratio.
        if min(runs) >= SPREAD_FLOOR_SEC:
            spread[name] = round(max(runs) / min(runs), 2)
        else:
            jitter_abs[name] = round(max(runs) - min(runs), 3)
        print(
            f"# {name}: {timings[name]:.3f}s ({n} rows, "
            f"spread {round(max(runs) / min(runs), 2):.2f}x over {n_runs})",
            file=sys.stderr,
        )

    # headline_total_sec sums the r1-r4 set only (cross-round
    # comparable); the r6 extension reports its own subtotal.
    total = round(sum(timings[n] for n in COMPARABLE), 3)
    r01 = round(sum(timings[n] for n in HEADLINE_R01), 3)
    r06_ext = round(sum(timings[n] for n in HEADLINE_R06), 3)
    r07_ext = round(sum(timings[n] for n in HEADLINE_R07), 3)
    r08_ext = round(sum(timings[n] for n in HEADLINE_R08), 3)
    r09_ext = round(sum(timings[n] for n in HEADLINE_R09), 3)
    r10_ext = round(sum(timings[n] for n in HEADLINE_R10), 3)
    r11_ext = round(sum(timings[n] for n in HEADLINE_R11), 3)
    r12_ext = round(sum(timings[n] for n in HEADLINE_R12), 3)
    r13_ext = round(sum(timings[n] for n in HEADLINE_R13), 3)
    r14_ext = round(sum(timings[n] for n in HEADLINE_R14), 3)
    # Lifecycle-subtracted twin for the engine-booting rows (VERDICT
    # r10 #7): every engine_q workload boots a fresh scratch
    # AnalyticsEngine INSIDE its timed region (isolation is the
    # point — each run must pay for its own warehouse), so its raw
    # number conflates the fixed open/lock/catalog cost with plan
    # cost and reads as a regression on any slower box. The twin
    # subtracts the measured engine_lifecycle probe, leaving the
    # plan+data cost; both numbers are reported, raw stays primary
    # for cross-round comparability.
    from andb_spark.workloads import engine_q

    _lc = calibration["engine_lifecycle"]
    lifecycle_adj = {
        n: round(max(0.0, timings[n] - _lc), 3)
        for n in timings
        if n in engine_q.QUERIES
    }
    vs_prev = _probe_normalized_vs_prev(calibration, timings)
    # The per-query max/min spread map goes on its OWN stdout line,
    # BEFORE the headline: r3's single line carrying both outgrew the
    # driver's tail capture and arrived truncated mid-JSON
    # (BENCH_r03.json "parsed": null). The LAST line is the compact
    # machine-readable record and must stay short enough to survive
    # any tail window.
    print(
        json.dumps(
            {
                "metric": "spread_max_over_min",
                "spread_floor_sec": SPREAD_FLOOR_SEC,
                "spread": spread,
                "sub_floor_jitter_abs_sec": jitter_abs,
            }
        )
    )
    full_record = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "sub_floor_jitter_abs_sec": jitter_abs,
        "sf": sf,
        "n_runs": n_runs,
        "calibration": calibration,
        "vs_prev": vs_prev,
        "queries_lifecycle_adj": lifecycle_adj,
    }
    subtotals = {
        "r01_subset_sec": r01,
        "r06_extension_sec": r06_ext,
        "r07_extension_sec": r07_ext,
        "r08_extension_sec": r08_ext,
        "r09_extension_sec": r09_ext,
        "r10_extension_sec": r10_ext,
        "r11_extension_sec": r11_ext,
        "r12_extension_sec": r12_ext,
        "r13_extension_sec": r13_ext,
        "r14_extension_sec": r14_ext,
    }
    full_record.update(subtotals)
    # Durable full record: the driver's 2000-char stdout tail cannot
    # truncate a file — per-query cross-round history reads from here
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_LAST_FULL.json",
            ),
            "w",
        ) as f:
            json.dump(full_record, f, indent=1)
    except OSError as e:
        print(f"# full-record dump failed: {e}", file=sys.stderr)
    # Full per-query record on its own line (the driver's tail window
    # keeps the END of stdout, so most of this survives verbatim) ...
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **subtotals,
                "n_runs": n_runs,
            }
        )
    )
    # ... and the LAST line stays under the driver's 2000-char tail
    # window so it parses whole (r04–r09: the ~100-query line overgrew
    # the window and every snapshot landed with parsed=null). It keeps
    # the contract shape with the 10 slowest queries inline; the full
    # map is the line above.
    slow10 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": slow10,
                "queries_note": "10 slowest; full map on previous line",
                "sf": sf,
                **subtotals,
                "n_runs": n_runs,
                # cross-round ratio vs the newest committed snapshot,
                # raw AND divided by the probe-median ratio (r9 #6):
                # read the normalized number as code drift
                "vs_prev": vs_prev,
                # fixed-cost box-drift probes (VERDICT r8 #4)
                "calibration": calibration,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
