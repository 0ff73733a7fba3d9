"""Streaming workloads over the events table (SURVEY §2.9 — north-star;
the reference has no streaming at all).

Window aggregations are defined once in ``andb_spark.streaming.windows``
and run here in batch mode (oracle-checkable); ``s_stream_tumbling``
runs the SAME transform as a real Structured Streaming query (parquet
source → watermark → memory sink) and returns the materialized result —
the batch/stream equivalence IS the correctness statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from andb_spark.catalog import load_table, table_path
from andb_spark.session import tune_for_session
from andb_spark.streaming.stateful import stateful_user_stats
from andb_spark.streaming.windows import (
    run_stream,
    session_agg,
    sliding_agg,
    stream_events,
    stream_source,
    tumbling_agg,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_for_session(spark)
    return load_table(spark, sf_dir, "events")


def s_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(_events(spark, sf_dir)).orderBy(
        "window_start", "event_type"
    )


def s_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(_events(spark, sf_dir)).orderBy("window_start")


def s_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No trailing global sort: one row per (user, session) is
    # fact-table-sized output, and the correctness compare is
    # order-insensitive.
    return session_agg(_events(spark, sf_dir))


def s_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real readStream execution of the tumbling aggregation."""
    tune_for_session(spark)
    out = stream_events(
        spark,
        table_path(sf_dir, "events"),
        tumbling_agg,
        watermark="1 hour",
        query_name="andb_stream_tumbling",
    )
    return out.orderBy("window_start", "event_type")


def s_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real readStream execution of the session-window aggregation:
    session_window merges per-user gap-bounded sessions as stateful
    streaming state; the watermark bounds that state (sessions older
    than the watermark close and evict). Same transform as the batch
    s_session — batch/stream equivalence is the correctness statement,
    checked against the lag-flag SQL oracle."""
    tune_for_session(spark)
    return stream_events(
        spark,
        table_path(sf_dir, "events"),
        session_agg,
        watermark="1 hour",
        query_name="andb_stream_session",
    )


def s_stateful_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running
    per-user stats in explicit group state. The finite fixture arrives
    in one micro-batch, so the emitted update per user IS the final
    state — oracle-checkable against a batch GROUP BY."""
    tune_for_session(spark)
    out = stream_events(
        spark,
        table_path(sf_dir, "events"),
        stateful_user_stats,
        watermark="1 hour",
        query_name="andb_stateful_user",
        output_mode="update",
    )
    # If the source ever splits into several micro-batches, keep the
    # last (cumulative) update per user: state is monotone in n_events.
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("user_id")
    )


def s_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (dropDuplicatesWithinWatermark): the events
    stream unioned with itself (every event arrives exactly twice, the
    at-least-once-delivery shape) deduped back to exactly-once on
    event_id. State holds only ids younger than the watermark — bounded
    on an unbounded stream."""
    tune_for_session(spark)
    path = table_path(sf_dir, "events")
    s1 = stream_source(spark, path, watermark="1 hour")
    s2 = stream_source(spark, path, watermark="1 hour")
    deduped = s1.unionAll(s2).dropDuplicatesWithinWatermark(["event_id"])
    out = run_stream(
        deduped, query_name="andb_stream_dedup", output_mode="append"
    )
    return out.select(
        "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
    ).orderBy("event_id")


def s_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range constraint:
    each view joined to the same user's purchases within the following
    30 minutes. Both sides are watermarked and the join condition bounds
    event time on both sides, so the state store can evict rows older
    than (watermark - 30 min) — bounded state on an unbounded stream,
    the one thing that makes stream-stream joins viable at scale. Inner
    join results emit in the micro-batch they match (no watermark
    wait)."""
    tune_for_session(spark)
    path = table_path(sf_dir, "events")
    views = (
        stream_source(spark, path, watermark="1 hour")
        .filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
    )
    purchases = (
        stream_source(spark, path, watermark="1 hour")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr("interval 30 minutes")
        ),
        "inner",
    )
    out = run_stream(joined, query_name="andb_stream_join", output_mode="append")
    return out.select(
        F.col("v_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
        F.round("purchase_value", 6).alias("purchase_value"),
    ).orderBy("user_id", "view_ts", "purchase_ts")


def s_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events stream joined to the static
    customer dimension — the canonical per-micro-batch dimension join.
    No streaming state at all (the static side is just broadcast into
    each batch), so it scales with the dim table, not stream age;
    append mode emits enriched rows as they arrive."""
    tune_for_session(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey", "c_mktsegment"
    )
    s = stream_source(spark, table_path(sf_dir, "events"), watermark="1 hour")
    joined = s.join(F.broadcast(cust), "user_id", "inner").select(
        "event_id",
        "user_id",
        "c_nationkey",
        "c_mktsegment",
        F.round("value", 6).alias("value"),
    )
    out = run_stream(
        joined, query_name="andb_stream_enrich", output_mode="append"
    )
    return out.orderBy("event_id")


def s_stream_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per hourly window on a real stream. Structured
    Streaming rejects COUNT(DISTINCT) in streaming aggregations, so
    this runs the streaming-safe rewrite: watermarked dropDuplicates
    on (window, user) — state holds one row per distinct pair, evicted
    with the watermark — then an ordinary count per window. The batch
    oracle states the same result as a plain COUNT(DISTINCT)."""
    tune_for_session(spark)

    def transform(stream: DataFrame) -> DataFrame:
        return (
            stream.withColumn("w", F.window("ts", "1 hour"))
            .dropDuplicates(["w", "user_id"])
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col("n_users"),
            )
        )

    out = stream_events(
        spark,
        table_path(sf_dir, "events"),
        transform,
        watermark="1 hour",
        query_name="andb_stream_distinct",
    )
    return out.orderBy("window_start")


def s_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical window rollup (the 'continuous aggregate' /
    hypertable-rollup pattern): the hourly tumbling aggregate re-rolled
    to days. At scale the hourly layer is a materialized incremental
    table; the daily layer reads it instead of raw events — 24× less
    input, same math, which is what makes multi-resolution dashboards
    affordable on an unbounded stream."""
    hourly = tumbling_agg(_events(spark, sf_dir))  # window_start, event_type, n, total_value
    return (
        hourly.groupBy(
            F.date_trunc("day", "window_start").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total_value"), 2).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )



def s_stream_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING as-of enrichment: each streaming event joined to the
    user's most recent STATIC order as of the event time. Window
    functions are disallowed inside a streaming query, so the as-of
    runs per micro-batch through ``foreachBatch`` — each batch is a
    plain DataFrame, and because the match depends only on the batch
    row and the static side, the union of per-batch results is
    IDENTICAL to the batch answer under any batching whatsoever. The
    oracle is therefore the same LATERAL SQL that grades the batch
    twin ``a_asof_join`` — the streaming execution path earns the full
    hash compare, not a rows-only waiver. Per-batch output lands in an
    append-only parquet spool (at scale: a Delta/manifest table, same
    pattern as streaming/dedup_ingest.py)."""
    import atexit
    import shutil
    import tempfile

    from andb_spark.operators.asof import asof_join

    tune_for_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    spool = tempfile.mkdtemp(prefix="andb_stream_asof_")
    atexit.register(shutil.rmtree, spool, ignore_errors=True)

    def enrich(batch_df: DataFrame, _bid: int) -> None:
        out = asof_join(
            batch_df.select("event_id", "user_id", "ts"),
            orders,
            left_on="user_id",
            right_on="o_custkey",
            left_time="ts",
            right_time="o_orderdate",
            payload_cols=["o_orderkey", "o_totalprice"],
            right_tiebreak="o_orderkey",
        ).select("event_id", "user_id", "o_orderkey", "o_totalprice")
        out.write.mode("append").parquet(spool)

    # Seed the spool with a zero-row frame of the output schema: if
    # the availableNow stream yields no batches (empty events slice at
    # a tiny SF) no parquet files would exist and the final read would
    # die with 'Unable to infer schema' instead of returning an empty
    # frame (ADVICE r6).
    empty = spark.createDataFrame(
        [], "event_id bigint, user_id bigint,"
            " o_orderkey bigint, o_totalprice double"
    )
    empty.write.mode("append").parquet(spool)

    src = stream_source(spark, table_path(sf_dir, "events"), watermark=None)
    q = (
        src.writeStream.foreachBatch(enrich)
        .queryName("andb_stream_asof")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.read.parquet(spool)


QUERIES = {
    "s_tumbling": s_tumbling,
    "s_daily_rollup": s_daily_rollup,
    "s_sliding": s_sliding,
    "s_session": s_session,
    "s_stream_tumbling": s_stream_tumbling,
    "s_stream_session": s_stream_session,
    "s_stateful_user": s_stateful_user,
    "s_stream_dedup": s_stream_dedup,
    "s_stream_join": s_stream_join,
    "s_stream_enrich": s_stream_enrich,
    "s_stream_asof": s_stream_asof,
    "s_stream_distinct": s_stream_distinct,
}

# Builders whose CONSTRUCTION executes a Structured Streaming job to
# completion (readStream → foreachBatch sink → collected result). Tools
# that invoke builders for plan inspection only (plans/reuse.py) must
# skip these by name — "s_stateful_user" streams too despite not
# carrying the s_stream_ prefix.
EXECUTING_BUILDERS = frozenset(
    {
        "s_stream_tumbling",
        "s_stream_session",
        "s_stateful_user",
        "s_stream_dedup",
        "s_stream_join",
        "s_stream_enrich",
        "s_stream_asof",
        "s_stream_distinct",
    }
)

_TUMBLING_SQL = """
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""

_SESSION_SQL = """
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '15 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT *, sum(new_s) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM e
        )
        SELECT min(ts) AS session_start, user_id,
               count(*) AS n_events, round(sum(value), 2) AS session_value
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """

ORACLES = {
    "s_stream_asof": """
        SELECT e.event_id, e.user_id, ref.o_orderkey, ref.o_totalprice
        FROM events e LEFT JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = e.user_id
              AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
            ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
        ) ref ON TRUE
        ORDER BY e.event_id
    """,
    "s_daily_rollup": """
        WITH hourly AS (
            SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                       AS window_start,
                   event_type, count(*) AS n, round(sum(value), 2) AS tv
            FROM events GROUP BY 1, 2
        )
        SELECT CAST(date_trunc('day', window_start) AS TIMESTAMP) AS day,
               event_type,
               CAST(sum(n) AS BIGINT) AS n,
               round(sum(tv), 2) AS total_value
        FROM hourly GROUP BY 1, 2 ORDER BY day, event_type
    """,
    "s_stateful_user": """
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 2) AS total_value,
               round(max(value), 2) AS max_value
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "s_stream_dedup": """
        SELECT event_id, user_id, event_type, round(value, 6) AS value
        FROM events ORDER BY event_id
    """,
    "s_tumbling": _TUMBLING_SQL,
    "s_stream_tumbling": _TUMBLING_SQL,
    "s_stream_join": """
        SELECT v.user_id AS user_id,
               CAST(v.ts AS TIMESTAMP) AS view_ts,
               CAST(p.ts AS TIMESTAMP) AS purchase_ts,
               round(p.value, 6) AS purchase_value
        FROM events v
        JOIN events p
          ON v.user_id = p.user_id
         AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
         AND CAST(p.ts AS TIMESTAMP)
             <= CAST(v.ts AS TIMESTAMP) + INTERVAL '30 minutes'
        WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        ORDER BY user_id, view_ts, purchase_ts
    """,
    "s_stream_distinct": """
        SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                   AS window_start,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY window_start
    """,
    "s_stream_enrich": """
        SELECT event_id, e.user_id AS user_id, c_nationkey, c_mktsegment,
               round(value, 6) AS value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        ORDER BY event_id
    """,
    "s_sliding": """
        SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                   - k * INTERVAL '30 minutes' AS window_start,
               count(*) AS n, round(round(sum(value), 2) / count(*), 6) AS avg_value
        FROM events, (SELECT unnest([0, 1]) AS k) ks
        GROUP BY 1 ORDER BY window_start
    """,
    "s_session": _SESSION_SQL,
    "s_stream_session": _SESSION_SQL,
}
