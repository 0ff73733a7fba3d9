"""Table registry over the parquet fixtures.

The reference keeps a pickled system catalog (andb_class / andb_attribute,
andb/catalog/class_.py:17-32, attribute.py:6-27) and one heap file per
relation. Here a "database" is a directory of parquet tables; Spark's
session catalog plus these helpers replace the whole catalog subsystem.

At 100 TB each of these would be a partitioned parquet/iceberg dataset
(orders/lineitem/events date-partitioned); `load_table` reads whatever
layout sits at ``<dir>/<name>.parquet`` so the same code serves both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Canonical driver fixture tables (TESTDATA.md / FIXTURES.md §B).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at every scale factor the
# TPC-H-ish schema reaches (region 5 rows, nation 25 — constant; supplier
# and part grow slowly). Joins against these should never shuffle the
# fact side.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Plan-handle memo for the read-only fixture tables: building the scan
# DataFrame costs a driver-side file listing + parquet footer/schema
# read (~0.15 s each on the r15 box), and every bench/compare query
# builder re-reads the same immutable files. The memo stores the LAZY
# DataFrame only — every action still computes from the parquet inputs
# (no rows, no results are retained), so this is plan reuse, not result
# caching. The memo lives ON the session object (r15 verdict #6: a
# module-level dict keyed by session never evicts and pins sessions
# alive in a many-session service; an attribute's lifetime IS the
# session's), so a new session never sees another session's plans.
_PLAN_MEMO_ATTR = "_andb_plan_memo"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Column pruning and predicate pushdown reach
    the parquet reader via Catalyst — callers just select/filter.

    The events table is written with nanosecond parquet timestamps,
    which Spark refuses by default (PARQUET_TYPE_ILLEGAL); we read them
    as raw nanos (legacy conf) and floor-convert to the engine's
    microsecond TimestampType — the same truncation DuckDB applies when
    casting TIMESTAMP_NS to TIMESTAMP."""
    plan_memo = getattr(spark, _PLAN_MEMO_ATTR, None)
    if plan_memo is None:
        plan_memo = {}
        setattr(spark, _PLAN_MEMO_ATTR, plan_memo)
    key = (os.path.abspath(sf_dir), name)
    memo = plan_memo.get(key)
    if memo is not None:
        return memo
    path = table_path(sf_dir, name)
    try:
        df = spark.read.parquet(path)
    except Exception as e:
        # ONLY the nanosecond-timestamp refusal earns the legacy-conf
        # retry: flipping nanosAsLong on an unrelated failure (missing
        # path, corrupt file) would permanently change how every later
        # read in the session types nano-timestamps.
        # Anchor on ERROR CLASS substrings, never a bare "NANOS": the
        # exception message embeds the file path, so a missing table
        # merely NAMED "nanos_archive" would otherwise trip the flip.
        msg = str(e).upper()
        if (
            "PARQUET_TYPE_ILLEGAL" not in msg
            and "ILLEGAL_PARQUET_TYPE" not in msg
            and "TIMESTAMP(NANOS" not in msg
        ):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer division — ns magnitudes exceed double's 53-bit mantissa
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and isinstance(df.schema["ts"].dataType, TimestampNTZType):
        # session TZ is UTC, so this cast is value-preserving; the
        # engine's event-time type is TimestampType (watermarkable).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    plan_memo[key] = df
    return df


# Last-attached fixture dir per session: re-registering the same ten
# temp views on every engine open cost ~0.12 s each (r15 ctor
# profile). Views are re-registered whenever the attach dir CHANGES
# (warm-up at sf0.001 alternating with timed runs at sf0.1 stays
# correct); nothing in the engine or workloads ever rebinds a
# fixture-named view, so a same-dir skip is safe. Stored on the
# session object for the same lifetime reason as the plan memo.
_ATTACHED_ATTR = "_andb_attached_dir"


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view (for the SQL entry
    point) and return the DataFrames keyed by name."""
    key = (os.path.abspath(sf_dir), tables)
    hit = getattr(spark, _ATTACHED_ATTR, None)
    if hit is not None and hit[0] == key:
        return dict(hit[1])
    out: dict[str, DataFrame] = {}
    local = "://" not in sf_dir  # os.path.exists is meaningless for
    # hdfs://-s3a://-style dirs — there, attempt every table and let a
    # missing one fail LOUDLY rather than silently registering nothing
    for name in tables:
        if local and not os.path.exists(table_path(sf_dir, name)):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    setattr(spark, _ATTACHED_ATTR, (key, out))
    return dict(out)
