"""ANALYZE-style table statistics.

Fills the reference's empty statistics stubs (``andb/sql/optimizer/
statistic/__init__.py``, ``andb/catalog/statistic.py`` — both zero
bytes) with the content they were reserved for: per-table row counts
and per-column min/max/ndv/null-count, computed in ONE full scan
(a single multi-aggregate — Spark computes all columns' statistics in
the same pass, partial-aggregated map-side) and stored as plain JSON in
the engine catalog.

Consumers:
- ``plans.ann.choose_topk_path`` — rows drive the exact-vs-LSH choice.
- ``AnalyticsEngine`` — `ANALYZE <table>` statement + `SHOW STATS`.
- Humans — the numbers a cost-based decision would read are inspectable
  instead of buried in Catalyst internals. (Catalyst's own CBO stats,
  `ANALYZE TABLE ... COMPUTE STATISTICS`, apply only to catalog tables;
  our managed tables are parquet dirs + temp views, so we keep our own.)

At 100 TB: one scan with algebraic aggregates only (min/max/count/HLL
ndv) — fully partial-aggregated, shuffle carries one row per column per
partition. ndv uses approx_count_distinct (HyperLogLog++), never exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Column types whose min/max are meaningful and JSON-storable.
_ORDERED = (
    T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.StringType,
    T.DateType, T.TimestampType, T.BooleanType, T.DecimalType, T.ShortType,
    T.ByteType,
)


def collect_stats(df: DataFrame) -> dict:
    """One-pass table statistics: {'rows': n, 'columns': {name: {...}}}."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    ordered_cols = []
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__ndv_{c}"))
        if isinstance(f.dataType, _ORDERED):
            ordered_cols.append(c)
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
    row = df.agg(*aggs).head().asDict()
    out: dict = {"rows": row["__rows"], "columns": {}}
    for f in df.schema.fields:
        c = f.name
        col_stats = {
            # sum over zero rows is NULL, not 0 — coalesce so ANALYZE
            # of an empty table stores arithmetic-safe counts
            "nulls": row[f"__nulls_{c}"] or 0,
            "ndv": row[f"__ndv_{c}"],
        }
        if c in set(ordered_cols):
            col_stats["min"] = _jsonable(row[f"__min_{c}"])
            col_stats["max"] = _jsonable(row[f"__max_{c}"])
        out["columns"][c] = col_stats
    return out


def _jsonable(v):
    """min/max values must survive a JSON round-trip (catalog storage)."""
    import datetime
    import decimal

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        # DecimalType is in _ORDERED, so its min/max land here; a raw
        # Decimal would make json.dump raise AFTER the in-memory
        # catalog was already mutated, wedging every later save
        return float(v)
    return v
