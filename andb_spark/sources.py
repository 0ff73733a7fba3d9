"""External source/sink formats (SURVEY.md §2.1 "Source formats").

The reference has NO external formats — data enters only via INSERT
(andb/executor/operator/physical/insert.py:9-61) and leaves only via the
ASCII result printer (andb/common/tabular_format.py). Spark's DataSource
V2 readers give us parquet/csv/json/orc with predicate pushdown and
column pruning for free; this module is the thin policy layer (format
inference, sane per-format defaults, schema application) shared by the
engine's COPY statement and programmatic users.

Scale notes:
- parquet/orc are splittable + columnar: pushdown, pruning, min/max
  skipping all reach the scan. The 100 TB path.
- csv/json are line-splittable but row-oriented: every column is read
  and parsed. Ingest formats only — COPY FROM lands them in managed
  parquet, never query them in place at scale.
- Schema is always applied explicitly when the caller knows it
  (COPY FROM uses the table's declared schema): schema inference on
  csv/json triggers an extra full pass over the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "csv", "json", "orc")

_EXT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
}


def infer_format(path: str) -> str | None:
    """Format from file extension; None when unrecognized (dirs with no
    extension default to parquet at the call site)."""
    return _EXT.get(os.path.splitext(path.rstrip("/"))[1].lower())


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read an external file/directory as a DataFrame.

    csv defaults: header=true (matches our own writer); timestamps parse
    from ISO strings. json: line-delimited (the only scalable layout —
    multiline JSON is not splittable). Explicit ``schema`` skips the
    inference pass and guarantees stable types.
    """
    fmt = (fmt or infer_format(path) or "parquet").lower()
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {FORMATS}")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def write_source(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write a DataFrame to an external path. csv gets a header row so
    the file round-trips through read_source; json is line-delimited."""
    fmt = (fmt or infer_format(path) or "parquet").lower()
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.format(fmt).save(path)
