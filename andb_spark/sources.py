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

FORMATS = ("parquet", "csv", "json", "orc", "text")

_EXT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
    ".txt": "text",
    ".text": "text",
}


# Compression suffixes Spark's text-based sources decompress
# transparently (per-file codec from the extension). Scale note: gzip
# is NOT splittable — a .csv.gz is one task no matter its size; zstd/
# bzip2 likewise arrive whole-file for csv/json/text. Fine for many
# medium ingest files, wrong for one giant archive — COPY FROM lands
# them in managed parquet either way.
_COMPRESSION_EXTS = (".gz", ".gzip", ".bz2", ".zst", ".zstd", ".snappy")


def infer_format(path: str) -> str | None:
    """Format from file extension; None when unrecognized (dirs with no
    extension default to parquet at the call site). Compression
    suffixes are stripped first, so `corpus.jsonl.gz` infers json, not
    nothing."""
    base = path.rstrip("/")
    root, ext = os.path.splitext(base)
    if ext.lower() in _COMPRESSION_EXTS:
        root, ext = os.path.splitext(root)
    return _EXT.get(ext.lower())


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
    if fmt == "text" and schema is not None:
        _check_text_schema([(f.name, f.dataType) for f in schema.fields])
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
    if fmt == "text":
        _check_text_schema(df.dtypes)
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.format(fmt).save(path)


def _check_text_schema(fields) -> None:
    """The line-oriented ``text`` source carries exactly one string
    column (one document/line per row — the rawest corpus ingest
    format; still line-splittable, so 1000-executor parallel). Fail
    fast with a clear message instead of Spark's late analysis error."""
    if len(fields) != 1 or str(fields[0][1]).lower() not in (
        "string",
        "stringtype()",
    ):
        raise ValueError(
            "text format requires exactly one string column, got "
            + str([(n, str(t)) for n, t in fields])
        )


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    id_from_name: bool = True,
) -> DataFrame:
    """Raw-file ingestion via Spark's built-in ``binaryFile`` source —
    the entry point of the multimodal pipeline: a directory of image/
    audio/video files becomes (doc_id, path, n_bytes, mod_time,
    payload) rows that feed straight into the decode/resize/embed
    stages (operators/multimodal.py).

    Scale: binaryFile is a DataSource V2 reader — files are assigned to
    tasks by size (spark.sql.files.maxPartitionBytes), pathGlobFilter
    prunes by name BEFORE any read, and column pruning drops the
    payload column entirely for metadata-only queries (schema scans of
    a 100 TB image corpus read zero image bytes). One caveat baked in:
    each file must fit in one task's memory — codec-sized media, not
    giant archives.

    ``id_from_name``: derive a stable numeric doc_id from the file
    name's digits (img_00042.bmp → 42) — the fixture convention; files
    without digits hash the path (stable across runs, not dense)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    from pyspark.sql import functions as F

    doc_id = (
        doc_id_from_path(F.col("path"))
        if id_from_name
        else path_hash_id(F.col("path"))
    )
    return df.select(
        doc_id.alias("doc_id"),
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("mod_time"),
        F.col("content").alias("payload"),
    )


def path_hash_id(path_col):
    """Hash-derived doc_id for a file path — the ONE copy of the id
    scheme's fallback (pmod, not abs: abs(Long.MIN_VALUE) raises under
    ANSI). Both doc_id_from_path and the id_from_name=False batch
    reader must use it, or the same file could carry different ids on
    different ingest paths and cross-path dedup on doc_id silently
    breaks."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(path_col), F.lit(1 << 62))


def doc_id_from_path(path_col):
    """Deterministic doc_id for a file path: the first digit run of the
    file name when it fits a bigint, else pmod(xxhash64(path), 2^62).
    ONE copy shared by the batch binary reader and the streaming
    multimodal ingest — the two paths MUST derive identical ids for
    the same file or cross-path dedup on doc_id silently breaks.
    ANSI-safe: try_cast (a 20-digit timestamp name falls through to
    the hash instead of raising) and pmod, not abs (abs(Long.MIN_VALUE)
    raises under ANSI)."""
    from pyspark.sql import functions as F

    name_digits = F.regexp_extract(
        F.element_at(F.split(path_col, "/"), -1), r"(\d+)", 1
    )
    return F.coalesce(
        F.when(name_digits != "", name_digits.try_cast("bigint")),
        path_hash_id(path_col),
    )
