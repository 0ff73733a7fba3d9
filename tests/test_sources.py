"""External source/sink formats (sources.py + COPY statement).

The reference has no bulk I/O — data enters via INSERT only
(andb/executor/operator/physical/insert.py:9-61) — so these tests cover
pure extension surface: format round-trips with schema fidelity, format
inference, and the engine-level COPY TO/FROM path including constraint
enforcement on import.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from andb_spark.api import AnalyticsEngine, EngineError
from andb_spark.sources import infer_format, read_source, write_source


@pytest.fixture()
def engine(spark, tmp_path):
    return AnalyticsEngine(str(tmp_path / "wh"), spark=spark)


SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)
ROWS = [(1, "alpha", 1.5), (2, "beta", -2.25), (3, None, 0.0)]


def test_infer_format():
    assert infer_format("/x/a.parquet") == "parquet"
    assert infer_format("/x/a.csv") == "csv"
    assert infer_format("/x/a.jsonl") == "json"
    assert infer_format("/x/a.orc") == "orc"
    assert infer_format("/x/dir") is None


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_round_trip_with_schema(spark, tmp_path, fmt):
    """Write → read with explicit schema preserves rows AND types for
    every format (csv/json carry no types on their own)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / f"out_{fmt}")
    write_source(df, path, fmt)
    back = read_source(spark, path, fmt, schema=SCHEMA)
    # nullability is reader policy (parquet reports its own); names and
    # types must survive exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in SCHEMA.fields
    ]
    assert sorted(back.collect()) == sorted(df.collect())


def test_csv_infer_schema_fallback(spark, tmp_path):
    """Without an explicit schema csv still round-trips values via
    inference (header row written and honored)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "inferred")
    write_source(df, path, "csv")
    back = read_source(spark, path, "csv")
    assert sorted(r.id for r in back.collect()) == [1, 2, 3]


def test_unsupported_format(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="unsupported format"):
        write_source(df, str(tmp_path / "x"), "avro")


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_copy_to_from(engine, tmp_path, fmt):
    """COPY TO exports, COPY FROM re-imports through the declared
    schema: a full export/truncate/import cycle restores the table."""
    e = engine.execute
    e("create table src (a int not null, b text)")
    e("insert into src values (1, 'x'), (2, 'y'), (3, null)")
    path = str(tmp_path / f"dump_{fmt}")
    assert e(f"copy src to '{path}' format {fmt}").effect_rows == 3
    e("delete from src")
    assert e("select count(1) as n from src").rows == [(0,)]
    assert e(f"copy src from '{path}' format {fmt}").effect_rows == 3
    assert e("select a, b from src order by a").rows == [
        (1, "x"),
        (2, "y"),
        (3, None),
    ]


def test_copy_from_enforces_not_null(engine, tmp_path, spark):
    """Imported rows go through the same constraint gate as INSERT
    (relation.py:122-123 parity)."""
    e = engine.execute
    e("create table strict_t (a int not null, b text)")
    bad = spark.createDataFrame(
        [(None, "x")],
        T.StructType(
            [
                T.StructField("a", T.IntegerType(), True),
                T.StructField("b", T.StringType(), True),
            ]
        ),
    )
    path = str(tmp_path / "bad.csv")
    write_source(bad, path, "csv")
    with pytest.raises(EngineError, match="NOT NULL"):
        e(f"copy strict_t from '{path}' format csv")


def test_copy_syntax_error(engine):
    with pytest.raises(EngineError, match="syntax: COPY"):
        engine.execute("copy nowhere sideways 'x'")


def test_copy_table_to_evaluates_once(engine, tmp_path, monkeypatch):
    """Plain ``COPY <table> TO`` must not re-scan the table for its
    row count (r9 verdict #3): the count comes from manifest metadata
    (zone-map ``__rows`` / parquet footers). Pinned by poisoning
    DataFrame.count for the duration of the statement — the export
    succeeds and still reports the exact count."""
    from pyspark.sql import DataFrame

    e = engine.execute
    e("create table once_t (a int, b text)")
    e("insert into once_t values (1,'x'), (2,'y'), (3,'z')")

    def _bomb(self):
        raise AssertionError("COPY TO must not call DataFrame.count")

    path = str(tmp_path / "once_dump")
    monkeypatch.setattr(DataFrame, "count", _bomb)
    assert e(f"copy once_t to '{path}' format csv").effect_rows == 3
    monkeypatch.undo()
    from andb_spark.sources import read_source

    back = read_source(engine.spark, path, "csv")
    assert sorted(r.a for r in back.collect()) == [1, 2, 3]


def test_binary_file_ingestion_feeds_multimodal(spark, tmp_path):
    """binaryFile source → multimodal decode end-to-end: real BMP files
    on disk ingest into (doc_id, payload) rows, decode to exact pixels,
    and metadata-only projections never read file contents."""
    import numpy as np

    from andb_spark.operators.multimodal import (
        decode_image_pixels,
        extract_image_meta,
    )
    from andb_spark.sources import read_binary_files
    from tests.test_multimodal import PX, make_bmp

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "img_007.bmp").write_bytes(make_bmp(PX))
    (d / "img_042.bmp").write_bytes(make_bmp(PX[::-1]))
    (d / "notes.txt").write_text("not an image")

    df = read_binary_files(spark, str(d), glob="*.bmp")
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {7, 42}  # txt pruned by glob, ids from names
    assert np.array_equal(
        decode_image_pixels(bytes(rows[7]["payload"])), PX
    )
    # plumb into the real-decode mapInPandas stage
    meta = {
        r["doc_id"]: r
        for r in extract_image_meta(
            df.select("doc_id", "payload", "n_bytes"), fake=False
        ).collect()
    }
    assert meta[42]["format"] == "bmp"
    assert (meta[42]["width"], meta[42]["height"]) == (3, 2)


def test_text_format_round_trip(spark, tmp_path):
    """Line-oriented text: one string column, one document per line —
    the rawest corpus ingest format (still line-splittable)."""
    from andb_spark.sources import read_source, write_source

    df = spark.createDataFrame(
        [("doc one",), ("doc two",), ("doc three",)], ["line"]
    )
    out = str(tmp_path / "corpus.txt")
    write_source(df, out, "text")
    back = read_source(spark, out)  # .txt extension infers text
    assert back.columns == ["value"]
    assert sorted(r[0] for r in back.collect()) == [
        "doc one",
        "doc three",
        "doc two",
    ]


def test_text_format_rejects_multi_column(spark, tmp_path):
    from andb_spark.sources import write_source

    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    with pytest.raises(ValueError, match="one string column"):
        write_source(df, str(tmp_path / "bad.txt"), "text")


def test_copy_text_round_trip(spark, tmp_path):
    from andb_spark.api import AnalyticsEngine

    eng = AnalyticsEngine(str(tmp_path / "wh"), spark=spark)
    e = eng.execute
    e("create table lines (value text)")
    e("insert into lines values ('alpha'), ('beta')")
    out = str(tmp_path / "export.txt")
    e(f"copy lines to '{out}' format text")
    e("create table lines2 (value text)")
    e(f"copy lines2 from '{out}' format text")
    assert sorted(
        r[0] for r in e("select value from lines2").rows
    ) == ["alpha", "beta"]


def test_compressed_ingest_round_trip(spark, tmp_path):
    """Spark's text-based sources decompress .gz transparently; the
    format must be inferred from the REAL extension under the
    compression suffix (corpus.jsonl.gz -> json). Not splittable —
    ingest-only, as documented."""
    import gzip

    from andb_spark.sources import infer_format, read_source

    assert infer_format("a/corpus.jsonl.gz") == "json"
    assert infer_format("a/lines.txt.zst") == "text"
    assert infer_format("a/data.csv.bz2") == "csv"
    assert infer_format("a/plain.parquet") == "parquet"

    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 1, "text": "alpha"}\n')
        f.write('{"doc_id": 2, "text": "beta"}\n')
    df = read_source(spark, str(p))
    assert sorted((r["doc_id"], r["text"]) for r in df.collect()) == [
        (1, "alpha"),
        (2, "beta"),
    ]
