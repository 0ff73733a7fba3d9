"""Batch/stream equivalence tests — the Structured Streaming correctness
contract: the same transform over a finite source must agree between
batch execution and incremental streaming execution."""

from __future__ import annotations

from andb_spark.catalog import load_table, table_path
from andb_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    stream_into_table,
    stream_source,
    tumbling_agg,
)


def test_stream_into_managed_table_idempotent(spark, tmp_path, sf_dir):
    """foreachBatch ingest: the streaming tumbling aggregate maintained
    in a managed table equals the batch aggregate, and a checkpoint
    replay (same batch ids) applies no duplicate effects."""
    from andb_spark.api import AnalyticsEngine

    eng = AnalyticsEngine(str(tmp_path / "wh"), spark=spark)
    eng.execute(
        "create table hourly (window_start timestamp, event_type text,"
        " n bigint, total_value double)"
    )
    events_path = table_path(sf_dir, "events")
    ckpt = str(tmp_path / "ckpt")
    out = tumbling_agg(stream_source(spark, events_path))
    stream_into_table(
        out, eng, "hourly", ["window_start", "event_type"], ckpt
    )
    got = sorted(tuple(r) for r in eng.execute(
        "select window_start, event_type, n, total_value from hourly"
    ).rows)
    batch = sorted(
        tuple(r)
        for r in tumbling_agg(load_table(spark, sf_dir, "events")).collect()
    )
    assert got == batch
    vnum_after = eng.catalog["tables"]["hourly"]["vnum"]

    # Re-run over the same checkpoint: no new data, no replayed effects.
    out2 = tumbling_agg(stream_source(spark, events_path))
    stream_into_table(
        out2, eng, "hourly", ["window_start", "event_type"], ckpt
    )
    assert eng.catalog["tables"]["hourly"]["vnum"] == vnum_after
    got2 = sorted(tuple(r) for r in eng.execute(
        "select window_start, event_type, n, total_value from hourly"
    ).rows)
    assert got2 == batch


def test_stream_equals_batch_tumbling(spark, sf_dir):
    batch = sorted(
        tuple(r) for r in tumbling_agg(load_table(spark, sf_dir, "events")).collect()
    )
    stream = sorted(
        tuple(r)
        for r in stream_events(
            spark, table_path(sf_dir, "events"), tumbling_agg,
            query_name="t_stream_eq",
        ).collect()
    )
    assert batch == stream
    assert len(batch) > 0


def test_sliding_windows_cover_each_event_twice(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    total = sliding_agg(ev).groupBy().sum("n").collect()[0][0]
    # width 1h / slide 30m → every event lands in exactly 2 windows
    assert total == 2 * n_events


def test_session_windows_respect_gap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = session_agg(ev)
    # sessions per user are disjoint: total events preserved
    assert out.groupBy().sum("n_events").collect()[0][0] == ev.count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: an event older than the watermark arriving
    after its window was finalized is dropped, not retro-applied. Two
    micro-batches (maxFilesPerTrigger=1), append mode: batch 1 closes
    window [09:00, 10:00) by advancing the watermark past it; batch 2
    delivers a 09:45 straggler, which must not change the emitted
    count."""
    import datetime as dt
    import time

    from pyspark.sql import functions as F

    from andb_spark.streaming.windows import tumbling_agg

    src = tmp_path / "late_src"
    src.mkdir()
    d = dt.datetime(2024, 1, 1)

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        time.sleep(1.1)  # distinct mtimes -> deterministic file order

    on_time = [
        (1, d + dt.timedelta(hours=9, minutes=5), 1, "click", 1.0),
        (2, d + dt.timedelta(hours=9, minutes=10), 1, "click", 1.0),
        (3, d + dt.timedelta(hours=9, minutes=30), 1, "click", 1.0),
        # pushes watermark to 10:20 (10:30 - 10min), closing [09:00,10:00)
        (4, d + dt.timedelta(hours=10, minutes=30), 1, "click", 1.0),
    ]
    # Spark's late-event filter runs one batch behind eviction
    # (SPARK-24634: watermarkForLateEvents = the PREVIOUS batch's
    # watermark), so the straggler arrives two batches after its window:
    bump = [(6, d + dt.timedelta(hours=12, minutes=0), 1, "click", 1.0)]
    late = [
        (5, d + dt.timedelta(hours=9, minutes=45), 1, "click", 99.0),  # late!
        (7, d + dt.timedelta(hours=13, minutes=0), 1, "click", 1.0),
    ]
    write_batch("b1", on_time)
    write_batch("b2", bump)
    write_batch("b3", late)

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
        .withWatermark("ts", "10 minutes")
    )
    out = tumbling_agg(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["window_start"]: r["n"] for r in spark.table("late_test").collect()
    }
    w9 = d + dt.timedelta(hours=9)
    assert got.get(w9) == 3, got  # the 09:45 straggler was dropped


def test_stream_dedup_ingest_two_batches_idempotent(spark, tmp_path, sf_dir):
    """Continuous dedup ingest (streaming/dedup_ingest.py): documents
    arrive in two micro-batches; the maintained clean corpus must hold
    no exact duplicates and no verified near-dup pair (neither within a
    batch nor ACROSS batches — the cross-batch screen is the maintained
    band table), the band table must exactly reflect the clean corpus,
    and a checkpoint replay must apply no duplicate effects."""
    from pyspark.sql import functions as F

    from andb_spark.api import AnalyticsEngine
    from andb_spark.operators import dedup as DD
    from andb_spark.streaming.dedup_ingest import stream_dedup_ingest

    eng = AnalyticsEngine(str(tmp_path / "wh"), spark=spark)
    eng.execute(
        "create table corpus_clean (doc_id bigint, text text, lang text,"
        " source text, n_chars bigint, text_hash text)"
    )
    eng.execute(
        "create table corpus_bands (doc_id bigint, band int, band_sig text)"
    )
    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_src")
    docs.filter("doc_id < 250").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id >= 250").coalesce(1).write.mode("append").parquet(src)
    ckpt = str(tmp_path / "ckpt_dedup")

    stream_dedup_ingest(
        spark, src, eng, "corpus_clean", "corpus_bands", ckpt,
        max_files_per_trigger=1,
    )

    clean = eng._read_table("corpus_clean")
    n_clean = clean.count()
    n_docs = docs.count()
    assert 0 < n_clean < n_docs  # fixture contains duplicates
    # no exact duplicates survive
    assert clean.select("text_hash").distinct().count() == n_clean
    # no verified near-dup pair anywhere in the accepted corpus —
    # including pairs whose members arrived in different batches
    pairs = DD.minhash_lsh_pairs(
        clean, "text", "doc_id", num_hashes=8, rows_per_band=2,
        threshold=0.5,
    )
    assert pairs.count() == 0
    # the band table is exactly the bands of the clean corpus
    bands = eng._read_table("corpus_bands")
    expect_bands = DD.band_table(clean, "text", "doc_id", 8, 2).select(
        "doc_id", "band", "band_sig"
    )
    assert bands.count() == expect_bands.count()
    assert bands.exceptAll(expect_bands).count() == 0
    # first-seen wins: every first-batch survivor has doc_id < 250 or
    # is genuinely new; at minimum the clean corpus spans both batches
    assert clean.filter("doc_id < 250").count() > 0
    assert clean.filter("doc_id >= 250").count() > 0

    # checkpoint replay: no new versions, identical corpus
    v_clean = eng.catalog["tables"]["corpus_clean"]["vnum"]
    stream_dedup_ingest(
        spark, src, eng, "corpus_clean", "corpus_bands", ckpt,
        max_files_per_trigger=1,
    )
    assert eng.catalog["tables"]["corpus_clean"]["vnum"] == v_clean
    clean2 = eng._read_table("corpus_clean")
    assert clean2.count() == n_clean


def test_stream_ivf_ingest_matches_batch_assignment(spark, tmp_path, sf_dir):
    """Continuous IVF maintenance: embeddings arriving in two
    micro-batches produce exactly the batch ivf_assign result, and a
    checkpoint replay applies no duplicate effects."""
    from pyspark.sql import functions as F

    from andb_spark.api import AnalyticsEngine
    from andb_spark.operators.similarity import ivf_assign
    from andb_spark.streaming.dedup_ingest import stream_ivf_ingest

    eng = AnalyticsEngine(str(tmp_path / "wh"), spark=spark)
    eng.execute(
        "create table ivf_assign (vec_id bigint, centroid_id int,"
        " centroid_sim double)"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    src = str(tmp_path / "emb_src")
    emb.filter("vec_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    emb.filter("vec_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    ckpt = str(tmp_path / "ckpt_ivf")

    stream_ivf_ingest(
        spark, src, eng, "ivf_assign", cents, ckpt, max_files_per_trigger=1
    )
    got = sorted(
        tuple(r)
        for r in eng._read_table("ivf_assign").collect()
    )
    expect = sorted(tuple(r) for r in ivf_assign(emb, cents).collect())
    assert got == expect

    v = eng.catalog["tables"]["ivf_assign"]["vnum"]
    stream_ivf_ingest(
        spark, src, eng, "ivf_assign", cents, ckpt, max_files_per_trigger=1
    )
    assert eng.catalog["tables"]["ivf_assign"]["vnum"] == v


def test_stream_multimodal_ingest_real_decode(spark, tmp_path):
    """Continuous multimodal ingest: BMP files arriving across
    micro-batches land decoded (REAL header parse) metadata rows in the
    managed table exactly once; replay applies nothing twice."""
    from andb_spark.api import AnalyticsEngine
    from andb_spark.streaming.dedup_ingest import stream_multimodal_ingest
    from tests.test_multimodal import PX, make_bmp
    import numpy as np

    eng = AnalyticsEngine(str(tmp_path / "wh"), spark=spark)
    eng.execute(
        "create table img_meta (doc_id bigint, n_bytes bigint,"
        " format text, width int, height int)"
    )
    src = tmp_path / "media"
    src.mkdir()
    (src / "img_001.bmp").write_bytes(make_bmp(PX))
    big = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    (src / "img_002.bmp").write_bytes(make_bmp(big))
    ckpt = str(tmp_path / "ckpt_mm")

    stream_multimodal_ingest(
        spark, str(src), eng, "img_meta", ckpt,
        glob="*.bmp", max_files_per_trigger=1,
    )
    rows = {r["doc_id"]: r for r in
            eng._read_table("img_meta").collect()}
    assert set(rows) == {1, 2}
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("bmp", 3, 2)
    assert (rows[2]["width"], rows[2]["height"]) == (6, 4)

    # new file arrives; only it is decoded and appended
    (src / "img_003.bmp").write_bytes(make_bmp(PX[:, :2]))
    v = eng.catalog["tables"]["img_meta"]["vnum"]
    stream_multimodal_ingest(
        spark, str(src), eng, "img_meta", ckpt,
        glob="*.bmp", max_files_per_trigger=1,
    )
    rows = {r["doc_id"]: r for r in
            eng._read_table("img_meta").collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[3]["width"], rows[3]["height"]) == (2, 2)
    assert eng.catalog["tables"]["img_meta"]["vnum"] > v


def test_stream_mark_is_keyed_on_checkpoint_identity():
    """A FRESH checkpoint restarts batch ids at 0; the exactly-once
    mark must not classify those as replays (that would silently drop
    every new batch until the old high-water mark was passed)."""
    from andb_spark.streaming.dedup_ingest import (
        _already_applied,
        _batch_mark,
    )

    mark = _batch_mark("/tmp/ckpt_a", 41)["last_stream_batch"]
    meta = {"last_stream_batch": mark}
    assert _already_applied(meta, "/tmp/ckpt_a", 41)       # replay
    assert _already_applied(meta, "/tmp/ckpt_a", 40)       # older replay
    assert not _already_applied(meta, "/tmp/ckpt_a", 42)   # new batch
    # different checkpoint = different stream identity: batch 0 is NEW
    assert not _already_applied(meta, "/tmp/ckpt_b", 0)
    # legacy integer marks (pre-sid catalogs) keep their old meaning
    assert _already_applied({"last_stream_batch": 5}, "/tmp/x", 3)
    assert not _already_applied({"last_stream_batch": 5}, "/tmp/x", 6)
    assert not _already_applied({}, "/tmp/x", 0)


def test_dedup_ingest_novel_text_survives_taken_id_duplicate(
    spark, tmp_path
):
    """r4 review finding: a novel text delivered in one batch under
    BOTH a taken id and a fresh id must survive via the fresh id. The
    old order picked min-id per hash first, crowned the taken id as
    the hash's only candidate, then the id screen discarded it —
    silently losing a first-seen document."""
    from andb_spark.api import AnalyticsEngine
    from andb_spark.streaming.dedup_ingest import stream_dedup_ingest

    eng = AnalyticsEngine(str(tmp_path / "wh"), spark=spark)
    eng.execute(
        "create table cc (doc_id bigint, text text, text_hash text)"
    )
    eng.execute("create table cb (doc_id bigint, band int, band_sig text)")
    src = str(tmp_path / "src")
    # batch 1: id 5 with some old text
    spark.createDataFrame(
        [(5, "completely different ancient words " * 6)],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: novel text 'a...' under taken id 5 AND fresh id 7
    novel = "a brand new never seen before sentence " * 6
    spark.createDataFrame(
        [(5, novel), (7, novel)], "doc_id bigint, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream_dedup_ingest(
        spark, src, eng, "cc", "cb", str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    rows = {
        (r["doc_id"], r["text"])
        for r in eng._read_table("cc").collect()
    }
    ids = {i for i, _ in rows}
    assert 5 in ids          # first write for id 5 kept
    assert 7 in ids, rows    # the novel text survived via the fresh id
    assert (5, novel) not in rows  # id 5's text was NOT overwritten
