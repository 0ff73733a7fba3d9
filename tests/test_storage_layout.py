"""Storage-layout scale tests: partitioned writes with partition
pruning, and bucketed tables whose joins need no shuffle.

At 100 TB the physical layout IS the index (SURVEY §2.1: the
reference's B+tree maps to partition/file pruning here): a
date-partitioned fact table turns time filters into directory pruning,
and pre-bucketing co-located join keys removes the dominant shuffle
from repeated fact-fact joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from andb_spark.catalog import load_table
from andb_spark.operators.zorder import zorder


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "lineitem_by_month")
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.partitionBy("ship_month")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    one_month = back.filter(F.col("ship_month") == "1996-03").select(
        F.sum("l_quantity").alias("q")
    )
    plan = _plan(one_month)
    # The month filter must prune at the directory level, not post-scan.
    assert "PartitionFilters" in plan
    assert "ship_month" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # and the pruned scan reads a fraction of the partitions
    n_parts = back.select("ship_month").distinct().count()
    assert n_parts > 12  # sanity: fixture spans years


def test_signlsh_bucket_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """The sign-LSH scale claim, demonstrated: embeddings written
    partitioned by their LSH bucket turn an ANN probe's candidate test
    into DIRECTORY-level partition pruning — the probe reads only the
    matching bucket dirs, never the corpus."""
    from andb_spark.operators.similarity import sign_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "emb_by_bucket")
    (
        emb.withColumn("bucket", sign_bucket("embedding", 4))
        .write.partitionBy("bucket")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    probe = back.filter(F.col("bucket") == "0101").select(
        F.count(F.lit(1)).alias("n")
    )
    plan = _plan(probe)
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    # every 4-bit bucket with members got its own directory
    n_buckets = back.select("bucket").distinct().count()
    assert 2 <= n_buckets <= 16


def test_bucketed_join_needs_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key into the same bucket count
    sort-merge-join with NO Exchange on either side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    (
        li.select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bkt")
    )
    (
        o.select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("o_bkt")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bkt")
            .join(
                spark.table("o_bkt"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        )
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")
    join_part = plan.split("SortMergeJoin", 1)[0]
    assert "SortMergeJoin" in plan, plan
    # no hash-repartitioning exchange feeds the join: bucket layout
    # already co-locates both sides
    assert "Exchange hashpartitioning" not in join_part, plan


def test_zorder_narrows_per_file_ranges_on_both_columns(spark, sf_dir, tmp_path):
    """Z-ordering on (l_partkey, l_suppkey) must give narrow per-file
    value ranges on BOTH columns — that is the property Parquet footer
    min/max skipping needs. A linear sort only achieves it for the
    leading column (the secondary column spans ~the full range in every
    file), which is exactly what this asserts."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    n_files = 16

    z_out = str(tmp_path / "z")
    zorder(li, ["l_partkey", "l_suppkey"], num_partitions=n_files).write.parquet(z_out)
    lin_out = str(tmp_path / "lin")
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(lin_out)
    )

    def avg_file_span(path: str, col: str) -> float:
        df = spark.read.parquet(path)
        lo, hi = df.agg(F.min(col), F.max(col)).first()
        spans = (
            df.groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .first()[0]
        )
        return spans / max(hi - lo, 1)

    # Linear sort: leading column clusters tightly, secondary does not.
    assert avg_file_span(lin_out, "l_partkey") < 0.15
    assert avg_file_span(lin_out, "l_suppkey") > 0.6
    # Z-order: both columns cluster well below the unclustered baseline.
    z_part = avg_file_span(z_out, "l_partkey")
    z_supp = avg_file_span(z_out, "l_suppkey")
    assert z_part < 0.5, z_part
    assert z_supp < 0.5, z_supp


def test_zorder_preserves_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = zorder(li, ["l_partkey", "l_suppkey"], num_partitions=4)
    assert z.count() == li.count()
    assert z.columns == li.columns

def test_incremental_band_join_shuffle_free_on_history(spark, sf_dir, tmp_path):
    """The incremental-dedup scale claim (operators/dedup.py::band_table):
    with the historical band table BUCKETED by (band, band_sig), the
    nightly increment-vs-history candidate join shuffles only the
    (tiny) increment side — the history scan feeds the join with no
    Exchange."""
    from andb_spark.operators.dedup import band_table

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") < 400)
    inc = docs.filter(F.col("doc_id") >= 400)
    spark.sql("DROP TABLE IF EXISTS bands_hist")
    (
        band_table(hist, "text", "doc_id")
        .write.bucketBy(8, "band", "band_sig")
        .sortBy("band", "band_sig")
        .mode("overwrite")
        .saveAsTable("bands_hist")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bands_hist").withColumnRenamed(
            "doc_id", "id_a"
        ).join(
            band_table(inc, "text", "doc_id").withColumnRenamed(
                "doc_id", "id_b"
            ),
            ["band", "band_sig"],
        ).select("band", "band_sig", "id_a", "id_b")
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bands_hist")
    assert "SortMergeJoin" in plan, plan
    # The history side (left child: first FileScan after the join node)
    # is the bucketed scan, fed with no repartitioning exchange.
    left_child = plan.split("SortMergeJoin", 1)[1].split("FileScan", 1)[0]
    assert "Exchange hashpartitioning" not in left_child, plan
    first_scan = plan.split("SortMergeJoin", 1)[1].split("FileScan", 1)[1]
    first_scan_line = first_scan.splitlines()[0]
    assert "Bucketed: true" in first_scan_line, first_scan_line
