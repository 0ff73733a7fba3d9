"""Relational operator coverage (SURVEY.md §2.1-§2.7, §2.10).

Each query exercises one row (or a tight cluster) of the reference's
declared operator inventory, expressed with the DataFrame API so
Catalyst owns the physical plan. The DuckDB oracle SQL for each lives in
``ORACLES`` with identical output column names (the driver sorts columns
by name and hash-compares values).

Determinism rules applied throughout (required for hash-matching an
independent engine):
- Double aggregates are wrapped in ``round(x, 2)`` (money) or
  ``round(x, 6)`` (ratios/averages) on BOTH sides, absorbing the
  few-ulp differences of different summation orders.
- AVERAGES of exact-decimal inputs use ``round(round(sum, d)/n, 6)``,
  never ``round(avg, 6)``: the true sum is a multiple of 10^-d so the
  inner round is boundary-safe, making the division bit-identical —
  a direct rounded average can land exactly ON a rounding boundary
  where summation order decides the digit (bit us at sf0.1).
  Averages of integer inputs are exact already (integer sums are
  exact in doubles) and stay plain.
- Window/limit queries order by a key suffix that is globally unique so
  row_number/limit frontiers are unambiguous.

Scale notes: joins against region/nation/supplier/part are explicitly
broadcast (they are bounded-size dims — andb_spark.catalog.
BROADCAST_TABLES); fact-fact joins (lineitem x orders) shuffle on the
join key, which AQE re-plans at runtime. Aggregations are partial
(map-side combine) by construction in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from andb_spark.catalog import BROADCAST_TABLES, load_table
from andb_spark.session import tune_for_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_for_session(spark)
    df = load_table(spark, sf_dir, name)
    return F.broadcast(df) if name in BROADCAST_TABLES else df


# --------------------------------------------------------------------------
# §2.4 aggregation — flagship: TPC-H Q1-shaped pricing summary.
# Reference parity: HashAggregation (physical/select.py:690-759) supports ONE
# group column and ONE aggregate; this is the generalized form (multi-column
# group, 7 aggregates incl. avg/count), all map-side-combinable.
# --------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            # exact-decimal averages: round(sum,2) is exact for the
            # 2-decimal inputs, so sum/n then round(6) is bit-identical
            # across engines (a direct round(avg,6) can land ON a
            # rounding boundary where summation-order ulps flip it)
            F.round(
                F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.round(
                F.round(F.sum("l_discount"), 2) / F.count(F.lit(1)), 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate without GROUP BY — 🛑 in the reference
    (transformations.py:178-181 rejects it)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (reference: HAVING as post-agg filter,
    implementations.py:184-188)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 3)
        .orderBy("o_custkey")
    )


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey", "l_partkey").alias("n_supp_part"),
    ).orderBy("l_returnflag")


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns (oracle: CASE-WHEN aggregates)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, group, top-10 — multi-way join the
    reference cannot run (one join max, transformations.py:161-162)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join with broadcast dims, grouped by nation."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        r.filter(F.col("r_name") == "ASIA")
        .join(n, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER (reference NestedLoopJoin.outer_join select.py:558-597)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        c.join(agg, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER (reference swaps to left, select.py:525-526)."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
        .orderBy("n_name")
    )


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER (reference full_join select.py:599-652)."""
    c = _t(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = _t(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        c.join(s, F.col("c_nationkey") == F.col("s_nationkey"), "full")
        .select(
            F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias(
                "nationkey"
            ),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI = EXISTS (reference: TODO comment only, select.py:481)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI = NOT EXISTS."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 300000)
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN of two bounded dims (reference cross_join
    select.py:549-552, implicit `FROM a, b`)."""
    r = _t(spark, sf_dir, "region")
    pr = (
        _t(spark, sf_dir, "part")
        .select("p_brand")
        .distinct()
    )
    return (
        r.crossJoin(pr)
        .select("r_name", "p_brand")
        .orderBy("r_name", "p_brand")
    )


def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: suppliers richer than their nation's average
    customer balance. Reference inner_join is theta-capable
    (select.py:554-556); Spark plans BNLJ/broadcast for this."""
    s = _t(spark, sf_dir, "supplier")
    nat_avg = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        # round(·,6) on BOTH sides before the comparison (module
        # determinism rule): an unrounded double average could land on
        # opposite sides of the '>' for the two engines' summation
        # orders when a supplier balance sits within an ulp of it
        .agg(F.round(F.avg("c_acctbal"), 6).alias("avg_bal"))
    )
    return (
        s.join(
            F.broadcast(nat_avg),
            (F.col("s_nationkey") == F.col("c_nationkey"))
            & (F.col("s_acctbal") > F.col("avg_bal")),
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# §2.2 filter / predicates / expressions
# --------------------------------------------------------------------------
def q_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IN / BETWEEN / IS NULL / AND-OR — the reference's declared
    but unexecutable predicate set (ExprOperation, utils.py:42-59)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").like("%red%")
            & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & F.col("p_size").between(5, 40)
            & F.col("p_retailprice").isNotNull()
        )
        .select("p_partkey", "p_name", "p_brand", "p_size")
        .orderBy("p_partkey")
    )


def q_case_cast_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / CAST / || concat — all 🛑 in the reference
    (SURVEY §2.2: lexer tokens without grammar rules)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 300000, F.lit("big"))
            .when(F.col("o_totalprice") >= 100000, F.lit("mid"))
            .otherwise(F.lit("small"))
            .alias("bucket"),
            F.floor(F.col("o_totalprice")).cast("bigint").alias("price_int"),
            F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias(
                "status_prio"
            ),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_upper"),
            F.substring(F.col("p_name"), 1, 5).alias("name_prefix"),
            F.length(F.col("p_name")).alias("name_len"),
            F.regexp_replace(F.col("p_type"), "[aeiou]", "").alias("type_novowel"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        )
        .orderBy("p_partkey")
        .limit(150)
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("yr", "qtr")
    )


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt(F.col("l_extendedprice")), 6).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.pmod(F.col("l_partkey"), F.lit(7)).alias("pk_mod"),
            F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_bucket"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# §2.5 sort / limit / distinct / top-k
# --------------------------------------------------------------------------
def q_sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY asc/desc (reference Sort select.py:761-856)."""
    c = _t(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    )


def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT+OFFSET — parsed but never wired in the reference
    (parser_.py:115-148, transformations.py:199)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(20)
    )


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — 🛑 DuplicateRemovalOperator never planned
    (logical.py:284-286)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority class (window + filter — Spark plans
    this as a per-partition TopK, no full sort)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rk")
    )


# --------------------------------------------------------------------------
# §2.6 set operations — all 🛑 in the reference (no planner rule)
# --------------------------------------------------------------------------
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.lit("customer").alias("side"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("side"),
    )
    return (
        c.unionAll(s)
        .groupBy("nationkey", "side")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey", "side")
    )


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


# --------------------------------------------------------------------------
# §2.8 window functions — lexer-only in the reference
# --------------------------------------------------------------------------
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(
                Window.partitionBy("o_custkey").orderBy("o_orderdate")
            ).alias("rk"),
            F.lag("o_totalprice", 1).over(w).alias("prev_price"),
            F.lead("o_totalprice", 1).over(w).alias("next_price"),
            F.round(
                F.sum("o_totalprice").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                2,
            ).alias("running_spend"),
        )
        .orderBy("o_custkey", "rn")
    )


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME variants beyond the default: a RANGE frame (peers
    by value distance — here a trailing 7-day spend window per
    customer), a bounded ROWS frame (3-order moving sum), and the
    rank-family distribution functions (ntile/percent_rank/cume_dist).
    One shuffle on o_custkey serves every window — all frames share the
    same partitioning."""
    o = _t(spark, sf_dir, "orders")
    day = F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("long")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_day = Window.partitionBy("o_custkey").orderBy(day)
    return (
        o.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            # decimal, not double: a 3-row avg rounded to cents straddles
            # the .xx5 boundary often enough that float summation order
            # flips the last digit vs the oracle; decimal math is exact
            # on both engines
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(
                    by_day.rangeBetween(-7, 0)
                ),
                2,
            ).cast("double").alias("spend_7d"),
            # sum, not avg: DuckDB's avg(DECIMAL) returns double, which
            # reintroduces the rounding race; a decimal SUM over the
            # same 3-row frame is exact on both engines
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(
                    base.rowsBetween(-2, 0)
                ),
                2,
            ).cast("double").alias("sum3"),
            F.ntile(4).over(base).alias("quartile"),
            F.round(F.percent_rank().over(base), 6).alias("pr"),
            F.round(F.cume_dist().over(base), 6).alias("cd"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation functions (first_value / last_value /
    nth_value) with an explicit full-partition frame — the remaining
    window subfamily next to ranks, offsets (lag/lead), and frames.
    Default frames end at CURRENT ROW, so last_value needs the explicit
    UNBOUNDED FOLLOWING bound to mean "the partition's last": the
    classic window gotcha, pinned here identically in both engines.
    Same single shuffle on the partition key as every other window."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first_value("o_orderkey").over(w).alias("first_order"),
            F.last_value("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# §2.10 subqueries / CTE — NotImplementedError in the reference
# (transformations.py:278-279)
# --------------------------------------------------------------------------
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        )
        ORDER BY o_orderkey
        """
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        FROM lineitem
        WHERE l_extendedprice > (SELECT avg(l_extendedprice) * 1.9 FROM lineitem)
        ORDER BY l_orderkey, l_linenumber
        """
    )


def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH spend AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, s.total_spend, s.n_orders
        FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
        WHERE s.n_orders >= 4
        ORDER BY c.c_custkey
        """
    )


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
        """
    )


# --------------------------------------------------------------------------
# TPC-H-shaped headline queries (adapted to the fixture schema, which has
# no l_shipmode/l_commitdate/ps_supplycost). These are the bench-breadth
# set: filter-only agg (q6), fact-fact-dim join + top-k (q10), broadcast
# ratio agg (q14), and a having-subquery double agg over the fact (q18).
# --------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+global agg — the pushdown showcase.
    All three predicates reach the parquet reader (min/max row-group
    skipping); no shuffle at all (partial sums + single final add)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, per customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q14_type_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ECONOMY-part revenue share in one ship-month.
    part is broadcast; the conditional and total sums share one pass."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "ECONOMY", disc_price).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(disc_price),
                6,
            ).alias("economy_share_pct")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a threshold,
    with customer context. The HAVING subquery and the outer agg reuse
    the same shuffle key (l_orderkey)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 210)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation on a pathologically hot key —
    l_returnflag has 3 distinct values across the whole fact table, so a
    naive single-phase shuffle lands everything on 3 reducers. The
    (key, salt) phase spreads each flag over 16 reducers first
    (operators/skew.py). Result identical to a plain GROUP BY."""
    from andb_spark.operators.skew import salted_aggregate

    li = _t(spark, sf_dir, "lineitem")
    return salted_aggregate(
        li,
        keys=["l_returnflag"],
        salt_cols=["l_orderkey", "l_linenumber"],
        partial_aggs={
            "n": F.count(F.lit(1)),
            "qty": F.sum("l_quantity"),
            "max_price": F.max("l_extendedprice"),
        },
        final_aggs={
            "n": F.sum("n"),
            "qty": F.round(F.sum("qty"), 2),
            "max_price": F.round(F.max("max_price"), 2),
        },
        n_salts=16,
    ).orderBy("l_returnflag")


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over the events stream table: users grouped by
    first-seen day, counted per day-offset of later activity — the
    standard product-analytics rollup. Distinct (user, day) activity
    first (collapses the fact table to user-days before any join), the
    per-user cohort min reuses that reduced table, and the final
    distinct-count shuffles user-days, not raw events."""
    e = _t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .withColumn("offset_days", F.datediff("day", "cohort_day"))
        .groupBy("cohort_day", "offset_days")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "offset_days")
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over the events table: signup → first view AFTER
    the signup → first purchase AFTER that view, per user; output is the
    user count surviving each stage. Each stage is a time-conditional
    semi-join on the previous stage's frontier timestamp — the classic
    sequence-analytics shape (three shuffles on user_id, each input
    pre-filtered by event type). The s1/s2 frontiers are lazily
    persisted (shared cache registry): the three crossJoined count
    branches would otherwise re-evaluate s1 three times and s2 twice —
    ~6 corpus scans for three scalar counts."""
    from andb_spark.caching import persist_tracked as _persist_tracked

    ev = _t(spark, sf_dir, "events")
    s1 = _persist_tracked(
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = _persist_tracked(
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_viewed")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchased")))
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the
    events.props JSON payload and aggregate it per event type.
    get_json_object is a JVM-side codegen'd path expression — at scale
    the JSON parse happens once per row inside the scan stage, no
    Python. (For repeated multi-field extraction, from_json to a struct
    would parse once for all fields.)"""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (30 min), the lag-flag →
    running-sum method — the batch mirror of the streaming
    session_window query (s_session). Per-user event streams are
    windowed (one shuffle on user_id), session ids are cumulative sums
    of new-session flags, then sessions roll up into a bounded
    session-length histogram. Gap arithmetic is integer microseconds
    (unix_micros) so both engines compare exact values; session
    membership depends only on the sorted timestamp multiset, so
    equal-timestamp tie order cannot change the result."""
    ev = _t(spark, sf_dir, "events")
    # Both windows share one spec (same partition key, same sort key) so
    # Catalyst plans ONE exchange + ONE sort and chains the window
    # functions; the session rollup's groupBy(user_id, sid) is then
    # satisfied by the existing user_id partitioning — no re-shuffle.
    staged = ev.select("user_id", F.unix_micros(F.col("ts")).alias("us"))
    w = Window.partitionBy("user_id").orderBy("us")
    gap_us = F.col("us") - F.lag("us").over(w)
    flagged = staged.select(
        "user_id",
        "us",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    per_session = (
        flagged.withColumn("sid", F.sum("new_s").over(wc))
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round((F.max("us") - F.min("us")) / F.lit(1e6), 6).alias("dur"),
        )
    )
    return (
        per_session.groupBy("n_events")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.round(F.sum("dur"), 6) / F.count(F.lit(1)), 6
            ).alias("avg_duration_secs"),
        )
        .orderBy("n_events")
    )


def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (ANSI listagg, new in Spark 4): the nations
    of each region as one ordered comma-joined string — deterministic
    via WITHIN GROUP (ORDER BY). The oracle is DuckDB's native
    string_agg with its ORDER BY clause; both engines must produce the
    identical joined string, so separator and ordering semantics are
    externally checked."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                   AS nations,
               count(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    )


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (new in Spark 4; the reference's planner rejects
    ANY subquery — transformations.py:278-279 — so recursion is a
    strict superset of its declared surface): a recursively generated
    daily date spine left-joined to orders, the gap-filling-by-
    recursion twin of q_gapfill's sequence() formulation. Oracle is
    the identical recursive SQL in DuckDB."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE d(dt) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT dt + INTERVAL '1' DAY FROM d
            WHERE dt < DATE '1995-02-28'
        )
        SELECT d.dt, count(o.o_orderkey) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0.0), 2) AS revenue
        FROM d LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = d.dt
        GROUP BY d.dt ORDER BY d.dt
        """
    )


def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (native in Spark 4.1 AND DuckDB —
    the grouping keys are inferred as every non-aggregate select item,
    the ordering as every select item left-to-right): the q1-shaped
    pricing rollup spelled with both inference clauses. The oracle is
    the IDENTICAL SQL in DuckDB, so the two engines' inference rules
    are checked against each other, not just our reading of the docs.
    Same plan as an explicit GROUP BY — one partial+final agg shuffle."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_quantity < 24
        GROUP BY ALL
        ORDER BY ALL
        """
    )


def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery join (native in Spark 4 AND DuckDB;
    the reference's planner rejects ANY subquery —
    transformations.py:278-279): per-customer order statistics via a
    correlated aggregate in the FROM clause. Spark decorrelates the
    lateral into an aggregate + equi-join (no per-row re-execution —
    the plan a 100 TB run needs); DuckDB runs its native lateral.
    Identical SQL both engines."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, l.n_orders, l.top_price
        FROM customer c, LATERAL (
            SELECT count(o_orderkey) AS n_orders,
                   max(o_totalprice) AS top_price
            FROM orders o WHERE o.o_custkey = c.c_custkey
        ) l
        WHERE l.n_orders >= 5
        ORDER BY c_custkey
        """
    )


def q_pivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard PIVOT syntax (Spark's relation-pivot clause; DuckDB
    accepts the same spelling alongside its own PIVOT..USING dialect):
    order revenue per priority pivoted across the three order states.
    Complements q_pivot, which grades the same reshaping through the
    DataFrame groupBy().pivot() API — this row grades the PARSER
    surface with identical SQL in both engines. The aggregate stays
    bare sum() inside PIVOT (DuckDB rejects wrapped aggregates there);
    rounding happens outside."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(coalesce(open_rev, 0.0), 2) AS open_rev,
               round(coalesce(done_rev, 0.0), 2) AS done_rev,
               round(coalesce(part_rev, 0.0), 2) AS part_rev
        FROM (
            SELECT o_orderpriority, o_orderstatus, o_totalprice
            FROM orders
        ) PIVOT (
            sum(o_totalprice)
            FOR o_orderstatus IN ('O' AS open_rev, 'F' AS done_rev,
                                  'P' AS part_rev)
        )
        ORDER BY o_orderpriority
        """
    )


def q_values_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation (native in Spark 4.1 AND DuckDB with the
    parenthesized `(VALUES ...) AS t(cols)` spelling — the reference's
    parser only accepts VALUES inside INSERT, parser_.py): a literal
    priority→weight lookup joined against orders, exercising NULL
    literals and cross-type inference inside the list. IDENTICAL SQL
    both engines; a broadcast of a literal relation — no scan, no
    shuffle on the VALUES side at any scale."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT w.tier, count(*) AS n_orders,
               round(sum(o.o_totalprice * w.weight), 2) AS wrev
        FROM orders o
        JOIN (VALUES ('1-URGENT', 2.0, 'hot'),
                     ('2-HIGH', 1.5, 'hot'),
                     ('3-MEDIUM', 1.0, 'warm'),
                     ('4-NOT SPECIFIED', 1.0, 'warm'),
                     ('5-LOW', 0.5, 'cold')) AS w(prio, weight, tier)
          ON o.o_orderpriority = w.prio
        GROUP BY w.tier
        ORDER BY w.tier
        """
    )


def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() super-aggregate indicator over ROLLUP (native in
    Spark AND DuckDB — the standard way to tell a real NULL group from
    a rollup subtotal row): per-(returnflag, linestatus) revenue with
    each row labeled by which keys are rolled up. IDENTICAL SQL both
    engines, so the two GROUPING() bit conventions are checked against
    each other. Same single partial+final agg shuffle as a plain
    rollup."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '(all)') AS rf,
               coalesce(l_linestatus, '(all)') AS ls,
               GROUPING(l_returnflag) AS g_rf,
               GROUPING(l_linestatus) AS g_ls,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls
        """
    )


def q_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-projection with column exclusion — Spark spells it
    `* EXCEPT (cols)`, DuckDB spells the same operation `* EXCLUDE
    (cols)`, so this differential grades the RESULT (the driver
    compares values, not SQL text): nation with the comment column
    dropped. Column pruning reaches the scan exactly as an explicit
    projection would."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        "SELECT * EXCEPT (c_name, c_acctbal) FROM customer"
        " ORDER BY c_custkey"
    )


def q_tablesample_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE invariant-bound row (the library-only/bound-twin
    pattern: engines' samplers can't emit identical rows, so the
    driver grades deterministic INVARIANTS). Spark's
    `TABLESAMPLE (10 PERCENT) REPEATABLE (seed)` per-partition
    Bernoulli sample of orders is checked for (a) cardinality inside
    a ±5-sigma binomial window around 10% — true under ANY partition
    layout, so the row is stable across executors/core counts — and
    (b) the subset property: zero sampled keys outside the base table
    (an anti-join that Spark plans as a broadcast null-safe hash
    anti). The oracle recomputes the window arithmetic exactly from
    the base count."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH s AS (
            SELECT o_orderkey FROM orders
            TABLESAMPLE (10 PERCENT) REPEATABLE (42)
        ),
        base AS (SELECT count(*) AS n FROM orders)
        SELECT
            (SELECT count(*) FROM s) BETWEEN
                CAST(0.10 * n - 5 * sqrt(n * 0.10 * 0.90) AS BIGINT)
                AND CAST(0.10 * n + 5 * sqrt(n * 0.10 * 0.90) AS BIGINT)
                AS n_in_window,
            (SELECT count(*) FROM s
             WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders))
                AS n_outside
        FROM base
        """
    )


def q_unpivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard UNPIVOT clause (native in Spark 4.1 AND DuckDB
    with the same `UNPIVOT (val FOR name IN (cols))` spelling):
    lineitem's per-line charge components melted into (component,
    amount) rows and aggregated. IDENTICAL SQL both engines. UNPIVOT
    is a generate/expand — no shuffle beyond the final aggregation."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT component, round(sum(amount), 2) AS total,
               count(*) AS n
        FROM (
            SELECT l_quantity, l_extendedprice, l_discount, l_tax
            FROM lineitem WHERE l_orderkey < 2000
        ) UNPIVOT (amount FOR component IN
                   (l_extendedprice, l_discount, l_tax))
        GROUP BY component
        ORDER BY component
        """
    )


def q_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause (native both engines — one window spec
    shared by several functions instead of repeating the OVER body):
    per-priority revenue rank and running share over the same spec.
    Spark plans ONE WindowExec for all functions sharing the named
    spec — the reuse is physical, not just syntactic."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority,
               rank() OVER w AS rk,
               round(sum(o_totalprice) OVER w, 2) AS run_rev
        FROM orders
        WHERE o_orderkey < 1000
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderpriority, rk
        """
    )


def q_is_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe comparison predicates `IS [NOT] DISTINCT FROM`
    (native both engines; the reference's 3VL `=` can never match
    NULLs): events bucketed by whether json-extracted props values
    null-safely equal a probe — counts differ from `=` exactly on the
    NULL rows, which is the semantic under test."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT
            count(*) AS n_total,
            sum(CASE WHEN nullif(event_type, 'click')
                     IS DISTINCT FROM 'purchase' THEN 1 ELSE 0 END)
                AS n_distinct_from_purchase,
            sum(CASE WHEN nullif(event_type, 'click')
                     IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
                AS n_null_safe_null,
            sum(CASE WHEN nullif(event_type, 'click') = 'purchase'
                     THEN 1 ELSE 0 END) AS n_eq_purchase
        FROM events
        WHERE event_id < 20000
        """
    )


def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST (native both engines — NULL on conversion failure
    instead of a runtime error; the ANSI-safe ingestion idiom for
    dirty columns): parse the numeric k out of the props JSON string
    with a regexp, TRY_CAST both it and a deliberately unparseable
    slice, and aggregate. IDENTICAL SQL both engines."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT
            count(TRY_CAST(regexp_extract(props, '[0-9]+', 0)
                           AS BIGINT)) AS n_parsed,
            count(TRY_CAST(event_type AS BIGINT)) AS n_unparseable,
            sum(TRY_CAST(regexp_extract(props, '[0-9]+', 0)
                         AS BIGINT)) AS k_sum
        FROM events
        WHERE event_id < 20000
        """
    )


def q_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clause (ANSI; native in Spark 4.1
    AND DuckDB): conditional aggregation without CASE scaffolding —
    per-priority order counts split by status in ONE grouped pass
    (each FILTER is a predicate on the aggregate's input, not an extra
    scan or join). IDENTICAL SQL both engines."""
    spark = tune_for_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
               round(sum(o_totalprice)
                     FILTER (WHERE o_totalprice > 100000), 2)
                   AS rev_large
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


def q_quantified_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI quantified comparisons — ``ANY`` / ``ALL`` / ``SOME``
    subqueries (native in DuckDB/Postgres, absent from Spark SQL;
    engine rewrite api.py::_rewrite_quantified with exact 3VL,
    differential-pinned per (op, quantifier, set-shape) in
    test_parser_surfaces_differential.py): orders strictly above ALL
    the large-quantity line prices, and at-or-below ANY small-part
    retail price. Each quantifier costs one scalar aggregation of its
    subquery (broadcast literal), never a per-row join. This goes
    through the ENGINE's SQL path; the oracle is the identical SQL on
    DuckDB's native implementation."""
    from andb_spark.api import AnalyticsEngine
    from andb_spark.workloads.engine_q import _scratch

    eng = AnalyticsEngine(
        _scratch("andb_quant_"), spark=spark, attach_dir=sf_dir
    )
    r = eng.execute(
        "select count(*) as n_above_all,"
        " sum(case when o_totalprice <= any"
        "  (select p_retailprice from part where p_size <= 2)"
        "  then 1 else 0 end) as n_below_any_small"
        " from orders"
        " where o_totalprice > all"
        "  (select l_extendedprice from lineitem where l_quantity >= 49)"
    )
    from andb_spark.workloads.engine_q import _rows_df

    return _rows_df(
        spark, r.rows, "n_above_all bigint, n_below_any_small bigint"
    )


def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill — the reference's roadmap
    'time-series module' (README.md:5) realized: build the complete
    hourly spine (sequence(min, max, 1 hour) × event types), left-join
    the hourly rollup onto it, fill missing counts with 0 and carry the
    last observed average forward (last ignorenulls window). Everything
    after the one fact-table aggregation shuffle operates on
    rollup-sized data: the spine is hours × types (bounded), so the
    spine join, the forward-fill window, and the output sort never see
    the fact table."""
    ev = _t(spark, sf_dir, "events")
    # avg computed as round(sum,2)/n: the 2-decimal sum is exact (input
    # values are 2-decimal, so the true sum is a multiple of 0.01 —
    # never near a rounding boundary), making the division and final
    # round bit-identical across engines. A direct round(avg, 6) can
    # land ON a boundary, where summation-order ulps flip the digit
    # (observed at sf0.1).
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.round(F.sum("value"), 2) / F.count(F.lit(1)), 6
        ).alias("avg_value"),
    )
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    ).crossJoin(ev.select("event_type").distinct())
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("avg_value", ignorenulls=True)
            .over(w)
            .alias("avg_value_ff"),
        )
        .orderBy("hour", "event_type")
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-day HllSketch of active
    users (hll_sketch_agg, Datasketches HLL), merged with hll_union_agg
    into the overall estimate WITHOUT rescanning the fact table — the
    incremental-rollup pattern for 100 TB: store the per-day sketch
    column in a stats table; any date-range distinct count is then a
    sketch merge over days, not a fact scan. Sketch inserts and unions
    are commutative/idempotent, so the estimate is deterministic under
    Spark's partition-order nondeterminism. No DuckDB oracle (different
    sketch implementation) — accuracy is unit-tested against exact
    countDistinct (tests/test_operators.py)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    return (
        daily.agg(
            F.count(F.lit(1)).alias("n_days"),
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias(
                "distinct_users_est"
            ),
        )
    )


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type anomaly screen: events whose value is ≥3 sample
    standard deviations from their event type's mean. The mean/std
    table is type-sized, so it broadcasts back onto the fact scan —
    one partial-aggregated shuffle for the moments, then a pure scan
    filter; at 100 TB the second pass reads the same partitions with
    the thresholds inlined. mu/sd are rounded (module determinism rule:
    double aggregates round on both sides before any comparison — a row
    ulps from the 3-sigma boundary must not flip between Spark's and
    DuckDB's summation orders), and sd > 0 guards the all-equal group
    whose 0/0 zscore is engine-divergent."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("sd") > 0)
            & (F.abs(F.col("value") - F.col("mu")) >= 3 * F.col("sd"))
        )
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4).alias(
                "zscore"
            ),
        )
        .orderBy("event_id")
    )


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance, correlation and
    covariance — single-pass partial-aggregatable moments (each is a
    map-side-combinable sum of powers), so one shuffle regardless of
    data size. Rounded on both sides: the moment sums are
    order-sensitive in floating point."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qp"
            ),
        )
        .orderBy("l_returnflag")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median + quartiles) matching
    DuckDB's quantile_cont. Exact percentile requires a full sort of
    the group — at 100 TB swap in approx_percentile (t-digest sketch,
    one pass, mergeable); kept exact here because the oracle gate
    hash-compares values."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-flag totals,
    per-(flag,status) detail, and the grand total in ONE pass — Spark
    expands the sets map-side, so the fact table is still read once."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_returnflag", "l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregation: HyperLogLog++ approximate distinct counts.
    At 100 TB approx_count_distinct replaces the exact two-shuffle
    distinct with a constant-memory mergeable sketch — the standard
    cardinality path for dashboards. No oracle (DuckDB's HLL yields
    different estimates); accuracy is unit-tested against the exact
    count (tests/test_operators.py::test_approx_distinct_accuracy)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


def q_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gradable twin of q_approx_distinct (VERDICT r4 #6): the
    HLL++ estimate can't match DuckDB's sketch, but the bounded-error
    INVARIANT can — per group, |approx − exact| ≤ 5% · exact (2.5× the
    rsd=0.02 standard error; Spark's HLL++ is deterministic for fixed
    data, so the boolean is reproducible, and the oracle states the
    expected TRUE per group as a literal). Grades the sketch against
    the exact count at whatever SF the driver runs."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
        F.countDistinct("l_partkey").alias("x"),
    )
    return g.select(
        "l_returnflag",
        (
            F.abs(F.col("a") - F.col("x")) <= F.col("x") * F.lit(0.05)
        ).alias("within_bound"),
    ).orderBy("l_returnflag")


def q_approx_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gradable twin of q_approx_quantile (the r5 sketch-invariant
    pattern): a Greenwald-Khanna estimate at accuracy=10000 must hold a
    rank within ±1/10000 of the target rank, so the estimated median
    must lie BETWEEN the exact values at ranks floor(0.5−ε)·n and
    ceil(0.5+ε)·n (ε widened to 0.01 for cross-boundary slack — still
    ~100× tighter than any wrong-algorithm result). The boolean is
    deterministic for fixed data; the oracle states TRUE per group."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.lit(0.5), F.lit(10000)
        ).alias("a"),
        F.percentile("l_extendedprice", F.lit(0.49)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.51)).alias("hi"),
    )
    return g.select(
        "l_returnflag",
        ((F.col("a") >= F.col("lo")) & (F.col("a") <= F.col("hi"))).alias(
            "within_bound"
        ),
    ).orderBy("l_returnflag")


def q_hll_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gradable twin of q_hll_distinct: BOTH distinct-count paths
    — the one-shot sketch AND the per-day → hll_union_agg rollup —
    must land within 5% of the exact count computed without any sketch
    (lgConfigK=12 standard error ≈ 1.6%; 5% is ~3σ on each).
    Deliberately NOT asserted: estimate equality between the two paths
    — the union is a register-wise max, but the sparse→dense mode
    transition makes the two ESTIMATES differ slightly once the
    cardinality outgrows sparse mode (first seen at sf0.1: 1488 vs
    1494 on 1500 exact — both in bound, not bit-identical; the sf0.01
    gate alone never leaves sparse mode and would have hidden it)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    merged = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    direct = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("d"),
        F.countDistinct("user_id").alias("x"),
    )
    bound = lambda c: F.abs(F.col(c) - F.col("x")) <= F.col("x") * F.lit(0.05)
    return merged.crossJoin(direct).select(
        bound("d").alias("direct_within_bound"),
        bound("est").alias("union_within_bound"),
    )


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch quantiles: approx_percentile (Greenwald-Khanna sketch,
    accuracy 1/10000) per return flag — the one-pass constant-memory
    mergeable path that replaces q_percentiles' exact full-sort
    formulation at 100 TB. No oracle (sketch estimates are
    engine-specific); accuracy is unit-tested against exact
    percentiles (tests/test_operators.py::
    test_approx_quantile_accuracy)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile(
                "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                F.lit(10000),
            ).alias("approx_q"),
        )
        .select(
            "l_returnflag",
            F.col("approx_q")[0].alias("p25"),
            F.col("approx_q")[1].alias("median"),
            F.col("approx_q")[2].alias("p75"),
        )
        .orderBy("l_returnflag")
    )


def q_function_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function scan (reference FunctionScan is a stub `pass`,
    physical/select.py:454-455): posexplode of a computed array —
    one input row fans out to one row per token with its ordinal."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
        .orderBy("doc_id", "pos")
    )


def q_select_no_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT without FROM — parses in the reference but the planner
    asserts >=1 scan (transformations.py:98)."""
    tune_for_session(spark)
    return spark.sql(
        "SELECT 1 AS one, 'x' AS s, round(2.5 * 2, 1) AS d, 1 + 2 * 3 AS arith"
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q_function_scan": q_function_scan,
    "q_select_no_from": q_select_no_from,
    "q_skew_salted_agg": q_skew_salted_agg,
    "q_approx_distinct": q_approx_distinct,
    "q_approx_distinct_bound": q_approx_distinct_bound,
    "q_approx_quantile": q_approx_quantile,
    "q_approx_quantile_bound": q_approx_quantile_bound,
    "q_funnel": q_funnel,
    "q_retention_cohorts": q_retention_cohorts,
    "q_json_extract": q_json_extract,
    "q_sessionize": q_sessionize,
    "q_gapfill": q_gapfill,
    "q_anomaly_zscore": q_anomaly_zscore,
    "q_hll_distinct": q_hll_distinct,
    "q_hll_sketch_bound": q_hll_sketch_bound,
    "q_stats_agg": q_stats_agg,
    "q_percentiles": q_percentiles,
    "q_grouping_sets": q_grouping_sets,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_type_revenue_ratio": q14_type_revenue_ratio,
    "q18_large_orders": q18_large_orders,
    "q3_top_revenue": q3_top_revenue,
    "q5_region_revenue": q5_region_revenue,
    "q_global_agg": q_global_agg,
    "q_having": q_having,
    "q_count_distinct": q_count_distinct,
    "q_rollup": q_rollup,
    "q_cube": q_cube,
    "q_pivot": q_pivot,
    "q_join_left": q_join_left,
    "q_join_right": q_join_right,
    "q_join_full": q_join_full,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_cross": q_join_cross,
    "q_join_theta": q_join_theta,
    "q_predicates": q_predicates,
    "q_case_cast_concat": q_case_cast_concat,
    "q_string_funcs": q_string_funcs,
    "q_date_funcs": q_date_funcs,
    "q_math_funcs": q_math_funcs,
    "q_sort_multi_key": q_sort_multi_key,
    "q_limit_offset": q_limit_offset,
    "q_distinct": q_distinct,
    "q_topk_per_group": q_topk_per_group,
    "q_union_all": q_union_all,
    "q_union_distinct": q_union_distinct,
    "q_intersect": q_intersect,
    "q_except": q_except,
    "q_window_funcs": q_window_funcs,
    "q_window_frames": q_window_frames,
    "q_window_navigation": q_window_navigation,
    "q_in_subquery": q_in_subquery,
    "q_scalar_subquery": q_scalar_subquery,
    "q_cte": q_cte,
    "q_listagg": q_listagg,
    "q_recursive_cte": q_recursive_cte,
    "q_group_by_all": q_group_by_all,
    "q_lateral_join": q_lateral_join,
    "q_pivot_sql": q_pivot_sql,
    "q_values_list": q_values_list,
    "q_grouping_id": q_grouping_id,
    "q_select_except": q_select_except,
    "q_tablesample_bound": q_tablesample_bound,
    "q_unpivot_sql": q_unpivot_sql,
    "q_agg_filter": q_agg_filter,
    "q_quantified_subquery": q_quantified_subquery,
    "q_named_window": q_named_window,
    "q_is_distinct": q_is_distinct,
    "q_try_cast": q_try_cast,
    "q_exists_subquery": q_exists_subquery,
}


ORACLES = {
    # The sketch invariant's expected value is a literal: the oracle's
    # job here is to pin WHICH groups exist and that the bounded-error
    # check holds for every one (the Spark side computes
    # |approx − exact| ≤ 5%·exact; a sketch regression flips a boolean
    # and hash-mismatches).
    "q_approx_quantile_bound": """
        SELECT l_returnflag, TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_hll_sketch_bound": """
        SELECT TRUE AS direct_within_bound, TRUE AS union_within_bound
    """,
    "q_approx_distinct_bound": """
        SELECT l_returnflag, TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_function_scan": """
        SELECT doc_id,
               CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos,
               unnest(w) AS tok
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS w
            FROM documents WHERE doc_id < 50
        )
        ORDER BY doc_id, pos
    """,
    "q_select_no_from": """
        SELECT 1 AS one, 'x' AS s, round(2.5 * 2, 1) AS d, 1 + 2 * 3 AS arith
    """,
    "q_window_navigation": """
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER w AS last_order,
               nth_value(o_orderkey, 2) OVER w AS second_order
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
        ORDER BY o_custkey, o_orderkey
    """,
    "q_window_frames": """
        SELECT o_custkey, o_orderkey,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
                   RANGE BETWEEN 7 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                   AS spend_7d,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                   AS sum3,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    "q_json_extract": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_stats_agg": """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_samp(l_quantity), 4) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q_percentiles": """
        SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS median,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        FROM lineitem
    """,
    "q_grouping_sets": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag),
                                (l_returnflag, l_linestatus), ())
        ORDER BY l_returnflag, l_linestatus
    """,
    "q_retention_cohorts": """
        WITH days AS (
            SELECT DISTINCT user_id,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
            FROM events
        ),
        cohort AS (
            SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
        )
        SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
               date_diff('day', cohort_day, day) AS offset_days,
               count(DISTINCT d.user_id) AS n_users
        FROM days d JOIN cohort c USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_day, offset_days
    """,
    "q_anomaly_zscore": """
        WITH stats AS (
            SELECT event_type, round(avg(value), 6) AS mu,
                   round(stddev_samp(value), 6) AS sd
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
               round((e.value - s.mu) / s.sd, 4) AS zscore
        FROM events e JOIN stats s USING (event_type)
        WHERE s.sd > 0 AND abs(e.value - s.mu) >= 3 * s.sd
        ORDER BY e.event_id
    """,
    "q_gapfill": """
        WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   event_type, count(*) AS n,
                   round(round(sum(value), 2) / count(*), 6) AS avg_value
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS lo,
                   date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS hi
            FROM events
        ),
        spine AS (
            SELECT g.h AS hour, t.event_type
            FROM span,
                 LATERAL (SELECT unnest(generate_series(lo, hi,
                          INTERVAL 1 HOUR)) AS h) g,
                 (SELECT DISTINCT event_type FROM events) t
        )
        SELECT s.hour, s.event_type, coalesce(h.n, 0) AS n,
               last_value(h.avg_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_value_ff
        FROM spine s LEFT JOIN hourly h
          ON h.hour = s.hour AND h.event_type = s.event_type
        ORDER BY s.hour, s.event_type
    """,
    "q_sessionize": """
        WITH flagged AS (
            SELECT user_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts) > 1800000000
                        OR lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ),
        sess AS (
            SELECT user_id, us,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        ),
        per AS (
            SELECT user_id, sid, count(*) AS n_events,
                   round((max(us) - min(us)) / 1e6, 6) AS dur
            FROM sess GROUP BY 1, 2
        )
        SELECT n_events, count(*) AS n_sessions,
               round(round(sum(dur), 6) / count(*), 6) AS avg_duration_secs
        FROM per GROUP BY 1 ORDER BY 1
    """,
    "q_funnel": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'view' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM s1) AS n_signup,
               (SELECT count(*) FROM s2) AS n_viewed,
               (SELECT count(*) FROM s3) AS n_purchased
    """,
    "q_skew_salted_agg": """
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_quantity), 2) AS qty,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q10_returned_revenue": """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q14_type_revenue_ratio": """
        SELECT round(
                   100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 6
               ) AS economy_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 210
        )
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(round(sum(l_quantity), 2) / count(*), 6) AS avg_qty,
               round(round(sum(l_discount), 2) / count(*), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_top_revenue": """
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM region JOIN nation ON n_regionkey = r_regionkey
                    JOIN customer ON c_nationkey = n_nationkey
                    JOIN orders ON o_custkey = c_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q_global_agg": """
        SELECT count(*) AS n_rows,
               round(sum(l_quantity), 2) AS total_qty,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem
    """,
    "q_having": """
        SELECT o_custkey, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS spend
        FROM orders GROUP BY o_custkey HAVING count(*) >= 3
        ORDER BY o_custkey
    """,
    "q_count_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_rollup": """
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "q_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "q_pivot": """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_join_left": """
        SELECT c_custkey, c_name, coalesce(n_orders, 0) AS n_orders
        FROM customer LEFT JOIN (
            SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
        ) o ON c_custkey = o_custkey
        ORDER BY c_custkey
    """,
    "q_join_right": """
        SELECT n_name, count(s_suppkey) AS n_suppliers
        FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q_join_full": """
        SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
          ON c.c_nationkey = s.s_nationkey
        ORDER BY nationkey
    """,
    "q_join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    "q_join_anti": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000)
        ORDER BY c_custkey
    """,
    "q_join_cross": """
        SELECT r_name, p_brand
        FROM region CROSS JOIN (SELECT DISTINCT p_brand FROM part) p
        ORDER BY r_name, p_brand
    """,
    "q_join_theta": """
        SELECT s_suppkey, s_name
        FROM supplier JOIN (
            SELECT c_nationkey, round(avg(c_acctbal), 6) AS avg_bal
            FROM customer GROUP BY c_nationkey
        ) n ON s_nationkey = c_nationkey AND s_acctbal > avg_bal
        ORDER BY s_suppkey
    """,
    "q_predicates": """
        SELECT p_partkey, p_name, p_brand, p_size
        FROM part
        WHERE p_name LIKE '%red%'
          AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND p_size BETWEEN 5 AND 40
          AND p_retailprice IS NOT NULL
        ORDER BY p_partkey
    """,
    "q_case_cast_concat": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 300000 THEN 'big'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'small' END AS bucket,
               CAST(floor(o_totalprice) AS BIGINT) AS price_int,
               o_orderstatus || '-' || o_orderpriority AS status_prio
        FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    "q_string_funcs": """
        SELECT p_partkey,
               upper(p_brand) AS brand_upper,
               substring(p_name, 1, 5) AS name_prefix,
               length(p_name) AS name_len,
               regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
        FROM part ORDER BY p_partkey LIMIT 150
    """,
    "q_date_funcs": """
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1, 2 ORDER BY yr, qtr
    """,
    "q_math_funcs": """
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_extendedprice), 6) AS price_sqrt,
               round(ln(l_extendedprice + 1), 6) AS price_ln,
               abs(l_discount - 0.05) AS disc_dev,
               l_partkey % 7 AS pk_mod,
               CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket
        FROM lineitem WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber
    """,
    "q_sort_multi_key": """
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer
        ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
    """,
    "q_limit_offset": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 10
    """,
    "q_distinct": """
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey
    """,
    "q_topk_per_group": """
        SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders
        ) t WHERE rk <= 3 ORDER BY o_orderpriority, rk
    """,
    "q_union_all": """
        SELECT nationkey, side, count(*) AS n FROM (
            SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
        ) u GROUP BY nationkey, side ORDER BY nationkey, side
    """,
    "q_union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey
    """,
    "q_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey
    """,
    "q_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey
    """,
    "q_window_funcs": """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rk,
               lag(o_totalprice, 1) OVER w AS prev_price,
               lead(o_totalprice, 1) OVER w AS next_price,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, rn
    """,
    "q_in_subquery": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        ORDER BY o_orderkey
    """,
    "q_scalar_subquery": """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        FROM lineitem
        WHERE l_extendedprice > (SELECT avg(l_extendedprice) * 1.9 FROM lineitem)
        ORDER BY l_orderkey, l_linenumber
    """,
    "q_listagg": """
        SELECT r.r_name,
               string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
               count(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
    """,
    "q_recursive_cte": """
        WITH RECURSIVE d(dt) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT dt + INTERVAL 1 DAY FROM d
            WHERE dt < DATE '1995-02-28'
        )
        SELECT d.dt, count(o.o_orderkey) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0.0), 2) AS revenue
        FROM d LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = d.dt
        GROUP BY d.dt ORDER BY d.dt
    """,
    "q_group_by_all": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_quantity < 24
        GROUP BY ALL
        ORDER BY ALL
    """,
    "q_lateral_join": """
        SELECT c_custkey, c_name, l.n_orders, l.top_price
        FROM customer c, LATERAL (
            SELECT count(o_orderkey) AS n_orders,
                   max(o_totalprice) AS top_price
            FROM orders o WHERE o.o_custkey = c.c_custkey
        ) l
        WHERE l.n_orders >= 5
        ORDER BY c_custkey
    """,
    "q_pivot_sql": """
        SELECT o_orderpriority,
               round(coalesce(open_rev, 0.0), 2) AS open_rev,
               round(coalesce(done_rev, 0.0), 2) AS done_rev,
               round(coalesce(part_rev, 0.0), 2) AS part_rev
        FROM (
            SELECT o_orderpriority, o_orderstatus, o_totalprice
            FROM orders
        ) PIVOT (
            sum(o_totalprice)
            FOR o_orderstatus IN ('O' AS open_rev, 'F' AS done_rev,
                                  'P' AS part_rev)
        )
        ORDER BY o_orderpriority
    """,
    "q_values_list": """
        SELECT w.tier, count(*) AS n_orders,
               round(sum(o.o_totalprice * w.weight), 2) AS wrev
        FROM orders o
        JOIN (VALUES ('1-URGENT', 2.0, 'hot'),
                     ('2-HIGH', 1.5, 'hot'),
                     ('3-MEDIUM', 1.0, 'warm'),
                     ('4-NOT SPECIFIED', 1.0, 'warm'),
                     ('5-LOW', 0.5, 'cold')) AS w(prio, weight, tier)
          ON o.o_orderpriority = w.prio
        GROUP BY w.tier
        ORDER BY w.tier
    """,
    "q_grouping_id": """
        SELECT coalesce(l_returnflag, '(all)') AS rf,
               coalesce(l_linestatus, '(all)') AS ls,
               GROUPING(l_returnflag) AS g_rf,
               GROUPING(l_linestatus) AS g_ls,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls
    """,
    "q_select_except": """
        SELECT * EXCLUDE (c_name, c_acctbal) FROM customer
        ORDER BY c_custkey
    """,
    "q_tablesample_bound": """
        SELECT TRUE AS n_in_window, CAST(0 AS BIGINT) AS n_outside
    """,
    "q_agg_filter": """
        SELECT o_orderpriority,
               count(*) AS n,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
               round(sum(o_totalprice)
                     FILTER (WHERE o_totalprice > 100000), 2)
                   AS rev_large
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q_quantified_subquery": """
        SELECT count(*) AS n_above_all,
               CAST(sum(CASE WHEN o_totalprice <= ANY
                 (SELECT p_retailprice FROM part WHERE p_size <= 2)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_any_small
        FROM orders
        WHERE o_totalprice > ALL
          (SELECT l_extendedprice FROM lineitem WHERE l_quantity >= 49)
    """,
    "q_unpivot_sql": """
        SELECT component, round(sum(amount), 2) AS total,
               count(*) AS n
        FROM (
            SELECT l_quantity, l_extendedprice, l_discount, l_tax
            FROM lineitem WHERE l_orderkey < 2000
        ) UNPIVOT (amount FOR component IN
                   (l_extendedprice, l_discount, l_tax))
        GROUP BY component
        ORDER BY component
    """,
    "q_named_window": """
        SELECT o_orderkey, o_orderpriority,
               rank() OVER w AS rk,
               round(sum(o_totalprice) OVER w, 2) AS run_rev
        FROM orders
        WHERE o_orderkey < 1000
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderpriority, rk
    """,
    "q_is_distinct": """
        SELECT
            count(*) AS n_total,
            CAST(sum(CASE WHEN nullif(event_type, 'click')
                     IS DISTINCT FROM 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_distinct_from_purchase,
            CAST(sum(CASE WHEN nullif(event_type, 'click')
                     IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_safe_null,
            CAST(sum(CASE WHEN nullif(event_type, 'click') = 'purchase'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_purchase
        FROM events
        WHERE event_id < 20000
    """,
    "q_try_cast": """
        SELECT
            count(TRY_CAST(regexp_extract(props, '[0-9]+', 0)
                           AS BIGINT)) AS n_parsed,
            count(TRY_CAST(event_type AS BIGINT)) AS n_unparseable,
            CAST(sum(TRY_CAST(regexp_extract(props, '[0-9]+', 0)
                         AS BIGINT)) AS BIGINT) AS k_sum
        FROM events
        WHERE event_id < 20000
    """,
    "q_cte": """
        WITH spend AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, s.total_spend, s.n_orders
        FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
        WHERE s.n_orders >= 4
        ORDER BY c.c_custkey
    """,
    "q_exists_subquery": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
    """,
}
