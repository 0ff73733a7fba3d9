"""Deterministic sampling operators for training-data pipelines.

A corpus pipeline needs repeatable samples: the same (salt, key) must
land in the same sample on every run, on every engine, regardless of
partitioning — which rules out `df.sample()` (seeded per-partition RNG,
not stable under repartitioning and not expressible in the oracle SQL).
Instead both operators hash the row key with md5 and decide membership
from the hex digest, so membership is a pure function of the data:

- ``hash_sample``: Bernoulli-style fraction sample. Keep a row iff the
  first 4 hex chars of md5(salt|key) sort below a threshold derived
  from the fraction (hex strings compare lexicographically == numerically
  for fixed width — the same trick dedup.py uses for min-hashes). A pure
  scan filter: no shuffle, no state, pushes down to the Parquet scan,
  and composes with any downstream operator. Different salts give
  independent samples; the same salt gives nested samples (fraction
  0.05 ⊂ fraction 0.10 — useful for scaling-law data ladders).

- ``stratified_sample``: exactly n rows per stratum, chosen by hash
  order (row_number over the stratum ordered by digest). One shuffle on
  the strata columns. At extreme scale with billions of rows per
  stratum, replace the global window with a per-stratum threshold from
  `approx_percentile` over the digest and filter — constant memory,
  two scans, no full sort; the window form here is exact and right for
  strata that fit a partition.

The reference has no sampling at all; this is north-star surface
(build-brief "operations a large-scale training-data pipeline needs").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_digest(key: Column | str, salt: str) -> Column:
    """First 4 hex chars of md5(salt|key) — the membership digest."""
    k = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), k.cast("string"))), 1, 4
    )


def fraction_threshold(fraction: float) -> str:
    """Hex threshold such that P[digest < threshold] == fraction (to
    1/65536 granularity). fraction >= 1.0 returns a sentinel above
    every hex digest ("g" sorts after "f"): clamping to 0xffff would
    silently drop the ~1/65536 rows whose digest IS "ffff"."""
    assert 0.0 <= fraction <= 1.0
    if fraction >= 1.0:
        return "g"
    return format(min(int(fraction * 65536), 65535), "04x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s42"
) -> DataFrame:
    """Deterministic ~fraction sample keyed on ``key_col``."""
    return df.filter(
        sample_digest(key_col, salt) < F.lit(fraction_threshold(fraction))
    )


def prefix_sum(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    partitions: int = 32,
    include_total: bool = False,
    pin: bool = True,
) -> DataFrame:
    """Global running sum of ``weight_col`` in ``key_col`` order,
    without ever collapsing the data to one partition. Adds ``_cum``
    (inclusive cumulative sum) and, when ``include_total``, ``_total``
    (grand total — an extra 1-row cross join; skip it when unused, or
    Catalyst still pays a scan to produce the joined row); internal
    ``_pid``/``_off`` staging columns are dropped.

    A naive cumulative sum is a window over ONE partition — a
    non-starter at corpus scale. This is the standard two-phase
    prefix sum instead: range-partition by key, per-partition subtotals
    (tiny — one row per partition), prefix offsets over that tiny
    table, broadcast back, then a per-partition running sum. No global
    single-partition stage ever sees the full data.

    ``pin`` (default True) persists the staged frame because TWO jobs
    evaluate it and RangePartitioner's boundary sampling is seeded per
    RDD INSTANTIATION — even a fully deterministic input can land a
    boundary row in different _pid buckets across two separate
    evaluations of the exchange, silently misapplying every offset
    after it. Only pass pin=False when the caller GUARANTEES a single
    materialization consumes the result with exchange reuse intact;
    pinned callers should run ``dedup.release_caches()`` after
    materializing so the frame does not outlive the query (ADVICE
    r3).
    """
    w, key = F.col(weight_col), F.col(key_col)
    staged = df.repartitionByRange(partitions, key).withColumn(
        "_pid", F.spark_partition_id()
    )
    # The staged plan is evaluated by TWO jobs (subtotals, then the
    # output join); the persist pins ONE set of range boundaries across
    # both — see the ``pin`` note above.
    if pin:
        from andb_spark.caching import persist_tracked

        staged = persist_tracked(staged)
    totals = staged.groupBy("_pid").agg(F.sum(w).alias("_psum"))
    # Prefix offsets: window over the per-partition subtotal table —
    # `partitions` rows, so the unavoidable single-partition window is
    # over a broadcast-sized input, not the data.
    offsets = totals.withColumn(
        "_off",
        F.coalesce(
            F.sum("_psum").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("bigint"),
        ),
    ).select("_pid", "_off")
    # ROWS frame, not the default RANGE frame: with duplicate keys,
    # RANGE gives every peer row the same cumulative value, which
    # breaks the running-sum invariant pack_shards /
    # weighted_systematic_sample depend on (callers should pass a
    # unique key for full determinism among ties).
    cum = (
        F.sum(w).over(
            Window.partitionBy("_pid")
            .orderBy(key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + F.col("_off")
    )
    out = staged.join(F.broadcast(offsets), "_pid")
    if include_total:
        total = totals.agg(F.sum("_psum").alias("_total"))
        out = out.crossJoin(F.broadcast(total))
    return out.withColumn("_cum", cum).drop("_pid", "_off")


def weighted_systematic_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    partitions: int = 32,
    pin: bool = True,
) -> DataFrame:
    """~k rows sampled with probability proportional to an INTEGER
    weight (systematic PPS sampling: walk the cumulative-weight line in
    key order, pick one row per total/k stride). Deterministic — the
    pick set is a pure integer function of (weights, key order), so the
    DuckDB oracle can state it exactly; no float pow()/ln() whose last
    ulp could disagree across engines (the reason we rejected
    Efraimidis-Espirakis A-ES).

    A row heavier than total/k spans multiple strides but is emitted
    once, so the output can be slightly under k; callers wanting
    exactly-k should cap weights first.
    """
    # Selected iff the cumulative interval (cum-w, cum] crosses a
    # stride boundary: floor((cum-w)·k/total) < floor(cum·k/total).
    # The bigint products overflow once total·k exceeds 2^63 (a 1e14-
    # token corpus sampled at k=1e5 — exactly the scale this module
    # targets), which under ANSI aborts the job. Route by runtime
    # magnitude: the exact bigint math whenever total·k provably fits
    # (every oracle fixture and any realistic corpus), else a
    # decimal(38) fallback. The fallback avoids decimal DIVISION
    # entirely (Spark's precision-loss division rounds HALF_UP at scale
    # 6, so a ratio within ~5e-7 of an integer could flip floor —
    # ADVICE r4): for positive T, floor(a/T) < floor(b/T) iff
    # a - a mod T < b - b mod T, and multiply/subtract/pmod at
    # DECIMAL(38,0) are all exact, so the fallback is bit-exact too.
    lim = (2**63 - 1) // max(k, 1)
    bigint_sel = (
        f"((_cum - {weight_col}) * {k}) div _total"
        f" < (_cum * {k}) div _total"
    )
    dec_a = f"(CAST(_cum - {weight_col} AS DECIMAL(38,0)) * {k})"
    dec_b = f"(CAST(_cum AS DECIMAL(38,0)) * {k})"
    decimal_sel = (
        f"({dec_a} - pmod({dec_a}, _total))"
        f" < ({dec_b} - pmod({dec_b}, _total))"
    )
    return (
        prefix_sum(
            df, weight_col, key_col, partitions, include_total=True, pin=pin
        )
        .filter(
            F.expr(
                f"CASE WHEN _total <= {lim} THEN {bigint_sel}"
                f" ELSE {decimal_sel} END"
            )
        )
        .drop("_cum", "_total")
    )


def pack_shards(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    budget: int,
    partitions: int = 32,
    pin: bool = True,
) -> DataFrame:
    """Assign each row to a contiguous fixed-budget shard: walk rows in
    ``key_col`` order accumulating INTEGER ``weight_col`` (e.g. token
    counts) and start a new shard every ``budget`` units — the
    "pack documents into ~N-token training shards" step of a data
    pipeline. A document belongs to the shard its interval STARTS in:
    ``shard_id = (cum - w) div budget``. Deterministic integer math
    over the two-phase prefix sum, so shard assignment is reproducible
    and oracle-checkable, and no stage sees the data in one partition.

    Shards are ~budget-sized (a row straddling a boundary bloats its
    shard by less than one row; rows heavier than the budget get a
    shard of their own plus spillover)."""
    return (
        prefix_sum(df, weight_col, key_col, partitions, pin=pin)
        .withColumn(
            "shard_id",
            F.expr(f"(_cum - {weight_col}) div {budget}").cast("bigint"),
        )
        .drop("_cum")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "s42",
) -> DataFrame:
    """Deterministic disjoint split assignment (train/val/test): adds a
    ``split`` column chosen by where the row's membership digest falls
    among cumulative fraction thresholds. A pure scan expression — no
    shuffle, stable under repartitioning/engines, and a row keeps its
    split forever as the corpus grows (membership depends only on salt
    and key). The last split absorbs rounding remainder; fractions
    should sum to 1."""
    digest = sample_digest(key_col, salt)
    names = list(splits)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cond = digest < F.lit(fraction_threshold(acc))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    salt: str = "s42",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, in deterministic hash
    order. Adds ``sample_rank`` (1-based rank within the stratum). Ties
    broken by the key itself so the pick is total-ordered."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_digest(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )
