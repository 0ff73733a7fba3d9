"""Range (interval) join — point-in-interval matching at scale.

The reference has no range join (its only join is a nested loop,
andb/executor/operator/physical/select.py:549-652); Spark itself plans a
plain theta join ``p.ts BETWEEN i.start AND i.end`` as a broadcast
nested loop or cartesian product — quadratic and unshippable at 100 TB.

This operator applies the standard bucketing decomposition: intervals
explode to every fixed-width time bucket they overlap, points map to
exactly one bucket, and the match becomes an equi-join on
(bucket, *keys) followed by the exact range filter. Work becomes
O(points + intervals × avg_buckets_per_interval + true_matches)
with a shuffle on high-cardinality (bucket, key) — no quadratic term,
no skew beyond what the true match distribution implies. Pick
``bucket_seconds`` near the typical interval length: each interval then
explodes to ~2 buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts <= end`` (inclusive bounds) and equal ``keys``.

    Bucketing uses second-truncated epochs, which is sound: truncation
    is monotone, so a point inside [start, end] always lands in one of
    the interval's exploded buckets.

    Only ``how='inner'`` is supported: the range predicate is applied
    as a post-join filter, which would silently drop an outer join's
    NULL-extended rows (degrading it to inner) and emit unmatched
    exploded interval replicas — wrap with an explicit anti-join for
    outer semantics rather than getting wrong answers here.
    """
    if how != "inner":
        raise ValueError(
            "bucketed_interval_join supports how='inner' only; outer"
            " variants need the range predicate inside the join"
            f" condition (got how={how!r})"
        )
    # timestamp/date columns bucket on epoch seconds; numeric time
    # columns (already epochs or plain ordinates) bucket directly in
    # their NATIVE units (``bucket_seconds`` is then a native-unit
    # width — microsecond epochs need a microsecond-scale width) —
    # both are monotone, which is all the decomposition needs. Dtype
    # is resolved PER SIDE: a point column and an interval column may
    # share a name with different types.
    p_types, i_types = dict(points.dtypes), dict(intervals.dtypes)
    if not bucket_seconds > 0:
        raise ValueError(
            f"bucket_seconds must be positive (got {bucket_seconds!r})"
        )
    # A fractional width (0 < w < 1 included) can't use the exact
    # integer path below — int() truncation would turn 0.5 into
    # w=0 and pmod(ep, 0) (r7 ADVICE #3). Fractional widths take the
    # double floor-division path on every dtype instead: floor(c/w)
    # is monotone, which is all the decomposition needs.
    fractional = float(bucket_seconds) != float(int(bucket_seconds))

    def bucket_of(c: str, types: dict):
        t = types.get(c)
        w = int(bucket_seconds)
        if t in ("timestamp", "timestamp_ntz", "date"):
            ep = f"unix_timestamp(`{c}`)"
        elif t in ("bigint", "int", "smallint", "tinyint"):
            ep = f"CAST(`{c}` AS BIGINT)"
        else:
            # fractional ordinates: double floor-div is fine (the
            # 2^53 hazard below is about INTEGRAL epochs)
            return F.floor(F.col(c) / bucket_seconds)
        if fractional:
            return F.floor(F.expr(ep) / bucket_seconds)
        # Integral epochs use pure integer arithmetic. FLOOR(c / w)
        # goes through double division, which above 2^53 (nanosecond
        # epochs ~1.7e18 — which the native-units contract invites)
        # assigns boundary-adjacent values to the neighboring bucket.
        # That never DROPS a match — long→double, correctly-rounded
        # division, and floor are each monotone, so an in-interval
        # point's bucket always stays inside the interval's exploded
        # bucket range — but it makes ids inexact (spurious extra
        # explode buckets, ids that disagree with any exact-arithmetic
        # consumer). (c - pmod(c, w)) DIV w is exact floor division
        # for negative epochs too (pmod is non-negative; bare DIV
        # truncates toward zero, which would merge the two buckets
        # around zero).
        return F.expr(f"(({ep}) - pmod(({ep}), {w}L)) DIV {w}L")
    p = points.withColumn("_bucket", bucket_of(point_ts, p_types))
    i = (
        intervals.withColumn(
            "_bucket",
            F.explode(F.sequence(bucket_of(start_col, i_types),
                                 bucket_of(end_col, i_types))),
        )
    )
    return (
        p.join(i, ["_bucket", *keys], how)
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_bucket")
    )
