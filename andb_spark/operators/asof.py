"""As-of (most-recent-match) join.

Spark has no native as-of join (SURVEY §2.3 "broadcast/range/as-of" row);
this implements it as a composition of built-in ops — the union-tag +
window "last known value" technique:

1. Tag left (probe) and right (reference) rows, union them on aligned
   schemas.
2. One window pass per key ordered by (time, tag) carries the last
   non-null reference payload forward (``F.last(ignorenulls=True)``).
3. Keep probe rows; each now holds the latest reference row with
   ref_time <= probe_time (backward), or — walking time descending —
   the earliest with ref_time >= probe_time (forward). An optional
   tolerance masks matches whose gap exceeds it (merge_asof parity).

direction='nearest' runs BOTH walks over the SAME key partitioning —
one Exchange, two WindowExec sorts — and picks per probe whichever
side has the smaller |gap| (ties go backward, pandas merge_asof
parity). Still strictly one shuffle of (left ∪ right).

Cost: ONE shuffle of (left ∪ right) on the key — strictly better at
scale than the join+filter+argmax formulation (which shuffles the same
data AND materializes every (probe, candidate) pair before pruning).
`pd.merge_asof` via applyInPandas would add an Arrow round-trip for no
semantic gain, so this stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    direction: str = "backward",
    right_tiebreak: str | None = None,
    tolerance=None,
) -> DataFrame:
    """For each left row, attach `payload_cols` from the right row with
    the greatest right_time <= left_time (direction='backward'), the
    smallest right_time >= left_time (direction='forward'), or the
    smallest |right_time - left_time| (direction='nearest'; equal-gap
    ties go to the backward side, pandas merge_asof parity) sharing the
    join key. Unmatched left rows keep NULL payloads. All directions
    share the one-shuffle union+window plan — nearest adds a second
    window SORT over the same exchange, not a second shuffle.

    `right_tiebreak`: column ordering reference rows with equal
    right_time (the row with the greatest tiebreak wins) — required for
    a deterministic result when right times can collide.

    `tolerance`: optional maximum time gap — a carried reference whose
    |right_time − left_time| exceeds it is masked back to NULL (the
    merge_asof tolerance semantics; for 'nearest' each side is masked
    before the choice). Expressed as a literal compatible with plain
    subtraction on the time columns, so numeric/epoch time columns take
    a number; date/timestamp callers should cast upstream."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )

    lcols = left.columns
    left_struct = F.struct(*[F.col(c) for c in lcols])
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    left_type = left.select(left_struct.alias("s")).schema["s"].dataType
    payload_type = right.select(payload_struct.alias("s")).schema["s"].dataType

    # tiebreak keeps ITS OWN type: casting to bigint would error on
    # string tiebreaks (ANSI) and truncate fractional sequence numbers
    # back into the very ties the parameter exists to break
    seq_type = (
        right.schema[right_tiebreak].dataType.simpleString()
        if right_tiebreak is not None
        else "bigint"
    )
    l_aligned = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(seq_type).alias("_seq"),
        left_struct.alias("_left"),
        F.lit(None).cast(payload_type).alias("_payload"),
    )
    r_seq = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0).cast("bigint")
    )
    # SQL equi-join semantics: a NULL-key or NULL-time reference row
    # matches NOTHING. Unfiltered, NULL keys would group together in
    # partitionBy (matching each other) and a NULL time would sort
    # nulls-first and be carried into every probe as the "earliest"
    # reference.
    r_aligned = right.filter(
        F.col(right_on).isNotNull() & F.col(right_time).isNotNull()
    ).select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_probe"),
        r_seq.alias("_seq"),
        F.lit(None).cast(left_type).alias("_left"),
        payload_struct.alias("_payload"),
    )

    unioned = l_aligned.unionByName(r_aligned)

    # Reference rows sort before probe rows at equal time (_is_probe
    # ascending), so an exactly-simultaneous reference row is visible to
    # the probe (<=/>= inclusive semantics). Among equal-time reference
    # rows the greatest _seq sorts last and therefore wins the
    # carry-forward. Forward direction is the time-mirrored walk: _t
    # descending, so "last non-null payload" is the nearest reference
    # at-or-after the probe.
    def _window(backward: bool):
        return (
            Window.partitionBy("_k")
            .orderBy(
                F.col("_t").asc() if backward else F.col("_t").desc(),
                F.col("_is_probe").asc(),
                F.col("_seq").asc_nulls_last(),
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    def _carry(df: DataFrame, backward: bool, suffix: str) -> DataFrame:
        w = _window(backward)
        df = df.withColumn(
            f"_ref{suffix}", F.last("_payload", ignorenulls=True).over(w)
        )
        # the time OF the carried payload row: _payload and _t are
        # non-null on exactly the same (reference) rows, so the last
        # non-null of each over one window come from the same row
        df = df.withColumn(
            f"_ref_t{suffix}",
            F.last(
                F.when(F.col("_is_probe") == 0, F.col("_t")),
                ignorenulls=True,
            ).over(w),
        )
        gap = (
            (F.col("_t") - F.col(f"_ref_t{suffix}"))
            if backward
            else (F.col(f"_ref_t{suffix}") - F.col("_t"))
        )
        if tolerance is not None:
            df = df.withColumn(
                f"_ref{suffix}",
                F.when(gap <= F.lit(tolerance), F.col(f"_ref{suffix}")),
            )
        return df

    if direction == "nearest":
        # both walks over the SAME partitionBy("_k") — Catalyst plans
        # one Exchange and two WindowExec sorts. Per probe, take the
        # side with the smaller gap; equal gaps go backward.
        carried = _carry(_carry(unioned, True, "_b"), False, "_f")
        gap_b = F.when(
            F.col("_ref_b").isNotNull(), F.col("_t") - F.col("_ref_t_b")
        )
        gap_f = F.when(
            F.col("_ref_f").isNotNull(), F.col("_ref_t_f") - F.col("_t")
        )
        carried = carried.withColumn(
            "_ref",
            F.when(gap_b.isNull(), F.col("_ref_f"))
            .when(gap_f.isNull(), F.col("_ref_b"))
            .when(gap_b <= gap_f, F.col("_ref_b"))
            .otherwise(F.col("_ref_f")),
        )
    else:
        carried = _carry(unioned, direction == "backward", "")
    probes = carried.filter(F.col("_is_probe") == 1)
    # SQL comparison semantics: a NULL probe time satisfies neither
    # t >= ref_t nor t <= ref_t, so such probes match NOTHING. Without
    # the mask the forward walk would hand them a carry: desc ordering
    # sorts null times LAST, after every reference row. (Backward asc
    # sorts them first, before any carry exists — safe by accident,
    # masked anyway for symmetry.)
    ref_ok = F.col("_t").isNotNull()
    out_cols = [F.col(f"_left.{c}").alias(c) for c in lcols] + [
        F.when(ref_ok, F.col(f"_ref.{c}")).alias(c) for c in payload_cols
    ]
    return probes.select(*out_cols)
