"""Z-order (Morton-curve) clustering for multi-column data skipping.

The reference's only access path beyond a full scan is a B+tree on a
single key prefix (andb/storage/engines/heap/bptree.py:225+,
implementations.py:53-64). On Spark/Parquet the analog of an index is
*layout*: min/max row-group and file statistics prune a scan only when
rows with nearby values sit in the same files. A linear sort gives that
for one column; Z-ordering interleaves the bits of several columns so
EVERY indexed column has narrow per-file ranges — the standard
multi-dimensional clustering technique (public Delta Lake / Databricks
OPTIMIZE ZORDER design).

Scale design (100 TB): the only driver-side work is one tiny min/max
aggregate per column (a single job over footer statistics when the
source is Parquet). Rank-normalization uses linear min/max scaling, not
a global window — no single-partition bottleneck. The z-value is a pure
JVM column expression (shifts/ors), then `repartitionByRange` (one
range-exchange shuffle, sampled boundaries) + in-partition sort gives
size-balanced, Z-clustered output files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> Column:
    """Morton code over ``cols`` as a BIGINT column expression.

    Each column is min/max-scaled to an integer in [0, 2^bits) using
    stats gathered from ``df`` (one small aggregate), then the bit
    planes are interleaved: output bit (i*len(cols) + j) is bit i of
    column j. len(cols) * bits must be <= 63.
    """
    if not cols:
        raise ValueError("zvalue needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds BIGINT")
    # Numeric projection per clustered column: numbers pass through,
    # DATE becomes epoch days and TIMESTAMP epoch seconds (ANSI forbids
    # a straight double cast of either), anything else — strings have
    # no meaningful linear min/max scaling — is a clear error instead
    # of a runtime CAST failure deep in the rewrite job.
    num_exprs: dict[str, Column] = {}
    for f_ in df.schema.fields:
        if f_.name not in cols:
            continue
        t = f_.dataType.simpleString()
        if t in ("date",):
            num_exprs[f_.name] = F.unix_date(F.col(f_.name)).cast("double")
        elif t.startswith("timestamp"):
            num_exprs[f_.name] = F.unix_timestamp(F.col(f_.name)).cast(
                "double"
            )
        elif t in ("float", "double"):
            # NaN would poison the max aggregate (Spark sorts NaN
            # greatest), making span NaN and every scaled value NaN —
            # whose bigint cast aborts the rewrite under ANSI. Map NaN
            # to NULL: the row clusters into the null bucket instead
            # (clustering quality only, never a failed job).
            num_exprs[f_.name] = F.nanvl(
                F.col(f_.name).cast("double"),
                F.lit(None).cast("double"),
            )
        elif t in (
            "tinyint", "smallint", "int", "bigint",
        ) or t.startswith("decimal"):
            num_exprs[f_.name] = F.col(f_.name).cast("double")
        else:
            raise ValueError(
                f"cannot ZORDER BY {f_.name}: type {t} has no linear"
                " numeric ordering (numeric/date/timestamp supported)"
            )
    missing = [c for c in cols if c not in num_exprs]
    if missing:
        raise ValueError(f"ZORDER column(s) not in the table: {missing}")
    stats = df.agg(
        *[F.min(num_exprs[c]).alias(f"_min_{c}") for c in cols],
        *[F.max(num_exprs[c]).alias(f"_max_{c}") for c in cols],
    ).first()

    top = (1 << bits) - 1
    scaled: list[Column] = []
    for c in cols:
        if stats[f"_min_{c}"] is None:
            raise ValueError(
                f"cannot ZORDER BY {c}: no non-NULL values to scale"
                " (empty table or all-NULL column)"
            )
        lo = float(stats[f"_min_{c}"])
        hi = float(stats[f"_max_{c}"])
        span = (hi - lo) or 1.0
        s = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor(
                    (num_exprs[c] - F.lit(lo))
                    / F.lit(span)
                    * F.lit(float(top + 1))
                ).cast("bigint"),
            ),
        )
        scaled.append(s)

    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(s, i).bitwiseAND(F.lit(1)),
                    i * len(scaled) + j,
                )
            )
    return z


def zorder(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: int | None = None,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` on the Morton curve of ``cols``.

    Writing the result produces one file per partition whose per-file
    min/max ranges are narrow in ALL of ``cols`` simultaneously, so a
    filter on any of them prunes most files (Parquet footer stats /
    Catalyst file skipping). Use as::

        zorder(df, ["l_partkey", "l_suppkey"], 64).write.parquet(path)
    """
    z = zvalue(df, cols, bits=bits).alias("__z")
    clustered = df.select("*", z)
    n = num_partitions or clustered.rdd.getNumPartitions()
    return (
        clustered.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
