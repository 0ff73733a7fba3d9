"""Skew-mitigation helpers: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one huge customer, the empty-string
document, a null-ish default id) can put an entire shuffle partition on
one executor. Spark's first two answers are free and already on in this
engine: map-side partial aggregation (always) and AQE skew-join
splitting (session default). These helpers cover the residual cases:

- ``salted_aggregate``: two-phase aggregation for *algebraic* aggregates
  whose per-key groups are too hot even for partial aggregation to tame
  (e.g. high-cardinality DISTINCT-like state per key). Phase 1 groups on
  (key, salt) spreading each hot key over ``n_salts`` reducers; phase 2
  re-aggregates the partial results on the key alone.
- ``salted_join``: fact⋈dim equi-join where specific dim keys are hot
  and the dim side is too large to broadcast outright: the fact side
  gets a random salt, the dim side is replicated ``n_salts`` times, and
  the join key becomes (key, salt). Skew disappears at the cost of
  replicating only the (bounded) dim side.

Both are deterministic in RESULT (salts only re-route rows); the salt
assignment itself uses a hash of stable columns, not rand(), so retries
and speculative tasks see identical routing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _stable_salt(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic pseudo-random salt in [0, n_salts): hash of the row's
    stable identifying columns (xxhash64 — cheap, JVM-side)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    salt_cols: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (key, salt) → key aggregation.

    ``partial_aggs`` maps output name → aggregate over the raw rows;
    ``final_aggs`` maps output name → aggregate over the phase-1 columns
    (e.g. partial ``count(*) as n`` then final ``sum(n) as n``)."""
    salted = df.withColumn("_salt", _stable_salt(salt_cols, n_salts))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    fact_salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-proof equi-join: fact rows are salted, the dim side is
    exploded ``n_salts`` ways, and the shuffle key becomes (key, salt) —
    a hot fact key now spreads across ``n_salts`` reducers.

    ``how`` is limited to inner/left (fact-preserving): right/full
    would emit each unmatched dim row once PER SALT REPLICA."""
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only, got {how!r}"
            " (right/full would duplicate unmatched dim rows n_salts times)"
        )
    fact_salt_cols = list(fact_salt_cols or fact.columns)
    f_salted = fact.withColumn("_salt", _stable_salt(fact_salt_cols, n_salts))
    d_exploded = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f_salted.join(d_exploded, [key, "_salt"], how).drop("_salt")
