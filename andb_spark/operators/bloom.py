"""Broadcastable Bloom-filter membership sketch for incremental dedup.

The 100 TB problem this solves: screening a daily increment against a
years-deep corpus history without joining the increment to the history.
``d_incremental_dedup`` does the exact anti-join (one shuffle of the
increment against a bucketed history); this operator replaces the join
with a *broadcast bit array* built once over the history's content
hashes. The increment scan then filters locally on every executor — no
shuffle, no history scan at query time, and the filter is mergeable
(bitwise OR) so per-partition/per-day filters union into one.

False-positive semantics (standard Bloom): a hit may be wrong with
probability ~fpp (those rows are dropped although new — acceptable for
dedup, where dropping an occasional unique document is cheap), a miss is
never wrong (no duplicate survives). Both sides are deterministic: the
k probe positions are Kirsch-Mitzenmacher double hashes of xxhash64,
fixed seeds, so the same input always yields the same filter and the
same verdicts.

Construction is distributed: probe positions are computed JVM-side and
reduced via ``distinct`` — the shuffle carries at most ``m`` distinct
bit positions (the filter's own size, NOT the corpus size), then the
driver packs them into a numpy bitset that is broadcast once. The
reference has no analog (AnDB's only membership structure is the B+tree
index, andb/storage/engines/heap/bptree.py:225).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    """Immutable packed bitset + its hashing parameters."""

    bitset: bytes  # little bit-order within each byte: bit i = byte i>>3, mask 1<<(i&7)
    num_bits: int
    num_hashes: int

    @property
    def fill_ratio(self) -> float:
        arr = np.frombuffer(self.bitset, dtype=np.uint8)
        return float(np.unpackbits(arr).sum()) / float(self.num_bits)


def optimal_params(num_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n·ln p / ln²2 bits, k = m/n·ln 2."""
    n = max(1, num_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _probe_positions(col: Column | str, num_bits: int, num_hashes: int) -> Column:
    """array<bigint> of the k probe positions for a value — pure
    Catalyst (xxhash64 + integer math), identical at build and probe
    time. Kirsch-Mitzenmacher: pos_i = (h1 + i·h2) mod m, with h1/h2
    independent xxhash64 lanes (the second lane is salted by a literal
    prefix column). Each lane is reduced mod m BEFORE combining so the
    arithmetic never overflows a long (ANSI mode errors on overflow):
    i·(h2 mod m) + (h1 mod m) < (k+1)·m ≪ 2⁶³."""
    col = F.col(col) if isinstance(col, str) else col
    h1 = F.pmod(F.xxhash64(col), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(F.lit("andb-bloom-lane2"), col), F.lit(num_bits))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(num_bits)),
    )


def build_bloom(
    df: DataFrame,
    col: Column | str,
    num_items: int | None = None,
    fpp: float = 0.01,
) -> BloomFilter:
    """Build a Bloom filter over a column, distributed.

    The only aggregation is ``distinct`` over probe positions — bounded
    by min(n·k, m) rows of one bigint, so the collect is capped by the
    filter size the caller chose to afford, never by the corpus."""
    n = num_items if num_items is not None else df.count()
    num_bits, num_hashes = optimal_params(n, fpp)
    # Arrow transfer (toPandas), NOT collect(): the distinct position
    # set approaches the bitset's bit count, and Python Row objects
    # cost ~50-100x the 8 bytes/position Arrow moves — at a 1e9-bit
    # filter that is the difference between ~8 GB of Rows and a
    # ~120 MB int64 column on the driver.
    pos = (
        df.select(
            F.explode(_probe_positions(col, num_bits, num_hashes)).alias("pos")
        )
        .distinct()
        .toPandas()["pos"]
        .to_numpy(dtype=np.int64)
    )
    bitset = np.zeros((num_bits + 7) // 8, dtype=np.uint8)
    if pos.size:
        np.bitwise_or.at(
            bitset, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
        )
    return BloomFilter(bitset.tobytes(), num_bits, num_hashes)


def merge_blooms(a: BloomFilter, b: BloomFilter) -> BloomFilter:
    """Bitwise-OR union — filters built with identical params merge
    exactly (the mergeability that makes per-day filters roll up)."""
    if (a.num_bits, a.num_hashes) != (b.num_bits, b.num_hashes):
        raise ValueError("cannot merge Bloom filters with different params")
    u = np.frombuffer(a.bitset, dtype=np.uint8) | np.frombuffer(
        b.bitset, dtype=np.uint8
    )
    return BloomFilter(u.tobytes(), a.num_bits, a.num_hashes)


def with_might_contain(
    df: DataFrame,
    col: Column | str,
    bloom: BloomFilter,
    out_col: str = "might_contain",
) -> DataFrame:
    """Append a boolean membership verdict column.

    The probe positions are computed JVM-side; only the final bit test
    crosses into Python, as an Arrow-batched pandas UDF over the
    broadcast bitset (one copy per executor, not per task). The
    broadcast registers with the shared cache registry so
    ``release_caches()`` frees it — a loop probing a 1e9-bit filter
    (~120 MB) would otherwise leak one immortal copy per call."""
    from andb_spark.caching import track_broadcast

    sc = df.sparkSession.sparkContext
    bc = track_broadcast(sc.broadcast(bloom.bitset))

    @F.pandas_udf("boolean")
    def _check(pos_lists: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)

        def hit(ps) -> bool:
            p = np.asarray(ps, dtype=np.int64)
            return bool(np.all(bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)))

        return pos_lists.map(hit)

    probes = _probe_positions(col, bloom.num_bits, bloom.num_hashes)
    return df.withColumn(out_col, _check(probes))


def bloom_new_items(
    increment: DataFrame,
    col: Column | str,
    bloom: BloomFilter,
) -> DataFrame:
    """Rows of the increment whose key is (probably) NOT in the history
    the filter was built over. Never passes a true duplicate; drops a
    ~fpp fraction of genuinely-new rows (deterministically)."""
    flagged = with_might_contain(increment, col, bloom, "_bf_hit")
    return flagged.filter(~F.col("_bf_hit")).drop("_bf_hit")
