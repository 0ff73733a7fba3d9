"""Session-level registry for opt-in persisted intermediates and
broadcast variables.

Builders across the package (dedup's ``materialize`` regimes,
``sampling.prefix_sum``'s boundary pin, bloom's broadcast bitsets,
workload scratch frames) compose LAZY DataFrames, so they cannot
release their own resources before the caller's action — the caller
owns the lifetime. Long-lived sessions (bench loops, the compare gate,
a REPL, the driver's correctness sweep) call ``release_caches()``
after consuming each query's result; without it, corpus-sized cached
blocks and broadcast payloads accumulate until LRU eviction or session
death.

This module is the NEUTRAL home of that registry: dedup re-exports
``release_caches``/``_persist_tracked`` for backward compatibility,
but sampling/workloads/bloom register here directly rather than
reaching into another operator module's privates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []
_LIVE_BROADCASTS: list = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for ``release_caches``."""
    df = df.persist()
    _LIVE_CACHES.append(df)
    return df


def track_broadcast(bc):
    """Register a Broadcast for ``release_caches`` — without this a
    loop probing a large bloom bitset (~120 MB at 1e9 bits) leaks one
    immortal executor+driver copy per call."""
    _LIVE_BROADCASTS.append(bc)
    return bc


def release_caches() -> int:
    """Unpersist every registered cache and destroy every registered
    broadcast since the last release. Returns the number of handles
    released. Idempotent."""
    return release_caches_since((0, 0))


def cache_mark() -> tuple[int, int]:
    """Registry high-water mark, for scoped release: callers that own a
    bounded unit of work (one engine statement, one REPL loop turn)
    snapshot the mark on entry and release only what the unit itself
    registered — a global ``release_caches()`` there would yank frames
    a LONGER-lived caller (a streaming sink's pinned batch state, an
    outer operator composition) is still counting on."""
    return (len(_LIVE_CACHES), len(_LIVE_BROADCASTS))


def release_caches_since(mark: tuple[int, int]) -> int:
    """Release registry entries added after ``mark`` (see
    ``cache_mark``). Nest-safe: inner scopes release their own suffix,
    leaving outer scopes' entries in place. Returns handles released.
    Idempotent."""
    nc, nb = mark
    n = 0
    for df in _LIVE_CACHES[nc:]:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    del _LIVE_CACHES[nc:]
    for bc in _LIVE_BROADCASTS[nb:]:
        try:
            bc.destroy()
            n += 1
        except Exception:
            pass
    del _LIVE_BROADCASTS[nb:]
    return n
