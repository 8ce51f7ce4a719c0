"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9: the engine's generalization beyond the reference's
stateless record-at-a-time model).

``running_user_totals`` maintains per-user running (count, sum) across
micro-batches — the canonical keyed-state operator. State is one fixed-
width tuple per key: at 100 TB of events the state store scales with
|users|, not |events|, and lives in the checkpoint (RocksDB-backed on a
real cluster via spark.sql.streaming.stateStore.providerClass).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..shipping import ensure_shipped

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import pandas as _pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield _pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running totals, one output row per user per
    micro-batch (update semantics). Batch fallback computes the same
    final answer for stream==batch verification."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
