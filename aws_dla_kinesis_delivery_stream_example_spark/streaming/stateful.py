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
# Sum is held in integer centi-units, not a double: float partial sums
# accumulate in per-batch arrival order, so an adversarial value set
# could land the final cent differently from the batch twin's one-pass
# sum (the q81/q90 integer-units pattern).  Event values are exact
# 2-dp decimals, so round(value*100) per row is lossless and the
# cross-batch sum is exact regardless of micro-batch order.
STATE_SCHEMA = "n long, total_centis long"


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import pandas as _pd

    n, total_centis = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        total_centis += int((pdf["value"] * 100).round().sum())
    state.update((n, total_centis))
    yield _pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total_centis / 100.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running totals, one output row per user per
    micro-batch (update semantics). Batch fallback computes the same
    final answer for stream==batch verification."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        # Sum in the SAME exact integer centi-units as the streaming
        # state (bround = pandas' half-even rounding), not raw doubles:
        # a raw double sum is accumulation-order-dependent and suffers
        # catastrophic cancellation (e.g. [1e15, 0.07, -1e15] sums to
        # 0.12-ish at ulp(1e15)=0.125 where the centi-unit state gives
        # exactly 0.07), which would make the promised stream == batch
        # verification fail on values the integer state handles exactly.
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.bround(F.col("value") * 100, 0).cast("long")) / 100.0
            ).alias("total_value"),
        )
    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
