"""Custom stateful streaming operator (guide: 'Stateful:
applyInPandasWithState'; engine extension — the reference has no
stateful processing beyond its dedup deque).

``running_user_stats`` keeps per-user running counts/sums across
micro-batches with explicit state — the building block for online
sessionization, rate limiting, or incremental per-key aggregates that
``groupBy().agg()`` can't express when you need custom state transitions
or timeout behavior.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State transition: fold this batch's rows into (count, sum) and
    emit the updated running totals for the key."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) across micro-batches.  State lives
    in the streaming state store (checkpointed, partitioned by key) —
    memory is O(distinct users), not O(events)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
