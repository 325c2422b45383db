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


# ---------------------------------------------------------------------------
# transformWithState — the Spark 4 arbitrary-state API (successor to
# applyInPandasWithState: typed state variables, timers, TTL, schema
# evolution).  Same running-stats semantics as above so the two APIs are
# directly comparable (and share the batch oracle).
# ---------------------------------------------------------------------------

try:  # pragma: no cover - exercised when the runtime ships the API
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningStatsProcessor(StatefulProcessor):
        """Per-user running (count, sum) with a typed ValueState —
        state lives in the RocksDB-backed store, O(distinct users)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n_events LONG, total_value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._stats.get() if self._stats.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._stats.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - pre-4.x runtime
    RunningStatsProcessor = None


def running_user_stats_tws(stream: DataFrame) -> DataFrame:
    """``running_user_stats`` re-expressed on transformWithStateInPandas.
    Identical output contract; the state variable is declared/typed via
    the handle instead of a positional tuple schema."""
    if RunningStatsProcessor is None:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
