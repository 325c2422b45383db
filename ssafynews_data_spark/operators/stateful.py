"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference's streams are stateless per-record pipes (Flink consumers,
collect/consumer.py, consumer2.py); its only "state" is the producer's
dedup deque and manual Kafka offsets.  A training-data engine needs
arbitrary keyed state (sessionization with counters, rate trackers,
incremental aggregates), which Structured Streaming exposes as
``applyInPandasWithState`` — keyed state + Arrow batches per group.

``stateful_session_stats`` re-derives gap-sessionization (the same
semantics as ``streaming_session_counts``'s ``session_window``) with an
explicit user-managed state machine, and adds a per-session length
tracker (``max_session_events``) that ``session_window`` alone cannot
produce without a second aggregation.  Three independent formulations —
this operator, ``session_window``, and the batch lag+cumsum oracle —
must agree.
"""

from __future__ import annotations

import uuid
from typing import TYPE_CHECKING, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ssafynews_data_spark.localframe import local_df
from ssafynews_data_spark.registry import register

if TYPE_CHECKING:  # pragma: no cover
    pass

#: 30-minute session gap in nanoseconds (matches sessionization +
#: streaming_session_counts: split strictly when gap > 30 min).
GAP_NS = 30 * 60 * 1_000_000_000

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_session_events", T.LongType()),
    ]
)

#: carried keyed state: last event ts (ns), totals, current-session run.
_STATE_SCHEMA = "last_ts LONG, n_sessions LONG, n_events LONG, cur_len LONG, max_len LONG"


def _session_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one user into the session state.

    Events inside a batch are NOT ordered — sort by (ts, event_id) so
    the state transition is deterministic and matches the batch
    oracle's ``ORDER BY ts, event_id`` window.
    """
    if state.exists:
        last_ts, n_sessions, n_events, cur_len, max_len = state.get
    else:
        last_ts, n_sessions, n_events, cur_len, max_len = (None, 0, 0, 0, 0)

    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        # normalize to int64 ns regardless of pandas datetime unit
        ts_ns = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
        for t in ts_ns:
            if last_ts is None or t - last_ts > GAP_NS:
                n_sessions += 1
                cur_len = 1
            else:
                cur_len += 1
            max_len = max(max_len, cur_len)
            n_events += 1
            last_ts = int(t)

    state.update((last_ts, n_sessions, n_events, cur_len, max_len))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
            "max_session_events": [max_len],
        }
    )


def tws_available() -> bool:
    """``transformWithStateInPandas`` (the Spark 4 stateful API that
    supersedes applyInPandasWithState) drives its state server over a
    protobuf channel; the test image ships no ``google.protobuf``, so
    the path is gated exactly like Kafka/Delta (import-probe + skip)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class UserTotalsProcessor:
    """StatefulProcessor for ``transformWithStateInPandas``: per-user
    running (n_events, max_value) in a ValueState.  Class lives in the
    package because workers unpickle it by module path.  Defined lazily
    (plain object + __init_subclass__-free) so importing this module
    never touches the gated API."""

    def __new__(cls):
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        class _Impl(StatefulProcessor):
            def init(self, handle):
                self._state = handle.getValueState(
                    "totals", "n LONG, max_v DOUBLE"
                )

            def handleInputRows(self, key, rows, timer_values):
                n, max_v = (
                    self._state.get() if self._state.exists() else (0, float("-inf"))
                )
                for pdf in rows:
                    if pdf.empty:
                        continue
                    n += len(pdf)
                    max_v = max(max_v, float(pdf["value"].max()))
                self._state.update((n, max_v))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "max_value": [max_v]}
                )

            def close(self):
                pass

        return _Impl()


def user_totals_tws(events: DataFrame) -> DataFrame:
    """events stream → per-user totals via transformWithStateInPandas.
    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and protobuf on
    the Python side — see ``tws_available``."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTotalsProcessor(),
            outputStructType="user_id LONG, n_events LONG, max_value DOUBLE",
            outputMode="Update",
            timeMode="None",
        )
    )


def session_stats_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user session stats via keyed pandas state."""
    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@register(
    "stateful_session_stats",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM g
        ), per AS (
            SELECT user_id, sid, count(*) AS len
            FROM s GROUP BY user_id, sid
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(len) AS BIGINT) AS n_events,
               CAST(max(len) AS BIGINT) AS max_session_events
        FROM per GROUP BY user_id
    """,
    tags=("streaming", "stateful", "applyInPandasWithState", "ST6"),
)
def stateful_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary keyed state over a real stream, oracle-checked: per-user
    session count, event count, and largest-session size with a 30-min
    gap rule.  The update-mode emits are monotonic per user, so the
    final state is the per-user max over the memory sink's rows (one
    emit per trigger; a single parquet source file = one trigger)."""
    from ssafynews_data_spark.operators.streaming_queries import _events_stream

    stats = session_stats_stream(_events_stream(spark, sf_dir))
    name = "sss_" + uuid.uuid4().hex[:10]
    q = stats.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        sink = local_df(spark, 
            spark.table(name).collect(), spark.table(name).schema
        )
    finally:
        q.stop()
    return sink.groupBy("user_id").agg(
        F.max("n_sessions").alias("n_sessions"),
        F.max("n_events").alias("n_events"),
        F.max("max_session_events").alias("max_session_events"),
    )
