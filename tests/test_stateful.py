"""applyInPandasWithState session operator: state must carry across
micro-batches and agree with the batch lag+cumsum formulation."""

from __future__ import annotations

import uuid
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssafynews_data_spark.operators.stateful import session_stats_stream

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)

T0 = datetime(2024, 5, 1, 12, 0, 0)
MIN = timedelta(minutes=1)


def _expected(events):
    """(user -> (n_sessions, n_events, max_session_events)) with the
    30-min strictly-greater gap rule, ordered by (ts, event_id)."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, ts, uid in events:
        by_user.setdefault(uid, []).append((ts, eid))
    for uid, evs in by_user.items():
        evs.sort()
        n_sessions = n_events = cur = best = 0
        last = None
        for ts, _ in evs:
            if last is None or (ts - last) > timedelta(minutes=30):
                n_sessions += 1
                cur = 1
            else:
                cur += 1
            best = max(best, cur)
            n_events += 1
            last = ts
        out[uid] = (n_sessions, n_events, best)
    return out


def _run_stream(spark, dirpath, n_files_events):
    """Write each event list as its own parquet file, stream with
    maxFilesPerTrigger=1 so every file is a separate micro-batch."""
    for i, events in enumerate(n_files_events):
        spark.createDataFrame(events, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dirpath}/batch_{i}")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{dirpath}/batch_*")
    )
    stats = session_stats_stream(stream)
    name = "tss_" + uuid.uuid4().hex[:8]
    q = stats.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        rows = spark.table(name).collect()
    finally:
        q.stop()
    # update-mode emits are monotonic per user: final = per-user max
    final = {}
    for r in rows:
        prev = final.get(r.user_id, (0, 0, 0))
        final[r.user_id] = (
            max(prev[0], r.n_sessions),
            max(prev[1], r.n_events),
            max(prev[2], r.max_session_events),
        )
    return final


def test_state_carries_across_batches(spark, tmp_path):
    """A session that STRADDLES the batch boundary must not be split,
    and a >30min gap across batches must open a new session."""
    batch1 = [
        (1, T0, 7),
        (2, T0 + 5 * MIN, 7),  # same session
        (3, T0, 9),
    ]
    batch2 = [
        (4, T0 + 10 * MIN, 7),  # continues user 7's session across batches
        (5, T0 + 120 * MIN, 7),  # >30min gap -> new session
        (6, T0 + 31 * MIN, 9),  # 31min > 30 -> new session for user 9
    ]
    got = _run_stream(spark, str(tmp_path), [batch1, batch2])
    assert got == _expected(batch1 + batch2)
    assert got[7] == (2, 4, 3)
    assert got[9] == (2, 2, 1)


def test_exact_30min_gap_same_session(spark, tmp_path):
    """Boundary: gap of exactly 30:00 stays in-session (strict > rule),
    matching session_window and the batch oracle."""
    events = [(1, T0, 1), (2, T0 + 30 * MIN, 1)]
    got = _run_stream(spark, str(tmp_path), [events])
    assert got[1] == (1, 2, 2)


def test_unsorted_batch_is_sorted_internally(spark, tmp_path):
    """Events arrive unordered within a batch; the state fold must sort
    by (ts, event_id) before applying the gap rule."""
    events = [
        (3, T0 + 90 * MIN, 5),
        (1, T0, 5),
        (2, T0 + 10 * MIN, 5),
    ]
    got = _run_stream(spark, str(tmp_path), [events])
    assert got[5] == (2, 3, 2)


def test_transform_with_state_user_totals(spark, sf_dir, tmp_path):
    """Spark 4 transformWithStateInPandas (gated: needs protobuf +
    RocksDB state store, absent from this image): per-user running
    totals must equal the batch aggregate."""
    import pytest

    from ssafynews_data_spark.operators.stateful import tws_available, user_totals_tws

    if not tws_available():
        pytest.skip(
            "transformWithStateInPandas needs google.protobuf (state "
            "server channel); not installed in this image"
        )

    import uuid

    from pyspark.sql import functions as F

    from ssafynews_data_spark.operators.streaming_queries import _events_stream
    from ssafynews_data_spark.sources.readers import load_table

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = user_totals_tws(_events_stream(spark, sf_dir))
        name = "tws_" + uuid.uuid4().hex[:8]
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                r.user_id: (r.n_events, r.max_value)
                for r in spark.table(name).collect()
            }
        finally:
            q.stop()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    want = {
        r.user_id: (r.n, r.mx)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want


def test_tws_running_stats_gated(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 typed-state API): gated on
    protobuf (its Python runner dependency, absent in this image).
    Where available, the streamed running stats must equal the batch
    per-user aggregate exactly."""
    import pytest

    pytest.importorskip(
        "google.protobuf", reason="protobuf absent: TWS runner cannot start"
    )
    from pyspark.sql import functions as F

    from ssafynews_data_spark.operators.streaming_queries import (
        streaming_tws_user_stats,
    )
    from ssafynews_data_spark.sources.readers import load_table

    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in streaming_tws_user_stats(spark, sf_dir).collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == want
