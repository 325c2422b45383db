"""Structured Streaming assembly tests (§7 stage 5): file-source
micro-batches driven synchronously via the memory sink."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from ssafynews_data_spark.schemas import TESTDATA_SCHEMAS
from ssafynews_data_spark.sources.readers import load_table
from ssafynews_data_spark.sources.sinks import foreach_batch_upsert, idempotent_append
from ssafynews_data_spark.streaming.pipeline import (
    daily_tumbling_counts,
    dedup_stream,
    run_to_memory,
)


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    return str(d)


def _events_stream(spark, sf_dir, path):
    load_table(spark, sf_dir, "events").coalesce(2).write.mode("overwrite").parquet(path)
    schema = TESTDATA_SCHEMAS["events"]
    return spark.readStream.schema(schema).parquet(path)


def test_tumbling_daily_counts_match_batch(spark, sf_dir, events_stream_dir):
    stream = _events_stream(spark, sf_dir, events_stream_dir + "/t1")
    agg = daily_tumbling_counts(stream)
    name = "t_" + uuid.uuid4().hex[:8]
    q = run_to_memory(agg, name, output_mode="complete")
    try:
        got = {
            (r.d, r.event_type): r.n
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.d, r.event_type): r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == batch


def test_stream_dedup_drops_dupes(spark, tmp_path):
    rows = [
        ("u1", "2024-01-01 10:00:00", "t1"),
        ("u1", "2024-01-01 10:00:00", "t1"),  # exact dup
        ("u2", "2024-01-01 11:00:00", "t2"),
    ]
    df = spark.createDataFrame(rows, "link string, updated string, title string").withColumn(
        "updated", F.to_timestamp("updated")
    )
    path = str(tmp_path / "dd")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    name = "t_" + uuid.uuid4().hex[:8]
    q = run_to_memory(dedup_stream(stream), name)
    try:
        got = spark.sql(f"SELECT link FROM {name}").collect()
    finally:
        q.stop()
    assert sorted(r.link for r in got) == ["u1", "u2"]


def test_idempotent_append_batch(spark):
    existing = spark.createDataFrame([("a",), ("b",)], "link string")
    incoming = spark.createDataFrame([("b",), ("c",), ("c",)], "link string")
    out = idempotent_append(incoming, existing)
    assert sorted(r.link for r in out.collect()) == ["c"]


def test_checkpoint_restart_no_reprocessing(spark, tmp_path):
    """ST1: the checkpoint replaces manual offset commits — after a
    restart with the same checkpoint dir, already-committed input files
    are not reprocessed into the idempotent sink."""
    src = str(tmp_path / "src")
    sink_path = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "link string, v int"

    spark.createDataFrame([("a", 1), ("b", 2)], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            stream.writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(foreach_batch_upsert(sink_path))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    # second batch of input, then restart from the same checkpoint
    spark.createDataFrame([("c", 3)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    rows = sorted((r.link, r.v) for r in spark.read.parquet(sink_path).collect())
    assert rows == [("a", 1), ("b", 2), ("c", 3)]


def test_foreach_batch_upsert_effectively_once(spark, tmp_path):
    path = str(tmp_path / "sink")
    sink = foreach_batch_upsert(path)
    b1 = spark.createDataFrame([("a", 1), ("b", 2)], "link string, v int")
    b2 = spark.createDataFrame([("b", 9), ("c", 3)], "link string, v int")
    sink(b1, 0)
    sink(b2, 1)
    sink(b2, 1)  # replayed batch (at-least-once delivery)
    rows = spark.read.parquet(path).collect()
    assert sorted((r.link, r.v) for r in rows) == [("a", 1), ("b", 2), ("c", 3)]


def test_available_now_trigger_drains_to_batch_equivalence(spark, sf_dir):
    """Trigger.AvailableNow — the production batch-drain mode (bounded
    run over all available data, then stop, unlike processAllAvailable
    which is test-harness-only) — must produce the same daily aggregate
    as the batch query."""
    import uuid

    from ssafynews_data_spark.operators.streaming_queries import _events_stream
    from ssafynews_data_spark.sources.readers import load_table
    from ssafynews_data_spark.streaming.pipeline import daily_tumbling_counts

    agg = daily_tumbling_counts(_events_stream(spark, sf_dir))
    name = "avnow_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.d, r.event_type): (r.n, round(r.total_value, 2))
        for r in spark.table(name).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.d, r.event_type): (r.n, round(r.total_value, 2))
        for r in ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("d"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == want


def test_drop_duplicates_within_watermark_across_batches(spark, tmp_path):
    """A duplicate key arriving in a LATER micro-batch (within the
    guarantee window) must still be dropped — the dedup state survives
    batch boundaries; maxFilesPerTrigger=1 forces the two files into
    separate micro-batches."""
    import os
    import time
    import uuid

    from pyspark.sql import functions as F

    d = str(tmp_path / "in")
    os.makedirs(d)
    batch1 = spark.createDataFrame(
        [("k1", "2024-01-01 10:00:00"), ("k2", "2024-01-01 10:01:00")],
        "key string, ts_s string",
    ).select("key", F.col("ts_s").cast("timestamp").alias("ts"))
    batch2 = spark.createDataFrame(
        [("k1", "2024-01-01 10:05:00"), ("k3", "2024-01-01 10:06:00")],
        "key string, ts_s string",
    ).select("key", F.col("ts_s").cast("timestamp").alias("ts"))
    batch1.coalesce(1).write.parquet(d + "/f1")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    batch2.coalesce(1).write.parquet(d + "/f2")

    stream = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/f*")
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["key"]
    )
    name = "wmdd_" + uuid.uuid4().hex[:8]
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.key for r in spark.table(name).collect()}
        n = spark.table(name).count()
    finally:
        q.stop()
    assert got == {"k1", "k2", "k3"}
    assert n == 3  # second k1 dropped despite arriving in a later batch


def test_streaming_semi_join_emits_purchase_once(spark, tmp_path):
    """One purchase with THREE matching clicks must emit exactly once
    (semi semantics); a purchase with no click in-window must not emit."""
    import os
    import uuid

    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 10:05:00", 7, "click", 1.0, "{}"),
        (3, "2024-01-01 10:10:00", 7, "click", 1.0, "{}"),
        (4, "2024-01-01 10:20:00", 7, "purchase", 9.0, "{}"),   # 3 matches
        (5, "2024-01-01 12:00:00", 8, "purchase", 9.0, "{}"),   # no click
        (6, "2024-01-01 09:00:00", 9, "click", 1.0, "{}"),
        (7, "2024-01-01 09:45:00", 9, "purchase", 9.0, "{}"),   # click 45min before: out of 30min window
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    # _events_stream globs for a FILE literally named events.parquet (the
    # testdata layout); a directory-style write would be invisible to it
    import glob
    import shutil

    d = str(tmp_path)
    tmp_dir = os.path.join(d, "_ev_dir")
    df.coalesce(1).write.parquet(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(d, "events.parquet"))
    shutil.rmtree(tmp_dir)

    from ssafynews_data_spark.operators.streaming_queries import streaming_semi_join

    out = {r.user_id: r.n_attributed for r in streaming_semi_join(spark, d).collect()}
    assert out == {7: 1}


def test_sliding_windows_triple_count(spark, sf_dir):
    from ssafynews_data_spark.operators.streaming_queries import (
        streaming_sliding_counts,
    )
    from ssafynews_data_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    total = (
        streaming_sliding_counts(spark, sf_dir)
        .agg(F.sum("n").alias("s"))
        .collect()[0]
        .s
    )
    n_events = load_table(spark, sf_dir, "events").count()
    # 3-day window, 1-day slide → every event in exactly 3 windows
    assert total == 3 * n_events


def test_state_inspection_matches_distinct_keys(spark, sf_dir):
    from ssafynews_data_spark.operators.streaming_queries import (
        streaming_state_inspection,
    )
    from ssafynews_data_spark.sources.readers import load_table

    state_keys = {
        r.user_id for r in streaming_state_inspection(spark, sf_dir).collect()
    }
    real_keys = {
        r.user_id
        for r in load_table(spark, sf_dir, "events").select("user_id").distinct().collect()
    }
    assert state_keys == real_keys


def test_streaming_restart_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Crash-recovery semantics: run a checkpointed aggregation over
    the first half of the data, STOP, land more files, restart the SAME
    query graph on the SAME checkpoint — the second run must process
    only the new files yet report totals that include the first run's
    state (recovered from the checkpoint, not recomputed)."""
    import uuid

    from pyspark.sql import functions as F

    from ssafynews_data_spark.sources.readers import load_table

    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(staging)

    def run_round() -> dict:
        stream = (
            spark.readStream.schema("event_id long, event_type string")
            .parquet(staging)
        )
        agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
        name = "rcv_" + uuid.uuid4().hex[:8]
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            return {r.event_type: r.n for r in spark.table(name).collect()}
        finally:
            q.stop()

    got1 = run_round()
    want1 = {
        r.event_type: r.n
        for r in half1.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got1 == want1

    half2.write.mode("append").parquet(staging)
    got2 = run_round()
    want2 = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got2 == want2  # state carried across the restart
