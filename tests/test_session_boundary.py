"""Session-gap boundary semantics: session_window vs the batch lag
formulation at a gap of exactly 30:00 (documented in
streaming_queries.streaming_session_counts)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from ssafynews_data_spark.streaming.pipeline import run_to_memory


def test_exact_gap_boundary(spark, tmp_path):
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:30:00"),  # exactly 1800s after the first
        (1, "2024-01-01 12:00:00"),  # clearly a new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    # batch formulation: gap > 1800s starts a new session → 10:30 stays
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(
            __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
                "user_id"
            ).orderBy("ts")
        )
    )
    batch_sessions = (
        df.withColumn(
            "new_s", F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
        )
        .agg(F.sum("new_s").alias("n"))
        .collect()[0]
        .n
    )
    assert batch_sessions == 2  # (10:00+10:30), (12:00)

    # streaming session_window on the same rows
    path = str(tmp_path / "p")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    name = "sb_" + uuid.uuid4().hex[:8]
    q = run_to_memory(agg, name, output_mode="complete")
    try:
        stream_sessions = spark.sql(f"SELECT count(*) AS c FROM {name}").collect()[0].c
    finally:
        q.stop()
    # session_window extends a session for an event at exactly last+gap
    # (measured empirically here) — the same inclusion as the batch
    # formulation's `> gap` rule, so the two agree even on the boundary.
    assert stream_sessions == 2, (
        "session_window boundary semantics changed — update the "
        "streaming_session_counts docstring if this fails"
    )
