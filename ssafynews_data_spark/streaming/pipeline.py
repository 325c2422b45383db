"""Structured Streaming assembly (SURVEY.md §2.10, §3.1, §7 stage 5).

The reference's ingest path is a hand-rolled Kafka consumer loop with
manual offset commits (collect/consumer.py:152-174) and a declarative
PyFlink twin (collect/consumer2.py).  Engine mapping:

- source: ``readStream`` (kafka in prod; file source with explicit
  schema in tests — same query graph either way);
- D1 producer dedup deque(1000)  →  ``withWatermark + dropDuplicates``;
- ST2 PROCTIME()                 →  ``current_timestamp()`` ingest col,
  but the engine defaults to *event time* with a watermark (the
  reference had no late-data story, ST6 — documented upgrade);
- daily batch report             →  ST8 tumbling 1-day window agg;
- S5/S6 idempotent upsert        →  ``foreachBatch`` + key-anti-join
  (sources/sinks.py), checkpoint dir replaces manual offset commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_ingest_time(stream: DataFrame) -> DataFrame:
    """ST2: the PROCTIME() analog (collect/consumer2.py:143)."""
    return stream.withColumn("proctime", F.current_timestamp())


def dedup_stream(
    stream: DataFrame,
    key: str = "link",
    event_time_col: str = "updated",
    watermark: str = "1 hour",
) -> DataFrame:
    """D1 upgraded: the producer's deque(1000) sliding dedup window
    (collect/producer.py:7-15) becomes watermarked state — bounded like
    the deque, but keyed and time-based instead of count-based."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicates(
        [key, event_time_col]
    )


def daily_tumbling_counts(
    stream: DataFrame,
    event_time_col: str = "ts",
    group_col: str = "event_type",
    watermark: str = "1 day",
) -> DataFrame:
    """ST8: the streaming twin of the daily batch report (stage 0's
    flagship) — tumbling 1-day window counts with late-data watermark."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), "1 day"), F.col(group_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd").alias("d"),
            group_col,
            "n",
            "total_value",
        )
    )


def enrichment_stream(stream: DataFrame, text_col: str = "summary") -> DataFrame:
    """§3.1 enrichment chain on a stream: the four mock pandas_udfs as
    narrow columns — identical graph to the batch ``enrich()``."""
    from ssafynews_data_spark.functions.udfs import enrich

    return enrich(stream, text_col=text_col)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Test harness: drive a streaming query synchronously to completion
    against the in-memory sink (guide: Structured Streaming)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
