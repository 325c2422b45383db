"""Batch + streaming sinks (SURVEY.md §2.1 S2/S5/S6/S7/S10).

The reference's write paths: Kafka JSON producer (collect/producer.py:26-29),
idempotent Postgres upsert — INSERT ... ON CONFLICT (link) DO NOTHING
(collect/consumer.py:65-90, consumer2.py:164-186) — and a
date-partitioned rolling JSON file sink (consumer2.py:190-209).

Spark-first equivalents:

- Partitioned parquet (not JSON) for the archive: partition pruning then
  replaces the reference's post-hoc date filter (spark_daily_report.py:63).
- Idempotent upsert = left-anti join against existing keys before append
  (works on any sink); on transactional stores use MERGE.
- Kafka sink = ``to_json(struct(*))`` → ``format("kafka")``; gated here
  behind the packaged-jar check since the test image has no Kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ssafynews_data_spark.localframe import local_df


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "year_month_day",
    ts_col: str = "published_at",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Daily-partitioned archive write (replaces consumer2.py:190-209).

    Adds the ``yyyyMMdd`` partition column the Flink sink derived via
    ``DATE_FORMAT(proctime,'yyyyMMdd')`` (consumer2.py:220), then writes
    partitioned columnar files so later day-slices are partition-pruned
    scans instead of full reads.
    """
    out = df
    if partition_col not in df.columns:
        out = df.withColumn(partition_col, F.date_format(F.col(ts_col), "yyyyMMdd"))
    out.write.mode(mode).partitionBy(partition_col).format(fmt).save(path)


def idempotent_append(
    df: DataFrame,
    existing: DataFrame,
    key: str = "link",
) -> DataFrame:
    """Rows of ``df`` whose ``key`` is not already present in ``existing``.

    The batch/anti-join formulation of the reference's
    ``ON CONFLICT (link) DO NOTHING`` (collect/consumer.py:81,
    consumer2.py:184).  Also dedups within the incoming batch itself
    (keep-first by key), matching upsert semantics.  At scale the anti
    join shuffles on ``key`` — if ``existing`` is a key-only projection
    it is tiny relative to the data and often broadcasts under AQE.
    """
    fresh = df.dropDuplicates([key])
    return fresh.join(existing.select(key).distinct(), on=key, how="left_anti")


def foreach_batch_upsert(
    path: str,
    key: str = "link",
    fmt: str = "parquet",
    partition_by: str | None = None,
):
    """``foreachBatch`` sink function: effectively-once append-by-key,
    optionally partitioned (S7's daily layout composed with S5/S6's
    upsert — one sink function covers the reference's whole write path).

    Replaces the reference's manual-offset-commit + ON CONFLICT pattern
    (consumer.py:156-174): Structured Streaming checkpointing gives
    at-least-once delivery and the key-idempotent write makes it
    effectively-once.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Only a *missing path* means "first batch".  A transient or
        # corrupt-file read error must FAIL the batch (checkpoint retry
        # preserves idempotence); swallowing it would treat existing
        # keys as empty and append the whole micro-batch as duplicates.
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jvm_path):
            existing = spark.read.format(fmt).load(path).select(key)
        else:
            existing = local_df(spark, [], batch_df.select(key).schema)
        out = idempotent_append(batch_df, existing, key)
        writer = out.write.mode("append").format(fmt)
        if partition_by is not None:
            writer = writer.partitionBy(partition_by)
        writer.save(path)

    return _sink


def _pg_upsert_sql(table: str, columns: list[str], key: str) -> str:
    """INSERT ... ON CONFLICT (key) DO NOTHING with quoted identifiers —
    the exact statement shape of the reference consumer
    (collect/consumer2.py:164-186; consumer.py:65-90).  Pure so the SQL
    contract is unit-testable without a database."""
    qcols = ", ".join(f'"{c}"' for c in columns)
    ph = ", ".join(["%s"] * len(columns))
    return (
        f'INSERT INTO "{table}" ({qcols}) VALUES ({ph}) '
        f'ON CONFLICT ("{key}") DO NOTHING'
    )


def foreach_batch_postgres_upsert(
    dsn: str,
    table: str,
    key: str = "link",
    columns: list[str] | None = None,
    page_size: int = 1000,
):
    """``foreachBatch`` sink: the reference's TRUE Postgres upsert
    (ON CONFLICT DO NOTHING), executed per PARTITION so each executor
    slot holds one connection and streams its rows in ``page_size``
    chunks — no driver collect, no per-row connection.  Composed with
    Structured Streaming checkpointing this is effectively-once: redelivered
    micro-batches re-insert the same keys and the conflict clause drops
    them, exactly like ``foreach_batch_upsert``'s anti-join does on files.

    psycopg2-gated: the import happens inside the partition function, so
    environments without the driver fail loudly at run time (and
    tests/test_real_providers_gated.py skips without a
    ``SPARK_GRAFT_PG_DSN``).  At 100 TB scale the same shape applies —
    writer parallelism == partition count; coalesce first if the
    database's connection budget is smaller."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        cols = columns or batch_df.columns
        sql = _pg_upsert_sql(table, cols, key)

        def write_partition(rows) -> None:
            import psycopg2  # gated: loud ImportError where absent

            conn = psycopg2.connect(dsn)
            try:
                with conn, conn.cursor() as cur:
                    buf = []
                    for r in rows:
                        buf.append(tuple(r[c] for c in cols))
                        if len(buf) >= page_size:
                            cur.executemany(sql, buf)
                            buf.clear()
                    if buf:
                        cur.executemany(sql, buf)
            finally:
                conn.close()

        batch_df.select(*cols).foreachPartition(write_partition)

    return _sink


def kafka_payload(df: DataFrame) -> DataFrame:
    """S2's value projection (producer.py:28's json.dumps serializer):
    one JSON string column named ``value`` — the Kafka wire contract."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def to_kafka_json(df: DataFrame, topic: str):
    """Kafka JSON sink writer (producer.py:26-29,50). Returns the writer;
    caller must have the kafka connector on the classpath."""
    return kafka_payload(df).write.format("kafka").option("topic", topic)


def write_csv(df: DataFrame, path: str, sep: str = ",", mode: str = "overwrite") -> None:
    """CSV sink (datashow.ipynb cells 28/41/47)."""
    df.write.mode(mode).option("header", "true").option("sep", sep).csv(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str,
    sort_col: str | None = None,
    fmt: str = "parquet",
    compression: str = "zstd",
) -> None:
    """Training-data shard writer: exactly ``n_shards`` output files,
    rows assigned by hash of ``shard_key`` (stable across runs for a
    stable key), optionally sorted within each shard (e.g. by a
    quality score so curriculum-style readers stream best-first).

    ``repartition(n, col)`` is one hash shuffle; ``sortWithinPartitions``
    is a per-partition sort with NO extra shuffle — the layout a
    1000-executor training job wants: shard count = reader parallelism,
    no global sort anywhere.  zstd by default: at 100 TB of text the
    ~30% size win over snappy is storage AND scan-time bandwidth (text
    shards are read many times per epoch), worth zstd's slightly higher
    encode cost on the one-time write."""
    out = df.repartition(n_shards, F.col(shard_key))
    if sort_col is not None:
        out = out.sortWithinPartitions(sort_col)
    out.write.mode("overwrite").option("compression", compression).format(fmt).save(path)


def observed_write(
    df: DataFrame,
    path: str,
    audit_cols: tuple[str, ...] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
):
    """Write with free pipeline metrics: ``df.observe`` attaches row
    count and per-column null counts to the SAME job that performs the
    write, so the audit costs zero extra scans — the Spark-native form
    of a pipeline's "rows written / nulls seen" counters (at 100 TB a
    follow-up ``count()`` for auditing would re-read the whole output).

    Returns the metrics row (an ``Observation`` result dict):
    ``n_rows`` plus ``nulls_<col>`` for each requested column."""
    from pyspark.sql import Observation

    obs = Observation("write_audit")
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in audit_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    observed = df.observe(obs, *metrics)
    observed.write.mode(mode).format(fmt).save(path)
    return obs.get
