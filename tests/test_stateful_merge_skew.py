"""Stateful streaming, MERGE/SCD2, and skew-salting tests."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from ssafynews_data_spark.operators.merge import merge_upsert, scd2_apply
from ssafynews_data_spark.operators.skew import salted_group_agg, salted_join
from ssafynews_data_spark.schemas import TESTDATA_SCHEMAS
from ssafynews_data_spark.sources.readers import load_table
from ssafynews_data_spark.streaming.pipeline import run_to_memory
from ssafynews_data_spark.streaming.stateful import running_user_stats


def test_running_user_stats_stateful(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev")
    ev.coalesce(2).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)
    name = "st_" + uuid.uuid4().hex[:8]
    q = run_to_memory(running_user_stats(stream), name, output_mode="update")
    try:
        # last update per user == final running totals
        got = {
            r.user_id: (r.n_events, round(r.total_value, 2))
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()
    want = {
        r.user_id: (r.n, round(r.s, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    # every user's final state must match the batch aggregate
    finals = {u: got[u] for u in want if u in got}
    assert finals == {u: want[u] for u in finals} and len(finals) == len(want)


def test_merge_upsert_latest_wins(spark):
    existing = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    )
    updates = spark.createDataFrame([("b", 20), ("d", 40)], "k string, v int")
    out = {r.k: r.v for r in merge_upsert(existing, updates, "k").collect()}
    assert out == {"a": 1, "b": 20, "c": 3, "d": 40}


def test_scd2_validity_ranges(spark):
    hist = spark.createDataFrame(
        [("u1", "seoul", "2024-01-01")], "k string, city string, valid_from string"
    )
    changes = spark.createDataFrame(
        [("u1", "busan", "2024-06-01"), ("u2", "jeju", "2024-03-01")],
        "k string, city string, valid_from string",
    )
    rows = {
        (r.k, r.city): (r.valid_to, r.is_current)
        for r in scd2_apply(hist, changes, "k").collect()
    }
    assert rows[("u1", "seoul")] == ("2024-06-01", False)
    assert rows[("u1", "busan")] == (None, True)
    assert rows[("u2", "jeju")] == (None, True)


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = {
        r.event_type: (r.n, round(r.total, 2))
        for r in salted_group_agg(ev, "event_type", "value").collect()
    }
    plain = {
        r.event_type: (r.n, round(r.s, 2))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    users = spark.createDataFrame(
        [(i, f"user_{i}") for i in range(15)], "user_id long, name string"
    )
    salted = salted_join(ev, users, "user_id")
    plain = ev.join(users, "user_id")
    assert salted.count() == plain.count()
    a = sorted((r.event_id, r.name) for r in salted.collect())
    b = sorted((r.event_id, r.name) for r in plain.collect())
    assert a == b
