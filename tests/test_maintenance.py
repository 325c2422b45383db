"""Compaction: the oracle proves semantics; these prove the point —
fewer files, no shuffle."""

from __future__ import annotations

import os

from ssafynews_data_spark.operators import maintenance
from ssafynews_data_spark.sources.readers import load_table


def _parquet_files(path: str) -> int:
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def test_compaction_cuts_file_count(spark, sf_dir):
    frag = maintenance.write_fragmented(spark, sf_dir, n_files=64)
    dst = maintenance._dir(sf_dir, "compacted_events")
    maintenance.compact(spark, frag, dst, maintenance.TARGET_FILE_ROWS)
    before, after = _parquet_files(frag), _parquet_files(dst)
    assert before == 64
    assert after < before // 4
    # and nothing lost
    assert (
        spark.read.parquet(dst).count()
        == load_table(spark, sf_dir, "events").count()
    )


def test_compaction_plans_no_shuffle(spark, sf_dir):
    frag = maintenance.write_fragmented(spark, sf_dir, n_files=16)
    df = spark.read.parquet(frag).coalesce(2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # coalesce concatenates, never shuffles


def test_profile_covers_all_requested_columns(spark, sf_dir):
    rows = {r.col: r for r in maintenance.events_column_profile(spark, sf_dir).collect()}
    assert set(rows) == {"event_type", "user_id", "value"}
    ev = load_table(spark, sf_dir, "events")
    assert rows["event_type"].n_distinct == ev.select("event_type").distinct().count()
