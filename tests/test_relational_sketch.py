"""Mergeable-HLL invariants: estimates near exact, union consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.operators.relational3 import hll_daily_user_sketches
from ssafynews_data_spark.sources.readers import load_table


def test_hll_estimates_bounded_and_union_consistent(spark, sf_dir):
    rows = hll_daily_user_sketches(spark, sf_dir).collect()
    per_day = [r for r in rows if r.day != "ALL"]
    total = [r for r in rows if r.day == "ALL"]
    assert per_day and len(total) == 1
    for r in per_day:
        assert abs(r.est_users - r.exact_users) <= max(2, 0.05 * r.exact_users), r
    exact_all = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert abs(total[0].est_users - exact_all) <= max(2, 0.05 * exact_all)
