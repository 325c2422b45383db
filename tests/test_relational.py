"""Relational-core invariants (beyond the DuckDB oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.operators import relational
from ssafynews_data_spark.sources.readers import load_table


def test_q1_group_count(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    rows = df.collect()
    assert 1 <= len(rows) <= 6  # |returnflag| x |linestatus|
    for r in rows:
        assert r.sum_disc_price <= r.sum_base_price  # discount only reduces


def test_q3_topk_ordered(spark, sf_dir):
    rows = relational.q3_shipping_priority(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = relational.q5_regional_revenue(spark, sf_dir)._sc is not None and \
        relational.q5_regional_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_top_events_per_user_bounds(spark, sf_dir):
    df = relational.top_events_per_user(spark, sf_dir)
    per_user = df.groupBy("user_id").count().collect()
    assert all(r["count"] <= 3 for r in per_user)


def test_sessionization_invariants(spark, sf_dir):
    df = relational.sessionization(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    rows = df.collect()
    assert sum(r.n_events for r in rows) == total
    assert all(1 <= r.n_sessions <= r.n_events for r in rows)


def test_asof_join_click_precedes_purchase(spark, sf_dir):
    df = relational.asof_join_purchase_click(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    j = (
        df.join(ev.withColumnRenamed("event_id", "purchase_id")
                  .withColumnRenamed("ts", "p_ts").drop("event_type"), "purchase_id")
        .join(ev.withColumnRenamed("event_id", "click_id")
                .withColumnRenamed("ts", "c_ts").drop("event_type"), "click_id")
    )
    bad = j.filter(F.col("c_ts") > F.col("p_ts")).count()
    assert bad == 0
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert df.count() == n_purchases


def test_rollup_totals_consistent(spark, sf_dir):
    rows = {(r.status, r.priority): r.n for r in relational.rollup_order_stats(spark, sf_dir).collect()}
    grand = rows[("ALL", "ALL")]
    by_status = sum(n for (s, p), n in rows.items() if p == "ALL" and s != "ALL")
    assert grand == by_status


def test_sequential_ids_dense(spark, sf_dir):
    rows = relational.sequential_ids(spark, sf_dir).collect()
    ids = sorted(r.news_id for r in rows)
    assert ids == list(range(1, len(rows) + 1))
