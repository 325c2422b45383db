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


def test_snapshot_diff_classification(spark):
    """snapshot_diff on a planted pair pins the four-way classification:
    null-side rows are added/removed, any field delta (including one
    that is NULL on one side) is changed, identical rows unchanged."""
    from ssafynews_data_spark.operators.merge import snapshot_diff

    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 21.0), (4, "w", 40.0), (5, "n", 50.0)],
        "k long, s string, v double",
    )
    out = {
        r.k: r.change_type
        for r in snapshot_diff(a, b, "k", ["s", "v"]).collect()
    }
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_money_columns_are_integer_cents(spark, sf_dir):
    """Fixture contract backing operators/money.py: every money/rate
    column the integer-exact paths convert with round(col*100) must BE
    a 2-decimal value (else cents() silently misquantizes and the
    'exact' sums drift).  Quantities must be integral for the q17
    integer cutoff."""
    li = load_table(spark, sf_dir, "lineitem")
    for col in ("l_extendedprice", "l_discount", "l_tax"):
        off = li.select(
            F.max(F.abs(F.col(col) * 100 - F.round(F.col(col) * 100))).alias("d")
        ).collect()[0].d
        assert off is not None and off < 1e-6, (col, off)
    qoff = li.select(
        F.max(F.abs(F.col("l_quantity") - F.round("l_quantity"))).alias("d")
    ).collect()[0].d
    assert qoff is not None and qoff == 0.0
    part = load_table(spark, sf_dir, "part")
    poff = part.select(
        F.max(
            F.abs(F.col("p_retailprice") * 100 - F.round(F.col("p_retailprice") * 100))
        ).alias("d")
    ).collect()[0].d
    assert poff is not None and poff < 1e-6


def test_money_half_up_matches_decimal_rounding(spark):
    """money.half_up on exact integer units == Python Decimal HALF_UP —
    incl. the .xx5 boundary cases round(sum(double), 2) got wrong."""
    from decimal import ROUND_HALF_UP, Decimal

    from ssafynews_data_spark.operators import money

    units_e4 = [123450, 123449, 123451, 99950, 100, 50, 49, 7777777750]
    df = spark.createDataFrame([(u,) for u in units_e4], "u long")
    got = {
        r.u: r.v
        for r in df.select("u", money.half_up(F.col("u"), 4).alias("v")).collect()
    }
    for u in units_e4:
        want = float(
            (Decimal(u) / Decimal(10000)).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
        )
        assert got[u] == want, (u, got[u], want)
