"""TPC-H completion (part 5) plan-shape invariants.

Value correctness is oracle-checked (tools/check_oracles.py /
CORRECTNESS); these tests pin the PHYSICAL properties the scale notes
claim — pushdown reaching the scan, EXISTS/NOT-EXISTS decorrelating to
semi/anti joins, scalar subqueries broadcasting instead of recomputing.
"""

from __future__ import annotations

from ssafynews_data_spark.operators import relational5


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_predicates_and_projection_reach_the_scan(spark, sf_dir):
    plan = _plan(relational5.q6_forecast_revenue(spark, sf_dir))
    scan = plan[plan.index("FileScan") :]
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    # all three range predicates push down
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    read = scan.split("ReadSchema: ")[1].splitlines()[0]
    # projection pruned to exactly the referenced columns
    for c in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert c in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_q21_decorrelates_to_semi_and_anti_joins(spark, sf_dir):
    plan = _plan(relational5.q21_waiting_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    rows = relational5.q21_waiting_suppliers(spark, sf_dir).collect()
    assert rows and all(r.numwait >= 1 for r in rows)
    waits = [r.numwait for r in rows]
    assert waits == sorted(waits, reverse=True)


def test_q11_threshold_broadcasts_single_row(spark, sf_dir):
    plan = _plan(relational5.q11_important_parts(spark, sf_dir))
    # the global scalar lands as a broadcast nested-loop of ONE row —
    # not a re-aggregation on the probe side (val is aggregated twice in
    # the plan tree, once per branch, but never per-row)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    rows = relational5.q11_important_parts(spark, sf_dir).collect()
    assert rows
    vals = [r.part_value for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_q15_argmax_is_exact_tie_safe(spark, sf_dir):
    """Every returned supplier carries exactly the (rounded) max
    revenue; equality on quantized values keeps ties engine-agnostic."""
    rows = relational5.q15_top_supplier(spark, sf_dir).collect()
    assert rows
    assert len({r.total_revenue for r in rows}) == 1


def test_sum_units_decimal_matches_int64_path(spark, sf_dir):
    """money.sum_units (decimal(38,0) accumulation — the BIGINT-headroom
    enforcement) must be value-identical to the int64 sum wherever both
    are exact, and must stay exact where the int64 sum silently wraps
    (ansi off, the engine session default)."""
    from pyspark.sql import functions as F

    from ssafynews_data_spark.operators import money
    from ssafynews_data_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    row_dec, row_i64 = (
        li.agg(
            money.half_up(s(money.disc_price_e4()), 4).alias("rev"),
            money.avg_half_up(s(money.cents("l_extendedprice")), n, 2, 2).alias(
                "avg_price"
            ),
        ).collect()[0]
        for s in (money.sum_units, F.sum)
    )
    assert row_dec.rev == row_i64.rev
    assert row_dec.avg_price == row_i64.avg_price

    # the wrap the decimal path removes: 4 rows of 2^62 e6-units sum to
    # 2^64 — int64 wraps to 0 under ansi=false, decimal is exact.
    big = spark.createDataFrame([(2**62,)] * 4, "u long")
    exact = big.agg(money.sum_units(F.col("u")).alias("s")).collect()[0].s
    assert int(exact) == 4 * 2**62
    if spark.conf.get("spark.sql.ansi.enabled") == "false":
        wrapped = big.agg(F.sum("u").alias("s")).collect()[0].s
        assert wrapped != 4 * 2**62  # silent corruption, now unreachable
