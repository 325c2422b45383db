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
