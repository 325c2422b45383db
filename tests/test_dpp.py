"""Dynamic partition pruning: the oracle proves semantics; these tests
prove the fact scan is actually pruned at run time."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.operators import dpp


def test_dpp_filter_in_plan(spark, sf_dir):
    df = dpp.dpp_top_days_report(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]


def test_dpp_reads_only_top_days(spark, sf_dir):
    path = dpp.write_day_partitioned(spark, sf_dir)
    dim = dpp.top_revenue_days(spark, sf_dir)
    # input_file_name() rejects multi-source plans: tag the fact rows
    # with their file BEFORE the join
    fact = spark.read.parquet(path).withColumn("f", F.input_file_name())
    joined = fact.join(F.broadcast(dim.select("d")), "d")
    # every file touched must belong to one of the K chosen day dirs
    files = [r.f for r in joined.select("f").distinct().collect()]
    days = {str(r.d) for r in dim.collect()}
    assert files
    for f in files:
        assert any(f"/d={d}/" in f for d in days), f


def test_dim_is_k_rows(spark, sf_dir):
    assert dpp.top_revenue_days(spark, sf_dir).count() == dpp.TOP_DAYS
