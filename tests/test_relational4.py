"""Invariants for the TPC-H subquery-family shapes (relational4) and
the corpus-LM quality operators (lm_quality) — plan-shape and semantic
checks beyond the DuckDB oracle gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ssafynews_data_spark.operators import lm_quality, relational4
from ssafynews_data_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- TPC-H subquery shapes -------------------------------------------------


def test_q4_exists_is_semi_join(spark, sf_dir):
    df = relational4.q4_order_priority(spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan  # EXISTS must not be a per-row subquery
    rows = df.collect()
    # every priority count is bounded by the quarter's order count
    total = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .count()
    )
    assert sum(r.order_count for r in rows) <= total


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    df = relational4.q13_customer_distribution(spark, sf_dir)
    rows = df.collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust  # outer join loses nobody


def test_q16_anti_join_and_distinct(spark, sf_dir):
    df = relational4.q16_parts_supplier_count(spark, sf_dir)
    plan = _plan(df)
    assert "LeftAnti" in plan  # NOT IN planned as anti join
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert all(r.supplier_cnt <= n_supp for r in df.collect())


def test_q19_disjunction_prunes_scans(spark, sf_dir):
    df = relational4.q19_disjunctive_revenue(spark, sf_dir)
    plan = _plan(df)
    # Catalyst must extract per-table conjuncts from the OR: the part
    # scan gets a brand filter, the lineitem scan a quantity bound.
    assert "PushedFilters" in plan
    r = df.collect()[0]
    assert r.n_matched >= 0


def test_q22_scalar_subquery_counts(spark, sf_dir):
    rows = relational4.q22_sales_opportunity(spark, sf_dir).collect()
    # every bucket is customers above the positive-balance average
    for r in rows:
        assert r.numcust >= 1
        assert r.totacctbal > 0


def test_q2_one_winner_per_part(spark, sf_dir):
    df = relational4.q2_min_cost_supplier(spark, sf_dir)
    per_part = df.groupBy("p_partkey").count().collect()
    assert all(r["count"] == 1 for r in per_part)  # tie-break is total


def test_q8_share_in_unit_interval(spark, sf_dir):
    rows = relational4.q8_market_share(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0


# --- corpus-LM quality family ---------------------------------------------


def test_bigram_lm_scores_every_multiword_doc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df = lm_quality.bigram_lm_perplexity(spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= docs.count()
    for r in rows:
        # add-one smoothing keeps every probability in (0, 1] →
        # nll >= 0; and a seen bigram's prob is at least 1/(c1+V)
        assert r.avg_nll >= 0.0
        assert r.n_bigrams >= 1


def test_bigram_lm_model_join_not_broadcast(spark, sf_dir):
    # the bigram "model" must not carry a broadcast HINT — at 100 TB it
    # has billions of rows.  (AQE may still choose broadcast at runtime
    # when the measured size is tiny, which is exactly right; the
    # invariant is that WE only pin the vocab-sized unigram and 1-row
    # vocab frames.)  The analyzed plan shows exactly those two hints.
    analyzed = (
        lm_quality.bigram_lm_perplexity(spark, sf_dir)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert analyzed.count("UnresolvedHint") == 0
    assert analyzed.count("ResolvedHint (strategy=broadcast)") == 2


def test_kl_divergence_nonnegative(spark, sf_dir):
    rows = lm_quality.unigram_kl_source_divergence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Gibbs' inequality (allow FP slack at the rounding boundary)
        assert r.kl_vs_corpus >= -1e-3
        assert r.n_tokens > 0


def test_zipf_slope_negative(spark, sf_dir):
    rows = lm_quality.zipf_fit_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_types >= 10:
            assert r.zipf_slope < 0  # frequency falls with rank
            assert 0.0 <= r.zipf_r2 <= 1.0 + 1e-9


def test_k_anonymity_accounting(spark, sf_dir):
    rows = lm_quality.k_anonymity_profile(spark, sf_dir).collect()
    ev_total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows) == ev_total
    for r in rows:
        assert 0 <= r.rows_below_k10 <= r.n_rows
        assert math.isclose(
            r.pct_below_k10, 100.0 * r.rows_below_k10 / r.n_rows, abs_tol=0.01
        )
