"""TPC-H shape coverage, part 4: the subquery/disjunction family.

Rounds 1-5 covered Q1/Q3/Q5/Q7/Q10/Q14/Q18 (relational.py) — the
scan→join→agg→top-k spine.  This module adds the *subquery* shapes the
reference's SQL surface (Flink DDL inserts, consumer2.py:190-220;
SQLAlchemy queries, consumer.py:137-150) would need as it grew:
correlated EXISTS, NOT-IN with an uncorrelated subquery, scalar
subqueries, left-outer count distributions, and disjunctive multi-column
predicates.  The driver's testdata is a reduced TPC-H (no
partsupp/commitdate/phone columns), so each query keeps the *plan shape*
of its TPC-H namesake while adapting predicates to the columns that
exist (TESTDATA.md).

Scale notes (100 TB):

- EXISTS / NOT IN / IN become left-semi / left-anti joins — never a
  per-row subquery.  Semi/anti joins shuffle once on the key and keep
  only the probe side's columns, so they're the cheapest join family.
- Scalar subqueries (Q22's avg) are computed as a 1-row DataFrame and
  cross-joined; Spark broadcasts the single row, so the "subquery"
  costs one extra stage, not a per-row evaluation.
- Q13's left-outer join keeps EVERY customer; the count distribution is
  two cascaded hash aggregates, both with map-side partials.
- Q19's disjunction mixes part and lineitem columns, so it can't fully
  push down — but Catalyst extracts the part-only conjuncts
  (brand/size) into the broadcast side's scan and the lineitem-only
  ones (quantity) into the fact scan, leaving only the cross-table
  residual above the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.operators import money
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("joins", "tpch", "q4", "semi"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts for orders with a late-shipping
    lineitem — the canonical correlated EXISTS.  (The testdata has no
    l_commitdate/l_receiptdate, so "late" is l_shipdate > o_orderdate.)
    Spark plans the EXISTS as a LEFT SEMI join on orderkey with the
    correlated date comparison as the join condition; the quarter filter
    prunes orders at the scan BEFORE the shuffle, and the semi join
    drops lineitem columns immediately, so the shuffle carries only
    (l_orderkey, l_shipdate).  Ref: spark_daily_report.py:62-70 is the
    reference's only agg — this is the subquery family it lacks."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(floor(10000.0
                     * sum(CASE WHEN sn.n_name = 'NATION_1'
                                THEN (CAST(round(l_extendedprice * 100) AS BIGINT)
                                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                                ELSE 0 END)
                     / sum((CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))))
                     + 0.5) AS BIGINT) / 10000.0
                   AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("joins", "tpch", "q8"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1's share of ASIA-customer revenue per
    year — a 7-relation join whose aggregate is a conditional-sum ratio
    (share = flagged revenue / total revenue), NOT a filter: rows from
    every supplier nation must survive to the aggregate.  All four
    dimension legs (nation×2, region, supplier) broadcast; the region
    filter prunes the customer leg before its shuffle; the only
    fact-fact shuffles are lineitem⋈orders and ⋈customer."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    customer = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = money.disc_price_e4()
    flagged = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        # ratio of identical exact integers -> identical double ->
        # floor-quantized identically (money.py)
        .agg(
            (
                F.floor(
                    F.lit(10000.0) * F.sum(flagged) / F.sum(rev) + F.lit(0.5)
                ).cast("long")
                / F.lit(10000.0)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q13_customer_distribution",
    oracle="""
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    tags=("joins", "tpch", "q13", "outer"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer —
    LEFT OUTER join (zero-order customers MUST appear with c_count=0,
    which an inner join would silently drop) with the priority filter in
    the JOIN condition, not the WHERE (a WHERE filter on the right side
    would turn the outer join back into an inner one).  Two cascaded
    hash aggregates follow; the second one's input is |customers| rows,
    so its shuffle is tiny.  count(o_orderkey) counts non-null keys
    only — the outer join's null rows contribute 0, matching SQL."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q16_parts_supplier_count",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#9'
          AND p_type  <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 50
    """,
    tags=("joins", "tpch", "q16", "anti", "distinct"),
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    excluding a blocklisted supplier set — NOT IN over an uncorrelated
    subquery, planned as a LEFT ANTI join against the (tiny, broadcast)
    bad-supplier frame.  The brand/type/size predicates all push into
    the part scan before its broadcast; count(DISTINCT) expands to a
    two-phase aggregate (dedup on group+suppkey, then count), both
    phases with map-side partials.  NOT IN's null trap doesn't bite
    here (s_suppkey is a non-null key) but the anti join is the
    null-safe form regardless."""
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
        SELECT CAST(floor((sum((CAST(round(l_extendedprice * 100) AS BIGINT)
                                * (100 - CAST(round(l_discount * 100) AS BIGINT))))
                           + 50) / 100.0) AS BIGINT) / 100.0 AS revenue,
               count(*) AS n_matched
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#7'  AND p_size BETWEEN 5 AND 25
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 15 AND 40
               AND l_quantity BETWEEN 20 AND 35)
    """,
    tags=("joins", "tpch", "q19", "pushdown"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-branch disjunction mixing
    part columns (brand, size) and lineitem columns (quantity).  The
    whole OR can't push below the join, but Catalyst derives the
    OR-of-branches *per table* — part rows outside
    brand∈{1,7,20}/size∈[1,40] and lineitems outside quantity∈[1,35]
    are pruned at their scans — leaving only the residual cross-table
    disjunction above the broadcast join.  One final 1-row aggregate."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 10) & qty.between(1, 15))
        | ((F.col("p_brand") == "Brand#7") & size.between(5, 25) & qty.between(10, 25))
        | ((F.col("p_brand") == "Brand#20") & size.between(15, 40) & qty.between(20, 35))
    )
    return j.filter(cond).agg(
        money.half_up(money.sum_units(money.disc_price_e4()), 4).alias("revenue"),
        F.count("*").alias("n_matched"),
    )


@register(
    "q22_sales_opportunity",
    oracle="""
        WITH cutoff AS (
            SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey, cutoff
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY n_name
        ORDER BY n_name
    """,
    tags=("joins", "tpch", "q22", "anti", "scalar-subquery"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no urgent order, by nation
    (the testdata generator gives every customer at least one order, so
    the literal Q22 "never ordered" set is empty; filtering the
    NOT-EXISTS side to '1-URGENT' keeps the identical plan shape with a
    non-degenerate answer).  Composes BOTH remaining subquery families:
    a scalar subquery (the positive-balance average, computed as a
    1-row frame and cross-joined; Spark broadcasts the single row so
    every partition filters locally) and NOT EXISTS (LEFT ANTI join on
    custkey, with the priority filter pushed into the anti side's scan
    BEFORE the shuffle).  The anti join's probe side is already cut
    down by the balance filter, so the shuffle moves only the
    surviving rich customers; orders contributes just o_custkey."""
    customer = load_table(spark, sf_dir, "customer")
    cutoff = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = customer.crossJoin(F.broadcast(cutoff)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH unit AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(floor(l_extendedprice / l_quantity * 100) AS BIGINT))
                       AS unit_cents
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ), best AS (
            SELECT l_partkey, l_suppkey, unit_cents,
                   min(unit_cents) OVER (PARTITION BY l_partkey) AS best_cents,
                   min(l_suppkey)  OVER (PARTITION BY l_partkey, unit_cents)
                       AS first_supp
            FROM unit
        )
        SELECT p_partkey, p_brand, s_name,
               unit_cents / 100.0 AS unit_price
        FROM best
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE unit_cents = best_cents AND l_suppkey = first_supp
          AND p_size <= 5
        ORDER BY p_partkey
    """,
    tags=("joins", "tpch", "q2", "correlated-min"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest supplier per part — a correlated
    MIN subquery (testdata has no partsupp, so observed
    l_extendedprice/l_quantity is the supply cost).  Rather than
    re-joining a grouped-min frame (Q2's textbook plan, one extra
    shuffle), the min-over-partition WINDOW reuses the (partkey)
    clustering from the groupBy shuffle; the supplier-key tie-break
    makes the winner deterministic on both engines.  Dimension joins
    broadcast; the p_size filter prunes parts before its broadcast.

    Price quantization is floor-to-cents on the RAW division, not
    round(x, 2): both engines compute the identical IEEE double for
    x/y·100 and floor agrees bit-for-bit, whereas each engine's
    round() breaks .xx5 boundaries by its own decimal algorithm —
    6 of 1948 winners flipped at sf0.1 before this change."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select(
        "p_partkey", "p_brand"
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")
        ).alias("unit_cents")
    )
    from pyspark.sql import Window as W

    w_part = W.partitionBy("l_partkey")
    w_tie = W.partitionBy("l_partkey", "unit_cents")
    best = unit.withColumn("best_cents", F.min("unit_cents").over(w_part)).withColumn(
        "first_supp", F.min("l_suppkey").over(w_tie)
    )
    return (
        best.filter(
            (F.col("unit_cents") == F.col("best_cents"))
            & (F.col("l_suppkey") == F.col("first_supp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            (F.col("unit_cents") / 100.0).alias("unit_price"),
        )
        .orderBy("p_partkey")
    )
