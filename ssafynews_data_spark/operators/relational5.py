"""TPC-H shape coverage, part 5: the remaining 8 queries — full 22/22.

Rounds 1-6 covered Q1-Q5, Q7, Q8, Q10, Q13, Q14, Q16, Q18, Q19, Q22
(relational.py / relational4.py).  This module finishes the suite:
Q6, Q9, Q11, Q12, Q15, Q17, Q20, Q21 — each a join/decorrelation shape
the engine had not yet exercised end-to-end (pure pushdown agg,
multi-fact profit join, HAVING-vs-global-scalar, conditional-count
pivot, argmax-vs-scalar-max, per-group correlated scalar, nested
semi-join quantile-of-group, and the double EXISTS / NOT-EXISTS
self-join).  The driver's testdata is a reduced TPC-H (no partsupp,
no l_commitdate/l_receiptdate/l_shipmode — TESTDATA.md), so each query
keeps the *plan shape* of its namesake with predicates adapted to the
columns that exist; adaptations are noted per query.

Scale notes (100 TB):

- Q6 is the pushdown benchmark: every predicate and both referenced
  columns reach the parquet scan; the whole query is one map-side
  partial + a 1-row final agg — no shuffle of data rows at all.
- Q9/Q12 shuffle the fact table once on orderkey; every dimension leg
  broadcasts.
- Q11/Q15's "global scalar" subqueries are 1-row DataFrames
  cross-joined (Spark broadcasts the row) — one extra stage, never a
  per-row subquery.
- Q17's per-part average decorrelates to a group-by + equi-join —
  at scale the join reuses the partkey partitioning of the aggregate.
- Q21's EXISTS / NOT-EXISTS pair becomes one left-semi plus one
  left-anti join on orderkey; both keep only the probe side's columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.operators import money
from ssafynews_data_spark.sources.readers import load_table


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                               * CAST(round(l_discount * 100) AS BIGINT))
                           + 50) / 100.0) AS BIGINT) / 100.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("tpch", "q6", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the forecasting-revenue-change query, unmodified (all
    its columns exist).  The canonical predicate-pushdown showcase:
    three range predicates and a 2-column projection all reach the
    parquet scan (PushedFilters + ReadSchema), the sum partials
    map-side, and the only 'shuffle' is the 1-row final aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money.half_up(
            money.sum_units(money.cents("l_extendedprice") * money.cents("l_discount")), 4
        ).alias("revenue")
    )


@register(
    "q9_product_profit",
    # Integer-exact money path (same treatment as cusum_drift_scores /
    # order_price_percentiles after a reseed catch): profit in units of
    # 10^-4 dollars is an exact BIGINT per row (prices/discounts are
    # 2-decimal, quantity integral), so the SUM is the identical
    # integer in both engines regardless of accumulation order, and
    # the final half-up quantization to cents is floor() over a
    # bit-identical double.  round(sum(<double>), 2) flipped a cent on
    # reseed 31337 when one nation-year's sum landed within an ULP of
    # a .xx5 boundary.
    oracle="""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(round(l_discount * 100) AS BIGINT))
                               - 10 * CAST(round(p_retailprice * 100) AS BIGINT)
                                    * CAST(l_quantity AS BIGINT))
                           + 50) / 100.0) AS BIGINT) / 100.0 AS sum_profit
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%red%'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    tags=("tpch", "q9", "joins"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-name-filtered slice.  The testdata has no partsupp, so the
    namesake's ps_supplycost becomes a retail-price cost proxy
    (0.1 * p_retailprice * l_quantity) — same expression shape (profit
    is revenue minus a per-line cost term), same 5-relation join.  The
    part filter prunes the (broadcast) part leg before the join; the
    single fact-fact shuffle is lineitem⋈orders on orderkey."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    # exact integer 10^-4 dollars per row (see oracle comment); fits a
    # BIGINT sum to ~10^9 rows per group — at true 100 TB group sizes
    # swap the sum to decimal(38, 4), same construction
    profit_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    ) - 10 * F.round(F.col("p_retailprice") * 100).cast("long") * F.col(
        "l_quantity"
    ).cast("long")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (
                F.floor((F.sum(profit_e4) + 50) / 100.0).cast("long") / 100.0
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


#: Q11's "important part" threshold: value share of the nation's total.
#: TPC-H uses 0.0001/SF over partsupp; over the reduced schema's
#: lineitem values 2/1000 keeps a meaningful important set (~50 parts
#: at sf0.01) without degenerating to all-or-nothing.  Kept as an
#: integer RATIO so the membership compare is exact integer arithmetic
#: (v*denom > total*numer) — no floating threshold at all.
Q11_NUMER = 2
Q11_DENOM = 1000


@register(
    "q11_important_parts",
    oracle=f"""
        WITH val AS (
            SELECT l_partkey,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS v_e4
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey
        )
        SELECT l_partkey AS partkey,
               CAST(floor((v_e4 + 50) / 100.0) AS BIGINT) / 100.0 AS part_value
        FROM val
        WHERE v_e4 * {Q11_DENOM} > (SELECT sum(v_e4) FROM val) * {Q11_NUMER}
        ORDER BY part_value DESC, partkey
    """,
    tags=("tpch", "q11", "scalar-subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's total value — a grouped aggregate HAVING-compared against a
    GLOBAL scalar subquery over the same aggregate.  partsupp is absent,
    so 'value' is the nation's lineitem revenue per part (same two-level
    aggregate + scalar-threshold shape).  Spark computes the per-part
    frame ONCE, derives the 1-row total from it, and broadcasts the row
    via crossJoin — the aggregate is not recomputed (self-referencing
    scalar subqueries decorrelate to exactly this).  Both sides of the
    strict inequality are quantized (round to cents, the q15 treatment)
    so a part value within an ULP of the threshold can't flip
    membership between Spark's and DuckDB's summation orders."""
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    li = load_table(spark, sf_dir, "lineitem")
    # pinned: both branches (the important set AND the 1-row threshold)
    # read the SAME materialized aggregate — without it Spark plans the
    # scan+join+shuffle twice (measured 3 exchanges → 2)
    val = pin(
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(money.sum_units(money.disc_price_e4()).alias("v_e4"))
    )
    total = val.agg(F.sum("v_e4").alias("total_e4"))
    # v > FRACTION * total on EXACT integers: v*denom > total*numer —
    # no rounding anywhere near the membership decision
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v_e4") * Q11_DENOM > F.col("total_e4") * Q11_NUMER)
        .select(
            F.col("l_partkey").alias("partkey"),
            money.half_up(F.col("v_e4"), 4).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


@register(
    "q12_priority_shipping",
    oracle="""
        SELECT l_returnflag AS flag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY flag
        ORDER BY flag
    """,
    tags=("tpch", "q12", "conditional-count"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per shipping class, how many lines belong to
    high- vs low-priority orders — the conditional-count (CASE-sum)
    pivot.  l_shipmode is absent, so the class column is l_returnflag
    (same cardinality class, same shape).  One orderkey shuffle; the
    date filter prunes lineitem at the scan before it."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("flag")
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                               + 50) / 100.0) AS BIGINT) / 100.0 AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    tags=("tpch", "q15", "scalar-subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the top supplier by quarterly revenue — a revenue
    'view' joined against its own scalar max (the namesake's CREATE VIEW
    becomes a reused DataFrame).  Revenue is the integer-exact money
    sum quantized to cents (operators/money.py), so the max equality
    compares identical doubles in both engines BY CONSTRUCTION — an
    unrounded FP equality across different summation orders would be
    engine-dependent, and even round(sum, 2) ties at .xx5 (the q9
    reseed lesson).  The max is a 1-row broadcast; the revenue
    aggregate is computed once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    # pinned: the revenue 'view' feeds both the argmax probe and the
    # scalar max — one aggregation, not two (the namesake's CREATE VIEW
    # materialization semantics)
    rev = pin(
        li.groupBy("l_suppkey").agg(
            money.half_up(money.sum_units(money.disc_price_e4()), 4).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        WITH pa AS (SELECT l_partkey AS pk,
                           sum(CAST(l_quantity AS BIGINT)) AS sum_q,
                           count(*) AS n_q
                    FROM lineitem GROUP BY l_partkey)
        SELECT CAST(floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                          / 7.0 + 0.5) AS BIGINT) / 100.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN pa   ON pk = l_partkey
        WHERE p_brand = 'Brand#1' AND p_type = 'ECONOMY'
          AND CAST(l_quantity AS BIGINT) * n_q * 5 < sum_q
    """,
    tags=("tpch", "q17", "correlated-scalar"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand — the canonical PER-GROUP correlated scalar subquery
    (l_quantity < 0.2 * avg quantity OF THAT PART), decorrelated into a
    per-part aggregate joined back by partkey.  p_container is absent,
    so the second part predicate is p_type.  At scale the per-part
    aggregate and the probe join share the partkey partitioning; the
    brand filter prunes the (broadcast) part leg.  The per-part cutoff
    qty < 0.2*avg(qty) is evaluated as qty*n*5 < sum(qty) — exact
    integer arithmetic, so membership cannot depend on either engine's
    accumulation order or rounding algorithm (operators/money.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    # qty < 0.2 * avg(qty) on EXACT integers: qty * n * 5 < sum(qty) —
    # quantities are integral, so membership is pure integer arithmetic
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_q"),
        F.count(F.lit(1)).alias("n_q"),
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "ECONOMY")
    )
    avg_yearly = F.floor(
        money.sum_units(money.cents("l_extendedprice")).cast("double") / F.lit(7.0) + F.lit(0.5)
    ).cast("long") / F.lit(100.0)
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(
            F.col("l_quantity").cast("long") * F.col("n_q") * 5 < F.col("sum_q")
        )
        .agg(avg_yearly.alias("avg_yearly"))
    )


@register(
    "q20_excess_shippers",
    oracle="""
        WITH pq AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        ),
        pt AS (SELECT l_partkey, sum(sq) AS tq FROM pq GROUP BY l_partkey),
        hot AS (
            SELECT DISTINCT pq.l_suppkey
            FROM pq
            JOIN pt USING (l_partkey)
            JOIN part ON p_partkey = pq.l_partkey
            WHERE p_name LIKE 'small%'
              AND round(pq.sq, 2) > round(0.5 * pt.tq, 2)
        )
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
          AND s_suppkey IN (SELECT l_suppkey FROM hot)
        ORDER BY s_name
    """,
    tags=("tpch", "q20", "nested-semi"),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of one nation who dominate the supply
    of some targeted part — the nested IN-subquery chain.  partsupp's
    availqty comparison becomes 'shipped more than half of the part's
    corpus-wide 1996 quantity' over lineitem (two cascaded aggregates on
    the same shuffle key + a fraction-of-group comparison — the
    namesake's correlated 0.5*sum(l_quantity) shape).  The hot-supplier
    set reduces to a left-semi join; the nation leg broadcasts.  Both
    sides of the dominance compare are quantized (round to 2) so a
    supplier at exactly half the part total can't flip membership on
    FP accumulation-order differences between engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # pinned: pq feeds BOTH the per-(part, supplier) probe side and the
    # per-part total — unpinned, Spark aggregates lineitem twice
    pq = pin(
        li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("sq"))
    )
    pt = pq.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    hot = (
        pq.join(pt, "l_partkey")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.round("sq", 2) > F.round(0.5 * F.col("tq"), 2))
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        # the dominating-supplier set is small by construction (it needs
        # > half of a part's corpus-wide quantity) — broadcast the semi
        # probe instead of sort-merging the supplier table against it
        supplier.join(
            F.broadcast(hot), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM lineitem l1
        JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    tags=("tpch", "q21", "exists", "anti"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who kept multi-supplier orders waiting — the
    hardest decorrelation in the suite: a correlated EXISTS (another
    supplier participated) AND a correlated NOT EXISTS (no OTHER
    supplier was also late) against the same fact table.  'Late' is
    l_shipdate > o_orderdate + 30 days (receipt/commit dates don't
    exist in the reduced schema).

    Spark shape: the late-line base joins orders once (status F,
    carrying o_orderdate for the lateness predicate); the EXISTS is a
    LEFT SEMI and the NOT EXISTS a LEFT ANTI join, both on orderkey
    with the suppkey inequality as a join residual — three shuffles
    total on the same key, no per-row subqueries, then one counting
    aggregate and a TakeOrdered(100) with s_name as the deterministic
    tiebreak."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")

    l1 = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).filter(late)
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l1.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))

    waited = (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waited.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
