"""Relational core: projections, filters, aggregations, joins, windows,
top-k, set ops (SURVEY.md §2.2-2.7).

The reference's whole relational surface is the daily-report job
(``dags/scripts/spark_daily_report.py:55-96``: to_date → filter →
groupBy/count → orderBy) plus pandas probes in the preprocess notebook.
The engine generalizes each pattern to the full Spark relational surface
and registers an oracle-checked query per operator family.

Scale notes (100 TB):

- Joins against ``region``/``nation``/``supplier`` are explicitly
  ``broadcast()`` — they are dimension tables at any scale.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  handles skew splitting.  On a real deployment both sides would be
  bucketed by orderkey to eliminate the shuffle entirely.
- Top-k is ``orderBy().limit(k)`` which Spark executes as
  TakeOrderedAndProject (per-partition heap + driver merge of k rows),
  never a global sort.
- Global sequential ids (P14) use a window only for oracle parity; at
  scale use ``zipWithIndex``-style block ids (see ``sequential_ids``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.operators import money
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Flagship: daily event counts — the engine form of the reference's daily
# category report (spark_daily_report.py:62-70: to_date → filter → groupBy
# category → count → orderBy desc), generalized to group by (day, type).
# ---------------------------------------------------------------------------


@register(
    "daily_event_counts",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS d,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("A1", "P2", "T1"),
    bench=True,
)
def daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (to_date) + A1 (group-count) + T1 (sort desc): partial
    aggregation map-side, one shuffle on (d, event_type)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("d", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy(F.desc("n"), "d", "event_type")
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped aggregation / join coverage.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    # Money-product sums and averages are integer-exact (operators/
    # money.py): a summed product's true total hits a .xx5 cent
    # boundary with prob ~1/100 per row, where the engines' differently
    # ordered double sums round apart.  Plain-column sums (qty, base
    # price) stay as-is — their true totals are exact cents/integers,
    # never at a boundary.
    oracle=f"""
        SELECT l_returnflag,
               l_linestatus,
               round(sum(l_quantity), 2)          AS sum_qty,
               round(sum(l_extendedprice), 2)     AS sum_base_price,
               {money.sum_half_up_sql(money.DISC_PRICE_E4_SQL, 4)} AS sum_disc_price,
               {money.sum_half_up_sql(
                   money.DISC_PRICE_E4_SQL
                   + " * (100 + CAST(round(l_tax * 100) AS BIGINT))", 6)}
                   AS sum_charge,
               {money.avg_half_up_sql("CAST(l_quantity AS BIGINT)", 2, 0)} AS avg_qty,
               {money.avg_half_up_sql(money.CENTS_SQL.format(col="l_extendedprice"), 2, 2)}
                   AS avg_price,
               {money.avg_half_up_sql(money.CENTS_SQL.format(col="l_discount"), 4, 2)}
                   AS avg_disc,
               count(*)                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A3"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide hash aggregate, fully codegen'd; the scan
    reads only the 7 referenced columns (column pruning) and the shipdate
    predicate is pushed to parquet row groups.  Product sums/averages
    use the integer-exact money path (operators/money.py)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_e4 = money.disc_price_e4()
    charge_e6 = disc_e4 * (100 + money.cents("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        money.half_up(money.sum_units(disc_e4), 4).alias("sum_disc_price"),
        money.half_up(money.sum_units(charge_e6), 6).alias("sum_charge"),
        money.avg_half_up(money.sum_units(F.col("l_quantity").cast("long")), n, 2, 0).alias(
            "avg_qty"
        ),
        money.avg_half_up(money.sum_units(money.cents("l_extendedprice")), n, 2, 2).alias(
            "avg_price"
        ),
        money.avg_half_up(money.sum_units(money.cents("l_discount")), n, 4, 2).alias(
            "avg_disc"
        ),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(floor((sum((CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)))) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("joins", "T2"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape.  customer is small relative to the facts →
    broadcast; orders⋈lineitem shuffles on orderkey (bucket both by
    orderkey on a real deployment).  Top-10 is TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = li.join(
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money.half_up(money.sum_units(money.disc_price_e4()), 4).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    oracle="""
        SELECT n_name,
               CAST(floor((sum((CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)))) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY n_name
    """,
    tags=("joins", "broadcast"),
    bench=True,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join.  region/nation/supplier are broadcast
    (dimension tables at every scale); the only shuffle joins are the
    fact-fact orders⋈lineitem and customer⋈orders legs."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    nat = nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    sup = supplier.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
    )
    return joined.groupBy("n_name").agg(
        money.half_up(money.sum_units(money.disc_price_e4()), 4).alias("revenue")
    )


@register(
    "q18_large_volume_customer",
    oracle="""
        WITH big AS (
            SELECT l_orderkey FROM lineitem
            GROUP BY 1 HAVING sum(l_quantity) > 250
        )
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(o_totalprice, 2) AS totalprice,
               CAST(sum(l_quantity) AS BIGINT) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 100
    """,
    tags=("joins", "semi-join", "having"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: a HAVING-filtered aggregate feeds a SEMI join
    back into the fact table.  The big-order key set is the output of a
    map-side-combining hash aggregate and is tiny (heavy-hitter tail),
    so it re-enters as a broadcast LeftSemi — the fact table is scanned
    twice but shuffled only once (for the final per-order rollup).
    At 100 TB the first aggregate's partial combine means the shuffle
    carries one row per orderkey, not per lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    cust = load_table(spark, sf_dir, "customer")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY.md §2.5 — engine surface; reference had none).
# ---------------------------------------------------------------------------


@register(
    "trailing_week_user_value",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id, epoch_us(ts) AS tu,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT event_id, user_id,
               CAST(count(*) OVER w AS BIGINT) AS n_7d,
               CAST(sum(cents) OVER w AS BIGINT) AS cents_7d
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY tu
                     RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("windows", "range-frame", "event-time"),
)
def trailing_week_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per-user trailing 7-day count and spend
    at every event — the value-based window the ROWS-frame queries
    can't state (a frame of *time*, not of row count; rows with equal
    timestamps are peers and enter together).  Ordering is integer
    epoch-microseconds and amounts are integer cents, so the running
    frame sums are bit-exact across engines regardless of evaluation
    order.

    100 TB shape: one shuffle on user_id, then a per-partition ordered
    scan with a sliding two-pointer frame — O(rows), no re-scan per
    frame.  The same shape serves fraud velocity checks and rate
    limiting."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("tu"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tu")
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_7d"),
        F.sum("cents").over(w).alias("cents_7d"),
    )


@register(
    "top_events_per_user",
    oracle="""
        SELECT user_id, event_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               CAST(rn AS INT) AS rn
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
            FROM events
        )
        WHERE rn <= 3
    """,
    tags=("windows", "T2"),
)
def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the deterministic form of the
    reference's pandas ``head(10)`` (spark_daily_report.py:153).  One
    shuffle on user_id; no global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "rn",
        )
    )


@register(
    "rolling_daily_counts",
    oracle="""
        WITH daily AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS d, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, d, n,
               round(avg(n) OVER (PARTITION BY event_type ORDER BY d
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
        FROM daily
    """,
    tags=("windows",),
)
def rolling_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day mean over a daily aggregate (frame spec
    rowsBetween): agg shuffle on (type, d), window shuffle on type."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    return daily.withColumn("ma7", F.round(F.avg("n").over(w), 2))


@register(
    "sessionization",
    oracle="""
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM g GROUP BY user_id
    """,
    tags=("windows", "sessionization"),
    bench=True,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap>30min cumsum (guide 'Common OLAP
    patterns').  Microsecond-exact gap comparison via unix_micros so the
    oracle agrees bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events"))
    )


@register(
    "asof_join_purchase_click",
    oracle="""
        SELECT p.event_id AS purchase_id,
               p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("joins", "asof"),
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one — guide 'Common OLAP
    patterns'): union both streams, sort within user, carry the last
    non-null click id forward.  One shuffle on user_id, no N×M join —
    this is the formulation that survives 100 TB (contrast with a range
    self-join which explodes)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"), F.lit(0).alias("is_p"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"), F.lit(1).alias("is_p"),
    )
    # at equal ts a click sorts before the purchase → "p.ts >= c.ts".
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p", "purchase_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.col("last_click").alias("click_id"),
        )
    )


# ---------------------------------------------------------------------------
# Semi/anti joins (D2's anti-join formulation) and set ops (§2.7).
# ---------------------------------------------------------------------------


@register(
    "customers_with_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("joins", "semi"),
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("joins", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — also the batch form of the reference's idempotent
    ``ON CONFLICT DO NOTHING`` insert (collect/consumer.py:81, D2)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "user_funnel_set_ops",
    oracle="""
        SELECT user_id, 'both' AS cohort FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT user_id, 'click_only' AS cohort FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    """,
    tags=("setops",),
)
def user_funnel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clickers.intersect(buyers).withColumn("cohort", F.lit("both"))
    only = clickers.exceptAll(buyers).withColumn("cohort", F.lit("click_only"))
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Grouping sets / distinct aggs / pivot (§2.4 engine extensions).
# ---------------------------------------------------------------------------


@register(
    "rollup_order_stats",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("rollup",),
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "cube_order_stats",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("cube",),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


@register(
    "segment_distinct_aggs",
    oracle="""
        SELECT c_mktsegment,
               count(*) AS n_customers,
               count(DISTINCT c_nationkey) AS n_nations,
               floor(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                          AS DOUBLE) / count(*) + 0.5) / 100 AS avg_bal
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("A4", "distinct"),
)
def segment_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-agg (expand + two-phase in Spark). At 100 TB prefer
    approx_count_distinct (HLL, single pass) — exposed separately.

    avg_bal is the avg_half_up construction over exact integer cents:
    round(avg(money), 2) is a cents/count integer quotient that lands
    on the half-cent lattice with real probability and round()
    tie-breaks per engine (the fertility-stats class, caught by virgin
    seed 577215 this round)."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        (
            F.floor(F.sum(cents).cast("double") / F.count("*") + F.lit(0.5))
            .cast("long")
            / F.lit(100.0)
        ).alias("avg_bal"),
    )


@register(
    "events_pivot_daily",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS d,
               coalesce(round(sum(CASE WHEN event_type = 'click'    THEN value END), 2), 0.0) AS click,
               coalesce(round(sum(CASE WHEN event_type = 'view'     THEN value END), 2), 0.0) AS view,
               coalesce(round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2), 0.0) AS purchase,
               coalesce(round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2), 0.0) AS signup,
               coalesce(round(sum(CASE WHEN event_type = 'error'    THEN value END), 2), 0.0) AS error
        FROM events
        GROUP BY 1
    """,
    tags=("pivot",),
)
def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for
    distinct pivot values at scale)."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    piv = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .pivot("event_type", kinds)
        .sum("value")
    )
    return piv.select(
        "d", *[F.coalesce(F.round(F.col(k), 2), F.lit(0.0)).alias(k) for k in kinds]
    )


# ---------------------------------------------------------------------------
# Profiling / stats probes (§2.4 A4-A6, notebook cells 16-17, 39-40, 54-55).
# ---------------------------------------------------------------------------


@register(
    "null_profile_documents",
    oracle="""
        SELECT count(*) AS n_rows,
               count(*) - count(text)   AS null_text,
               count(*) - count(lang)   AS null_lang,
               count(*) - count(source) AS null_source
        FROM documents
    """,
    tags=("A4",),
)
def null_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 null-count profile (datashow.ipynb cells 16-17) — one pass,
    one row out."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
        F.sum(F.col("source").isNull().cast("long")).alias("null_source"),
    )


@register(
    "doc_len_stats",
    oracle="""
        WITH s AS (
            SELECT lang, max(n_chars) AS max_len, min(n_chars) AS min_len
            FROM documents GROUP BY lang
        )
        SELECT s.lang, s.max_len, s.min_len, min(d.doc_id) AS longest_doc_id
        FROM s JOIN documents d ON d.lang = s.lang AND d.n_chars = s.max_len
        GROUP BY s.lang, s.max_len, s.min_len
    """,
    tags=("A5",),
)
def doc_len_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 min/max length + argmax doc (datashow.ipynb cells 39-40,50).
    Single pass: argmax-with-tiebreak as max(struct(len, -doc_id))."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.max("n_chars").alias("max_len"),
            F.min("n_chars").alias("min_len"),
            F.max(F.struct(F.col("n_chars").alias("l"), (-F.col("doc_id")).alias("nd"))).alias("s"),
        )
        .select("lang", "max_len", "min_len", (-F.col("s.nd")).alias("longest_doc_id"))
    )


@register(
    "doc_len_histogram",
    oracle="""
        SELECT n_chars - n_chars % 50 AS bucket, count(*) AS n
        FROM documents GROUP BY 1
    """,
    tags=("A6",),
)
def doc_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 value-counts histogram (datashow.ipynb cells 54-55), bucketed
    with pure integer arithmetic so both engines agree on types."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("n_chars") - F.col("n_chars") % 50).alias("bucket")
    return docs.groupBy(bucket).agg(F.count("*").alias("n"))


@register(
    "sequential_ids",
    oracle="""
        SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) AS INT) AS news_id
        FROM documents
    """,
    tags=("P14",),
)
def sequential_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 sequential id assignment (datashow.ipynb cell 30).

    A global row_number needs a single-partition sort — fine for id
    backfills that fit an executor, wrong at 100 TB.  The scale path is
    block arithmetic: per-partition counts → running offsets →
    offset + local index (zipWithIndex shape), which is what
    ``text.assign_block_ids`` implements.  This oracle-parity version
    keeps the window form.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = W.orderBy("doc_id")
    return docs.select("doc_id").withColumn("news_id", F.row_number().over(w))


@register(
    "q7_nation_volume_shipping",
    oracle="""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(floor((sum((CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)))) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
    """,
    tags=("joins", "tpch", "q7"),
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipped between a nation PAIR, by year —
    a 6-relation join with a disjunctive cross-nation predicate that
    Catalyst must keep above the nation joins.  Both nation legs are
    broadcast (25-row dimension at every scale) and the nation-name
    filters prune each leg BEFORE its broadcast, so the only shuffles
    are the fact-fact lineitem⋈orders and orders⋈customer legs; the
    shipdate range pushes to the parquet scan."""
    nation = load_table(spark, sf_dir, "nation")
    n_pair = ("NATION_1", "NATION_2")
    n1 = nation.filter(F.col("n_name").isin(*n_pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*n_pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    customer = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        money.half_up(money.sum_units(money.disc_price_e4()), 4).alias("revenue")
    )


@register(
    "q10_returned_items",
    oracle="""
        WITH agg AS (
            SELECT c_custkey, c_name, n_name,
                   round(c_acctbal, 2) AS c_acctbal,
                   CAST(floor((sum((CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)))) + 50) / 100.0) AS BIGINT) / 100.0 AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-10-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
              AND l_returnflag = 'R'
            GROUP BY 1, 2, 3, 4
        )
        SELECT c_custkey, c_name, n_name, c_acctbal, revenue
        FROM agg
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("joins", "tpch", "q10"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned
    items in a quarter.  The returnflag filter and the orderdate range
    both push to the parquet scans (each prunes its fact side before
    any join); nation broadcasts; the two fact-fact joins shuffle on
    orderkey/custkey; and the final top-20 is TakeOrderedAndProject
    (revenue DESC with a custkey tie-break so both engines select the
    identical rows), never a global sort."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy(
        "c_custkey",
        "c_name",
        "n_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    ).agg(
        money.half_up(money.sum_units(money.disc_price_e4()), 4).alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), "c_custkey").limit(20).select(
        "c_custkey", "c_name", "n_name", "c_acctbal", "revenue"
    )


@register(
    "q14_promo_revenue",
    oracle="""
        SELECT CAST(floor(10000.0
                     * sum(CASE WHEN p_type = 'PROMO'
                                THEN (CAST(round(l_extendedprice * 100) AS BIGINT)
                                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                                ELSE 0 END)
                     / sum((CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))))
                     + 0.5) AS BIGINT) / 100.0
                   AS promo_revenue_pct,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    tags=("joins", "tpch", "q14"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share for one month — the
    canonical conditional-aggregation-over-a-join query.  The shipdate
    range prunes lineitem at the scan; part is a broadcast dimension,
    so the single shuffle is the final 1-row aggregate (partial sums
    map-side).  No DISTINCT, no window — this is the cheapest possible
    plan for the question."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    rev_e4 = money.disc_price_e4()
    promo_e4 = F.when(F.col("p_type") == "PROMO", rev_e4).otherwise(F.lit(0))
    # ratio of two identical exact integers -> identical double ->
    # floor-quantized identically on both engines (money.py)
    pct = F.floor(
        F.lit(10000.0) * F.sum(promo_e4) / F.sum(rev_e4) + F.lit(0.5)
    ).cast("long") / F.lit(100.0)
    return j.agg(
        pct.alias("promo_revenue_pct"),
        F.count("*").alias("n_lineitems"),
    )
