"""Product-analytics shapes: ordered funnels and retention cohorts.

The reference's events story stops at daily counts
(``spark_daily_report.py:62-70``); any real analytics deployment of the
same engine immediately asks the two questions these operators answer:
"how many users progress click → cart-ish → purchase IN ORDER?" and
"of the users first seen on day D, how many came back k days later?".
Both are pure aggregate/window shapes — no sessionization state, no
UDFs — and both are classic OLAP benchmark queries in their own right.

Scale notes (100 TB):

- The funnel is one groupBy(user) with conditional-min aggregates (the
  per-step first-occurrence timestamps), then one tiny rollup — order
  comparison happens on the aggregate row, NOT by joining the event
  stream to itself (the naive self-join is O(events²) per user).
- Cohorts are two hash aggregates: first-seen day per user (one
  shuffle), then (cohort, day-offset) counts of the user-day activity
  frame joined to it.  The cohort dimension is |users| rows — at
  100 TB the join broadcasts nothing and shuffles by user_id, which
  the first aggregate already clustered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


@register(
    "funnel_conversion_ordered",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
                   min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
                   min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS step_view,
               CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                             THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
               CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                              AND t_purchase > t_click
                             THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
        FROM per_user
    """,
    tags=("analytics", "funnel"),
)
def funnel_conversion_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user converts a step
    only if their FIRST occurrence of it comes strictly after their
    first occurrence of the previous step.  One conditional-min
    aggregate per user, then a single global rollup — the order logic
    runs on |users| rows, never via an event-to-event self-join.  NULL
    comparisons fall out of three-valued logic identically on both
    engines (a missing step yields NULL > NULL = NULL → not counted)."""
    ev = load_table(spark, sf_dir, "events")

    def first_of(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))

    def cnt(c):
        return F.sum(F.when(c, 1).otherwise(0)).cast("long")

    return per_user.agg(
        F.count("*").alias("n_users"),
        cnt(viewed).alias("step_view"),
        cnt(clicked).alias("step_click"),
        cnt(purchased).alias("step_purchase"),
    )


@register(
    "retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        )
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
               CAST(date_diff('day', cohort_day, d) AS INT) AS day_offset,
               count(*) AS active_users
        FROM activity JOIN firsts USING (user_id)
        WHERE date_diff('day', cohort_day, d) <= 7
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("analytics", "retention", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by first-seen day,
    counted on each subsequent active day (offset ≤ 7).  Two hash
    aggregates + one join keyed on user_id — the second aggregate's
    input is user-days, already orders of magnitude below raw events.
    day_offset = 0 is the cohort's own size; monotone decay is NOT
    enforced (re-activation is real data), only measured."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("cohort_day"))
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    offset = F.datediff(F.col("d"), F.col("cohort_day"))
    return (
        activity.join(firsts, "user_id")
        .filter(offset <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            offset.cast("int").alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort", "day_offset")
    )
