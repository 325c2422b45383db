"""Time-series completion: date spines, gap-filling, LOCF.

The reference's daily report (``dags/scripts/spark_daily_report.py:62-70``)
simply groups by the days that HAVE data — a day with no articles
silently vanishes from the report, and a downstream consumer can't
tell "no news" from "pipeline down".  Gap-filling against a date spine
is the standard fix, and it exercises surfaces the rest of the registry
doesn't: generator expressions (``sequence``/``explode``), Spark 4's
recursive CTEs, and IGNORE NULLS window frames.

Scale notes (100 TB):

- The spine is |days| × |keys| rows — thousands, not billions; it's
  built from a 1-row min/max aggregate (broadcast), exploded, and
  broadcast to the left join against the daily aggregate (which is
  itself already tiny).  The raw fact table is touched exactly once.
- The recursive-CTE variant exists for SQL-surface parity (Spark 4.x
  ``WITH RECURSIVE``, UNION ALL form); ``sequence()`` is the scale
  path — recursion depth equals the day count, and each step is a
  driver-coordinated iteration, so prefer the generator on long spans.
- LOCF is one IGNORE NULLS window over the spine-joined frame —
  partition-local after the join's shuffle on the series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

N_USERS = 20  # gap-fill the first N user ids (sparse purchase series)


def _daily_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < N_USERS))
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("day_value"))
    )


def _bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.to_date(F.min("ts")).alias("d_lo"), F.to_date(F.max("ts")).alias("d_hi")
    )


_GAPFILL_ORACLE = f"""
    WITH bounds AS (
        SELECT CAST(min(ts) AS DATE) AS d_lo, CAST(max(ts) AS DATE) AS d_hi
        FROM events
    ), spine AS (
        SELECT CAST(unnest(generate_series(d_lo, d_hi, INTERVAL 1 DAY)) AS DATE)
                   AS d
        FROM bounds
    ), users AS (
        SELECT DISTINCT user_id FROM events WHERE user_id < {N_USERS}
    ), daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               count(*) AS n, round(sum(value), 2) AS day_value
        FROM events
        WHERE event_type = 'purchase' AND user_id < {N_USERS}
        GROUP BY 1, 2
    )
    SELECT u.user_id,
           strftime(s.d, '%Y-%m-%d') AS day,
           coalesce(n, 0) AS n,
           coalesce(day_value, 0.0) AS day_value
    FROM users u CROSS JOIN spine s
    LEFT JOIN daily ON daily.user_id = u.user_id AND daily.d = s.d
"""


@register(
    "timeseries_gapfill",
    oracle=_GAPFILL_ORACLE,
    tags=("timeseries", "gapfill"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (user × day) purchase grid with explicit zeros for silent
    days.  The spine comes from ``sequence(d_lo, d_hi)`` over the
    broadcast 1-row bounds — a generator, not a recursion and not a
    driver loop; the left join keys on (user_id, d) against the
    already-aggregated daily frame, so nothing here scales with the
    raw event count except the one groupBy."""
    daily = _daily_purchases(spark, sf_dir)
    spine = (
        _bounds(spark, sf_dir)
        .select(F.explode(F.expr("sequence(d_lo, d_hi, interval 1 day)")).alias("d"))
    )
    users = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < N_USERS)
        .select("user_id")
        .distinct()
    )
    grid = users.crossJoin(F.broadcast(spine))
    return grid.join(daily, ["user_id", "d"], "left").select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
    )


@register(
    "timeseries_gapfill_recursive",
    oracle=_GAPFILL_ORACLE,
    tags=("timeseries", "gapfill", "recursive-cte"),
)
def timeseries_gapfill_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same gap-fill with the date spine built by a Spark 4
    ``WITH RECURSIVE`` CTE (UNION ALL + strictly-advancing bound, so it
    terminates; Spark does not yet allow UNION-distinct recursion).
    Same oracle as ``timeseries_gapfill`` — the two spine constructions
    must be indistinguishable.  Kept as SQL-surface parity; recursion
    depth = day count makes ``sequence()`` the scale path."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_ts_gapfill")
    return spark.sql(
        f"""
        WITH RECURSIVE bounds AS (
            SELECT CAST(min(ts) AS DATE) AS d_lo, CAST(max(ts) AS DATE) AS d_hi
            FROM events_ts_gapfill
        ), spine(d, d_hi) AS (
            SELECT d_lo, d_hi FROM bounds
            UNION ALL
            SELECT date_add(d, 1), d_hi FROM spine WHERE d < d_hi
        ), users AS (
            SELECT DISTINCT user_id FROM events_ts_gapfill
            WHERE user_id < {N_USERS}
        ), daily AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   count(*) AS n, round(sum(value), 2) AS day_value
            FROM events_ts_gapfill
            WHERE event_type = 'purchase' AND user_id < {N_USERS}
            GROUP BY 1, 2
        )
        SELECT u.user_id,
               date_format(s.d, 'yyyy-MM-dd') AS day,
               coalesce(n, 0) AS n,
               coalesce(day_value, CAST(0.0 AS DOUBLE)) AS day_value
        FROM users u CROSS JOIN (SELECT d FROM spine) s
        LEFT JOIN daily ON daily.user_id = u.user_id AND daily.d = s.d
        """
    )


@register(
    "timeseries_locf",
    oracle=f"""
        WITH bounds AS (
            SELECT CAST(min(ts) AS DATE) AS d_lo, CAST(max(ts) AS DATE) AS d_hi
            FROM events
        ), spine AS (
            SELECT CAST(unnest(generate_series(d_lo, d_hi, INTERVAL 1 DAY)) AS DATE)
                       AS d
            FROM bounds
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   round(avg(value), 2) AS avg_value
            FROM events
            WHERE value > 300
            GROUP BY 1, 2
        ), grid AS (
            SELECT t.event_type, s.d, avg_value
            FROM types t CROSS JOIN spine s
            LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = s.d
        )
        SELECT event_type,
               strftime(d, '%Y-%m-%d') AS day,
               last_value(avg_value IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_value
        FROM grid
    """,
    tags=("timeseries", "locf", "window"),
)
def timeseries_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over a sparse daily series
    (avg value of high-value events per type; the >300 filter makes
    most days empty).  One IGNORE NULLS last_value window per series —
    leading days before the first observation stay NULL on both
    engines.  This is the reference report's missing-day story done
    right: silent days become explicit carried-forward rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value") > 300)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.round(F.avg("value"), 2).alias("avg_value"))
    )
    spine = (
        _bounds(spark, sf_dir)
        .select(F.explode(F.expr("sequence(d_lo, d_hi, interval 1 day)")).alias("d"))
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine)).join(
        daily, ["event_type", "d"], "left"
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
    )
