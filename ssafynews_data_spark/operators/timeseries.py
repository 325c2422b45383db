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
        ), spine(d, d_hi) MAX RECURSION LEVEL 4000 AS (
            -- depth = day span; the default 100 died on a reseeded
            -- fixture spanning 300 days.  4000 covers a decade of
            -- days; recursion depth = spine length is exactly why the
            -- docstring calls sequence() the scale path.
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
            -- exact-cents average, floor-quantized: per-row cents are
            -- deterministic, the integer sum is order-independent, and
            -- floor on the identical quotient double agrees bit-for-bit
            -- (round(.,2) differs per engine at .xx5 boundaries)
            SELECT event_type, CAST(ts AS DATE) AS d,
                   floor(sum(CAST(round(value * 100) AS BIGINT))
                         * 1.0 / count(*)) / 100.0 AS avg_value
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
        .agg(
            # exact-cents average, floor-quantized (see oracle comment)
            (
                F.floor(
                    F.sum(F.round(F.col("value") * 100).cast("long"))
                    * 1.0
                    / F.count("*")
                )
                / 100.0
            ).alias("avg_value")
        )
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


@register(
    "daily_count_anomalies",
    # The z-score is derived from EXACT INTEGER window moments (count
    # sums s1, square-sums s2, window width w): each engine's
    # stddev_samp uses a different accumulation algorithm (Welford vs
    # two-pass), and when the true z lands exactly on a .xx5 boundary
    # (it can: sd is rational whenever w*s2-s1^2 is a perfect-square
    # multiple — caught on a reseeded fixture at -0.375) the two
    # algorithms' last-ulp disagreement flips round().  Built from
    # identical integers, sqrt/div/floor are IEEE-identical per engine.
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        scored AS (
            SELECT event_type, d, n,
                   sum(n)     OVER w AS s1,
                   sum(n * n) OVER w AS s2,
                   count(*)   OVER w AS w_cnt
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        ),
        z AS (
            SELECT event_type, d, n,
                   (n * w_cnt - s1) * sqrt(w_cnt - 1)
                       / sqrt(CAST(w_cnt AS DOUBLE))
                       / sqrt(CAST(w_cnt * s2 - s1 * s1 AS DOUBLE)) AS zval
            FROM scored
            WHERE w_cnt >= 2 AND w_cnt * s2 - s1 * s1 > 0
        )
        SELECT event_type,
               strftime(d, '%Y-%m-%d') AS day,
               n,
               CAST(floor(zval * 100 + 0.5) AS BIGINT) / 100.0 AS zscore,
               (abs(zval) > 3.0) AS is_anomaly
        FROM z
        ORDER BY event_type, day
    """,
    tags=("timeseries", "monitoring", "anomaly"),
)
def daily_count_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-health monitoring: each day's event count scored
    against the TRAILING 7-day window (PRECEDING only — using the
    current row would let an anomaly mask itself), |z| > 3 flagged.
    This is the "did ingest break today?" check the reference has no
    answer for beyond eyeballing the report; one day-level aggregate +
    one window, both tiny."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("n"))
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-7, -1)
    )
    scored = (
        daily.withColumn("s1", F.sum("n").over(w))
        .withColumn("s2", F.sum(F.col("n") * F.col("n")).over(w))
        .withColumn("w_cnt", F.count("n").over(w))
    )
    # z from exact integer moments — see the oracle comment: both
    # engines derive the identical doubles, so the floor quantization
    # and the |z| > 3 flag cannot diverge
    z = (
        (F.col("n") * F.col("w_cnt") - F.col("s1"))
        * F.sqrt(F.col("w_cnt") - 1)
        / F.sqrt(F.col("w_cnt").cast("double"))
        / F.sqrt((F.col("w_cnt") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
    )
    return (
        scored.filter(
            (F.col("w_cnt") >= 2)
            & (F.col("w_cnt") * F.col("s2") - F.col("s1") * F.col("s1") > 0)
        )
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            (F.floor(z * 100 + F.lit(0.5)).cast("long") / F.lit(100.0)).alias(
                "zscore"
            ),
            (F.abs(z) > 3.0).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "cusum_drift_scores",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(floor(CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS DOUBLE) / count(*)) AS BIGINT) AS vi
            FROM events GROUP BY 1, 2
        ),
        base AS (
            SELECT event_type, sum(vi) AS tot, count(*) AS nd
            FROM daily GROUP BY event_type
        ),
        run AS (
            SELECT daily.event_type AS event_type, d, tot, nd,
                   sum(vi) OVER w AS s_k,
                   row_number() OVER w AS k
            FROM daily JOIN base ON daily.event_type = base.event_type
            WINDOW w AS (PARTITION BY daily.event_type ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_type,
               strftime(d, '%Y-%m-%d') AS day,
               CAST(s_k * nd - k * tot AS DOUBLE) / (100.0 * nd) + 0.0 AS cusum
        FROM run
        ORDER BY event_type, day
    """,
    tags=("timeseries", "monitoring", "cusum"),
)
def cusum_drift_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detector: the running sum of each day's deviation
    from the series mean — a sustained shift in daily average value
    shows as a monotone CUSUM ramp long before any single day trips a
    z-score.  Deviations are accumulated in SCALED INTEGERS
    (cusum_k = (S_k·n − k·T) / 100n with S_k, T exact cent sums):

    - per-row cents ``round(value*100)`` are exact (stored values are
      2dp, so value*100 sits within an ulp of an integer — never at a
      tie);
    - the daily value ``vi = floor(cent_sum / count)`` floors a
      bit-identical double (exact integer operands ≤ 2^53, one IEEE
      division) — ``floor`` agrees across engines on identical doubles,
      unlike ``round``, whose half-tie algorithm differs (a third-seed
      reseeded fixture landed a daily average on a .xx5 cent tie and
      flipped the old ``round(avg(value), 2)`` form by one cent);
    - the OUTPUT is the raw double quotient of identical integers — no
      final rounding to disagree over; the trailing + 0.0 collapses
      IEEE −0.0 when a series nets out to zero.

    One ordered window per type over day-level rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.floor(
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / F.count("*")
        )
        .cast("long")
        .alias("vi")
    )
    base = daily.groupBy("event_type").agg(
        F.sum("vi").alias("tot"), F.count("*").alias("nd")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = (
        daily.join(F.broadcast(base), "event_type")
        .withColumn("s_k", F.sum("vi").over(w))
        .withColumn("k", F.row_number().over(W.partitionBy("event_type").orderBy("d")))
    )
    cusum = (F.col("s_k") * F.col("nd") - F.col("k") * F.col("tot")).cast(
        "double"
    ) / (100.0 * F.col("nd"))
    return run.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        (cusum + 0.0).alias("cusum"),
    ).orderBy("event_type", "day")
