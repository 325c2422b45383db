"""Second relational batch: JSON columns, flatten-concat aggs, lag/lead,
percentiles, range/band joins (completing SURVEY.md §2 coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssafynews_data_spark.localframe import local_df
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


@register(
    "parse_event_props",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
               floor(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) * 100
                          AS DOUBLE) / count(*) + 0.5) / 100 AS avg_k
        FROM events
        GROUP BY event_type
    """,
    tags=("F8", "json"),
)
def parse_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 JSON decode (collect/consumer.py:158's json.loads as a column
    op): parse the ``props`` JSON string with an explicit schema —
    ``from_json`` is codegen'd; no Python, no inference pass."""
    ev = load_table(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.LongType())])
    k = F.from_json(F.col("props"), props_schema)["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("total_k"),
            # avg_half_up over exact integers, not round(avg): the
            # integer-quotient tie class (virgin seed 577215, r10)
            (
                F.floor(
                    (F.sum("k") * 100).cast("double") / F.count("*") + F.lit(0.5)
                ).cast("long")
                / F.lit(100.0)
            ).alias("avg_k"),
        )
    )


@register(
    "keyword_flatten_per_source",
    oracle="""
        WITH t AS (
            SELECT source,
                   unnest(list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
                                      x -> x <> '')) AS token
            FROM documents
        )
        SELECT source, string_agg(DISTINCT token, ' ' ORDER BY token) AS all_tokens
        FROM t GROUP BY source
    """,
    tags=("A7", "F11"),
)
def keyword_flatten_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/F11 — the reference's driver-side ``sum(keywords.tolist(), [])``
    flatten + join (spark_daily_report.py:117-118,233) as a distributed
    collect_set→sort→join.  NOTE: collect_set per group is bounded by
    vocabulary size, not row count — fine for token vocabularies, wrong
    for unbounded payloads."""
    docs = load_table(spark, sf_dir, "documents")
    from ssafynews_data_spark.operators.text import tokens_col

    return (
        docs.select("source", F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("source")
        .agg(
            F.array_join(F.array_sort(F.collect_set("token")), " ").alias("all_tokens")
        )
    )


@register(
    "event_value_deltas",
    oracle="""
        SELECT event_id, user_id,
               round(value - lag(value) OVER w, 2)  AS delta_prev,
               round(lead(value) OVER w - value, 2) AS delta_next
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("windows", "lag", "lead"),
)
def event_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead frame ops (SURVEY.md §2.5 engine surface) — one shuffle
    on user_id serves both directions."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
    )


@register(
    "order_price_percentiles",
    oracle="""
        SELECT o_orderpriority,
               quantile_disc(o_totalprice, 0.5) AS p50,
               quantile_disc(o_totalprice, 0.9) AS p90,
               count(*) AS n
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("percentile",),
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles (SQL-standard ``percentile_disc`` ==
    DuckDB ``quantile_disc``): the result is an actual stored value, so
    it is bit-identical across engines by construction.  The earlier
    continuous form interpolated between two values and each engine's
    FMA/rounding order could land the midpoint on a different side of a
    .xx5 cent tie — the round-8 second-seed reseed caught exactly that
    (256879.795 rounding to .79 vs .80).  Exact percentile holds all
    group values — at 100 TB switch to ``percentile_approx``
    (t-digest-style sketch, bounded memory, mergeable map-side)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p50"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p90"),
            F.count("*").alias("n"),
        )
    )


@register(
    "value_band_join",
    oracle="""
        SELECT b.band, count(*) AS n, round(sum(e.value), 2) AS total
        FROM events e
        JOIN (VALUES ('low', 0.0, 100.0),
                     ('mid', 100.0, 500.0),
                     ('high', 500.0, 1e308)) AS b(band, lo, hi)
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band
    """,
    tags=("joins", "range"),
)
def value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/band join: theta-join against a broadcast band table —
    Spark plans BroadcastNestedLoopJoin, which is the right physical
    shape when one side is a handful of rows (the alternative, a CASE
    expression, doesn't generalize to bands loaded from data)."""
    ev = load_table(spark, sf_dir, "events")
    bands = local_df(spark, 
        [("low", 0.0, 100.0), ("mid", 100.0, 500.0), ("high", 500.0, 1e308)],
        "band string, lo double, hi double",
    )
    joined = ev.join(
        F.broadcast(bands), (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@register("approx_distinct_profile", tags=("A4", "sketch"))
def approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch profile — the 100 TB form of the notebook's distinct
    probes (single pass, mergeable, bounded memory).  Rows-only check
    (sketch estimates are engine-specific); tests bound the relative
    error against exact counts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        F.count("*").alias("n_rows"),
    )


@register(
    "event_value_quartiles",
    oracle="""
        WITH r AS (
            SELECT event_type, value,
                   ntile(4)       OVER w AS quartile,
                   percent_rank() OVER w AS pr,
                   cume_dist()    OVER w AS cd
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        )
        SELECT event_type, CAST(quartile AS INT) AS quartile,
               count(*) AS n,
               round(min(value), 2) AS lo,
               round(max(value), 2) AS hi,
               round(max(pr), 6) AS max_percent_rank,
               round(max(cd), 6) AS max_cume_dist
        FROM r
        GROUP BY event_type, quartile
    """,
    tags=("window", "ntile", "percent_rank", "cume_dist"),
)
def event_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window trio the engine had not yet exercised —
    ntile/percent_rank/cume_dist — as per-type value quartile bands.
    Total ordering includes event_id so tie placement is deterministic
    cross-engine.  One window shuffle on event_type, then the quartile
    rollup reuses the same partitioning (no second exchange)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select(
        "event_type",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return r.groupBy("event_type", "quartile").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
        F.round(F.max("pr"), 6).alias("max_percent_rank"),
        F.round(F.max("cd"), 6).alias("max_cume_dist"),
    )


@register(
    "ansi_safe_math",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(count(CASE WHEN value <> 0 THEN 1 END) AS BIGINT)
                   AS n_nonzero,
               round(sum(CASE WHEN value <> 0
                              THEN CAST(1.0 AS DOUBLE) / value END), 4)
                   AS sum_inverse,
               CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                                           AS BIGINT) IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_k_parsed
        FROM events
        GROUP BY 1
    """,
    tags=("ansi", "error-handling", "try"),
)
def ansi_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-handling surface: ``try_divide`` (NULL instead of a
    divide-by-zero error under ANSI mode) and ``try_cast`` over a JSON
    extraction — the production pattern for untrusted numeric fields: a
    malformed row yields NULL and the aggregate continues, instead of a
    task failure killing the stage.  Everything codegen'd; the oracle
    mirrors try-semantics with guarded CASE / TRY_CAST in DuckDB."""
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object(F.col("props"), "$.k")
    t = ev.select(
        "event_type",
        F.try_divide(F.lit(1.0), F.col("value")).alias("inv"),
        F.col("value"),
        k_str.try_cast("bigint").alias("k"),
    )
    return t.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("value") != 0, 1)).alias("n_nonzero"),
        F.round(F.sum(F.when(F.col("value") != 0, F.col("inv"))), 4).alias(
            "sum_inverse"
        ),
        F.sum(F.col("k").isNotNull().cast("long")).alias("n_k_parsed"),
    )


@register(
    "approx_quantile_contract",
    oracle="""
        WITH ranks AS (
            SELECT o_orderpriority,
                   o_totalprice,
                   percent_rank() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice) AS pr
            FROM orders
        )
        SELECT o_orderpriority,
               count(*) AS n,
               true AS p50_ok,
               true AS p90_ok
        FROM ranks
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("percentile", "approx", "contract"),
)
def approx_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch form of percentiles, driver-checked via a
    rank-error CONTRACT: ``percentile_approx(x, p, accuracy)`` promises
    the returned value's true rank is near p with error ~1/accuracy.
    Spark computes approx AND exact percent_rank of the approx answers
    in one pass and emits per-group booleans; the oracle (which cannot
    run Spark's sketch) asserts the same booleans as literal true over
    the same groups — so a sketch regression flips driver-visible
    values, while the group/count columns pin the frame.

    The tolerance is 2/accuracy, not 1/accuracy: the single-summary
    Greenwald-Khanna bound is eps = 1/accuracy, but Spark's partial
    aggregation MERGES per-partition summaries and merged GK summaries
    degrade beyond single-summary eps (observed: rank error
    1.03/accuracy on a reseeded fixture, seed 31337, 32 partitions —
    within 2/accuracy, beyond 1/accuracy).  2/accuracy still flips on
    any real regression (e.g. a mis-set accuracy reads ~10x out).
    At 100 TB the exact form (order_price_percentiles) needs all group
    values in memory; this is the form that ships."""
    accuracy = 1000  # single-summary rank error <= 0.1%-ile per group
    orders = load_table(spark, sf_dir, "orders")
    approx = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(accuracy)).alias("a50"),
        F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(accuracy)).alias("a90"),
        F.count("*").alias("n"),
    )
    ranked = orders.join(F.broadcast(approx), "o_orderpriority").groupBy(
        "o_orderpriority", "a50", "a90", "n"
    ).agg(
        # exact rank of each approx answer, computed from first principles:
        # fraction of group values <= the returned quantile
        (F.sum((F.col("o_totalprice") <= F.col("a50")).cast("long")) / F.col("n"))
        .alias("r50"),
        (F.sum((F.col("o_totalprice") <= F.col("a90")).cast("long")) / F.col("n"))
        .alias("r90"),
    )
    tol = 2.0 / accuracy + 1e-9  # merge-degraded bound; see docstring
    return ranked.select(
        "o_orderpriority",
        "n",
        ((F.col("r50") >= 0.5 - tol) & (F.col("r50") <= 0.5 + tol + 1.0 / F.col("n")))
        .alias("p50_ok"),
        ((F.col("r90") >= 0.9 - tol) & (F.col("r90") <= 0.9 + tol + 1.0 / F.col("n")))
        .alias("p90_ok"),
    ).orderBy("o_orderpriority")


@register(
    "value_correlations",
    oracle="""
        SELECT event_type,
               round(corr(value, CAST(hour(ts) AS DOUBLE)), 4) + 0.0
                   AS corr_value_hour,
               round(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 2) + 0.0
                   AS covar_value_hour,
               round(stddev_samp(value), 2) AS sd_value,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("A-family", "statistics"),
)
def value_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates (Pearson corr, sample
    covariance, stddev) per event type — the statistics family the
    other aggregate queries don't touch.  All are single-pass mergeable
    moments (sum, sum², sum xy), so map-side partials apply exactly as
    for sum/count; no second scan, no window."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.hour("ts").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            # + 0.0 normalizes IEEE -0.0: a near-zero corr/covar rounds
            # to zero with an engine-dependent SIGN bit (virgin seed
            # 524287's 'error' group: -0.0 vs 0.0, hash mismatch)
            (F.round(F.corr("value", hour), 4) + 0.0).alias("corr_value_hour"),
            (F.round(F.covar_samp("value", hour), 2) + 0.0).alias(
                "covar_value_hour"
            ),
            F.round(F.stddev_samp("value"), 2).alias("sd_value"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "central_tendency_stats",
    oracle="""
        SELECT event_type,
               CAST(round(median(value) * 200) AS BIGINT) / 200.0 AS med_value,
               CAST(mode(CAST(floor(value / 50) AS BIGINT)) AS BIGINT)
                   AS mode_band,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("A-family", "statistics", "median-mode"),
)
def central_tendency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2023 central-tendency aggregates: exact interpolated
    MEDIAN (both engines interpolate at even counts) and MODE over a
    coarse value band (banding makes the mode unique on the fixture —
    raw doubles are all distinct, where mode would be an arbitrary
    tie).  The median is emitted on the half-cent lattice (x*200
    rounded to the exact integer both engines share) instead of
    round(x, 2): an even-count midpoint of 2-decimal values IS a
    half-cent ~50% of the time, and round's tie-break there differs
    per engine (caught by reseed 2468).  Median holds each group's values for the exact answer; the
    100 TB form is percentile_approx (see approx_quantile_contract)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            (F.round(F.median("value") * 200).cast("long") / 200.0).alias(
                "med_value"
            ),
            F.mode(F.floor(F.col("value") / 50).cast("long")).alias("mode_band"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "boolean_aggregates_profile",
    oracle="""
        SELECT user_id,
               bool_or(event_type = 'purchase') AS ever_purchased,
               bool_and(value < 500) AS always_under_500,
               CAST(count(*) FILTER (WHERE value > 100) AS BIGINT)
                   AS n_over_100
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("A-family", "boolean-agg"),
)
def boolean_aggregates_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family per user: ``bool_or`` /
    ``bool_and`` / ``count_if`` — the predicate-profile shape behind
    audience segmentation ("ever purchased, never big-ticket").  All
    three are single-pass mergeable flags, so the map-side partials are
    one bit per group."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.bool_or(F.col("event_type") == "purchase").alias("ever_purchased"),
            F.bool_and(F.col("value") < 500).alias("always_under_500"),
            F.count_if(F.col("value") > 100).alias("n_over_100"),
        )
        .orderBy("user_id")
    )


@register(
    "keyword_string_agg",
    oracle="""
        WITH t AS (
            SELECT source,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
                       x -> x <> '')) AS w
            FROM documents
        ),
        topw AS (
            SELECT source, w,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY count(*) DESC, w) AS r
            FROM t GROUP BY source, w
        )
        SELECT source,
               string_agg(w, ',' ORDER BY r) AS top_words
        FROM topw WHERE r <= 5
        GROUP BY source
        ORDER BY source
    """,
    tags=("A-family", "string-agg"),
)
def keyword_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — the reference's comma-joined
    keywords column (ollama_consumer.py:253) done deterministically:
    ``collect_list`` alone has NO ordering guarantee across partitions,
    so the rank is materialized first and the collected (rank, word)
    structs are array_sort'ed before joining — same answer on every
    run, every parallelism, and hash-equal to DuckDB's
    ``string_agg(... ORDER BY)``."""
    docs = load_table(spark, sf_dir, "documents")
    from ssafynews_data_spark.operators.text import tokens_col

    freq = (
        docs.select("source", F.explode(tokens_col(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("n"))
    )
    ranked = freq.withColumn(
        "r", F.row_number().over(W.partitionBy("source").orderBy(F.desc("n"), "w"))
    ).filter(F.col("r") <= 5)
    return (
        ranked.groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("r", "w"))),
                    lambda s: s["w"],
                ),
                ",",
            ).alias("top_words")
        )
        .orderBy("source")
    )
