"""Skew-mitigation helpers (SURVEY.md §7 stage 6 — 100 TB hardening).

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in the session factory);
these helpers are the explicit form for when AQE can't help — e.g. a
hot-key aggregate whose single reducer OOMs, or a broadcast-ineligible
join with one pathological key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

SALT_BUCKETS = 8


def salted_group_agg(
    df: DataFrame, key: str, value: str, buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Two-phase salted aggregate: (key, salt) partial → key final.

    The first shuffle spreads each hot key over ``buckets`` reducers;
    the second shuffle carries only ``buckets`` rows per key.  Output ==
    plain ``groupBy(key).agg(count, sum)`` exactly (counts and sums are
    algebraic — they re-merge losslessly).
    """
    salt = (F.rand(seed=42) * buckets).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_n"), F.sum(value).alias("_s"))
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("total")
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Salted equi-join for a skewed big side: big rows get a random
    salt in [0, buckets); the small side is exploded ``buckets``× so
    every (key, salt) bucket finds its match.  Correct for any join
    where ``small`` has unique keys; costs ``buckets``× the small side
    (still tiny when small is dimension-shaped)."""
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * buckets).cast("int"))
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_big.join(exploded_small, [key, "_salt"]).drop("_salt")


@register(
    "salted_event_counts",
    oracle="""
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        FROM events
        GROUP BY event_type
    """,
    tags=("skew", "salting"),
)
def salted_event_counts(spark, sf_dir: str) -> DataFrame:
    """Hot-key aggregate through the salted two-phase path — the oracle
    proves salting is semantically invisible (== plain GROUP BY)."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_group_agg(ev, "event_type", "value")
    return out.select("event_type", "n", F.round("total", 2).alias("total"))


@register(
    "bucket_skew_audit",
    oracle="""
        WITH b AS (
            SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                        AS BIGINT) % 32 AS bucket
            FROM events
        ),
        counts AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(min(n) AS BIGINT) AS min_rows,
               CAST(max(n) AS BIGINT) AS max_rows,
               round(max(n) * 1.0 * count(*) / sum(n), 3) AS skew_factor
        FROM counts
    """,
    tags=("skew", "audit", "partitioning"),
)
def bucket_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution audit BEFORE committing to a partitioning: how
    evenly would 32 hash buckets of user_id fill?  ``skew_factor`` =
    max bucket / average bucket — 1.0 is perfect, and anything over
    ~2 means the planned shuffle will straggle on its hottest task
    (→ salt it, see ``salted_event_counts``).  Uses the
    engine-independent md5 bucket (sampling.hash_bucket) so DuckDB
    computes the identical assignment; at 100 TB this audit is one
    cheap aggregate that saves re-running a skewed job."""
    from ssafynews_data_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        hash_bucket(F.col("user_id"), 32).alias("bucket")
    ).agg(F.count("*").alias("n"))
    return counts.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.min("n").cast("long").alias("min_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.round(F.max("n") * 1.0 * F.count("*") / F.sum("n"), 3).alias(
            "skew_factor"
        ),
    )
