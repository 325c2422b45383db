"""Set-similarity join via prefix filtering (AllPairs / PPJoin family).

MinHash banding (operators/dedup.py) finds near-dup pairs
probabilistically; prefix filtering finds them EXACTLY with the same
shuffle-linear shape — the other classic answer, standard in data
cleaning (Bayardo et al. 2007 "Scaling Up All Pairs", Xiao et al. 2008
PPJoin).  The lemma: order every shingle by one global total order;
if J(a, b) ≥ t, then a and b must share at least one shingle inside
each one's PREFIX of length |s| − ⌈t·|s|⌉ + 1.  So an equi-join on
prefix shingles yields a candidate set with zero false negatives, and
exact verification of candidates returns exactly the ≥ t pairs — which
is why this query can share the quadratic exact-Jaccard oracle at any
fixture, with no recall caveat.

Frequency-ascending order (rarest shingles first) is used because it
minimizes candidates: common shingles land in suffixes where they can't
generate joins.  Any fixed order is CORRECT; this one is fast.

Scale notes (100 TB):

- The global shingle order is a rank over the vocab — computed here
  with a single window (vocab-sized input); at 100 TB assign ranks via
  the range-partition + per-partition-offset machinery
  (operators/text.py:assign_block_ids) instead of one sorted partition.
- Candidate generation joins only prefix rows: sum of prefix lengths ≈
  (1 − t)·total shingles, so the join input is a (1−t) fraction of the
  corpus — and the verify step touches candidates only, exactly like
  the MinHash chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.operators.dedup import (
    _DUCK_SHINGLES,
    JACCARD_THRESHOLD,
    _doc_shingles,
)
from ssafynews_data_spark.registry import register


def prefix_rows(sh: DataFrame, threshold: float) -> DataFrame:
    """The prefix of each doc's shingle set under the global
    rare-first order: rows a doc must expose to the candidate join."""
    freq = sh.groupBy("sh").agg(F.count("*").alias("f"))
    order = freq.withColumn(
        "r", F.row_number().over(W.orderBy("f", "sh"))  # vocab-sized sort
    ).select("sh", "r")
    ranked = sh.join(order, "sh")
    n = F.count("*").over(W.partitionBy("doc_id"))
    pos = F.row_number().over(W.partitionBy("doc_id").orderBy("r"))
    return (
        ranked.withColumn("n", n)
        .withColumn("pos", pos)
        .filter(F.col("pos") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select("doc_id", "sh")
    )


@register(
    "prefix_filter_jaccard_pairs",
    # SAME oracle family as ngram_jaccard_pairs / minhash_verified_pairs:
    # prefix filtering is exact-complete, so verified candidates EQUAL
    # the exact pair set by construction (not by fixture luck).
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh
            FROM documents
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(floor(common / (sa.n + sb.n - common) * 10000) AS BIGINT)
                   AS jaccard_q4
        FROM pairs
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE common / (sa.n + sb.n - common) >= {JACCARD_THRESHOLD}
    """,
    tags=("dedup", "set-join", "prefix-filter"),
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs-style exact set-similarity join: prefix-token equi-join
    for candidates (zero false negatives by the prefix lemma), exact
    Jaccard verify on candidates only.  Deterministic and complete —
    the third member of the near-dup ladder (exact quadratic ↔ this ↔
    probabilistic MinHash), sharing the exact twin's oracle."""
    sh = pin(_doc_shingles(spark, sf_dir))
    pref = prefix_rows(sh, JACCARD_THRESHOLD)
    a = pref.select(F.col("doc_id").alias("doc_a"), "sh")
    b = pref.select(F.col("doc_id").alias("doc_b"), "sh")
    cands = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    fa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    fb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        cands.join(fa, "doc_a")
        .join(fb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.floor(jac * 10000).alias("jaccard_q4"))
    )
