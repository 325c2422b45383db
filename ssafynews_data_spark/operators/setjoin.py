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
from ssafynews_data_spark.sources.readers import load_table


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


# ---------------------------------------------------------------------------
# Ed-Join: exact edit-distance similarity join via q-gram prefix filter.
# ---------------------------------------------------------------------------

#: Edit-distance threshold for `edit_distance_pairs` (reference parity:
#: the notebook dedups headlines by "almost identical title" — the
#: string-level complement of the token-level Jaccard family above).
EDIT_DISTANCE_MAX = 4
#: q-gram width.  One edit operation destroys at most EDJOIN_Q q-grams
#: (it touches q gram windows), which is the whole count/prefix lemma.
EDJOIN_Q = 3
#: Number of rarest-first distinct q-grams each string must expose to
#: the candidate join: q·k + 1 (Xiao et al. 2008 "Ed-Join", lemma 1 —
#: derivation restated in edit_distance_pairs' docstring).
EDJOIN_PREFIX = EDJOIN_Q * EDIT_DISTANCE_MAX + 1
#: Comparison-key width: the first N chars of the document.  A fixed
#: window bounds the per-row gram fan-out (≤ N − q + 1 grams) no matter
#: how long the document is — the scan stays O(rows · N), not O(bytes).
EDJOIN_KEY_CHARS = 64
#: Guard for the degenerate small-gram-set block (see docstring): if
#: more than this many documents have < EDJOIN_PREFIX distinct grams,
#: the all-pairs fallback block is no longer "a handful of degenerate
#: rows" and the job raises instead of silently going quadratic.
EDJOIN_SMALL_MAX_DOCS = 1_000


def _edjoin_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, EDJOIN_KEY_CHARS).alias("key")
    )


@register(
    "edit_distance_pairs",
    # Exact-complete (prefix lemma, degenerate block included), so the
    # oracle is the brute-force quadratic answer — equality holds by
    # construction, not by fixture margin.
    oracle=f"""
        WITH k AS (
            SELECT doc_id, substr(text, 1, {EDJOIN_KEY_CHARS}) AS key
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.key, b.key) AS BIGINT) AS edit_dist
        FROM k a JOIN k b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.key, b.key) <= {EDIT_DISTANCE_MAX}
    """,
    tags=("dedup", "set-join", "edit-distance", "edjoin"),
)
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance similarity join (Ed-Join, Xiao et al. 2008):
    all document pairs whose first-{EDJOIN_KEY_CHARS}-chars keys are
    within Levenshtein distance EDIT_DISTANCE_MAX, without an all-pairs
    product.  The string-level member of the near-dup ladder — catches
    single-character edits (typos, date stamps, mojibake repairs) that
    token-level Jaccard smears over a whole shingle.

    Losslessness, spelled out (this is what lets the quadratic oracle
    hash-match by construction):

    - one edit operation overlaps at most q gram windows, so it removes
      at most q values from a key's DISTINCT q-gram set; ed(a,b) <= k
      implies |G_a ∩ G_b| >= max(|G_a|,|G_b|) − k·q  (count lemma);
    - order all grams by one global total order (rarest document-
      frequency first — any fixed order is correct, this one minimizes
      candidates); if |G_a ∩ G_b| >= t >= 1 then the length-(|G|−t+1)
      prefixes share >= 1 gram (prefix lemma), and |G| − t + 1 <= k·q+1,
      so exposing min(|G|, k·q + 1) grams per key suffices WHENEVER
      max(|G_a|,|G_b|) >= k·q + 1;
    - the remaining pairs — BOTH keys with < k·q + 1 distinct grams
      (near-degenerate repetitive or tiny strings; zero rows on the
      fixtures, asserted in tests) — go through an explicit small×small
      block guarded by EDJOIN_SMALL_MAX_DOCS, so completeness never
      silently depends on the corpus being nice.

    Verification is row-local: ``levenshtein(a, b, k)`` (the
    threshold form — JVM-side banded DP that early-exits at k+1, so
    verify cost is O(k·|key|) per candidate, not O(|key|²)).

    At 100 TB: gram document frequencies are a vocab-sized aggregate;
    candidate generation joins only k·q+1 rows per document (constant!),
    so the shuffle is O(rows), and the verify touches candidates only —
    same shape as prefix_filter_jaccard_pairs / the MinHash chain.
    """
    return edjoin_pairs(pin(_edjoin_keys(spark, sf_dir)))


def edjoin_pairs(keys: DataFrame, k: int = EDIT_DISTANCE_MAX) -> DataFrame:
    """Core Ed-Join over a ``(doc_id, key)`` frame — see
    edit_distance_pairs for the lemma walkthrough.  Factored out so the
    completeness property (engine == brute-force DP) is testable on
    adversarial synthetic corpora, including the degenerate small-gram
    block the parquet fixtures never exercise."""
    prefix_len = EDJOIN_Q * k + 1
    pos = F.posexplode(
        F.expr(
            f"transform(sequence(1, greatest(length(key) - {EDJOIN_Q - 1}, 0)),"
            f" i -> substring(key, i, {EDJOIN_Q}))"
        )
    )
    grams = (
        keys.select("doc_id", pos.alias("p", "gr"))
        .select("doc_id", "gr")
        .distinct()
    )
    nd = grams.groupBy("doc_id").agg(F.count("*").alias("nd"))
    # rarest-first global order; rank() over the vocab-sized frequency
    # table (same shape as prefix_rows above)
    freq = grams.groupBy("gr").agg(F.count("*").alias("df"))
    order = freq.withColumn("r", F.row_number().over(W.orderBy("df", "gr"))).select(
        "gr", "r"
    )
    ranked = grams.join(order, "gr")
    rk = F.row_number().over(W.partitionBy("doc_id").orderBy("r"))
    pref = (
        ranked.withColumn("rk", rk)
        .filter(F.col("rk") <= prefix_len)
        .select("doc_id", "gr")
    )
    a = pref.select(F.col("doc_id").alias("doc_a"), "gr")
    b = pref.select(F.col("doc_id").alias("doc_b"), "gr")
    cands = (
        a.join(b, "gr")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # degenerate block: keys with < prefix-length distinct grams (incl.
    # gram-less keys shorter than q, which never reach `grams`).  Both
    # sides small → the lemma's overlap bound is vacuous → compare them
    # all, under a loud cap.
    small = (
        keys.join(nd, "doc_id", "left")
        .filter(F.coalesce("nd", F.lit(0)) < prefix_len)
        .select("doc_id")
    )
    n_small = small.count()
    if n_small > EDJOIN_SMALL_MAX_DOCS:
        raise ValueError(
            f"edit_distance_pairs: {n_small} documents have fewer than "
            f"{prefix_len} distinct {EDJOIN_Q}-grams in their first "
            f"{EDJOIN_KEY_CHARS} chars (cap {EDJOIN_SMALL_MAX_DOCS}); the "
            "degenerate all-pairs block would dominate — raise the cap "
            "deliberately or widen EDJOIN_KEY_CHARS."
        )
    if n_small:
        sa = small.select(F.col("doc_id").alias("doc_a"))
        sb = small.select(F.col("doc_id").alias("doc_b"))
        small_pairs = (
            F.broadcast(sa).crossJoin(sb).filter(F.col("doc_a") < F.col("doc_b"))
        )
        cands = cands.unionByName(small_pairs).distinct()
    ka = keys.select(F.col("doc_id").alias("doc_a"), F.col("key").alias("key_a"))
    kb = keys.select(F.col("doc_id").alias("doc_b"), F.col("key").alias("key_b"))
    ed = F.levenshtein("key_a", "key_b", k)
    return (
        cands.join(ka, "doc_a")
        .join(kb, "doc_b")
        .select("doc_a", "doc_b", ed.alias("edit_dist"))
        # threshold form returns -1 when distance exceeds the bound
        .filter(F.col("edit_dist") >= 0)
        .select("doc_a", "doc_b", F.col("edit_dist").cast("long").alias("edit_dist"))
    )
