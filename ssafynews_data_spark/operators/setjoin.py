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
# Pass-Join: exact edit-distance similarity join via chunk signatures.
# ---------------------------------------------------------------------------

#: Edit-distance threshold for `edit_distance_pairs` (reference parity:
#: the notebook dedups headlines by "almost identical title" — the
#: string-level complement of the token-level Jaccard family above).
EDIT_DISTANCE_MAX = 4
#: Comparison-key width: the first N chars of the document.  A fixed
#: window bounds the per-row signature fan-out no matter how long the
#: document is — the scan stays O(rows · k²), not O(bytes).
EDJOIN_KEY_CHARS = 64
#: Guard for the degenerate tiny-key block (see docstring): if more
#: than this many documents have keys of length <= k, the all-pairs
#: fallback block is no longer "a handful of degenerate rows" and the
#: job raises instead of silently going quadratic.
EDJOIN_SMALL_MAX_DOCS = 1_000


def _edjoin_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, EDJOIN_KEY_CHARS).alias("key")
    )


@register(
    "edit_distance_pairs",
    # Exact-complete (chunk pigeonhole, degenerate block included), so
    # the oracle is the brute-force quadratic answer — equality holds
    # by construction, not by fixture margin.
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
    tags=("dedup", "set-join", "edit-distance", "pass-join"),
)
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance similarity join: all document pairs whose
    first-{EDJOIN_KEY_CHARS}-chars keys are within Levenshtein distance
    EDIT_DISTANCE_MAX, without an all-pairs product — Pass-Join chunk
    signatures (Li, Deng, Feng, ICDE 2011).  The string-level member of
    the near-dup ladder: catches single-character edits (typos, date
    stamps, mojibake repairs) that token-level Jaccard smears over a
    whole shingle.  See edjoin_pairs for the algorithm and the
    losslessness argument.

    History note: the first cut used Ed-Join q-gram prefix filtering
    (Xiao et al. 2008) — lossless, but candidates join on 3-char gram
    VALUES, whose selectivity collapses on low-entropy text (the scale
    sweep read alpha 1.52 / 968 s at 50k replicated synthetic docs:
    even each doc's rarest trigrams had thousands-deep buckets).
    Chunk signatures join on ~{EDJOIN_KEY_CHARS // (EDIT_DISTANCE_MAX + 1)}-char
    substrings instead, so bucket depth tracks true near-duplicates
    rather than alphabet entropy.
    """
    # keys are substring(text, 1, EDJOIN_KEY_CHARS), so the probe-length
    # cap is known statically — pass it to skip the max() discovery job
    return edjoin_pairs(
        pin(_edjoin_keys(spark, sf_dir)), max_len=EDJOIN_KEY_CHARS
    )


def edjoin_pairs(
    keys: DataFrame, k: int = EDIT_DISTANCE_MAX, max_len: int | None = None
) -> DataFrame:
    """Core Pass-Join over a ``(doc_id, key)`` frame.

    Losslessness (this is what lets the quadratic oracle hash-match by
    construction): split each key into k+1 contiguous CHUNKS.  Along an
    optimal alignment, a substitution or deletion in `a` touches
    exactly one chunk of `a` and an insertion touches none, so <= k
    edits leave >= 1 chunk untouched (pigeonhole).  An untouched chunk
    appears VERBATIM in `b`, shifted by the net indel count before it —
    at most k positions.  Therefore every pair within distance k shares
    (chunk i of the chunked side) == (substring of the probed side at a
    position within ±k of chunk i's start), and an equi-join of chunk
    rows against enumerated probe substrings has zero false negatives.

    - Chunk side: every key with length >= k+1 emits its k+1 chunks
      (lengths L div (k+1) ± 1, deterministic split).
    - Probe side: every key emits, for each chunk index i and each
      possible chunked-side length La in [len−k, len+k] ∩ [k+1, cap],
      its substrings at positions start_i(La) ± k of length clen_i(La)
      — O(k²) rows per doc before dedup, CONSTANT per row.
    - Pairs where BOTH keys are shorter than k+1 (no chunking possible)
      go through an explicit small×small block guarded by
      EDJOIN_SMALL_MAX_DOCS — completeness never silently depends on
      the corpus being nice.  (A pair with one side >= k+1 is covered:
      that side chunks, the tiny side probes.)

    Verification is row-local: ``levenshtein(a, b, k)`` — the
    threshold form, a JVM-side banded DP that early-exits at k+1, so
    verify cost is O(k·|key|) per candidate, not O(|key|²).

    At 100 TB: both signature sides are a constant number of rows per
    document (k+1 chunks; <= (k+1)(2k+1)² probes), so the candidate
    equi-join shuffles O(rows) regardless of corpus size, and — unlike
    gram-value prefixes — the join key is a (length/(k+1))-char
    substring, selective even on low-alphabet text.  The verify
    touches candidates only, exactly like the MinHash chain.
    """
    n_chunks = k + 1
    lb = F.length("key")
    # Probe-side length enumeration must reach the LONGEST key actually
    # present, not the registered query's EDJOIN_KEY_CHARS constant —
    # a caller passing 70-char keys would otherwise silently lose pairs
    # whose chunked side is longer than the constant (two identical
    # 70-char keys share no probe row capped at 64).  Callers with a
    # KNOWN upper bound (e.g. keys built by substring(_, 1, cap)) pass
    # ``max_len`` and this builder stays lazy; an over-estimate is safe
    # (extra probe rows join to nothing).  Otherwise one eager max()
    # pass over the keys (map-side partial, 1-row result) discovers it
    # — callers should cache/pin the keys frame first so the pass does
    # not recompute the lineage (the registered query does, via pin()).
    if max_len is None:
        max_len = keys.agg(F.max(F.length("key")).alias("m")).collect()[0].m or 0
    chunk_side = _chunk_rows(keys, k)
    probe_side = _probe_rows(keys, k, max_len)

    cands = (
        chunk_side.join(probe_side, ["i", "sig"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )

    # degenerate block: keys too short to cut into k+1 chunks.  A pair
    # is missed above only when BOTH sides are tiny — compare those
    # all-pairs, under a loud cap.
    small = keys.filter(lb < n_chunks).select("doc_id")
    n_small = small.count()
    if n_small > EDJOIN_SMALL_MAX_DOCS:
        raise ValueError(
            f"edit_distance_pairs: {n_small} documents have keys shorter "
            f"than {n_chunks} chars (cap {EDJOIN_SMALL_MAX_DOCS}); the "
            "degenerate all-pairs block would dominate — raise the cap "
            "deliberately or reconsider the key definition."
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


def _chunk_rows(keys: DataFrame, k: int) -> DataFrame:
    """(doc_a, i, sig): the k+1 chunks of every chunkable key —
    exactly k+1 rows per document of length >= k+1."""
    n_chunks = k + 1
    lb = F.length("key")
    return (
        keys.filter(lb >= n_chunks)
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("key").alias("key_a"),
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"),
            (lb / n_chunks).cast("int").alias("base"),
            (lb % n_chunks).alias("rem"),
        )
        .select(
            "doc_a",
            "i",
            F.expr(
                "substring(key_a, i * base + least(i, rem) + 1,"
                " base + if(i < rem, 1, 0))"
            ).alias("sig"),
        )
    )


def _probe_rows(keys: DataFrame, k: int, max_len: int) -> DataFrame:
    """(doc_b, i, sig): for every key, the substrings any chunk of a
    within-distance-k partner could land on — (i, La, p) triple
    explode, all windows bounded by k (<= (k+1)(2k+1)² rows per doc
    before dedup).  ``max_len`` is the frame's true longest key: the
    La enumeration upper bound (completeness requires reaching every
    chunkable partner length that exists).  The CASE guards keep
    sequence() from running descending when a window is empty near the
    string edges."""
    n_chunks = k + 1
    return (
        keys.select(
            F.col("doc_id").alias("doc_b"),
            F.col("key").alias("key_b"),
            F.length("key").alias("lb"),
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"),
        )
        .select(
            "doc_b",
            "key_b",
            "lb",
            "i",
            F.explode(
                F.expr(
                    f"CASE WHEN greatest(lb - {k}, {n_chunks})"
                    f"       <= least(lb + {k}, {max_len})"
                    f" THEN sequence(greatest(lb - {k}, {n_chunks}),"
                    f"               least(lb + {k}, {max_len}))"
                    " ELSE array() END"
                )
            ).alias("la"),
        )
        .select(
            "doc_b",
            "key_b",
            "i",
            F.expr(f"la div {n_chunks} + if(i < la % {n_chunks}, 1, 0)").alias("clen"),
            F.expr(
                f"i * (la div {n_chunks}) + least(i, la % {n_chunks}) + 1"
            ).alias("cstart"),
            "lb",
        )
        .select(
            "doc_b",
            "key_b",
            "i",
            "clen",
            F.explode(
                F.expr(
                    f"CASE WHEN greatest(cstart - {k}, 1)"
                    f"       <= least(cstart + {k}, lb - clen + 1)"
                    f" THEN sequence(greatest(cstart - {k}, 1),"
                    f"               least(cstart + {k}, lb - clen + 1))"
                    " ELSE array() END"
                )
            ).alias("p"),
        )
        .select(
            "doc_b",
            "i",
            F.expr("substring(key_b, p, clen)").alias("sig"),
        )
        .distinct()
    )
