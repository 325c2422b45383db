"""Similarity search over the ``embeddings`` table (north-star M6).

The reference stores a pgvector ``Vector(768)`` column for ANN serving
(collect/ollama_consumer.py:234) but never implements search.  Engine
ladder:

1. brute-force cosine top-k — exact baseline, broadcast the query set so
   the corpus is scanned once with no shuffle (oracle-checked against
   DuckDB ``list_cosine_similarity``);
2. embedding near-dup pairs — cosine >= threshold self-join (exact,
   quadratic → correctness oracle);
3. SRP-banded LSH — sign-random-projection bit bands (Charikar '02);
   candidate pairs via equality join on (band, key), bits-per-band
   derived from corpus size so background candidates stay ~linear
   (scale path; both ``near_dup_auto`` and the query-side ANN
   ``ann_lsh_topk`` moved onto SRP banding in round 6, replacing
   MLlib's BucketedRandomProjectionLSH — BRP's scalar buckets
   degenerate on unit vectors, see ``near_dup_auto``);
3b. PQ-ANN (ladder item 5) keeps the O(q·n) scoring remark instead:
   ADC scores every (query, code) pair, so its cost is q·n map lookups
   regardless of codebook quality — linear in the corpus, pruned
   further only by pairing with the IVF layout;
4. IVF — KMeans(seed 42) coarse quantizer, probe the ``NPROBE`` nearest
   centroids only (classic IVF-Flat layout: at scale the corpus is
   partitioned by centroid id, so a query touches nprobe partitions);
5. PQ — product quantization (Jegou et al. 2011): per-subspace
   codebooks (seeded Lloyd's on a bounded md5-ordered sample, r7)
   compress each vector to PQ_M 4-bit codes, queries score by ADC
   (the lookup tables as ONE broadcast row — plan size independent of
   the batch; the literal-map form is kept as the parity-contract
   reference but routed off by default since r13: its plan compile
   cost exceeds the broadcast row's execution), deep candidate list
   exact-re-ranked;
6. IVF-PQ (``ivfpq_index_topk``) — the faiss-standard composite:
   RESIDUAL PQ codes (``by_residual=true``, r8 — codebooks quantize
   emb − center, recall at the nprobe coverage cap) written
   PARTITIONED BY coarse centroid, so a query reads nprobe/IVF_K of an
   M-bytes-per-vector index (PartitionFilters plan-asserted),
   residual-ADC-scores it (one extra (centroid, code) cross-dot lookup
   per subspace), and refines the deep candidate list against the flat
   store by id.  The 100 TB serving layout.

Exact math is built-in array expressions (``zip_with`` + ``aggregate``),
computed in double, JVM-side — except the all-pairs near-dup verify
form, where per-pair row machinery dominates and a blocked numpy matrix
product via ``mapInPandas`` is ~60x faster with bitwise-identical
results (order-preserving accumulation).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.localframe import local_df
from ssafynews_data_spark.parallel import run_parallel
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 form the query set
NEAR_DUP_COS = 0.35  # max pairwise cos in the fixture blobs is ~0.48
NPROBE = 2
IVF_K = 8
#: hard ceiling for the exact (driver-materialized) near-dup verify form —
#: above this the quadratic GEMM and the toPandas() both stop being "small
#: by contract"; callers must switch to ``near_dup_auto`` / LSH.  This is
#: the SINGLE cap for every exact-quadratic form (VERDICT r6 item 5):
#: ``near_dup_auto`` clamps any caller-passed ``exact_limit`` to it, so
#: no code path can take a quadratic plan past this row count.
EXACT_NEAR_DUP_MAX_ROWS = 50_000

#: default router crossover (perf, not safety): below this the exact
#: quadratic branch beats LSH band generation; far below the hard cap.
EXACT_NEAR_DUP_ROUTE_ROWS = 1_000
assert EXACT_NEAR_DUP_ROUTE_ROWS <= EXACT_NEAR_DUP_MAX_ROWS


def as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


# -- SQL-string twins of the array helpers above (guide §7.3) ----------------
# Building deep expression trees through the Column API pays py4j
# round-trips per operator (measured ~180 us each on this box, ~40
# round-trips per zip_with once PySpark's per-call debug capture is
# off); one residual-ADC serve construction spent ~1 s in pure driver
# socket chatter.  These emit the SAME operations in the SAME
# association order as their Column twins through ONE parser call
# (F.expr / selectExpr), so every computed double is bit-identical —
# asserted by the ADC literal-vs-batch parity tests and the oracle.


def _dot_sql(a: str, b: str) -> str:
    """SQL twin of :func:`dot` — identical fold, one parse."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        f" 0.0D, (acc, x) -> acc + x)"
    )


def _cosine_sql(a: str, b: str) -> str:
    """SQL twin of :func:`cosine` — dot/(sqrt·sqrt), same tree."""
    return f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", as_double(F.col("embedding")).alias("emb"))


# ---------------------------------------------------------------------------
# 1. Brute-force cosine top-k (exact baseline).
# ---------------------------------------------------------------------------


@register(
    "cosine_topk",
    oracle=f"""
        WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
             c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
             sims AS (
                 SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        list_cosine_similarity(q.emb, c.emb) AS sim
                 FROM q CROSS JOIN c
                 WHERE q.vec_id <> c.vec_id
             )
        SELECT query_id, neighbor_id, round(sim, 4) AS sim, CAST(rank AS INT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM sims)
        WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "knn"),
    bench=True,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus — the corpus streams through once, no shuffle until the final
    per-query top-k (which AQE keeps tiny).  This is the correct shape
    at 100 TB whenever |queries| ≪ |corpus|."""
    return _exact_topk_rounded(_corpus(spark, sf_dir))


def _exact_topk_rounded(corpus: DataFrame) -> DataFrame:
    """``cosine_topk``'s exact body over an arbitrary (vec_id, emb)
    frame — factored so the serving contracts that already hold the
    PINNED corpus reuse it for their exact-baseline leg instead of
    re-scanning parquet and re-running the cast lineage (guide §2.4;
    the ``_ivf_fresh_topk`` pattern).  Expressions are identical to the
    pre-factoring ``cosine_topk`` — same rounding, same tie-breaks."""
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    sims = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        # one parsed string instead of the Column-API cosine tree
        # (same expressions — see _cosine_sql)
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            f"{_cosine_sql('q_emb', 'emb')} AS sim",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


# ---------------------------------------------------------------------------
# 2. Embedding near-dup pairs (exact).
# ---------------------------------------------------------------------------


@register(
    "embedding_near_dup",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.emb, b.emb), 4) AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= {NEAR_DUP_COS}
    """,
    tags=("dedup", "similarity"),
    # NOT benched: this is the driver-materialized GEMM verify form; the
    # benched near-dup headline is near_dup_auto_pairs (the scale path).
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs (the embedding analog of
    ``ngram_jaccard_pairs``).  Quadratic — the oracle/verify form; the
    LSH variant below is the candidate generator at scale.

    Physical strategy: blocked matrix product via ``mapInPandas`` — each
    task multiplies its block of rows against the broadcast corpus
    matrix with numpy, emitting only surviving pairs through Arrow.
    Accumulation is dimension-by-dimension IN ORDER, so every double is
    bitwise identical to the JVM ``aggregate(zip_with(...))`` form (and
    to the DuckDB oracle at the rounded precision) — vectorization
    changes the speed, not the math.  Measured 64 s → ~1 s at sf0.1 vs
    the row-at-a-time nested-loop join.
    """
    import numpy as np
    import pandas as pd

    corpus = pin(_corpus(spark, sf_dir))
    n = corpus.count()
    if n > EXACT_NEAR_DUP_MAX_ROWS:
        # Fail loudly instead of OOMing the driver: the corpus matrix is
        # broadcast into every Python worker AND materialized here.
        raise ValueError(
            f"embedding_near_dup is the exact verify form (quadratic, "
            f"driver-materialized) and is capped at "
            f"{EXACT_NEAR_DUP_MAX_ROWS} rows; got {n}. Use near_dup_auto "
            f"(LSH candidates + exact verify) at scale."
        )
    pdf = corpus.toPandas()  # verify-form corpus is small by contract (guarded)
    if pdf.empty:
        return local_df(spark, [], "id_a LONG, id_b LONG, cos_sim DOUBLE")

    b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    B = np.array(pdf["emb"].tolist(), dtype=np.float64)
    d = B.shape[1]
    nb2 = np.zeros(len(B))
    for i in range(d):  # in-order sum of squares == dot(x, x)
        nb2 = nb2 + B[:, i] * B[:, i]
    nb = np.sqrt(nb2)

    def gemm_block(batches):
        for block in batches:
            if block.empty:
                continue
            a_ids = block["vec_id"].to_numpy(dtype=np.int64)
            A = np.array(block["emb"].tolist(), dtype=np.float64)
            na2 = np.zeros(len(A))
            acc = np.zeros((len(A), len(B)))
            for i in range(d):  # left-to-right accumulation per pair
                na2 = na2 + A[:, i] * A[:, i]
                acc = acc + A[:, i][:, None] * B[:, i][None, :]
            sim = acc / (np.sqrt(na2)[:, None] * nb[None, :])
            mask = (a_ids[:, None] < b_ids[None, :]) & (sim >= NEAR_DUP_COS)
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": a_ids[ii], "id_b": b_ids[jj], "cos_sim": sim[ii, jj]}
            )

    # Right-size the fan-out: ~2k-row GEMM blocks.  With a tiny corpus,
    # 32 Python workers would each pay interpreter+numpy startup for
    # microseconds of matmul; at scale the same formula spreads blocks
    # across the cluster (block × corpus fits executor memory by
    # construction: 2048 × |corpus| × 8 B).
    width = spark.sparkContext.defaultParallelism
    parts = max(1, min(width, len(pdf) // 2048 + 1))
    out = corpus.repartition(parts).mapInPandas(
        gemm_block, "id_a LONG, id_b LONG, cos_sim DOUBLE"
    )
    # round JVM-side so the rounding rule matches every other query
    return out.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))


# ---------------------------------------------------------------------------
# 3. LSH-bucketed ANN (MLlib random projection — scale path).
# ---------------------------------------------------------------------------


@register("ann_lsh_topk", tags=("similarity", "lsh"), bench=True)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via SRP band candidates (round 6: replaced
    MLlib's ``BucketedRandomProjectionLSH``, whose scalar buckets
    degenerate on unit vectors — every probe was silently brute-force;
    see ``near_dup_auto`` for the geometry).

    The corpus is banded once (seeded numpy GEMM per Arrow batch, no
    model fit); the ``N_QUERIES``-row probe side reuses the same banded
    frame and is BROADCAST into the (band, key) equi-join, so the
    corpus is never shuffled for the probe — candidates stream out of
    the scan, exact cosine ranks them, and the per-query top-k is a
    window group limit.  Pruning factor 2^rbits / bands grows with
    log n via ``srp_band_params``.  Rows-only driver check (band keys
    are hash-specific); the recall floor is driver-certified by
    ``ann_lsh_recall_contract`` and pytest-asserted vs exact."""
    corpus = pin(_corpus(spark, sf_dir))
    n = corpus.count()
    rbits, bands = srp_band_params(max(n, 16), NEAR_DUP_COS)
    keys = _srp_band_keys(rbits, bands)
    banded = corpus.select(
        "vec_id", F.posexplode(keys(F.col("emb"))).alias("_band", "_key")
    )
    q_banded = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "_band", "_key"
    )
    cand = (
        banded.join(F.broadcast(q_banded), ["_band", "_key"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q_emb = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("emb_q")
    )
    pairs = (
        cand.join(corpus.select(F.col("vec_id").alias("neighbor_id"), "emb"), "neighbor_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("emb_q"), F.col("emb")), 4).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


_PAIR_COSINE_UDF = None


def pair_cosine(a: Column, b: Column) -> Column:
    """Arrow-batched cosine over two array columns with
    dimension-by-dimension IN-ORDER accumulation — bitwise-identical to
    the JVM ``aggregate(zip_with(...))`` fold and to the blocked-GEMM
    forms (``embedding_near_dup``, ``semantic_dedup``), but ~8x faster
    than the interpreted higher-order functions for per-pair work.
    THE single definition of the accumulation recipe: every consumer
    shares this UDF so the bitwise-equality guarantee can't drift.
    Built lazily (and cached) because pandas_udf return-type parsing
    needs an active SparkContext — module import must stay session-free.

    Marked non-deterministic (it is not — the fold is exact) as the
    optimizer fence from the optimization guide §4.4: a filter on the
    UDF's output otherwise duplicates the ArrowEvalPython node (one
    copy pushed below the filter, one in the surviving projection), so
    every candidate pair paid the Arrow round-trip twice
    (near_dup_auto's plan showed ArrowEvalPython at nodes 35 AND 38;
    after the fence it is evaluated once)."""
    global _PAIR_COSINE_UDF
    if _PAIR_COSINE_UDF is None:

        @F.pandas_udf("double")
        def _pc(a_s: pd.Series, b_s: pd.Series) -> pd.Series:
            if len(a_s) == 0:
                return pd.Series([], dtype="float64")
            A = np.array(a_s.tolist(), dtype=np.float64)
            B = np.array(b_s.tolist(), dtype=np.float64)
            na2 = np.zeros(len(A))
            nb2 = np.zeros(len(A))
            acc = np.zeros(len(A))
            for i in range(A.shape[1]):  # left-to-right, like the JVM fold
                na2 = na2 + A[:, i] * A[:, i]
                nb2 = nb2 + B[:, i] * B[:, i]
                acc = acc + A[:, i] * B[:, i]
            return pd.Series(acc / (np.sqrt(na2) * np.sqrt(nb2)))

        _PAIR_COSINE_UDF = _pc.asNondeterministic()
    return _PAIR_COSINE_UDF(a, b)


def srp_band_params(
    n: int, threshold: float, target_recall: float = 0.9, band_cap: int = 48
) -> tuple[int, int]:
    """(bits_per_band, n_bands) for SRP banding, derived from corpus
    size and threshold — the standard SimHash/SRP AND-OR composition
    (Charikar '02): P(bit agrees) = 1 - acos(cos) / pi, a band is an
    AND of ``rbits`` bits, tables are an OR.

    Two competing constraints, resolved in this order:

    - pruning wants MORE bits: background collisions per random pair
      per band are 0.5^rbits, so rbits ~ log2(n / 8) keeps expected
      background candidates per vector roughly constant as n grows —
      this is the knob that makes the join shuffle-linear at 100 TB;
    - recall wants FEWER bits: hitting ``target_recall`` at exactly
      ``threshold`` needs ln(1-R) / ln(1 - p_bit^rbits) bands, and the
      band budget is capped (each band is one exploded row per vector
      in the join), so rbits is clamped to the largest value whose
      band requirement fits the cap.

    At aggressive thresholds (>= ~0.8, the realistic near-dup regime)
    the recall clamp never binds and pruning scales with log n.  At
    permissive thresholds (the 0.35 fixture regime, inside the tail of
    the RANDOM-pair cosine distribution at dim 64) p_bit is barely
    above 1/2, the clamp binds at small rbits, and the pruning factor
    is modest — correctly so: the true result set itself is a constant
    fraction of all pairs there, so no candidate scheme can be
    sub-quadratic.  Output-linear is the achievable contract, and the
    verify step is output-proportional."""
    import math

    # threshold == 1.0 would make p_bit exactly 1 and the recall-clamp
    # log below divide by zero; 0.999 keeps the math finite and an
    # exact-duplicate caller still gets the tightest bands
    p_bit = 1.0 - math.acos(max(-1.0, min(0.999, threshold))) / math.pi
    # largest rbits whose recall-mandated band count fits the cap
    p_band_min = 1.0 - (1.0 - target_recall) ** (1.0 / band_cap)
    rbits_recall_max = max(1, int(math.log(p_band_min) / math.log(p_bit)))
    # the pruning floor of 4 yields to, never overrides, the recall
    # clamp: if the clamp sits below 4 (only possible at threshold < 0,
    # where p_bit < 1/2) recall wins and target_recall stays guaranteed
    rbits = min(max(4, math.ceil(math.log2(max(n, 16) / 8.0))), rbits_recall_max)
    p_band = p_bit**rbits
    bands = min(band_cap, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band)))
    return rbits, bands


def _srp_band_keys(rbits: int, bands: int, seed: int = 42):
    """Arrow UDF: embedding array -> array<long> of per-band SRP keys.
    One numpy GEMM per batch against a seeded Gaussian direction matrix
    (regenerated identically in every worker — cheaper than shipping
    it), sign bits packed per band.  Row-local, no state."""

    @F.pandas_udf("array<long>")
    def band_keys(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(emb.to_numpy())
        D = np.random.RandomState(seed).standard_normal((bands * rbits, X.shape[1]))
        bits = (X @ D.T) > 0
        w = 1 << np.arange(rbits, dtype=np.int64)
        keys = bits.reshape(len(X), bands, rbits).astype(np.int64) @ w
        return pd.Series(list(keys))

    return band_keys


def near_dup_auto(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    threshold: float = NEAR_DUP_COS,
    exact_limit: int = EXACT_NEAR_DUP_ROUTE_ROWS,
) -> DataFrame:
    """Adaptive near-dup: the library-level rewrite SURVEY.md §4 calls
    out (no custom Catalyst rule needed).  Small corpora get the exact
    quadratic self-join; above ``exact_limit`` rows the plan switches to
    SRP-banded LSH candidates + exact verify — same output contract
    (id_a < id_b, cos_sim >= threshold), different physical strategy.

    The default ``exact_limit`` (EXACT_NEAR_DUP_ROUTE_ROWS, 1k) is low
    because the crossover is early: even with the
    vectorized ``pair_cosine`` the quadratic branch pays |n|²/2 pair
    materializations (~10 s at 2k×2k), while the LSH branch prunes
    candidates before the verify.

    The LSH is sign-random-projection banding (rbits-bit AND within a
    band, OR across bands — parameters derived per corpus by
    ``srp_band_params``), NOT MLlib's BucketedRandomProjectionLSH: BRP
    buckets by floor(projection / bucketLength), but projections of
    unit vectors concentrate in ±~3/sqrt(dim) (±0.38 at dim 64), so
    any bucketLength coarse enough for recall puts nearly the whole
    corpus in a couple of buckets per table and the "candidates" are
    all pairs — invisible at 2k vectors, a 60x blow-up at 20k (caught
    by tools/scale_sweep.py round 6).  BRP also cannot AND-compose
    projections within a table, so narrowing the buckets just trades
    the blow-up for recall loss.  SRP bands AND-compose by
    construction, and rbits grows with log n so background candidates
    stay ~linear in the corpus.

    The count() here is a cheap planning action (count-star over
    parquet metadata / cached input), the moral equivalent of AQE
    choosing a join strategy from runtime stats.
    """
    # pin: the corpus feeds the routing count plus two (exact branch)
    # or three (LSH branch: banding, id_a-emb join, id_b-emb join)
    # consumers — one materialization instead of re-running the scan +
    # cast lineage per consumer (guide §2.4).
    corpus = pin(corpus)
    n = corpus.count()
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(emb_col).alias("emb_a"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(emb_col).alias("emb_b"))
    sim = pair_cosine(F.col("emb_a"), F.col("emb_b"))
    # the hard cap overrides any caller preference: past it the exact
    # branch is a driver/executor memory hazard, not a strategy choice
    if n <= min(exact_limit, EXACT_NEAR_DUP_MAX_ROWS):
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:  # SRP-LSH candidates, then exact verify on candidates only
        rbits, bands = srp_band_params(n, threshold)
        keys = _srp_band_keys(rbits, bands)
        # pin: banded feeds BOTH sides of the self-join; without the
        # barrier each side re-runs the SRP GEMM over the whole corpus
        # (the before-plan showed the banding ArrowEvalPython twice,
        # nodes 4 and 12 — guide §4: halve the Python-boundary work).
        banded = pin(corpus.select(
            F.col(id_col).alias("_id"),
            F.posexplode(keys(as_double(F.col(emb_col)))).alias("_band", "_key"),
        ))
        cand = (
            banded.alias("x")
            .join(
                banded.alias("y"),
                (F.col("x._band") == F.col("y._band"))
                & (F.col("x._key") == F.col("y._key"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
            .distinct()
        )
        # join embeddings back by id: shuffles 2 corpus copies instead
        # of carrying the vectors through the band explode (bands x the
        # embedding bytes through the candidate shuffle)
        pairs = cand.join(a, "id_a").join(b, "id_b")
    return (
        pairs.select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# 4. IVF coarse-quantizer ANN (KMeans partitions + nprobe).
# ---------------------------------------------------------------------------


def _cent_frame(spark: SparkSession, centers) -> DataFrame:
    """(centroid, c_emb) frame from the KB-sized centroid list/matrix
    (numpy rows or MLlib ``clusterCenters()``) — the broadcast side of
    every IVF probe/argmin join; one definition so the call sites
    cannot drift."""
    return local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "centroid INT, c_emb ARRAY<DOUBLE>",
    )


def _ivf_flat_serve(
    assigned: DataFrame, cent_df: DataFrame, nprobe: int = NPROBE
) -> DataFrame:
    """The IVF-Flat serving shape shared by ``ann_ivf_topk`` (fresh fit),
    ``ivf_staleness_audit`` (frozen fit) and ``ivf_recall_curve``
    (swept ``nprobe``): probe each query's ``nprobe`` nearest centroids
    (broadcast crossJoin — |queries| × k rows), rank exactly within the
    probed cells.  One definition so the stale-vs-fresh retention
    comparison can never be skewed by the two paths drifting apart."""
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    qc = queries.crossJoin(F.broadcast(cent_df)).selectExpr(
        "query_id", "q_emb", "centroid",
        f"{_cosine_sql('q_emb', 'c_emb')} AS c_sim",
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("c_sim"), "centroid")
    probe = (
        qc.withColumn("p", F.row_number().over(wq))
        .filter(F.col("p") <= nprobe)
        .select("query_id", "q_emb", "centroid")
    )
    cands = assigned.join(F.broadcast(probe), "centroid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sims = cands.selectExpr(
        "query_id",
        "vec_id AS neighbor_id",
        f"{_cosine_sql('q_emb', 'emb')} AS sim",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


def _ivf_fresh_topk(corpus: DataFrame) -> DataFrame:
    """Fresh KMeans(IVF_K, seed 42) fit + IVF-Flat serve over an
    already-loaded corpus — the body of ``ann_ivf_topk``, factored so
    callers that ALREADY hold the (pinned) corpus
    (``ivf_staleness_audit``'s fresh-baseline leg) don't re-scan
    parquet and re-run the cast lineage for the same fit."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    vecs = pin(corpus.withColumn("vec", array_to_vector(F.col("emb"))))
    km = KMeans(k=IVF_K, seed=42, featuresCol="vec", predictionCol="centroid")
    model = km.fit(vecs)
    # assigned feeds the query slice AND the candidate join inside
    # _ivf_flat_serve — pin so the transform runs once
    assigned = pin(model.transform(vecs).select("vec_id", "emb", "centroid"))
    return _ivf_flat_serve(assigned, _cent_frame(spark, model.clusterCenters()))


@register("ann_ivf_topk", tags=("similarity", "ivf"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat: KMeans(k=8, seed=42) coarse centroids; each query
    probes its NPROBE nearest centroids and ranks exactly within them.

    At scale the corpus is written partitioned by ``centroid`` so a
    query reads nprobe/k of the data (partition pruning); here the
    pruning happens via the broadcast equi-join on centroid id.
    """
    return _ivf_fresh_topk(_corpus(spark, sf_dir))


# ---------------------------------------------------------------------------
# 5. Semantic dedup (SemDeDup-style: cluster, then pairwise within cluster).
# ---------------------------------------------------------------------------


SEMDEDUP_K = 8
SEMDEDUP_EPS = NEAR_DUP_COS
SEMDEDUP_MAXITER = 5


@register("semantic_dedup", tags=("dedup", "similarity", "semdedup"), bench=True)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): KMeans the
    embeddings into coarse clusters, then drop any vector that has a
    smaller-id neighbor in the SAME cluster with cosine >= eps (greedy
    keep-lowest-id).  Returns (vec_id, centroid) of the keepers plus the
    per-cluster drop count.

    100 TB shape: the pairwise step is confined within clusters — cost
    Σ|cluster|² instead of |corpus|², and each cluster's pairs build
    from an equi-join on the centroid id, so the shuffle is one
    hash-partition of the corpus by centroid.  Skewed/giant clusters are
    the known failure mode: cap them by re-clustering recursively or
    salting the within-cluster join (docs/SCALE.md).  Rows-only check
    (KMeans isn't SQL-expressible); semantics vs the exact pair set are
    pytest-gated (tests/test_similarity.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    import numpy as np
    import pandas as pd

    corpus = _corpus(spark, sf_dir)
    if corpus.isEmpty():
        return local_df(spark, [], "vec_id LONG, centroid INT, n_dropped_in_cluster LONG")
    vecs = pin(corpus.withColumn("vec", array_to_vector(F.col("emb"))))
    # right-size the iterative fit like vectors.pca_kmeans: ~20 KMeans
    # jobs each pay per-task scheduling overhead; ~10k rows per task,
    # clamped to cluster width (no-op at real scale).
    n = vecs.count()
    width = spark.sparkContext.defaultParallelism
    parts = max(1, min(width, n // 10_000 + 1))
    if parts < vecs.rdd.getNumPartitions():
        vecs = pin(vecs.coalesce(parts))
    # a coarse quantizer only needs rough partitions — 5 Lloyd
    # iterations, not the default 20 (dedup quality is governed by the
    # pairwise verify, not centroid polish; halves the fit wall-time).
    km = KMeans(
        k=SEMDEDUP_K, seed=42, maxIter=SEMDEDUP_MAXITER,
        featuresCol="vec", predictionCol="centroid",
    )
    assigned = km.fit(vecs).transform(vecs).select("vec_id", "emb", "centroid")

    def keepers_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        # dense GEMM within one cluster — dimension-by-dimension IN-ORDER
        # accumulation, bitwise-identical to the JVM aggregate(zip_with)
        # cosine (same recipe as embedding_near_dup; vectorization
        # changes speed, not math, so threshold comparisons can't flip).
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        A = np.array(pdf["emb"].tolist(), dtype=np.float64)
        d = A.shape[1]
        n2 = np.zeros(len(A))
        acc = np.zeros((len(A), len(A)))
        for i in range(d):
            n2 = n2 + A[:, i] * A[:, i]
            acc = acc + A[:, i][:, None] * A[:, i][None, :]
        nrm = np.sqrt(n2)
        sim = acc / (nrm[:, None] * nrm[None, :])
        mask = (ids[:, None] < ids[None, :]) & (sim >= SEMDEDUP_EPS)
        # the group knows its whole answer: kept rows AND the drop count
        # (every id with a smaller-id near-dup drops; the smallest id of
        # a cluster can never drop, so a cluster is never empty)
        dropped = np.unique(ids[np.nonzero(mask)[1]])
        keep = ~np.isin(ids, dropped)
        return pd.DataFrame(
            {
                "vec_id": ids[keep],
                "centroid": pdf["centroid"].to_numpy()[keep],
                "n_dropped_in_cluster": np.int64(len(dropped)),
            }
        )

    # groupBy(centroid).applyInPandas = ONE hash-partition of the corpus
    # by centroid; each cluster is a dense numpy block — the per-pair
    # JVM lambda join form was 5x slower at sf0.1 (1.5M pairs x 768-dim
    # aggregate per pair vs 8 cluster-local matrix products).  The
    # grouped map emits the FINAL rows (kept ids + the cluster's drop
    # count) directly: the previous keeper anti-join + drop-count
    # semi-join + per-centroid aggregate + left join re-ran the GEMM
    # subtree per consumer (FlatMapGroupsInPandas twice in the r13
    # before-plan) and added three joins the group already knew the
    # answer to.  One exchange, one Python stage, zero joins.
    return assigned.groupBy("centroid").applyInPandas(
        keepers_in_cluster,
        "vec_id LONG, centroid INT, n_dropped_in_cluster LONG",
    )


def assign_capped_clusters(
    corpus: DataFrame,
    k: int = SEMDEDUP_K,
    cap: int = 10_000,
    seed: int = 42,
    max_depth: int = 3,
    emb_col: str = "emb",
) -> DataFrame:
    """Cluster assignment with a SIZE CAP — the giant-cluster mitigation
    ``semantic_dedup`` documents: any cluster larger than ``cap`` is
    re-clustered recursively (k' = ceil(size / cap), capped at k), so
    the downstream within-cluster pairwise work is bounded by cap² per
    group no matter how skewed the embedding space is.

    Returns (input columns…, cluster STRING) where cluster is the
    hierarchy path ("3", "3/1", …) — stable keys for groupBy.  The
    driver loop runs one KMeans fit per oversized cluster per level
    (cheap: fits see only that cluster's rows); splitting CAN separate a
    borderline pair — acceptable because SemDeDup is already
    cluster-approximate by construction.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    def _assign(df: DataFrame, kk: int, prefix: str) -> DataFrame:
        vecs = df.withColumn("_v", array_to_vector(F.col(emb_col)))
        km = KMeans(
            k=kk, seed=seed, maxIter=SEMDEDUP_MAXITER,
            featuresCol="_v", predictionCol="_c",
        )
        out = km.fit(vecs).transform(vecs)
        label = F.concat(F.lit(prefix), F.col("_c").cast("string"))
        return out.withColumn("cluster", label).drop("_v", "_c")

    result = pin(_assign(corpus, k, ""))
    for _ in range(max_depth):
        sizes = result.groupBy("cluster").agg(F.count("*").alias("n"))
        big = [(r.cluster, r.n) for r in sizes.filter(F.col("n") > cap).collect()]
        if not big:
            break
        keep = result.filter(~F.col("cluster").isin([c for c, _ in big]))
        pieces = [keep]
        for c, n in big:
            sub = result.filter(F.col("cluster") == c).drop("cluster")
            kk = min(k, max(2, -(-n // cap)))  # ceil div, >=2 to make progress
            pieces.append(_assign(sub, kk, c + "/"))
        acc = pieces[0]
        for p in pieces[1:]:
            acc = acc.unionByName(p)
        result = pin(acc)
    return result


# ---------------------------------------------------------------------------
# 6. IVF write path — partitioned-by-centroid layout with partition pruning.
# ---------------------------------------------------------------------------


def write_ivf_index(corpus: DataFrame, path: str, k: int = IVF_K, seed: int = 42):
    """Materialize the IVF-Flat layout: assign each vector to its KMeans
    centroid and write parquet PARTITIONED BY centroid — at scale a
    query probing ``nprobe`` centroids reads ``nprobe/k`` of the data
    via partition pruning, which is the whole point of IVF.  Returns the
    fitted KMeans model (its centers are the probe index)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.withColumn("vec", array_to_vector(F.col("emb")))
    model = KMeans(k=k, seed=seed, featuresCol="vec", predictionCol="centroid").fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "emb", "centroid")
    assigned.write.mode("overwrite").partitionBy("centroid").parquet(path)
    return model


def read_ivf_probe(spark: SparkSession, path: str, probe_centroids: list[int]) -> DataFrame:
    """Read ONLY the probed partitions.  The isin filter on the
    partition column compiles to PartitionFilters in the parquet scan
    (asserted in tests/test_similarity.py) — no data files outside the
    probed centroids are opened."""
    return spark.read.parquet(path).filter(F.col("centroid").isin(probe_centroids))


@register("ivf_partition_pruning", tags=("similarity", "ivf", "layout"))
def ivf_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF with the REAL storage layout: build → write
    partitioned by centroid → probe via partition-pruned read → exact
    rank within the probed partitions.  Rows-only check (KMeans is not
    SQL-expressible); recall vs exact top-k is pytest-gated."""
    import os

    import ssafynews_data_spark

    corpus = _corpus(spark, sf_dir)
    if corpus.isEmpty():  # KMeans cannot fit on zero rows (empty-day path)
        return local_df(spark, 
            [], "query_id LONG, neighbor_id LONG, sim DOUBLE, rank INT"
        )
    # repo-local scratch (spark-warehouse/ is gitignored); keyed by SF so
    # concurrent checks at different scale factors don't clobber
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(ssafynews_data_spark.__file__))),
        "spark-warehouse",
        "ivf_index_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    model = write_ivf_index(corpus, path)

    cent_df = _cent_frame(spark, model.clusterCenters())
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    # nprobe nearest centroids per query: tiny (|q| x k) — driver-side,
    # exactly how an IVF index serves (the centroid table IS the index)
    probe = (
        queries.crossJoin(F.broadcast(cent_df))
        .select(
            "query_id", "q_emb", "centroid",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("c_sim"),
        )
        .withColumn(
            "p",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("c_sim"), "centroid")
            ),
        )
        .filter(F.col("p") <= NPROBE)
        .select("query_id", "q_emb", "centroid")
    )
    probe_rows = probe.collect()  # tiny: N_QUERIES x NPROBE rows
    cents = sorted({r["centroid"] for r in probe_rows})

    pruned = read_ivf_probe(spark, path, cents)
    probe_df = local_df(spark, probe_rows, probe.schema)
    cands = pruned.join(F.broadcast(probe_df), "centroid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sims = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("emb")).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


# ---------------------------------------------------------------------------
# 5. Hybrid retrieval — dense + sparse rankings fused by RRF.
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


@register(
    "hybrid_rrf_retrieval",
    oracle=f"""
        WITH items AS (
            SELECT e.vec_id AS id,
                   CAST(e.embedding AS DOUBLE[]) AS emb,
                   list_distinct(list_filter(string_split_regex(lower(d.text),
                       '[^\\p{{L}}\\p{{N}}]+'), x -> x <> '')) AS toks
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        ),
        pairs AS (
            SELECT q.id AS query_id, c.id AS id,
                   list_cosine_similarity(q.emb, c.emb) AS sim,
                   len(list_filter(q.toks, x -> list_contains(c.toks, x))) AS inter,
                   len(q.toks) + len(c.toks)
                     - len(list_filter(q.toks, x -> list_contains(c.toks, x))) AS uni
            FROM items q JOIN items c ON q.id < {N_QUERIES} AND q.id <> c.id
        ),
        ranked AS (
            SELECT query_id, id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, id) AS rank_dense,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY CASE WHEN uni = 0 THEN 0.0
                                               ELSE CAST(inter AS DOUBLE) / uni END DESC,
                                               id) AS rank_sparse
            FROM pairs
        ),
        fused AS (
            SELECT query_id, id,
                   1.0 / ({RRF_K} + rank_dense) + 1.0 / ({RRF_K} + rank_sparse)
                       AS rrf
            FROM ranked
        )
        SELECT query_id, id AS doc_id, round(rrf, 6) AS rrf_score,
               CAST(rank AS INT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY rrf DESC, id) AS rank
              FROM fused)
        WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "hybrid", "rrf", "retrieval"),
    bench=True,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid dense+sparse retrieval with reciprocal rank fusion: each
    query document ranks the corpus twice — by embedding cosine and by
    distinct-token Jaccard — and the two rank lists fuse as
    ``1/(60+r_dense) + 1/(60+r_sparse)`` (Cormack et al.'s RRF, the
    standard fusion in production RAG stacks).

    Physical shape: ONE pair frame computes both signals (the broadcast
    query side carries its embedding AND token set, so the corpus
    streams once), then two window ranks over the same frame and a
    final per-query top-k.  At 100 TB the shape is unchanged: |queries|
    ≪ |corpus| keeps the join broadcast, and the windows partition by
    query_id — parallel across queries, linear per query."""
    from ssafynews_data_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(tokens_col(F.col("text"))).alias("toks")
    )
    items = _corpus(spark, sf_dir).join(
        docs, F.col("vec_id") == F.col("doc_id")
    ).select(F.col("vec_id").alias("id"), "emb", "toks")
    queries = items.select(
        F.col("id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("toks").alias("q_toks"),
    ).filter(F.col("query_id") < N_QUERIES)

    inter = F.size(F.array_intersect(F.col("q_toks"), F.col("toks")))
    uni = F.size(F.col("q_toks")) + F.size(F.col("toks")) - inter
    jac = F.when(uni == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / uni
    )
    pairs = items.join(
        F.broadcast(queries), F.col("id") != F.col("query_id")
    ).select(
        "query_id",
        "id",
        cosine(F.col("q_emb"), F.col("emb")).alias("sim"),
        jac.alias("jac"),
    )
    w_dense = W.partitionBy("query_id").orderBy(F.desc("sim"), "id")
    w_sparse = W.partitionBy("query_id").orderBy(F.desc("jac"), "id")
    fused = pairs.select(
        "query_id",
        "id",
        (
            1.0 / (RRF_K + F.row_number().over(w_dense))
            + 1.0 / (RRF_K + F.row_number().over(w_sparse))
        ).alias("rrf"),
    )
    w_final = W.partitionBy("query_id").orderBy(F.desc("rrf"), "id")
    return (
        fused.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("id").alias("doc_id"),
            F.round("rrf", 6).alias("rrf_score"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# 7. Oracle-checkable contracts for the approximate family.
#
# The ANN algorithms themselves aren't SQL-expressible (bucket layouts and
# KMeans labels are engine-specific), but their CONTRACTS are: the exact
# top-k reference is DuckDB-computable, and the recall / containment /
# accounting guarantees are deterministic facts the driver can hash-check.
# Each contract frame mixes genuinely-DuckDB-computed columns (exact-side
# counts and similarity sums) with spec columns (recall_ok=TRUE): if the
# approximate side ever degrades, the Spark frame diverges and the row
# FAILS — converting the previous rows-only checks into driver-certified
# ones.  (VERDICT r4 "What's missing" #3.)
# ---------------------------------------------------------------------------

#: aggregate-recall floors, identical to tests/test_similarity.py.
#: The IVF floor must hold across EMBEDDING DRAWS, not just seed 42:
#: with nprobe=2 of 8 cells on near-random unit vectors, per-neighbor
#: cell-hit probability is ~0.5, so 50-row recall is binomial with
#: sd ~7 points — a seven-seed survey (42/777/1234/555/31337/99/2468)
#: measured 36-60%.  30 sits ~3 sd under the mean (a fixture draw
#: cannot sink it) while a real probe regression reads ~0-12%.  The
#: earlier 40 was set on the seed-42 draw alone and seed 99 (36%)
#: legitimately broke it — the same lesson as the minhash chain floor.
LSH_RECALL_MIN_PCT = 60
IVF_RECALL_MIN_PCT = 30

_EXACT_TOPK_CTE = f"""
        WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
             c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
             sims AS (
                 SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        list_cosine_similarity(q.emb, c.emb) AS sim
                 FROM q CROSS JOIN c
                 WHERE q.vec_id <> c.vec_id
             ),
             topk AS (
                 SELECT query_id, neighbor_id, round(sim, 4) AS sim
                 FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                                    ORDER BY sim DESC, neighbor_id)
                                 AS rank
                       FROM sims)
                 WHERE rank <= {TOP_K}
             )
"""


_ANN_CONTRACT_SCHEMA = (
    "n_queries LONG, n_exact_rows LONG, exact_sim_sum_q4 LONG, recall_ok BOOLEAN"
)


def _ann_recall_contract(
    spark: SparkSession, sf_dir: str, approx_fn, min_pct: int
) -> DataFrame:
    """One-row contract frame: exact-side facts (DuckDB-recomputable) +
    the aggregate-recall guarantee of ``approx_fn``'s top-k vs the exact
    top-k.  ``approx_fn`` is called lazily so the empty-corpus path never
    touches the (unfittable-on-zero-rows) LSH/KMeans models."""
    if _corpus(spark, sf_dir).isEmpty():
        # matches the oracle on empty input: counts 0, NULL sim sum,
        # recall vacuously satisfied (0 hits >= 0 required)
        return local_df(spark, [(0, 0, None, True)], _ANN_CONTRACT_SCHEMA)
    approx = approx_fn()
    # pin: exact feeds the hit join AND the facts aggregate — one
    # corpus topk pass instead of two; broadcast: both sides are
    # N_QUERIES×TOP_K rows but post-window estimates planned a
    # sort-merge join (guide §3.1)
    exact = pin(cosine_topk(spark, sf_dir).select("query_id", "neighbor_id", "sim"))
    hits = approx.select("query_id", "neighbor_id").join(
        F.broadcast(exact.select("query_id", "neighbor_id")),
        ["query_id", "neighbor_id"],
    )
    e = exact.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact_rows"),
        # per-row sims are 4-decimal-rounded doubles (bit-identical
        # cross-engine); quantize EACH to an integer and sum integers —
        # round(sum(<rounded doubles>), 3) lands on a half-thousandth
        # tie ~1/10 draws (caught by the pytest reseed gate, seed
        # 8675309: 16.181 vs 16.18) and tie-breaks per engine
        F.sum(F.round(F.col("sim") * 10000).cast("long")).alias(
            "exact_sim_sum_q4"
        ),
    )
    h = hits.agg(F.count("*").alias("n_hits"))
    return e.crossJoin(h).select(
        "n_queries",
        "n_exact_rows",
        "exact_sim_sum_q4",
        (F.col("n_hits") * 100 >= F.col("n_exact_rows") * min_pct).alias("recall_ok"),
    )


#: one shared oracle for both ANN contracts: DuckDB recomputes the
#: exact-side facts; the recall floor itself is applied SPARK-SIDE (the
#: frame emits recall_ok=false when violated, which then hash-mismatches
#: the oracle's TRUE) — the floor constant does not appear in the SQL.
_ANN_CONTRACT_ORACLE = f"""{_EXACT_TOPK_CTE}
        SELECT count(DISTINCT query_id) AS n_queries,
               count(*) AS n_exact_rows,
               CAST(sum(CAST(round(sim * 10000) AS BIGINT)) AS BIGINT) AS exact_sim_sum_q4,
               TRUE AS recall_ok
        FROM topk
    """


@register(
    "ann_lsh_recall_contract",
    oracle=_ANN_CONTRACT_ORACLE,
    tags=("similarity", "lsh", "contract"),
)
def ann_lsh_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract for ``ann_lsh_topk``: DuckDB recomputes
    the exact top-k (count + rounded similarity mass) and the frame
    asserts LSH aggregate recall >= 60% against that exact set — the
    containment check VERDICT r4 asked for, expressed as a hashable
    row."""
    return _ann_recall_contract(
        spark, sf_dir, lambda: ann_lsh_topk(spark, sf_dir), LSH_RECALL_MIN_PCT
    )


@register(
    "ann_ivf_recall_contract",
    oracle=_ANN_CONTRACT_ORACLE,
    tags=("similarity", "ivf", "contract"),
)
def ann_ivf_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract for ``ann_ivf_topk`` (see
    ``ann_lsh_recall_contract``); the IVF floor is lower because nprobe=2
    of 8 centroids legitimately misses cross-centroid neighbors."""
    return _ann_recall_contract(
        spark, sf_dir, lambda: ann_ivf_topk(spark, sf_dir), IVF_RECALL_MIN_PCT
    )


@register(
    "semantic_dedup_contract",
    oracle=f"""
        SELECT (SELECT count(*) FROM embeddings) AS n_total,
               (SELECT count(*) FROM embeddings) AS n_accounted,
               CAST(0 AS BIGINT) AS orphan_drops,
               CAST(0 AS BIGINT) AS both_kept_incluster_pairs
    """,
    tags=("dedup", "semdedup", "contract"),
)
def semantic_dedup_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract for ``semantic_dedup``: (a) keeper count
    plus the query's own reported drop counts accounts for every vector;
    (b) no dropped vector lacks a smaller-id near-dup (cluster pairs are
    a subset of global pairs, so every drop must be globally justified);
    (c) no near-dup pair survives with both endpoints kept IN THE SAME
    cluster — the greedy-within-cluster guarantee, decided from the
    output's own centroid column (cross-cluster survivors are
    SemDeDup-legitimate and excluded).  The global pair set is the SAME
    exact self-join the driver hash-checks via ``near_dup_auto_pairs``,
    so the reference side is itself verified."""
    kept = semantic_dedup(spark, sf_dir)
    corpus = _corpus(spark, sf_dir)

    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"))
    pairs = pin(
        a.join(b, F.col("id_a") < F.col("id_b"))
        # shared vectorized pair cosine — the interpreted fold here cost
        # ~a minute at 2k vectors for this one contract row
        .filter(pair_cosine(F.col("emb_a"), F.col("emb_b")) >= SEMDEDUP_EPS)
        .select("id_a", "id_b")
    )
    kept_ids = kept.select("vec_id")
    dropped = corpus.select("vec_id").join(kept_ids, "vec_id", "left_anti")

    n_total = corpus.agg(F.count("*").alias("n_total"))
    n_kept = kept.agg(F.count("*").alias("n_kept"))
    n_dropped_reported = (
        kept.select("centroid", "n_dropped_in_cluster")
        .distinct()
        .agg(F.coalesce(F.sum("n_dropped_in_cluster"), F.lit(0)).alias("n_drop"))
    )
    orphans = dropped.join(
        pairs, dropped["vec_id"] == pairs["id_b"], "left_anti"
    ).agg(F.count("*").alias("orphan_drops"))
    ka = kept.select(F.col("vec_id").alias("id_a"), F.col("centroid").alias("cent_a"))
    kb = kept.select(F.col("vec_id").alias("id_b"), F.col("centroid").alias("cent_b"))
    both_kept = (
        pairs.join(ka, "id_a")
        .join(kb, "id_b")
        .filter(F.col("cent_a") == F.col("cent_b"))
        .agg(F.count("*").alias("both_kept_incluster_pairs"))
    )
    return (
        n_total.crossJoin(n_kept)
        .crossJoin(n_dropped_reported)
        .crossJoin(orphans)
        .crossJoin(both_kept)
        .select(
            "n_total",
            (F.col("n_kept") + F.col("n_drop")).alias("n_accounted"),
            "orphan_drops",
            "both_kept_incluster_pairs",
        )
    )


@register(
    "near_dup_auto_pairs",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.emb, b.emb), 4) AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= {NEAR_DUP_COS}
    """,
    tags=("dedup", "similarity", "adaptive"),
)
def near_dup_auto_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adaptive router as a registered query, with ``exact_limit``
    raised to 6 000 so EVERY plausible fixture (sf0.001/0.01/0.1 at
    500-2 000 vectors, plus headroom for a regenerated fixture — a
    mis-scaled 5 000-vector reseed once routed onto the ~92%-recall
    LSH branch and broke the hash check) stays on the exact branch,
    where the exact-pair oracle holds by construction.  The library
    default stays 1k.  No driver materialization either way (unlike
    ``embedding_near_dup``'s GEMM verify form).  The benched
    scale-path headline is ``near_dup_lsh_verified`` below."""
    return near_dup_auto(_corpus(spark, sf_dir), exact_limit=6_000)


@register(
    "near_dup_lsh_verified",
    tags=("dedup", "similarity", "lsh"),
    bench=True,  # the near-dup HEADLINE: the scale path, forced LSH branch
)
def near_dup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup SCALE path as the benched headline: the router with
    ``exact_limit=0`` always takes LSH candidates + vectorized exact
    verify — shuffle-linear at any corpus size.  Rows-only driver check
    (bucket collisions are engine-specific); the containment/recall
    contract (output ⊆ exact pairs, recall ≥ 80%) is pytest-gated in
    tests/test_similarity.py, and the exact twin
    (``near_dup_auto_pairs``) carries the full hash oracle."""
    return near_dup_auto(_corpus(spark, sf_dir), exact_limit=0)


@register(
    "near_dup_containment_contract",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
             exact AS (
                 SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM e a JOIN e b ON a.vec_id < b.vec_id
                 WHERE list_cosine_similarity(a.emb, b.emb) >= {NEAR_DUP_COS}
             )
        SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
               true AS lsh_subset_of_exact,
               true AS recall_ok
        FROM exact
    """,
    tags=("dedup", "similarity", "lsh", "contract"),
)
def near_dup_containment_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The benched LSH near-dup headline held to its guarantees in a
    driver-hashable row: every pair it emits is a true >= threshold
    pair (containment — the exact verify step makes this structural),
    and it recovers >= 80% of the exact pair set (recall — the banding
    bound for these LSH parameters on normalized vectors).  The exact
    side is recomputed independently on BOTH engines (DuckDB in the
    oracle, the exact-branch router here); the LSH pair count itself is
    engine-specific and deliberately not emitted."""
    corpus = pin(_corpus(spark, sf_dir))
    # pin both pair sets: each feeds its own count AND the semi-join —
    # unpinned, the LSH banding and the quadratic verify each ran twice
    # (guide §2.4); the two materializations are independent jobs and
    # overlap (guide §2.6).  No cache race on the shared corpus pin
    # (ADVICE r13): near_dup_auto's routing count() below runs EAGERLY
    # at construction time, sequentially, so the corpus is fully
    # materialized before the two legs fork.
    lsh = pin(near_dup_auto(corpus, exact_limit=0).select("id_a", "id_b"))
    exact = pin(
        near_dup_auto(corpus, exact_limit=2_000_000_000).select("id_a", "id_b")
    )
    n_lsh, n_exact = run_parallel(lambda: lsh.count(), lambda: exact.count())
    n_common = lsh.join(exact, ["id_a", "id_b"], "left_semi").count()
    return local_df(spark, 
        [(n_exact, n_common == n_lsh, n_common >= 0.8 * n_exact)],
        "n_exact_pairs long, lsh_subset_of_exact boolean, recall_ok boolean",
    )


# ---------------------------------------------------------------------------
# 5. Product quantization (PQ) ANN — compressed codes + ADC scoring.
# ---------------------------------------------------------------------------

#: 8 subspaces of dim/8, 16 centroids each: 8 4-bit codes per vector
#: (4 bytes vs 256 for raw float64x8... the 64:1 compression PQ exists
#: for).  The fixture blobs are near-random unit vectors (max pairwise
#: cos ~0.48), the hardest PQ regime — quantization noise is comparable
#: to the similarity signal — so the re-rank list is deep (PQ_RERANK) and the
#: recall floor deliberately modest; on real embedding corpora
#: (neighbors at cos >= 0.8) the same codebooks separate sharply.
#: Measured fixture recall@5 (sampled-fit codebooks, r7): 0.90 at
#: sf0.01, 0.74 at sf0.1.
PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace (codes fit in 4 bits each)
#: ADC candidates per query before the exact re-rank.  Constant-depth
#: (the faiss convention — serving cost does NOT scale with the
#: corpus); 256 instead of the earlier 100 because on the near-random
#: fixtures ADC noise ~ similarity signal and depth 100 (top 5% at 2k
#: vectors) left per-hit retention a coin-flip binomial: two hard
#: sf0.1-scale draws measured IVF-PQ retention 83-95% of flat IVF at
#: depth 100 and 100% at depth 256.  At 1e9 vectors the re-rank join
#: still touches only 256 ids per query.
PQ_RERANK = 256
PQ_RECALL_MIN_PCT = 50


#: codebook training sample cap.  PQ codebooks are routinely trained on
#: ~50-100k vectors regardless of corpus size (faiss does exactly this);
#: quality saturates long before the corpus does.  The cap bounds BOTH
#: the one collect (<= 50k * dim doubles, ~25 MB at dim 64) and the fit.
PQ_FIT_SAMPLE = 50_000


def _np_kmeans(X: "np.ndarray", k: int, seed: int, iters: int = 10) -> "np.ndarray":
    """Seeded Lloyd's k-means on a driver-resident sample (numpy, GEMM
    assignment step).  Rough Voronoi cells are all PQ needs — the exact
    re-rank absorbs the slack — so 10 iterations, no convergence test.
    Returns exactly k centroids; when the sample has fewer than k rows
    the surplus centroids repeat sample rows (harmless: argmax scoring
    just never prefers a duplicate)."""
    rng = np.random.RandomState(seed)
    if len(X) >= k:
        C = X[rng.choice(len(X), size=k, replace=False)].copy()
    else:
        C = X[np.arange(k) % len(X)].copy()
    for _ in range(iters):
        # argmin ||x - c||^2 == argmax (x.c - ||c||^2 / 2), one GEMM
        a = np.argmax(X @ C.T - (C * C).sum(1) / 2.0, axis=1)
        for j in range(k):
            mem = X[a == j]
            if len(mem):
                C[j] = mem.mean(0)
    return C


def _pq_codebooks(
    corpus: DataFrame, emb_col: str = "emb", id_col: str = "vec_id"
) -> list:
    """Train one seeded k-means(PQ_K) per subspace on a BOUNDED sample
    of the subvectors; return the M centroid matrices (numpy, K x
    dim/M).  Train-once-on-a-sample, encode-the-world is the standard
    PQ pipeline (Jegou et al. 2011; faiss trains on sampled vectors):

    - the sample is deterministic and order-free — top-PQ_FIT_SAMPLE by
      md5 of the id (TakeOrderedAndProject: one pass over the corpus,
      no full shuffle, no partition-order bias);
    - the 8 fits run driver-side on that sample (seeded numpy Lloyd's,
      milliseconds) instead of 8 MLlib jobs whose per-fit scheduling
      overhead dominated at every fixture scale (VERDICT r6 item 3:
      ann_pq_topk was ~pure fit overhead);
    - fit cost is flat in corpus size BY CONSTRUCTION; encode stays
      distributed (Arrow UDF, one GEMM per batch per subspace)."""
    rows = (
        corpus.select(F.col(emb_col).alias("e"), F.md5(F.col(id_col).cast("string")).alias("o"))
        .sort("o")
        .limit(PQ_FIT_SAMPLE)
        .select("e")
        .collect()
    )
    X = np.stack([np.asarray(r[0], dtype=float) for r in rows])
    sub = X.shape[1] // PQ_M
    return [
        _np_kmeans(X[:, m * sub : (m + 1) * sub], PQ_K, seed=42 + m)
        for m in range(PQ_M)
    ]


def _pq_encode(books: list):
    """Arrow UDF: embedding -> array<int> of PQ codes (argmin centroid
    per subspace, one numpy GEMM per batch per subspace)."""
    sub = books[0].shape[1]

    @F.pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(emb.to_numpy())
        codes = np.empty((len(X), len(books)), dtype=np.int32)
        for m, C in enumerate(books):
            Xm = X[:, m * sub : (m + 1) * sub]
            # argmin ||x - c||^2 = argmax (x.c - ||c||^2 / 2)
            codes[:, m] = np.argmax(Xm @ C.T - (C * C).sum(1) / 2.0, axis=1)
        return pd.Series(list(codes))

    return encode


#: ADC lookup router (VERDICT r7 item 3).  The literal-map ADC form
#: compiles M·K·|Q| partial-dot doubles INTO THE PLAN — a few KB at the
#: contract's 10 queries, but thousands of serving queries would bloat
#: generated code past the JVM method-size comfort zone.  Above this
#: query count the SAME lookups travel as broadcast DATA instead: one
#: 1-row frame carrying a (m·K + code) -> (partial-dots, ||c||²) map
#: plus the query-id/norm arrays, crossJoined (Spark broadcasts the
#: row) with identical per-row math — plan size then independent of
#: |Q| and K.  Both paths are hash-equal by construction and pinned so
#: by tests/test_similarity.py + adc_batch_parity_contract.
#:
#: 0 since the r13 optimization round: the literal plan's
#: analysis/optimization/codegen cost EXCEEDS the broadcast row's whole
#: execution even at the 10-query contract batch (measured sf0.1, noop,
#: median of 5, identical output rows: flat ADC candidate cut
#: 1.26 -> 0.82 s; residual IVF-PQ serve 3.46 -> 1.31 s — guide §7.3,
#: "planning time itself can become the bottleneck").  At 100 TB the
#: constant-size plan is also the right default: serving batches are
#: large and codegen happens per query ON the driver.  The literal
#: branch stays as the zero-extra-operator reference form, exercised
#: explicitly by the parity contract and tests (raise this constant to
#: route small batches back onto it).
ADC_LITERAL_MAX_QUERIES = 0


def _adc_dot_norm2(books: list, Q: "np.ndarray") -> tuple[Column, Column]:
    """ADC scoring columns over a ``codes`` column: driver-built LITERAL
    lookup maps — dot_maps[m][code] = array over queries of Q_m . c,
    norm_maps[m][code] = ||c||^2 — folded into (dots, norm2) where
    ``dots`` is the per-query partial-dot array and ``norm2`` the
    reconstructed-vector squared norm.  M maps of K entries, each a few
    KB: ADC is map lookups + one zip_with sum per subspace, pure
    codegen, ZERO joins and zero shuffles."""
    sub = books[0].shape[1]
    nq = Q.shape[0]
    dots = F.array(*[F.lit(0.0) for _ in range(nq)])
    norm2 = F.lit(0.0)
    for m, C in enumerate(books):
        Qm = Q[:, m * sub : (m + 1) * sub]
        pd_mk = Qm @ C.T  # (Q, K)
        dot_map = F.map_from_arrays(
            F.array(*[F.lit(k) for k in range(PQ_K)]),
            F.array(
                *[
                    F.array(*[F.lit(float(pd_mk[q, k])) for q in range(nq)])
                    for k in range(PQ_K)
                ]
            ),
        )
        norm_map = F.map_from_arrays(
            F.array(*[F.lit(k) for k in range(PQ_K)]),
            F.array(*[F.lit(float((C[k] * C[k]).sum())) for k in range(PQ_K)]),
        )
        part = F.element_at(dot_map, F.col("codes")[m])
        dots = F.zip_with(dots, part, lambda a, b: a + b)
        norm2 = norm2 + F.element_at(norm_map, F.col("codes")[m])
    return dots, norm2


def _adc_lut_row(
    spark: SparkSession, books: list, Q: "np.ndarray", qids: list, qnorm: "np.ndarray"
) -> DataFrame:
    """The batch-serving ADC lookup table as ONE broadcastable row:
    ``_adc_lut[m·K + code] = (partial dots over queries, ||c||²)`` plus
    the query-id / query-norm arrays.  Built with createDataFrame (data,
    not plan literals), so the serving plan stays constant-size no
    matter how many queries are batched."""
    sub = books[0].shape[1]
    entries = []
    for m, C in enumerate(books):
        pd_mk = Q[:, m * sub : (m + 1) * sub] @ C.T  # (Q, K)
        for k in range(PQ_K):
            entries.append(
                (
                    m * PQ_K + k,
                    [float(x) for x in pd_mk[:, k]],
                    float((C[k] * C[k]).sum()),
                )
            )
    return (
        local_df(spark, entries, "lk int, pd array<double>, cn2 double")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("lk", F.struct("pd", "cn2")))
            ).alias("_adc_lut")
        )
        .withColumn("_adc_qids", F.lit([int(q) for q in qids]))
        .withColumn("_adc_qn", F.lit([float(x) for x in qnorm]))
    )


#: columns the ADC machinery injects; never part of the caller's carry
_ADC_HELPER_COLS = frozenset(
    {"codes", "_adc_lut", "_adc_qids", "_adc_qn", "_adc_qc", "_adc_ccn2", "_adc_cross"}
)


def _adc_explode(
    df: DataFrame,
    books: list,
    Q: "np.ndarray",
    qids: list,
    qnorm: "np.ndarray",
    use_literal: bool | None = None,
) -> DataFrame:
    """Explode a coded frame (``neighbor_id``, ``codes``, any carry
    columns) into per-(query, neighbor) ADC cosine rows: (query_id,
    <carry>, adc_sim), self-pairs dropped.  Shared by the flat PQ path
    and IVF-PQ so the ADC normalization/tiebreak lives in ONE place.

    Routing (``use_literal=None``): ≤ ADC_LITERAL_MAX_QUERIES queries →
    literal lookup maps compiled into the plan (zero extra operators);
    above → the same lookups as one broadcast row (``_adc_lut_row``)
    crossJoined in, so plan size is independent of the query count.
    Both branches compute identical doubles in identical order."""
    nq = Q.shape[0]
    if use_literal is None:
        use_literal = nq <= ADC_LITERAL_MAX_QUERIES
    carry = [c for c in df.columns if c not in _ADC_HELPER_COLS]
    if use_literal:
        dots, norm2 = _adc_dot_norm2(books, Q)
        qid_arr = F.array(*[F.lit(int(q)) for q in qids])
        qnorm_arr = F.array(*[F.lit(float(x)) for x in qnorm])
        return (
            df.select(
                *carry,
                F.posexplode(
                    F.zip_with(dots, qnorm_arr, lambda d, qn: d / (qn * F.sqrt(norm2)))
                ).alias("qpos", "adc_sim"),
            )
            .select(
                F.element_at(qid_arr, F.col("qpos") + 1).alias("query_id"),
                *carry,
                "adc_sim",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
    # broadcast branch: the whole scoring expression as ONE parsed SQL
    # string (guide §7.3) — the Column-API form paid ~40 py4j
    # round-trips per zip_with/element_at while building the identical
    # tree.  Operations and association order copied term-for-term
    # from the Column twin above; bit-identity is pinned by
    # test_adc_literal_and_batch_paths_identical.
    df = df.crossJoin(
        F.broadcast(_adc_lut_row(df.sparkSession, books, Q, qids, qnorm))
    )
    ent = lambda m: f"element_at(_adc_lut, {m * PQ_K} + codes[{m}])"  # noqa: E731
    dots_s = f"{ent(0)}.pd"
    norm2_s = f"{ent(0)}.cn2"
    for m in range(1, len(books)):
        dots_s = f"zip_with({dots_s}, {ent(m)}.pd, (a, b) -> a + b)"
        norm2_s = f"{norm2_s} + {ent(m)}.cn2"
    sim_s = f"zip_with({dots_s}, _adc_qn, (d, qn) -> d / (qn * sqrt({norm2_s})))"
    return (
        df.selectExpr(
            *[f"`{c}`" for c in carry],
            "_adc_qids",
            f"posexplode({sim_s}) AS (qpos, adc_sim)",
        )
        .selectExpr(
            "element_at(_adc_qids, qpos + 1) AS query_id",
            *[f"`{c}`" for c in carry],
            "adc_sim",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )


def _adc_candidate_cut(scored: DataFrame) -> DataFrame:
    """Keep the PQ_RERANK best ADC rows per query (deterministic
    neighbor_id tiebreak)."""
    w = W.partitionBy("query_id").orderBy(F.desc("adc_sim"), "neighbor_id")
    return scored.withColumn("r0", F.row_number().over(w)).filter(
        F.col("r0") <= PQ_RERANK
    )


def _exact_rerank_topk(cand: DataFrame) -> DataFrame:
    """Exact-cosine re-rank of a candidate frame carrying (query_id,
    neighbor_id, emb_q, emb_n) down to TOP_K."""
    rer = cand.selectExpr(
        "query_id",
        "neighbor_id",
        f"round({_cosine_sql('emb_q', 'emb_n')}, 4) AS sim",
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return rer.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= TOP_K
    )


def ann_pq_topk_frame(
    spark: SparkSession, corpus: DataFrame, id_col: str = "vec_id", emb_col: str = "emb"
) -> DataFrame:
    """PQ-ANN top-k: encode the corpus into M 4-bit codes, score every
    (query, code) pair by asymmetric distance computation (ADC), take
    the PQ_RERANK best per query, then exact-cosine re-rank to TOP_K —
    the standard PQ serving pipeline (Jegou et al. 2011, public).

    Spark shape: the per-(subspace, code) partial dot products against
    ALL queries are a driver-built LITERAL map (M maps of K entries,
    each an array of Q doubles — a few KB), so ADC is map lookups +
    one zip_with sum per subspace, pure codegen, ZERO joins and zero
    shuffles until the per-query group limit; only the PQ_RERANK x Q
    candidate rows join back for exact re-rank.  At 100 TB the codes
    table (M bytes/vector vs 4·dim) is the stored index — encode once,
    serve many — and pairs naturally with the IVF layout
    (``write_ivf_index``) for partition-pruned PQ scans."""
    corpus = pin(corpus)
    qrows = sorted(
        corpus.filter(F.col(id_col) < N_QUERIES).select(id_col, emb_col).collect()
    )  # Q rows by contract (N_QUERIES=10) — a capped query-set fetch
    if not qrows:
        # empty corpus / no queries: nothing to train or serve (KMeans
        # cannot fit on zero rows — same guard as the ANN contracts)
        return local_df(spark, 
            [], "query_id long, neighbor_id long, sim double, rank int"
        )
    books = _pq_codebooks(corpus, emb_col, id_col)
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    qnorm = np.sqrt((Q * Q).sum(1))

    coded = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("emb_n"),
        _pq_encode(books)(F.col(emb_col)).alias("codes"),
    )
    cand = _adc_candidate_cut(_adc_explode(coded, books, Q, qids, qnorm))
    q_emb = corpus.filter(F.col(id_col) < N_QUERIES).select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("emb_q")
    )
    return _exact_rerank_topk(cand.join(F.broadcast(q_emb), "query_id"))


@register("ann_pq_topk", tags=("similarity", "pq"))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered PQ-ANN top-k (see ``ann_pq_topk_frame``).  Rows-only
    driver check (codes depend on KMeans initialization); the recall
    floor is the oracle-bearing ``pq_ann_recall_contract``."""
    return ann_pq_topk_frame(spark, _corpus(spark, sf_dir))


@register(
    "pq_ann_recall_contract",
    oracle=_ANN_CONTRACT_ORACLE,
    tags=("similarity", "pq", "contract"),
)
def pq_ann_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract for ``ann_pq_topk`` (same frame as the
    LSH/IVF contracts): DuckDB recomputes the exact top-k facts, Spark
    asserts PQ aggregate recall >= PQ_RECALL_MIN_PCT against them.  The
    floor is below the LSH one: 4x16 codebooks quantize dim-64 vectors
    hard, and the exact re-rank can only recover what ADC's candidate
    list retains."""
    return _ann_recall_contract(
        spark, sf_dir, lambda: ann_pq_topk(spark, sf_dir), PQ_RECALL_MIN_PCT
    )


# ---------------------------------------------------------------------------
# IVF-PQ — the faiss-standard composite index: coarse centroids prune
# WHICH cells a query reads (partition pruning), PQ codes compress WHAT
# it reads (M bytes/vector), ADC scores it without decompressing.
# ---------------------------------------------------------------------------

#: nprobe=2 of IVF_K=8 cells caps ATTAINABLE recall at the fraction of
#: true neighbors living in probed cells — measured cap 0.52 at sf0.01,
#: 0.62 at sf0.1.  With residual encoding (r8) the served recall@5 is
#: 0.52 / 0.60 (deterministic: seeded KMeans + seeded sampled
#: codebooks) — 100% / 97% of the cap, i.e. quantization loss is gone
#: and what remains is pure probe coverage (raw-vector encoding left
#: sf0.1 at 0.54 = 87% of cap).  The floor matches IVF_RECALL_MIN_PCT:
#: residual encoding closed the gap to the probe-coverage cap, so the
#: binding constraint is the same cell-hit binomial as flat IVF — the
#: seven-seed survey (36-60%, sd ~7 points) applies verbatim, and the
#: seed-42-calibrated 45 broke on seed 99's draw exactly like IVF's 40.
IVFPQ_RECALL_MIN_PCT = 30


def _pq_codebooks_residual(assigned: DataFrame, centers: "np.ndarray") -> list:
    """Residual-PQ codebooks (faiss ``by_residual=true``): the same
    bounded md5-ordered sample as ``_pq_codebooks``, but each sampled
    vector has its cell centroid subtracted BEFORE the per-subspace
    fits.  Residuals concentrate near the origin, so the K centroids
    spend their resolution on the within-cell displacement instead of
    re-describing the coarse structure IVF already captured — strictly
    finer quantization for the same code budget."""
    rows = (
        assigned.select(
            F.col("emb").alias("e"),
            F.col("centroid").alias("c"),
            F.md5(F.col("vec_id").cast("string")).alias("o"),
        )
        .sort("o")
        .limit(PQ_FIT_SAMPLE)
        .select("e", "c")
        .collect()
    )
    X = np.stack([np.asarray(r[0], dtype=float) for r in rows])
    X -= centers[np.asarray([int(r[1]) for r in rows])]
    sub = X.shape[1] // PQ_M
    return [
        _np_kmeans(X[:, m * sub : (m + 1) * sub], PQ_K, seed=42 + m)
        for m in range(PQ_M)
    ]


def _pq_encode_residual(books: list, centers: "np.ndarray"):
    """Arrow UDF: (embedding, centroid) -> PQ codes of the RESIDUAL
    (emb - center[centroid]); one numpy GEMM per batch per subspace,
    the centroid matrix captured KB-sized in the closure."""
    sub = books[0].shape[1]

    @F.pandas_udf("array<int>")
    def encode(emb: pd.Series, cent: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(emb.to_numpy()) - centers[cent.to_numpy().astype(int)]
        codes = np.empty((len(X), len(books)), dtype=np.int32)
        for m, C in enumerate(books):
            Xm = X[:, m * sub : (m + 1) * sub]
            codes[:, m] = np.argmax(Xm @ C.T - (C * C).sum(1) / 2.0, axis=1)
        return pd.Series(list(codes))

    return encode


def _residual_lut_row(
    spark: SparkSession,
    books: list,
    Q: "np.ndarray",
    qids: list,
    qnorm: "np.ndarray",
    centers: "np.ndarray",
) -> DataFrame:
    """The residual-ADC batch lookup table as ONE broadcastable row:
    the flat ``_adc_lut_row`` (residual partial dots + residual norms)
    extended with the centroid-keyed terms — ``_adc_qc[c]`` = per-query
    dot(q, c) array, ``_adc_ccn2[c]`` = ‖c‖², and
    ``_adc_cross[m·IVF_K·K + c·K + k]`` = dot(c_m, C_m[k]).  All built
    with createDataFrame (data, not plan literals): M·IVF_K·K + IVF_K·
    (Q + 2) doubles ≈ tens of KB, and the serving plan stays
    constant-size no matter how many queries are batched."""
    sub = books[0].shape[1]
    n_cells = centers.shape[0]
    qc = Q @ centers.T  # (Q, IVF_K)
    cn2 = (centers * centers).sum(1)  # (IVF_K,)
    cent_entries = [
        (c, [float(x) for x in qc[:, c]], float(cn2[c])) for c in range(n_cells)
    ]
    cross_entries = []
    for m, C in enumerate(books):
        cc_mk = centers[:, m * sub : (m + 1) * sub] @ C.T  # (IVF_K, K)
        for c in range(n_cells):
            for k in range(PQ_K):
                cross_entries.append(
                    (m * n_cells * PQ_K + c * PQ_K + k, float(cc_mk[c, k]))
                )
    cent_row = local_df(spark, 
        cent_entries, "c int, qc array<double>, cn2 double"
    ).agg(
        F.map_from_entries(F.collect_list(F.struct("c", "qc"))).alias("_adc_qc"),
        F.map_from_entries(F.collect_list(F.struct("c", "cn2"))).alias("_adc_ccn2"),
    )
    cross_row = local_df(spark, cross_entries, "ck int, x double").agg(
        F.map_from_entries(F.collect_list(F.struct("ck", "x"))).alias("_adc_cross")
    )
    return (
        _adc_lut_row(spark, books, Q, qids, qnorm)
        .crossJoin(cent_row)
        .crossJoin(cross_row)
    )


def _adc_explode_residual(
    df: DataFrame,
    books: list,
    Q: "np.ndarray",
    qids: list,
    qnorm: "np.ndarray",
    centers: "np.ndarray",
    use_literal: bool | None = None,
) -> DataFrame:
    """Residual-ADC scoring of a (neighbor_id, centroid, codes) frame:
    the reconstruction is x̂ = c + r̂, so

    - dot(q, x̂)  = dot(q, c)          [centroid lookup, per query]
                  + Σ_m dot(q_m, C_m[k_m])   [the shared residual maps]
    - ‖x̂‖²      = ‖c‖² + 2·Σ_m dot(c_m, C_m[k_m]) + Σ_m ‖C_m[k_m]‖²

    i.e. exactly ONE extra lookup per subspace vs the raw-vector form
    (the (centroid, code) cross-dot), plus two centroid-keyed scalars.

    Routing mirrors ``_adc_explode`` (``use_literal=None``): ≤
    ADC_LITERAL_MAX_QUERIES queries → all lookups are driver-built
    literal maps compiled into the plan, totalling IVF_K·(M·K + Q + 1)
    doubles (KB at contract scale); above → the same entries move into
    ONE broadcast row (``_residual_lut_row``) crossJoined in, so bulk
    serving's plan size is independent of the query count.  Both
    branches perform identical lookups in identical accumulation
    order — the residual twin of ``adc_batch_parity_contract``."""
    sub = books[0].shape[1]
    nq = Q.shape[0]
    if use_literal is None:
        use_literal = nq <= ADC_LITERAL_MAX_QUERIES
    carry = [c for c in df.columns if c not in _ADC_HELPER_COLS]
    if use_literal:
        # residual partial dots + residual norm term (shared machinery)
        rdots, rnorm2 = _adc_dot_norm2(books, Q)
        # centroid-keyed terms
        qc = Q @ centers.T  # (Q, IVF_K)
        cn2 = (centers * centers).sum(1)  # (IVF_K,)
        cents = list(range(centers.shape[0]))
        qc_map = F.map_from_arrays(
            F.array(*[F.lit(c) for c in cents]),
            F.array(
                *[F.array(*[F.lit(float(qc[q, c])) for q in range(nq)]) for c in cents]
            ),
        )
        cn2_map = F.map_from_arrays(
            F.array(*[F.lit(c) for c in cents]),
            F.array(*[F.lit(float(x)) for x in cn2]),
        )
        # cross term maps: (centroid·K + code) -> dot(c_m, C_m[k]) per subspace
        cross = F.lit(0.0)
        for m, C in enumerate(books):
            cc_mk = centers[:, m * sub : (m + 1) * sub] @ C.T  # (IVF_K, K)
            cross_map = F.map_from_arrays(
                F.array(*[F.lit(c * PQ_K + k) for c in cents for k in range(PQ_K)]),
                F.array(
                    *[F.lit(float(cc_mk[c, k])) for c in cents for k in range(PQ_K)]
                ),
            )
            cross = cross + F.element_at(
                cross_map, F.col("centroid") * PQ_K + F.col("codes")[m]
            )
        qc_cent = F.element_at(qc_map, F.col("centroid"))
        ccn2 = F.element_at(cn2_map, F.col("centroid"))
        qid_arr = F.array(*[F.lit(int(q)) for q in qids])
        qnorm_arr = F.array(*[F.lit(float(x)) for x in qnorm])
        dots = F.zip_with(rdots, qc_cent, lambda r, c: r + c)
        norm2 = ccn2 + 2.0 * cross + rnorm2
        return (
            df.select(
                *carry,
                F.posexplode(
                    F.zip_with(dots, qnorm_arr, lambda d, qn: d / (qn * F.sqrt(norm2)))
                ).alias("qpos", "adc_sim"),
            )
            .select(
                F.element_at(qid_arr, F.col("qpos") + 1).alias("query_id"),
                *carry,
                "adc_sim",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
    # broadcast branch: ONE parsed SQL string for the whole residual-ADC
    # scoring expression (guide §7.3 — the Column form of this tree cost
    # ~1 s of py4j chatter per serve construction, built twice per serve
    # contract).  Same lookups, same accumulation order as the literal
    # twin above; bit-identity pinned by
    # test_residual_adc_literal_and_batch_paths_identical.
    n_cells = centers.shape[0]
    df = df.crossJoin(
        F.broadcast(
            _residual_lut_row(df.sparkSession, books, Q, qids, qnorm, centers)
        )
    )
    ent = lambda m: f"element_at(_adc_lut, {m * PQ_K} + codes[{m}])"  # noqa: E731
    rdots_s = f"{ent(0)}.pd"
    rnorm2_s = f"{ent(0)}.cn2"
    for m in range(1, len(books)):
        rdots_s = f"zip_with({rdots_s}, {ent(m)}.pd, (a, b) -> a + b)"
        rnorm2_s = f"{rnorm2_s} + {ent(m)}.cn2"
    xent = lambda m: (  # noqa: E731 — cross-dot lookup
        f"element_at(_adc_cross,"
        f" {m * n_cells * PQ_K} + centroid * {PQ_K} + codes[{m}])"
    )
    cross_s = xent(0)
    for m in range(1, len(books)):
        cross_s = f"{cross_s} + {xent(m)}"
    dots_s = f"zip_with({rdots_s}, element_at(_adc_qc, centroid), (r, c) -> r + c)"
    norm2_s = f"element_at(_adc_ccn2, centroid) + ({cross_s}) * 2.0D + ({rnorm2_s})"
    sim_s = f"zip_with({dots_s}, _adc_qn, (d, qn) -> d / (qn * sqrt({norm2_s})))"
    return (
        df.selectExpr(
            *[f"`{c}`" for c in carry],
            "_adc_qids",
            f"posexplode({sim_s}) AS (qpos, adc_sim)",
        )
        .selectExpr(
            "element_at(_adc_qids, qpos + 1) AS query_id",
            *[f"`{c}`" for c in carry],
            "adc_sim",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )


def ivfpq_topk_frame(spark: SparkSession, corpus: DataFrame, path: str) -> DataFrame:
    """IVF-PQ serving (Jegou et al. 2011; the faiss IVFPQ + refine
    pipeline, public):

    - WRITE: assign each vector to its KMeans(IVF_K) centroid, PQ-encode
      the RESIDUAL emb − center[centroid] (faiss ``by_residual=true``,
      the library default: residuals concentrate near the origin, so
      the codebooks spend their resolution on within-cell displacement
      instead of re-describing the coarse structure — measured recall@5
      now sits AT the nprobe coverage cap: 0.52/0.52 at sf0.01 and
      0.60/0.62 at sf0.1, vs 0.54 = 87% of cap raw), and write (vec_id,
      codes) parquet PARTITIONED BY centroid.  That table IS the index:
      PQ_M small ints per vector instead of 4·dim bytes, clustered so a
      probe reads ``nprobe/IVF_K`` of the files via partition pruning.
    - SERVE: the centroid matrix is the driver-resident probe index
      (IVF_K × dim floats — KB); each query picks its NPROBE nearest
      cells by one tiny GEMM, the probed cells are read back partition-
      pruned (PartitionFilters — plan-asserted in tests), residual-ADC
      scores the codes (``_adc_explode_residual``: the shared partial-
      dot maps plus one (centroid, code) cross-dot lookup per subspace —
      the exact price of by_residual) with a per-query allowed-cell
      literal map filtering cross-probe rows, and the deep candidate
      list joins back to the flat vector store BY ID (broadcast of the
      Q×PQ_RERANK candidate side) for exact re-rank.

    At 100 TB this is the serving layout the module ladder points at:
    scan cost per query = nprobe/IVF_K of an M-bytes-per-vector table,
    fit cost sample-bounded (``_pq_codebooks_residual``), re-rank cost
    output-sized.  Reference scope: pgvector column only
    (ollama_consumer.py:234); this is north-star M6's scale path.

    Split as ``ivfpq_build_index`` (corpus-sized, once) + ``ivfpq_serve``
    (per query batch, pruned) so the scale sweep can grade the two
    costs separately — serving never scans the corpus (r8)."""
    corpus = pin(corpus)
    qrows = sorted(
        corpus.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb").collect()
    )
    if not qrows:
        return local_df(spark, 
            [], "query_id long, neighbor_id long, sim double, rank int"
        )
    books, centers = ivfpq_build_index(spark, corpus, path)
    return ivfpq_serve(spark, path, books, centers, qrows)


def ivfpq_build_index(
    spark: SparkSession, corpus: DataFrame, path: str
) -> tuple[list, "np.ndarray"]:
    """The corpus-sized, run-once half of IVF-PQ: KMeans(IVF_K) coarse
    quantizer, residual codebooks (sample-bounded fit), then TWO
    centroid-partitioned tables — ``path`` holding (vec_id, codes) (the
    M-bytes-per-vector compressed index every probe scans) and
    ``path + "_flat"`` holding (vec_id, emb) (the inverted-list raw
    vectors, read partition-pruned ONLY for the Q×PQ_RERANK refine
    candidates — the disk-resident analogue of faiss keeping original
    vectors alongside the lists for re-ranking).  Returns the
    driver-resident serving state (codebooks + centroid matrix, KB)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.withColumn("vec", array_to_vector(F.col("emb")))
    model = KMeans(
        k=IVF_K, seed=42, featuresCol="vec", predictionCol="centroid"
    ).fit(vecs)
    centers = np.stack(
        [np.asarray(c, dtype=float) for c in model.clusterCenters()]
    )
    assigned = pin(model.transform(vecs).select("vec_id", "emb", "centroid"))
    assigned.count()  # materialize once before the consumers fork
    # the flat refine companion never consumes the codebooks — write it
    # CONCURRENTLY with the sample collect + driver-side Lloyd's fits
    # (guide §2.6); the codes + meta writes then overlap each other
    books, _ = run_parallel(
        lambda: _pq_codebooks_residual(assigned, centers),
        lambda: assigned.select("vec_id", "emb", "centroid")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(path + "_flat"),
    )
    coded = assigned.select(
        "vec_id",
        "centroid",
        _pq_encode_residual(books, centers)(
            F.col("emb"), F.col("centroid")
        ).alias("codes"),
    )
    run_parallel(
        lambda: coded.write.mode("overwrite").partitionBy("centroid").parquet(path),
        lambda: _write_ivfpq_meta(spark, path, books, centers),
    )
    return books, centers


def _write_ivfpq_meta(
    spark: SparkSession, path: str, books: list, centers: "np.ndarray"
) -> None:
    """Persist the driver-resident serving state (residual codebooks +
    coarse centroids, KB) beside the index, so a serving tier can
    reload it without re-training — the third file of the faiss-style
    artifact (codes, flat vectors, quantizer).  Doubles roundtrip
    parquet bit-exactly, so a reloaded server computes the SAME ADC
    scores (asserted by ``ivfpq_serve_contract``)."""
    rows = [
        ("center", int(c), -1, [float(x) for x in centers[c]])
        for c in range(centers.shape[0])
    ]
    rows += [
        ("book", int(m), int(k), [float(x) for x in books[m][k]])
        for m in range(len(books))
        for k in range(PQ_K)
    ]
    local_df(spark, 
        rows, "kind string, m int, k int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path + "_meta")


def ivfpq_load_meta(spark: SparkSession, path: str) -> tuple[list, "np.ndarray"]:
    """Reload the serving state written by ``_write_ivfpq_meta`` — the
    cold-start path of a serving tier: no corpus scan, no KMeans, just
    the KB-sized quantizer parquet."""
    rows = spark.read.parquet(path + "_meta").collect()
    centers = np.stack(
        [
            np.asarray(v, dtype=float)
            for _, v in sorted((r.m, r.vec) for r in rows if r.kind == "center")
        ]
    )
    book_rows = [(r.m, r.k, r.vec) for r in rows if r.kind == "book"]
    n_books = max(m for m, _, _ in book_rows) + 1
    books = [
        np.stack(
            [
                np.asarray(v, dtype=float)
                for _, v in sorted((k, v) for mm, k, v in book_rows if mm == m)
            ]
        )
        for m in range(n_books)
    ]
    return books, centers


def _serve_expected(idx: DataFrame, centers: "np.ndarray", qrows: list) -> int:
    """Exact expected serve row count from the index's OWN cell sizes:
    each query yields min(TOP_K, vectors in its probed cells minus
    itself when its own cell is probed).  Draw-robust — never bets on
    a fixture's KMeans/cell shape — and cheap: two IVF_K-sized
    aggregates plus the driver-side probe GEMM."""
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    probes = _probe_cells(centers, Q, qids)
    # ONE IVF_K-sized aggregate instead of two separate jobs: per cell,
    # the size plus the query ids living in it (collect_list skips the
    # non-query NULLs; membership only — order is irrelevant)
    cells = idx.groupBy("centroid").agg(
        F.count("*").alias("n"),
        F.collect_list(
            F.when(F.col("vec_id").isin(qids), F.col("vec_id"))
        ).alias("qv"),
    ).collect()
    cell_sizes = {r.centroid: r.n for r in cells}
    own_cell = {int(q): r.centroid for r in cells for q in r.qv}
    return sum(
        min(
            TOP_K,
            sum(cell_sizes.get(c, 0) for c in probes[q])
            - (1 if own_cell.get(q) in probes[q] else 0),
        )
        for q in qids
    )


def _probe_cells(
    centers: "np.ndarray", Q: "np.ndarray", qids: list
) -> dict[int, list[int]]:
    """Per-query NPROBE nearest coarse cells by centroid cosine — the
    driver-side probe step (one tiny GEMM against the KB matrix),
    shared by serving and by the append contract's coverage
    expectation."""
    qnorm = np.sqrt((Q * Q).sum(1))
    cnorm = np.sqrt((centers * centers).sum(1))
    csim = (Q @ centers.T) / (qnorm[:, None] * cnorm[None, :])
    return {
        q: [int(c) for c in np.argsort(-csim[i])[:NPROBE]]
        for i, q in enumerate(qids)
    }


def ivfpq_serve(
    spark: SparkSession,
    path: str,
    books: list,
    centers: "np.ndarray",
    qrows: list,
) -> DataFrame:
    """The per-batch serving half: probe (driver GEMM against the KB
    centroid matrix) → partition-pruned codes read → residual ADC →
    candidate cut → partition-pruned flat read for the exact re-rank.
    NOTHING here scans the corpus: both reads touch nprobe-probed
    partitions only and the query embeddings arrive with the request
    (``qrows``), so serve cost scales with the probed fraction, not the
    table."""
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    qnorm = np.sqrt((Q * Q).sum(1))
    probes = _probe_cells(centers, Q, qids)
    cells = sorted({c for cs in probes.values() for c in cs})

    pruned = spark.read.parquet(path).filter(F.col("centroid").isin(cells))

    # -- residual ADC over the pruned codes, per query in ITS cells ----
    # (per-query allowed-cell map as one parsed literal string — integer
    # membership logic, so only plan-construction cost changes)
    allow_s = "map(" + ", ".join(
        f"{q}, array({', '.join(str(c) for c in probes[q])})" for q in qids
    ) + ")"
    coded_read = pruned.select(
        F.col("vec_id").alias("neighbor_id"), "centroid", "codes"
    )
    scored = _adc_explode_residual(
        coded_read, books, Q, qids, qnorm, centers
    ).filter(f"array_contains(element_at({allow_s}, query_id), centroid)")
    cand = _adc_candidate_cut(scored).select("query_id", "neighbor_id")

    # -- refine: exact re-rank against the PRUNED inverted-list flats --
    # (every candidate came from a probed cell, so its raw vector lives
    # in a probed partition of the flat companion by construction)
    flat = (
        spark.read.parquet(path + "_flat")
        .filter(F.col("centroid").isin(cells))
        .select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("emb_n"))
    )
    q_emb = local_df(spark, 
        [(int(r[0]), [float(x) for x in r[1]]) for r in qrows],
        "query_id long, emb_q array<double>",
    )
    return _exact_rerank_topk(
        flat.join(F.broadcast(cand), "neighbor_id")  # candidates are Q×RERANK rows
        .join(F.broadcast(q_emb), "query_id")
    )


def _ivfpq_path(sf_dir: str) -> str:
    import os

    import ssafynews_data_spark

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(ssafynews_data_spark.__file__))),
        "spark-warehouse",
        "ivfpq_index_" + os.path.basename(os.path.normpath(sf_dir)),
    )


@register("ivfpq_index_topk", tags=("similarity", "ivf", "pq", "layout"))
def ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered IVF-PQ end-to-end (see ``ivfpq_topk_frame``): build →
    write the centroid-partitioned codes index → probe partition-pruned
    → ADC → exact refine.  Rows-only driver check (KMeans is not
    SQL-expressible); the recall floor is the oracle-bearing
    ``ivfpq_recall_contract``."""
    return ivfpq_topk_frame(spark, _corpus(spark, sf_dir), _ivfpq_path(sf_dir))


#: residual-encoding retention: IVF-PQ must keep at least this share
#: of flat-IVF's hits ON THE SAME probes.  Unlike an absolute recall
#: floor (cell-hit binomial, varies 36-60% across embedding draws —
#: see IVF_RECALL_MIN_PCT), the RATIO isolates quantization loss from
#: probe coverage.  Measured with residual codes at PQ_RERANK=256:
#: 100% on all seven sf0.01-scale survey seeds, 100% on seed-42 sf0.1,
#: 100% on BOTH hard reseeded 2000-vector draws (at the earlier depth
#: 100 those two read 94.7% and 83.3% — per-hit retention was a
#: binomial at top-5% rerank depth, which is why the floor briefly
#: dropped to 85; deepening the constant re-rank list was the right
#: fix, not loosening the contract).  90 leaves a couple-of-losses
#: margin while a residual-encoding regression (a broken encode reads
#: ~0-50%) still trips it.  This is the draw-robust form of the r7
#: directive "raise the floor to the measured residual recall" — an
#: absolute recall floor high enough to certify residual encoding (45)
#: is sunk by a legitimate draw (seed 99: 36%), so the certification
#: lives in the ratio.
IVFPQ_RETENTION_MIN_PCT = 90

_IVFPQ_CONTRACT_ORACLE = f"""{_EXACT_TOPK_CTE}
        SELECT count(DISTINCT query_id) AS n_queries,
               count(*) AS n_exact_rows,
               CAST(sum(CAST(round(sim * 10000) AS BIGINT)) AS BIGINT) AS exact_sim_sum_q4,
               TRUE AS recall_ok,
               TRUE AS retention_ok
        FROM topk
    """


@register(
    "ivfpq_recall_contract",
    oracle=_IVFPQ_CONTRACT_ORACLE,
    tags=("similarity", "ivf", "pq", "contract"),
)
def ivfpq_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract for ``ivfpq_index_topk``: DuckDB
    recomputes the exact top-k facts; Spark asserts (a) aggregate
    recall >= IVFPQ_RECALL_MIN_PCT (the probe-coverage floor shared
    with flat IVF) and (b) the residual-encoding guarantee — IVF-PQ
    retains >= IVFPQ_RETENTION_MIN_PCT of flat IVF's hits on the same
    nprobe/IVF_K probes, so quantization loss is certified ~zero
    independent of the embedding draw (see the constant's ladder)."""
    # ONE pinned corpus + ONE guard aggregate (total rows, query-slice
    # rows) instead of three fresh parquet scans — the old shape issued
    # a fresh _corpus scan for each isEmpty() guard plus one more inside
    # cosine_topk / ivfpq_index_topk (ADVICE r13; guide §2.4).  The
    # aggregate also materializes the pin before anything forks on it.
    corpus = pin(_corpus(spark, sf_dir))
    g = corpus.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("vec_id") < N_QUERIES, True)).alias("nq"),
    ).first()
    if not g.n:
        return local_df(spark,
            [(0, 0, None, True, True)],
            "n_queries long, n_exact_rows long, exact_sim_sum_q4 long,"
            " recall_ok boolean, retention_ok boolean",
        )
    # exact baseline over the SAME pinned corpus (expressions identical
    # to cosine_topk — it IS _exact_topk_rounded over a fresh scan)
    exact = pin(_exact_topk_rounded(corpus).select("query_id", "neighbor_id", "sim"))
    path = _ivfpq_path(sf_dir)
    # the exact-baseline materialization is fit-independent — overlap it
    # with the eager index build (guide §2.6, VERDICT r13 item 1) so the
    # exact pass hides behind the KMeans fit + artifact writes
    pq_frame, _ = run_parallel(
        lambda: ivfpq_topk_frame(spark, corpus, path),  # builds the artifact
        lambda: exact.count(),
    )
    pq_hits = pq_frame.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    # flat-IVF retention baseline served from the index's OWN flat store
    # and persisted centers — ann_ivf_topk here re-fit the identical
    # KMeans (same corpus, k, seed) and re-scanned the corpus for
    # nothing (guide §2.4; the ivf_sq8_serve_contract move).  Same
    # assignment (the flat store IS the fit's assignment, doubles
    # roundtrip parquet bit-exactly), same serve path, identical hits.
    if not g.nq:
        # rows but no vec_id < N_QUERIES: ivfpq_topk_frame early-returns
        # WITHOUT building the artifact (KMeans on zero queries has
        # nothing to serve), so there is no meta/flat to read — and no
        # baseline is owed: the exact top-k is empty, every hit count is
        # 0, and both floors hold vacuously (0 >= 0), matching the
        # oracle's literal TRUEs.
        ivf = local_df(spark, [], "query_id long, neighbor_id long")
    else:
        _, centers = ivfpq_load_meta(spark, path)
        ivf = _ivf_flat_serve(
            spark.read.parquet(path + "_flat").select("vec_id", "emb", "centroid"),
            _cent_frame(spark, centers),
        ).select("query_id", "neighbor_id")
    ivf_hits = ivf.join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    e = exact.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact_rows"),
        # integer q4 sum — see _ann_recall_contract for the tie class
        F.sum(F.round(F.col("sim") * 10000).cast("long")).alias(
            "exact_sim_sum_q4"
        ),
    )
    h = pq_hits.agg(F.count("*").alias("n_pq_hits")).crossJoin(
        ivf_hits.agg(F.count("*").alias("n_ivf_hits"))
    )
    return e.crossJoin(h).select(
        "n_queries",
        "n_exact_rows",
        "exact_sim_sum_q4",
        (F.col("n_pq_hits") * 100 >= F.col("n_exact_rows") * IVFPQ_RECALL_MIN_PCT).alias(
            "recall_ok"
        ),
        (
            F.col("n_pq_hits") * 100 >= F.col("n_ivf_hits") * IVFPQ_RETENTION_MIN_PCT
        ).alias("retention_ok"),
    )


# ---------------------------------------------------------------------------
# 7. Round-8 contracts: ADC router parity + incremental index append.
# ---------------------------------------------------------------------------


@register(
    "adc_batch_parity_contract",
    oracle=f"""
        SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < {N_QUERIES})
                    * (count(*) - 1) AS BIGINT) AS n_scored,
               true AS paths_identical
        FROM embeddings
    """,
    tags=("similarity", "pq", "adc", "contract"),
)
def adc_batch_parity_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract for the ADC router (r8): the literal
    form (lookup tables compiled into the plan) and the batch-serving
    form (the same tables as ONE broadcast row) must score every
    (query, neighbor) pair BIT-identically — same lookups, same
    accumulation order, only where the table lives differs.  Output:
    (n_scored, paths_identical); n_scored = |Q|·(n−1) (self-pairs
    dropped) is what DuckDB recomputes.  The equality is checked with
    one anti-join in each direction on the full scored row (query,
    neighbor, sim), so ANY diverging double fails the contract — this
    is the cross-engine twin of
    tests/test_similarity.py::test_adc_literal_and_batch_paths_identical."""
    corpus = pin(_corpus(spark, sf_dir))
    qrows = sorted(
        corpus.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb").collect()
    )
    if not qrows:
        return local_df(spark, 
            [(0, True)], "n_scored long, paths_identical boolean"
        )
    books = _pq_codebooks(corpus)
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    qnorm = np.sqrt((Q * Q).sum(1))
    coded = pin(
        corpus.select(
            F.col("vec_id").alias("neighbor_id"),
            _pq_encode(books)(F.col("emb")).alias("codes"),
        )
    )
    # pin both scored frames: each feeds two anti-join counts (and lit a
    # third count) — without the barrier the ADC scoring pipeline re-ran
    # per consumer (the serve-contract built/loaded pattern, F2)
    lit = pin(_adc_explode(coded, books, Q, qids, qnorm, use_literal=True))
    bat = pin(_adc_explode(coded, books, Q, qids, qnorm, use_literal=False))
    cols = ["query_id", "neighbor_id", "adc_sim"]
    only_lit = lit.join(bat, cols, "left_anti").count()
    only_bat = bat.join(lit, cols, "left_anti").count()
    n = lit.count()
    return local_df(spark, 
        [(n, only_lit == 0 and only_bat == 0)],
        "n_scored long, paths_identical boolean",
    )


def _assign_centroids(centers: "np.ndarray"):
    """Arrow UDF: embedding -> nearest coarse-cell id (argmin Euclidean
    via the same argmax identity PQ encoding uses; one GEMM per batch
    against the KB-sized centroid matrix)."""

    @F.pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:  # np.stack raises on an empty Arrow batch
            return pd.Series([], dtype="int32")
        X = np.stack(emb.to_numpy())
        return pd.Series(
            np.argmax(X @ centers.T - (centers * centers).sum(1) / 2.0, axis=1).astype(
                "int32"
            )
        )

    return assign


#: holdout appended incrementally in ``ivfpq_index_append`` — the
#: newest IVFPQ_APPEND_N vec_ids arrive AFTER the index is built.
IVFPQ_APPEND_N = 20


@register(
    "ivfpq_index_append",
    # serve coverage is a Spark-computed BOOLEAN, not a pinned
    # |Q|·TOP_K product: the exact expected row count is
    # Σ_q min(TOP_K, non-self vectors in q's probed cells), which a
    # skewed KMeans/cell draw legitimately moves — pinning the product
    # in SQL was the same fixture-draw-shape bet the r8 reseeds retired
    # for the recall floors.
    oracle=f"""
        WITH m AS (SELECT max(vec_id) AS mx, count(*) AS n FROM embeddings)
        SELECT CAST(n - (SELECT count(*) FROM embeddings, m
                         WHERE vec_id > mx - {IVFPQ_APPEND_N}) AS BIGINT)
                   AS n_base,
               CAST((SELECT count(*) FROM embeddings, m
                     WHERE vec_id > mx - {IVFPQ_APPEND_N}) AS BIGINT)
                   AS n_appended,
               CAST(n AS BIGINT) AS n_index,
               true AS serve_complete,
               true AS codes_valid
        FROM m
    """,
    tags=("similarity", "ivf", "pq", "maintenance", "incremental"),
)
def ivfpq_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF-PQ maintenance (the faiss ``add()``-after-
    ``train()`` lifecycle): build the index on the corpus MINUS the
    newest IVFPQ_APPEND_N vectors, then append those by encoding with
    the EXISTING codebooks/centroids — assign each new vector to its
    nearest coarse cell (one Arrow GEMM against the KB centroid
    matrix), residual-encode, and ``mode("append")`` into the
    centroid-partitioned codes + flat tables.  No re-fit, no rewrite of
    existing partitions: at 100 TB this is how a live index absorbs a
    day's new embeddings — append cost is sized by the DELTA only.

    Contract row: base/appended/total index row counts (DuckDB-
    recomputable) plus serve_complete — a post-append serve returns
    EXACTLY Σ_q min(TOP_K, non-self vectors in q's probed cells) rows,
    the draw-robust form of "the appended rows are visible to the
    probe path" (expected count computed from the index's own cell
    sizes, never pinned in SQL) — and codes_valid
    (every stored code array is PQ_M codes in [0, PQ_K)).  Quantization
    drift is the known cost of append-without-refit (codebooks were fit
    pre-append); the recall story stays with ``ivfpq_recall_contract``.
    Reference scope: the reference re-embeds into pgvector row by row
    (ollama_consumer.py:234) with no index lifecycle at all."""
    import shutil

    corpus = pin(_corpus(spark, sf_dir))
    stats = corpus.agg(
        F.max("vec_id").alias("mx"), F.count("*").alias("n")
    ).collect()[0]
    if stats.n == 0:
        return local_df(spark, 
            [(0, 0, 0, True, True)],
            "n_base long, n_appended long, n_index long,"
            " serve_complete boolean, codes_valid boolean",
        )
    cut = int(stats.mx) - IVFPQ_APPEND_N  # newest N ids are the delta
    base = corpus.filter(F.col("vec_id") <= cut)
    delta = corpus.filter(F.col("vec_id") > cut)
    path = _ivfpq_path(sf_dir) + "_append"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_flat", ignore_errors=True)
    books, centers = ivfpq_build_index(spark, base, path)
    coded_delta = delta.select(
        "vec_id", _assign_centroids(centers)(F.col("emb")).alias("centroid"), "emb"
    )
    coded_delta.select(
        "vec_id",
        "centroid",
        _pq_encode_residual(books, centers)(F.col("emb"), F.col("centroid")).alias(
            "codes"
        ),
    ).write.mode("append").partitionBy("centroid").parquet(path)
    coded_delta.select("vec_id", "emb", "centroid").write.mode("append").partitionBy(
        "centroid"
    ).parquet(path + "_flat")

    idx = spark.read.parquet(path)
    ok = idx.agg(
        F.min(
            (F.size("codes") == PQ_M)
            & F.forall("codes", lambda c: (c >= 0) & (c < PQ_K))
        ).alias("ok")
    ).collect()[0].ok
    qrows = sorted(
        corpus.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb").collect()
    )
    serve_rows = ivfpq_serve(spark, path, books, centers, qrows).count()
    expected = _serve_expected(idx, centers, qrows)
    return local_df(spark, 
        [
            (
                int(base.count()),
                int(delta.count()),
                int(idx.count()),
                bool(serve_rows == expected),
                bool(ok),
            )
        ],
        "n_base long, n_appended long, n_index long,"
        " serve_complete boolean, codes_valid boolean",
    )


@register(
    "ivfpq_serve_contract",
    # all three guarantees are engine-computed booleans (the serve
    # output itself is KMeans-shaped and not SQL-derivable); n_queries
    # anchors the row to the data.  This is VERDICT r8 item 6: the
    # serving layout driver-certified as its own query, not only as a
    # leg of ivfpq_index_topk.
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               true AS state_roundtrip_ok,
               true AS serve_complete
        FROM embeddings WHERE vec_id < {N_QUERIES}
    """,
    tags=("similarity", "ivf", "pq", "serving", "contract"),
    bench2=True,
)
def ivfpq_serve_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving layer certified end-to-end as a lifecycle: build the
    index artifact (codes + flat + persisted quantizer meta), COLD-START
    a second server by reloading the quantizer state from disk
    (``ivfpq_load_meta`` — no corpus scan, no KMeans), and assert

    - state_roundtrip_ok: the reloaded server's (query_id, neighbor_id,
      rank, sim) rows are IDENTICAL to the builder's — doubles
      roundtrip parquet bit-exactly, so any divergence means the
      serving state is not self-contained;
    - serve_complete: the serve returns exactly
      Σ_q min(TOP_K, non-self vectors in q's probed cells) rows,
      computed from the index's own cell sizes (draw-robust).

    At 100 TB this is the property that matters operationally: the
    query tier restarts from the stored artifact alone, while the
    recall story stays with ``ivfpq_recall_contract`` and the
    sub-linear serve cost with the scale sweep's ``ivfpq_serve`` row
    (alpha 0.33).  Reference scope: the reference has no index
    lifecycle at all (pgvector column writes, ollama_consumer.py:234).
    """
    import shutil

    corpus = pin(_corpus(spark, sf_dir))
    qrows = sorted(
        corpus.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb").collect()
    )
    if not qrows:
        return local_df(spark, 
            [(0, True, True)],
            "n_queries long, state_roundtrip_ok boolean, serve_complete boolean",
        )
    path = _ivfpq_path(sf_dir) + "_serve"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_flat", ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    books, centers = ivfpq_build_index(spark, corpus, path)
    books2, centers2 = ivfpq_load_meta(spark, path)

    # pin both serve outputs: built feeds two anti-join counts and
    # loaded three consumers — without the barrier each count re-ran
    # the whole serve pipeline (codes scan + ADC + window + refine).
    # CONSTRUCTION lives inside the legs: building a serve frame is
    # ~0.5 s of driver-side py4j/analysis that overlaps the other
    # legs' cluster work when run from the pool threads (guide §2.6 —
    # phase-timed serially at ~1.0 s for the pair before this move).
    def built_leg() -> tuple[DataFrame, int]:
        b = pin(ivfpq_serve(spark, path, books, centers, qrows))
        return b, b.count()

    def loaded_leg() -> tuple[DataFrame, int]:
        ld = pin(ivfpq_serve(spark, path, books2, centers2, qrows))
        return ld, ld.count()

    (built, _), (loaded, n_loaded), expected = run_parallel(
        built_leg,
        loaded_leg,
        lambda: _serve_expected(spark.read.parquet(path), centers2, qrows),
    )
    cols = built.columns
    only_built, only_loaded = run_parallel(
        lambda: built.join(loaded, cols, "left_anti").count(),
        lambda: loaded.join(built, cols, "left_anti").count(),
    )
    return local_df(spark, 
        [
            (
                len(qrows),
                only_built == 0 and only_loaded == 0,
                n_loaded == expected,
            )
        ],
        "n_queries long, state_roundtrip_ok boolean, serve_complete boolean",
    )


@register(
    "hard_negative_mining",
    oracle=f"""
        WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
             c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
                   FROM embeddings),
             sims AS (
                 SELECT a.vec_id AS anchor_id, c.vec_id AS neighbor_id,
                        list_cosine_similarity(a.emb, c.emb) AS sim
                 FROM a JOIN c
                   ON a.vec_id <> c.vec_id AND a.label <> c.label
             )
        SELECT anchor_id, neighbor_id,
               CAST(round(sim * 10000) AS BIGINT) AS sim_q4,
               CAST(rank AS INT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                           ORDER BY sim DESC, neighbor_id) AS rank
              FROM sims)
        WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "contrastive", "training-data"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR / SimCSE
    data-prep step, public): for each anchor vector, the TOP_K most
    similar vectors whose LABEL DIFFERS — the negatives that sit
    closest to the decision boundary and therefore carry the gradient
    signal in-batch random negatives lack.

    Scale shape (the cosine_topk pattern, label-aware): anchors
    broadcast with their labels, the corpus streams through ONCE, and
    the label-mismatch predicate lives in the join condition so
    same-label rows are dropped before any scoring or shuffle; the
    per-anchor top-k is the only exchange.  At 100 TB with a large
    anchor set, swap the broadcast for the IVF-PQ index route
    (``ivfpq_serve``) and post-filter probed candidates by label —
    same contract, sub-linear scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("emb"), "label"
    )
    anchors = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("emb").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    sims = corpus.join(
        F.broadcast(anchors),
        (F.col("vec_id") != F.col("anchor_id"))
        & (F.col("label") != F.col("a_label")),
    ).select(
        "anchor_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("a_emb"), F.col("emb")).alias("sim"),
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        # emit the similarity on the q4 INTEGER lattice (VERDICT r9
        # item 3): round(double, 4) emits a decimal-lattice double and
        # that whole class half-tie-breaks per engine (finding 13);
        # round(sim*10000) as BIGINT is tie-free — ordering still uses
        # the raw double, bit-identical cross-engine
        .select(
            "anchor_id",
            "neighbor_id",
            F.round(F.col("sim") * 10000).cast("long").alias("sim_q4"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# OPQ — Optimized Product Quantization (Ge, He, Ke, Sun, CVPR 2013).
# Learn an ORTHOGONAL rotation R that re-mixes dimensions before the
# PQ subspace split so each subspace carries balanced variance, then
# quantize the rotated vectors.  Training alternates two exact steps
# on a bounded sample (the faiss OPQMatrix recipe, public):
#   (a) fixed R: train PQ codebooks on X·R (seeded Lloyd's per
#       subspace) and encode — reconstruction X̂ in rotated space;
#   (b) fixed codes: orthogonal Procrustes — R ← U·Vᵀ from the SVD of
#       Xᵀ·X̂ minimizes ‖X·R − X̂‖_F over orthogonal matrices exactly.
# Reference parity anchor: the reference stores raw pgvector
# embeddings (ollama_consumer.py:234) — rotation-optimized codes are
# engine-side capability beyond it, same class as the PQ/IVF-PQ path.
# ---------------------------------------------------------------------------

#: alternations of (re-fit codebooks, Procrustes re-rotate).  Iteration
#: 0 runs with R = I and IS plain PQ, so best-so-far tracking makes
#: the trained OPQ sample-SSE <= plain PQ sample-SSE BY CONSTRUCTION
#: (a later iteration only replaces the incumbent when strictly
#: better); Lloyd's-from-scratch per iteration does not guarantee
#: monotone descent, so the guarantee lives in the tracking, not in
#: hope.  5 alternations is the knee on every fixture draw measured.
OPQ_ITERS = 5

#: corpus-SSE slack for the distributed audit boolean.  At every test
#: SF the training sample (PQ_FIT_SAMPLE = 50k) CONTAINS the whole
#: embeddings table, so corpus SSE == sample SSE and the OPQ <= plain
#: inequality is exact; at real scale (sample < corpus) the encode
#: generalizes statistically and 5% slack is the honest bound — a
#: broken rotation (non-orthogonal R, mis-sliced subspace) blows SSE
#: up by orders of magnitude, which this still trips loudly.
OPQ_CORPUS_SSE_SLACK = 1.05


def _opq_fit(X: "np.ndarray") -> tuple:
    """Alternating OPQ fit on a driver-resident sample.  Returns
    ``(R, opq_books, plain_books, plain_sse, opq_sse)`` where the
    plain pair is iteration 0 (R = I, i.e. ordinary PQ with this
    module's seeded codebook fit) and the OPQ pair is the best
    (R, books) over OPQ_ITERS alternations; ``opq_sse <= plain_sse``
    always (best-so-far includes iteration 0).  SSE is measured in
    rotated space, which equals original-space SSE because R is
    orthogonal: ‖X·R − X̂‖² = ‖X − X̂·Rᵀ‖²."""
    d = X.shape[1]
    sub = d // PQ_M

    def fit_books(Xr):
        return [
            _np_kmeans(Xr[:, m * sub : (m + 1) * sub], PQ_K, seed=42 + m)
            for m in range(PQ_M)
        ]

    def reconstruct(Xr, books):
        # copy, not empty_like: if d were ever not divisible by PQ_M,
        # the tail columns beyond PQ_M*sub must reconstruct as identity
        # (zero residual), not uninitialized memory feeding the SSE and
        # the Procrustes SVD (ADVICE r10)
        recon = Xr.copy()
        for m, C in enumerate(books):
            Xm = Xr[:, m * sub : (m + 1) * sub]
            codes = np.argmax(Xm @ C.T - (C * C).sum(1) / 2.0, axis=1)
            recon[:, m * sub : (m + 1) * sub] = C[codes]
        return recon

    R = np.eye(d)
    best = None
    plain_books = None
    plain_sse = None
    for it in range(OPQ_ITERS):
        Xr = X @ R
        books = fit_books(Xr)
        recon = reconstruct(Xr, books)
        sse = float(((Xr - recon) ** 2).sum())
        if it == 0:
            plain_books, plain_sse = books, sse
        if best is None or sse < best[2]:
            best = (R.copy(), books, sse)
        # orthogonal Procrustes: argmin_R ||X R - recon||_F = U Vt
        # from SVD(X^T recon) — exact, no step size, no line search
        U, _s, Vt = np.linalg.svd(X.T @ recon)
        R = U @ Vt
    R_best, books_best, opq_sse = best
    return R_best, books_best, plain_books, plain_sse, opq_sse


def _pq_sq_err(books: list, R: "np.ndarray | None" = None):
    """Arrow UDF: embedding -> PQ squared reconstruction error (after
    optional rotation R).  One GEMM per batch per subspace — the same
    vectorized shape as ``_pq_encode``, so the corpus audit is a
    single distributed pass with zero joins."""
    sub = books[0].shape[1]

    @F.pandas_udf("double")
    def err(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=float)
        X = np.stack(emb.to_numpy())
        if R is not None:
            X = X @ R
        e = np.zeros(len(X))
        for m, C in enumerate(books):
            Xm = X[:, m * sub : (m + 1) * sub]
            codes = np.argmax(Xm @ C.T - (C * C).sum(1) / 2.0, axis=1)
            diff = Xm - C[codes]
            e += (diff * diff).sum(1)
        return pd.Series(e)

    return err


@register(
    "opq_rotation_contract",
    oracle=f"""
        SELECT count(*) AS n_vectors,
               CAST({PQ_M} AS INT) AS n_subspaces,
               TRUE AS rotation_orthogonal_ok,
               TRUE AS opq_train_sse_le_plain,
               TRUE AS opq_corpus_sse_ok
        FROM embeddings
    """,
    tags=("similarity", "pq", "opq", "contract"),
)
def opq_rotation_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable OPQ contract (VERDICT r9 item 4's named
    candidate): DuckDB recomputes the corpus count; Spark asserts

    - ``rotation_orthogonal_ok``: ‖RᵀR − I‖_max < 1e-8 (Procrustes
      returns U·Vᵀ, orthogonal by construction — a regression here
      means the SVD update got mangled);
    - ``opq_train_sse_le_plain``: trained OPQ sample-SSE <= plain PQ
      sample-SSE, EXACT by best-so-far tracking (iteration 0 is plain
      PQ), draw-independent — no floor calibration needed;
    - ``opq_corpus_sse_ok``: the DISTRIBUTED corpus audit — both
      encoders applied to every vector in one Arrow pass (two UDF
      columns, zero joins, one 1-row aggregate), OPQ SSE within
      OPQ_CORPUS_SSE_SLACK of plain (exact <= at test SFs where the
      training sample contains the corpus; see the constant).

    100 TB shape: fit is flat-cost on the bounded PQ_FIT_SAMPLE
    (sample-train is the published OPQ practice — faiss OPQMatrix),
    the rotation is a d×d broadcast into the encode UDF (32 KB at
    dim 64), and encode/audit stream the corpus once with map-side
    partial aggregation; nothing scales with corpus size but the
    linear scan itself."""
    corpus = _corpus(spark, sf_dir)
    if corpus.isEmpty():
        return local_df(spark, 
            [(0, PQ_M, True, True, True)],
            "n_vectors long, n_subspaces int, rotation_orthogonal_ok boolean,"
            " opq_train_sse_le_plain boolean, opq_corpus_sse_ok boolean",
        )
    rows = (
        corpus.select(
            F.col("emb").alias("e"), F.md5(F.col("vec_id").cast("string")).alias("o")
        )
        .sort("o")
        .limit(PQ_FIT_SAMPLE)
        .select("e")
        .collect()
    )
    X = np.stack([np.asarray(r[0], dtype=float) for r in rows])
    R, opq_books, plain_books, plain_sse, opq_sse = _opq_fit(X)
    d = X.shape[1]
    orthogonal = bool(np.abs(R.T @ R - np.eye(d)).max() < 1e-8)
    return (
        corpus.select(
            _pq_sq_err(plain_books)(F.col("emb")).alias("plain_err"),
            _pq_sq_err(opq_books, R)(F.col("emb")).alias("opq_err"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("plain_err").alias("sse_plain"),
            F.sum("opq_err").alias("sse_opq"),
        )
        .select(
            F.col("n").alias("n_vectors"),
            F.lit(PQ_M).alias("n_subspaces"),
            F.lit(orthogonal).alias("rotation_orthogonal_ok"),
            F.lit(bool(opq_sse <= plain_sse)).alias("opq_train_sse_le_plain"),
            (F.col("sse_opq") <= F.col("sse_plain") * OPQ_CORPUS_SSE_SLACK).alias(
                "opq_corpus_sse_ok"
            ),
        )
    )


def _rotate_embeddings(R: "np.ndarray"):
    """Arrow UDF: embedding -> embedding · R (one GEMM per batch; R is
    a d×d closure broadcast — 32 KB at dim 64).  The OPQ pre-transform
    applied corpus-wide, the faiss ``OPQMatrix`` chain position."""

    @F.pandas_udf("array<double>")
    def rot(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(emb.to_numpy())
        return pd.Series(list(X @ R))

    return rot


def _exact_topk_frame(corpus: DataFrame) -> DataFrame:
    """Brute-force cosine top-k over an arbitrary (vec_id, emb) frame —
    the cosine_topk shape (broadcast queries, one corpus pass, one
    per-query window), reusable for transformed corpora."""
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    sims = corpus.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("emb")).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim")
    )


#: Benign boundary band for rotation-preservation checks: an orthogonal
#: rotation preserves inner products only up to float round-off
#: (~1e-15/term, d=64 → well under 1e-12 per cosine), so a rank-K/K+1
#: pair whose margin falls below round-off may legitimately swap sides.
#: 1e-9 is three orders above worst-case noise yet six below any real
#: fixture margin (~1e-3); a mangled rotation perturbs sims at O(1) and
#: still fires the detector (pytest-proven on a rank-deficient fake).
ROTATION_TIE_EPS = 1e-9


def _rotation_mismatches(exact: DataFrame, exact_rot: DataFrame) -> DataFrame:
    """Symmetric difference of two exact top-k sets, excluding pairs
    within ROTATION_TIE_EPS of the per-query rank-K sim (draw-dependent
    degenerate margins must not flip the contract — ADVICE r10).  Side
    markers, NOT null key columns: a USING-style full outer join
    coalesces the join keys, so key-null filtering would never fire."""
    kth = exact.groupBy("query_id").agg(F.min("sim").alias("kth_sim"))
    return (
        exact.select("query_id", "neighbor_id", F.col("sim").alias("sim_orig"))
        .withColumn("in_orig", F.lit(1))
        .join(
            exact_rot.select(
                "query_id", "neighbor_id", F.col("sim").alias("sim_rot")
            ).withColumn("in_rot", F.lit(1)),
            ["query_id", "neighbor_id"],
            "full_outer",
        )
        .filter(F.col("in_orig").isNull() | F.col("in_rot").isNull())
        .join(kth, "query_id")
        .filter(
            F.abs(F.coalesce("sim_orig", "sim_rot") - F.col("kth_sim"))
            > ROTATION_TIE_EPS
        )
    )


@register(
    "opq_ivfpq_serve_contract",
    oracle=f"""{_EXACT_TOPK_CTE}
        SELECT count(DISTINCT query_id) AS n_queries,
               count(*) AS n_exact_rows,
               CAST(sum(CAST(round(sim * 10000) AS BIGINT)) AS BIGINT) AS exact_sim_sum_q4,
               TRUE AS rotation_preserves_exact_topk,
               TRUE AS recall_ok
        FROM topk
    """,
    tags=("similarity", "ivf", "pq", "opq", "contract"),
)
def opq_ivfpq_serve_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ composed with IVF-PQ serving — the faiss ``OPQ<M>,IVF<K>,
    PQ<M>`` index-factory chain (public): learn the Procrustes rotation
    on the bounded sample, rotate the corpus (one Arrow GEMM pass),
    build the residual IVF-PQ index IN ROTATED SPACE, and serve the
    rotated queries against it.  DuckDB recomputes the exact top-k
    facts in ORIGINAL space; Spark asserts

    - ``rotation_preserves_exact_topk``: the exact top-k SETS in
      rotated space equal the original-space sets per query — the
      orthogonality guarantee AT THE SERVING LAYER (R preserves every
      inner product up to last-ulp float noise; the fixture's top-k
      margins are ~1e-3, nine orders above it).  A mangled rotation
      (non-orthogonal, wrong transpose) fails this exactly.
    - ``recall_ok``: the OPQ-IVFPQ chain's served hits clear the same
      IVFPQ_RECALL_MIN_PCT floor as the unrotated index — rotation
      re-mixes the draw but the cell-hit binomial is distributionally
      identical (the multi-seed survey behind the floor applies
      verbatim).

    100 TB shape: identical to ``ivfpq_index_topk`` plus one flat
    rotate pass at build and a d×d GEMM per query batch at serve; the
    rotation changes NO cost term (same pruned probe reads, same ADC,
    same bounded re-rank).  The exact passes here are contract
    apparatus, not the serving path."""
    corpus = _corpus(spark, sf_dir)
    if corpus.isEmpty():
        return local_df(spark, 
            [(0, 0, None, True, True)],
            "n_queries long, n_exact_rows long, exact_sim_sum_q4 long,"
            " rotation_preserves_exact_topk boolean, recall_ok boolean",
        )
    sample = (
        corpus.select(
            F.col("emb").alias("e"), F.md5(F.col("vec_id").cast("string")).alias("o")
        )
        .sort("o")
        .limit(PQ_FIT_SAMPLE)
        .select("e")
        .collect()
    )
    X = np.stack([np.asarray(r[0], dtype=float) for r in sample])
    R = _opq_fit(X)[0]
    rotated = pin(corpus.select("vec_id", _rotate_embeddings(R)(F.col("emb")).alias("emb")))

    exact = pin(cosine_topk(spark, sf_dir).select("query_id", "neighbor_id", "sim"))
    exact_rot = _exact_topk_frame(rotated)
    # set equality per query == symmetric difference is empty (both
    # sides are exactly N_QUERIES * TOP_K rows by construction), with
    # sub-round-off boundary pairs excluded (see _rotation_mismatches).
    mismatches = _rotation_mismatches(exact, exact_rot)
    served = ivfpq_topk_frame(
        spark, rotated, _ivfpq_path(sf_dir) + "_opq"
    ).select("query_id", "neighbor_id")
    hits = served.join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    e = exact.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact_rows"),
        F.sum(F.round(F.col("sim") * 10000).cast("long")).alias("exact_sim_sum_q4"),
    )
    checks = mismatches.agg(F.count("*").alias("n_mismatch")).crossJoin(
        hits.agg(F.count("*").alias("n_hits"))
    )
    return e.crossJoin(checks).select(
        "n_queries",
        "n_exact_rows",
        "exact_sim_sum_q4",
        (F.col("n_mismatch") == 0).alias("rotation_preserves_exact_topk"),
        (
            F.col("n_hits") * 100 >= F.col("n_exact_rows") * IVFPQ_RECALL_MIN_PCT
        ).alias("recall_ok"),
    )


# ---------------------------------------------------------------------------
# 11. SQ8 scalar quantization serving — the faiss "SQ8" codec (public:
#     faiss ScalarQuantizer QT_8bit; per-dim affine min/max codec),
#     completing the quantizer family beside Flat / SRP-LSH / IVF / PQ /
#     residual IVF-PQ / OPQ.  Unlike PQ (codebook kmeans on subspaces),
#     SQ8 is training-trivial — a per-DIMENSION (min, max) pair — which
#     makes it the quantizer of choice when refit cadence matters more
#     than compression ratio (4x vs PQ's 32x here).
# ---------------------------------------------------------------------------

SQ_LEVELS = 255  # 8-bit affine codes 0..255
SQ_RERANK = 64  # exact re-rank depth per query (same refine shape as PQ)

#: aggregate-recall floor for the SQ8+refine chain.  With 8 bits/dim
#: the per-cosine quantization error is O(range/255) ~ 1e-3 while the
#: rank-SQ_RERANK→rank-TOP_K margin on the fixture family is ~5e-2, so
#: the refine step recovers the exact top-k on every surveyed draw
#: (100% at seeds 42/777/1234/555/31337 and the virgin gate seed); 90
#: sits far under the surveyed band while a real codec regression
#: (wrong scale, transposed dims) reads ~0-20%.
SQ8_RECALL_MIN_PCT = 90


def _sq8_path(sf_dir: str) -> str:
    import ssafynews_data_spark

    root = os.path.dirname(
        os.path.dirname(os.path.abspath(ssafynews_data_spark.__file__))
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(root, "spark-warehouse", f"sq8_index_{tag}")


def sq8_train(corpus: DataFrame) -> tuple["np.ndarray", "np.ndarray"]:
    """Per-dimension (min, max) over the corpus — ONE posexplode
    aggregation whose output is d rows regardless of corpus size (the
    map-side partial combine reduces each task to d rows before the
    shuffle), then a d-row collect.  Deterministic: min/max need no
    sample and no seed."""
    stats = (
        corpus.select(F.posexplode("emb").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("vmin"), F.max("x").alias("vmax"))
        .collect()
    )
    vmin = np.array([r.vmin for r in sorted(stats, key=lambda r: r.dim)])
    vmax = np.array([r.vmax for r in sorted(stats, key=lambda r: r.dim)])
    return vmin, vmax


def _sq8_lit(arr: "np.ndarray") -> Column:
    return F.array(*[F.lit(float(v)) for v in arr])


def _arr_sql(arr) -> str:
    """A double array literal as SQL text.  ``repr`` round-trips every
    finite double exactly (and Spark's parser, like Java's
    ``parseDouble``, is correctly rounded), so the parsed literal holds
    the same bits ``F.lit(float(v))`` would — one parse instead of one
    py4j call per element (guide §7.3)."""
    return "array(" + ", ".join(f"{float(v)!r}D" for v in arr) + ")"


def _arr2_sql(mat) -> str:
    """2-D double array literal as SQL text (see :func:`_arr_sql`)."""
    return "array(" + ", ".join(_arr_sql(row) for row in mat) + ")"


def _sq8_encode_sql(vmin: "np.ndarray", vmax: "np.ndarray", col: str = "emb") -> str:
    """SQL twin of :func:`_sq8_encode` — same affine round-to-nearest
    expression on the same literal doubles, one parse instead of ~130
    per-element F.lit calls.  Bit-identity with the Column form is
    pinned by test_sq8_sql_twins_match_column_forms."""
    lo, rng = _arr_sql(vmin), _arr_sql(vmax - vmin)
    return (
        f"transform({col}, (x, i) -> CASE WHEN element_at({rng}, i + 1) > 0.0D"
        f" THEN CAST(round((x - element_at({lo}, i + 1))"
        f" * {SQ_LEVELS} / element_at({rng}, i + 1)) AS INT)"
        f" ELSE 0 END)"
    )


def _sq8_encode(
    vmin: "np.ndarray", vmax: "np.ndarray", col: Column | None = None
) -> Column:
    """codes[i] = round(SQ_LEVELS * (x[i]-vmin[i]) / (vmax[i]-vmin[i])),
    constant dims encode as 0 — row-local whole-stage-codegen array
    math (transform with index), no UDF."""
    lo, rng = _sq8_lit(vmin), _sq8_lit(vmax - vmin)
    return F.transform(
        F.col("emb") if col is None else col,
        lambda x, i: F.when(
            F.element_at(rng, i + 1) > 0.0,
            F.round(
                (x - F.element_at(lo, i + 1))
                * SQ_LEVELS
                / F.element_at(rng, i + 1)
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )


def _sq8_const_row(
    spark: SparkSession,
    vmin: "np.ndarray",
    vmax: "np.ndarray",
    centers: "np.ndarray | None" = None,
) -> DataFrame:
    """The SQ8 quantizer constants as ONE broadcastable row — data, not
    plan literals (the ADC-router move, F11/r13): at dim 64 the literal
    arrays made a serve plan cost more to analyze/codegen than to
    execute (measured 1.14 → 0.83 s per ivf-sq8 serve pass, identical
    rows).  Columns: ``_lo``, ``_rng`` (+ ``_cent`` when the centroid
    matrix is needed).  Same doubles as the literal form, so every
    downstream value is bit-identical; the literal helpers remain for
    the one-pass build/encode paths where plan cost is paid once."""
    row: tuple = (
        [float(x) for x in vmin],
        [float(x) for x in (vmax - vmin)],
    )
    schema = "_lo array<double>, _rng array<double>"
    if centers is not None:
        row = row + (
            [[float(x) for x in centers[c]] for c in range(centers.shape[0])],
        )
        schema += ", _cent array<array<double>>"
    return local_df(spark, [row], schema)


def _sq8_dequant_col(col: Column | None = None) -> Column:
    """The SQ8 affine dequant (the inverse of ``_sq8_encode``) against
    the ``_sq8_const_row`` columns instead of plan literals — identical
    arithmetic on identical doubles."""
    return F.transform(
        F.col("codes") if col is None else col,
        lambda c, i: F.element_at(F.col("_lo"), i + 1)
        + c.cast("double") * F.element_at(F.col("_rng"), i + 1) / SQ_LEVELS,
    )


def _sq8_dequant_sql(col: str = "codes") -> str:
    """SQL twin of :func:`_sq8_dequant_col` — same affine expression
    (lo[i] + c·rng[i]/SQ_LEVELS, identical association), one parse
    instead of a transform-with-index Column build (guide §7.3)."""
    return (
        f"transform({col}, (c, i) -> element_at(_lo, i + 1)"
        f" + CAST(c AS DOUBLE) * element_at(_rng, i + 1) / {SQ_LEVELS})"
    )


def sq8_build_index(
    spark: SparkSession, corpus: DataFrame, path: str
) -> tuple["np.ndarray", "np.ndarray"]:
    """Train (one d-row agg) → persist quantizer meta (d rows: dim,
    vmin, vmax — the KB-sized cold-start artifact) → encode the corpus
    row-locally and write (vec_id, codes) plus the flat refine
    companion.  At 100 TB the codes file is the 4x-smaller scan set;
    the flat file is touched only for SQ_RERANK candidates per query."""
    # the flat refine companion never consumes the quantizer — write it
    # CONCURRENTLY with the d-row train aggregate (guide §2.6); the
    # codec-dependent codes + meta writes then overlap each other.
    # (Serving callers pass the already-materialized pinned corpus, so
    # the two legs read the cache rather than racing to build it.)
    (vmin, vmax), _ = run_parallel(
        lambda: sq8_train(corpus),
        lambda: corpus.select("vec_id", "emb")
        .write.mode("overwrite")
        .parquet(path + "_flat"),
    )
    run_parallel(
        lambda: local_df(
            spark,
            [(i, float(vmin[i]), float(vmax[i])) for i in range(len(vmin))],
            "dim int, vmin double, vmax double",
        )
        .write.mode("overwrite")
        .parquet(path + "_meta"),
        lambda: corpus.selectExpr(
            "vec_id", f"{_sq8_encode_sql(vmin, vmax)} AS codes"
        )
        .write.mode("overwrite")
        .parquet(path),
    )
    return vmin, vmax


def sq8_load_meta(spark: SparkSession, path: str) -> tuple["np.ndarray", "np.ndarray"]:
    rows = sorted(spark.read.parquet(path + "_meta").collect(), key=lambda r: r.dim)
    return (
        np.array([r.vmin for r in rows]),
        np.array([r.vmax for r in rows]),
    )


def sq8_serve(
    spark: SparkSession,
    path: str,
    vmin: "np.ndarray",
    vmax: "np.ndarray",
    qrows: list,
) -> DataFrame:
    """Asymmetric serve: float queries against dequantized codes (one
    compressed-scan pass, broadcast query side), cut to SQ_RERANK
    candidates per query, exact re-rank against the flat companion
    fetched for candidates only — the faiss ``SQ8,Refine`` shape."""
    q_emb = local_df(spark,
        [(int(r[0]), [float(x) for x in r[1]]) for r in qrows],
        "query_id long, emb_q array<double>",
    )
    # quantizer constants ride as one broadcast row (see _sq8_const_row)
    codes = (
        spark.read.parquet(path)
        .crossJoin(F.broadcast(_sq8_const_row(spark, vmin, vmax)))
        .selectExpr(
            "vec_id AS neighbor_id",
            f"{_sq8_dequant_sql()} AS emb_hat",
        )
    )
    approx = codes.join(
        F.broadcast(q_emb), F.col("neighbor_id") != F.col("query_id")
    ).selectExpr(
        "query_id",
        "neighbor_id",
        f"{_cosine_sql('emb_q', 'emb_hat')} AS approx_sim",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_sim"), "neighbor_id")
    cand = (
        approx.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= SQ_RERANK)
        .select("query_id", "neighbor_id")
    )
    flat = spark.read.parquet(path + "_flat").select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("emb_n")
    )
    return _exact_rerank_topk(
        flat.join(F.broadcast(cand), "neighbor_id").join(F.broadcast(q_emb), "query_id")
    )


def _sq8_recon_ok(
    codes: DataFrame, corpus: DataFrame, vmin: "np.ndarray", vmax: "np.ndarray"
) -> bool:
    """Round-to-nearest reconstruction bound, checked corpus-wide in
    ONE codegen'd pass: per dim, |x − dequant(code)| ≤ step/2 with
    step = range/SQ_LEVELS (+1 ulp headroom).  Exact by construction
    for a correct codec trained on this corpus; a truncating or
    mis-scaled codec fails it (pytest-proven to fire)."""
    # constants as one broadcast row (see _sq8_const_row); step_i =
    # rng_i / SQ_LEVELS computed element-wise — the same IEEE division
    # the literal form baked in, so the bound is bit-identical
    const = _sq8_const_row(codes.sparkSession, vmin, vmax)
    # whole fold as one parsed string (guide §7.3); float literals are
    # repr-round-tripped so the bound constants are the same doubles
    # the Column form folded in
    slack, eps = (1.0 + 1e-9), 1e-15
    row_ok = (
        f"aggregate("
        f"zip_with("
        f"zip_with(emb, {_sq8_dequant_sql()}, (x, xh) -> abs(x - xh)),"
        f" transform(_rng, r -> r / {SQ_LEVELS}),"
        f" (e, s) -> e <= s / 2.0D * {slack!r}D + {eps!r}D),"
        f" true, (acc, ok) -> acc AND ok)"
    )
    return bool(
        codes.join(corpus, "vec_id")
        .crossJoin(F.broadcast(const))
        .selectExpr(f"{row_ok} AS row_ok")
        .agg(F.min("row_ok").alias("ok"))
        .collect()[0]
        .ok
    )


@register(
    "sq8_serve_contract",
    oracle=f"""{_EXACT_TOPK_CTE}
        SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
               CAST(count(*) AS BIGINT) AS n_exact_rows,
               CAST(sum(CAST(round(sim * 10000) AS BIGINT)) AS BIGINT)
                   AS exact_sim_sum_q4,
               TRUE AS state_roundtrip_ok,
               TRUE AS recon_err_bounded,
               TRUE AS recall_ok
        FROM topk
    """,
    tags=("similarity", "sq8", "quantization", "serving", "contract"),
    bench2=True,
)
def sq8_serve_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 codec + serving lifecycle, driver-certified: build the codes
    + flat + quantizer-meta artifact, COLD-START a second server from
    the meta parquet alone, and assert

    - ``state_roundtrip_ok``: the reloaded server's top-k rows are
      IDENTICAL to the builder's (doubles roundtrip parquet
      bit-exactly; any divergence means serving state isn't
      self-contained);
    - ``recon_err_bounded``: max per-dim |x − dequant(encode(x))| over
      the WHOLE corpus ≤ (vmax−vmin)/SQ_LEVELS/2 (+1 ulp headroom) —
      the round-to-nearest guarantee, exact by construction since the
      codec is trained on the same corpus (no clamping is possible),
      so this boolean is draw-INDEPENDENT: it fails only on a real
      codec bug (wrong scale, swapped dims, truncation-vs-round);
    - ``recall_ok``: the served top-k hits ≥ SQ8_RECALL_MIN_PCT of the
      exact top-k (multi-seed surveyed 100%; see floor comment).

    DuckDB recomputes the exact-side facts (query/row counts, the q4
    integer sim sum).  Reference scope: certifies the quantized-serving
    guarantee behind the reference's pgvector column
    (ollama_consumer.py:234) at a 4x-compressed scan footprint.
    100 TB shape: train is one d-row agg, encode is row-local codegen,
    serve scans codes only (broadcast queries) and touches the flat
    store for Q×SQ_RERANK candidate rows."""
    import shutil

    corpus = pin(_corpus(spark, sf_dir))
    qrows = sorted(
        corpus.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb").collect()
    )
    if not qrows:
        return local_df(spark, 
            [(0, 0, None, True, True, True)],
            "n_queries long, n_exact_rows long, exact_sim_sum_q4 long,"
            " state_roundtrip_ok boolean, recon_err_bounded boolean,"
            " recall_ok boolean",
        )
    path = _sq8_path(sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    shutil.rmtree(path + "_flat", ignore_errors=True)
    # exact baseline over the PINNED corpus (not a fresh parquet scan —
    # guide §2.4; expressions identical to cosine_topk).  Its facts
    # aggregate is build-independent (it reads only the already-
    # materialized corpus pin), so it runs CONCURRENTLY with the whole
    # build instead of serially after it (guide §2.6, VERDICT r13
    # item 1): the exact-topk wall clock hides behind the train+write
    # critical path.
    exact = pin(_exact_topk_rounded(corpus).select("query_id", "neighbor_id", "sim"))
    (vmin, vmax), facts = run_parallel(
        lambda: sq8_build_index(spark, corpus, path),
        lambda: exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count("*").alias("n_exact_rows"),
            F.sum(F.round(F.col("sim") * 10000).cast("long")).alias(
                "exact_sim_sum_q4"
            ),
        ).collect()[0],
    )
    vmin2, vmax2 = sq8_load_meta(spark, path)

    # pin both serve outputs (see ivfpq_serve_contract): each extra
    # consumer otherwise re-ran the dequant scan + window + refine.
    # Construction runs inside the legs so its driver-side py4j cost
    # overlaps the other legs' cluster work (guide §2.6).
    def built_leg() -> DataFrame:
        b = pin(sq8_serve(spark, path, vmin, vmax, qrows))
        b.count()
        return b

    def loaded_leg() -> DataFrame:
        ld = pin(sq8_serve(spark, path, vmin2, vmax2, qrows))
        ld.count()
        return ld

    built, loaded, recon = run_parallel(
        built_leg,
        loaded_leg,
        lambda: _sq8_recon_ok(spark.read.parquet(path), corpus, vmin, vmax),
    )
    cols = built.columns
    only_built, only_loaded, n_hits = run_parallel(
        lambda: built.join(loaded, cols, "left_anti").count(),
        lambda: loaded.join(built, cols, "left_anti").count(),
        lambda: loaded.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count(),
    )
    roundtrip_ok = only_built == 0 and only_loaded == 0
    return local_df(spark, 
        [
            (
                int(facts.n_queries),
                int(facts.n_exact_rows),
                # None when the exact top-k is empty (rows but no
                # vec_id < N_QUERIES) — the oracle emits NULL there too
                int(facts.exact_sim_sum_q4)
                if facts.exact_sim_sum_q4 is not None
                else None,
                bool(roundtrip_ok),
                bool(recon),
                bool(n_hits * 100 >= facts.n_exact_rows * SQ8_RECALL_MIN_PCT),
            )
        ],
        "n_queries long, n_exact_rows long, exact_sim_sum_q4 long,"
        " state_roundtrip_ok boolean, recon_err_bounded boolean,"
        " recall_ok boolean",
    )


# ---------------------------------------------------------------------------
# 12. Contrastive triplet mining (round 11) — the training-data
#     complement of hard_negative_mining: (anchor, positive, negative)
#     triplets with integer-lattice margins, the input shape for
#     triplet/InfoNCE losses (public: FaceNet Schroff et al. 2015;
#     SBERT hard-triplet batching).
# ---------------------------------------------------------------------------


@register(
    "contrastive_triplet_mining",
    oracle=f"""
        WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
             c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
                   FROM embeddings),
             sims AS (
                 SELECT a.vec_id AS anchor_id, c.vec_id AS other_id,
                        a.label = c.label AS same_label,
                        list_cosine_similarity(a.emb, c.emb) AS sim
                 FROM a JOIN c ON a.vec_id <> c.vec_id
             ),
             ranked AS (
                 SELECT *, row_number() OVER (
                            PARTITION BY anchor_id, same_label
                            ORDER BY sim DESC, other_id) AS r
                 FROM sims
             ),
             pos AS (
                 SELECT anchor_id, other_id AS positive_id,
                        CAST(round(sim * 10000) AS BIGINT) AS pos_sim_q4
                 FROM ranked WHERE same_label AND r = 1
             ),
             neg AS (
                 SELECT anchor_id, other_id AS negative_id,
                        CAST(round(sim * 10000) AS BIGINT) AS neg_sim_q4,
                        CAST(r AS INT) AS neg_rank
                 FROM ranked WHERE NOT same_label AND r <= {TOP_K}
             )
        SELECT p.anchor_id, positive_id, negative_id,
               pos_sim_q4, neg_sim_q4,
               pos_sim_q4 - neg_sim_q4 AS margin_q4,
               neg_rank
        FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
    """,
    tags=("similarity", "contrastive", "training-data"),
)
def contrastive_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triplets for contrastive training:
    per anchor, the top-1 SAME-label neighbor (the positive) crossed
    with the TOP_K hardest DIFFERENT-label neighbors (the negatives of
    ``hard_negative_mining``), with similarities and the pos−neg margin
    on the tie-free q4 integer lattice (ordering still uses the raw
    double; the margin is an exact integer difference of already-
    quantized values, so no new rounding class is introduced).

    Plan shape: ONE corpus pass (anchors broadcast into the scan), ONE
    window shuffle keyed (anchor_id, same_label) — both rankings come
    from the same exchange — and a broadcast-sized pos⋈neg join.  At
    100 TB the corpus streams once; everything downstream of the window
    is |anchors|-sized.  Anchors with no same-label sibling drop out of
    the inner join identically in both engines.  Reference scope: the
    reference stores raw pgvector embeddings (ollama_consumer.py:234)
    with no training-pair mining at all."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("emb"), "label"
    )
    anchors = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("emb").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    sims = corpus.join(
        F.broadcast(anchors), F.col("vec_id") != F.col("anchor_id")
    ).select(
        "anchor_id",
        F.col("vec_id").alias("other_id"),
        (F.col("label") == F.col("a_label")).alias("same_label"),
        cosine(F.col("a_emb"), F.col("emb")).alias("sim"),
    )
    w = W.partitionBy("anchor_id", "same_label").orderBy(F.desc("sim"), "other_id")
    ranked = sims.withColumn("r", F.row_number().over(w))
    q4 = F.round(F.col("sim") * 10000).cast("long")
    pos = ranked.filter(F.col("same_label") & (F.col("r") == 1)).select(
        "anchor_id",
        F.col("other_id").alias("positive_id"),
        q4.alias("pos_sim_q4"),
    )
    neg = ranked.filter(~F.col("same_label") & (F.col("r") <= TOP_K)).select(
        "anchor_id",
        F.col("other_id").alias("negative_id"),
        q4.alias("neg_sim_q4"),
        F.col("r").cast("int").alias("neg_rank"),
    )
    # broadcast: pos is ≤ |anchors| rows but sat behind a window +
    # filter, so the planner fell back to sort-merge (guide §3.1)
    return F.broadcast(pos).join(neg, "anchor_id").select(
        "anchor_id",
        "positive_id",
        "negative_id",
        "pos_sim_q4",
        "neg_sim_q4",
        (F.col("pos_sim_q4") - F.col("neg_sim_q4")).alias("margin_q4"),
        "neg_rank",
    )


# ---------------------------------------------------------------------------
# 13. IVF ∘ SQ8 — the faiss "IVF<K>,SQ8" index-factory composition
#     (public): coarse KMeans cells + per-dim affine SQ8 codec over the
#     RESIDUALS, completing the composition matrix beside residual
#     IVF-PQ and OPQ∘IVF-PQ.  Trades PQ's 32x compression for SQ8's 4x
#     in exchange for a training-trivial, refit-friendly codec (a
#     residual min/max pair per dim instead of per-subspace Lloyd's).
# ---------------------------------------------------------------------------


def _centers_lit(centers: "np.ndarray") -> Column:
    return F.array(
        *[
            F.array(*[F.lit(float(x)) for x in centers[c]])
            for c in range(centers.shape[0])
        ]
    )


def ivfsq8_build_index(
    spark: SparkSession, corpus: DataFrame, path: str
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """KMeans(IVF_K) coarse quantizer (same seed-42 fit as IVF-PQ),
    residual SQ8 codec trained in ONE d-row aggregation over the
    residuals, then the same three-artifact layout as IVF-PQ: codes
    partitioned by centroid, the flat refine companion, and the
    KB-sized quantizer meta (centers + residual vmin/vmax).  Returns
    the driver-resident serving state."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.withColumn("vec", array_to_vector(F.col("emb")))
    model = KMeans(
        k=IVF_K, seed=42, featuresCol="vec", predictionCol="centroid"
    ).fit(vecs)
    centers = np.stack(
        [np.asarray(c, dtype=float) for c in model.clusterCenters()]
    )
    # residual vs the own-cell centroid — centroid matrix inlined as one
    # parsed literal (repr-round-tripped doubles; see _arr_sql) instead
    # of ~520 F.lit py4j calls through _centers_lit (guide §7.3)
    assigned = pin(
        model.transform(vecs)
        .select("vec_id", "emb", "centroid")
        .withColumn(
            "res",
            F.expr(
                f"zip_with(emb, element_at({_arr2_sql(centers)},"
                f" centroid + 1), (x, c) -> x - c)"
            ),
        )
    )
    assigned.count()  # materialize once before the consumers fork
    # the flat refine companion never consumes the residual codec —
    # write it CONCURRENTLY with the sq8_train d-row aggregate (guide
    # §2.6); the codec-dependent codes + meta writes then overlap
    (vmin, vmax), _ = run_parallel(
        lambda: sq8_train(assigned.select(F.col("res").alias("emb"))),
        lambda: assigned.select("vec_id", "emb", "centroid")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(path + "_flat"),
    )
    rows = [
        ("center", int(c), [float(x) for x in centers[c]])
        for c in range(centers.shape[0])
    ]
    rows += [
        ("sqmin", -1, [float(x) for x in vmin]),
        ("sqmax", -1, [float(x) for x in vmax]),
    ]
    run_parallel(
        lambda: assigned.select(
            "vec_id", "centroid", F.expr(_sq8_encode_sql(vmin, vmax, "res")).alias("codes")
        )
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(path),
        lambda: local_df(spark, rows, "kind string, m int, vec array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "_meta"),
    )
    return centers, vmin, vmax


def ivfsq8_load_meta(
    spark: SparkSession, path: str
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    rows = spark.read.parquet(path + "_meta").collect()
    centers = np.stack(
        [
            np.asarray(v, dtype=float)
            for _, v in sorted((r.m, r.vec) for r in rows if r.kind == "center")
        ]
    )
    vmin = np.asarray(next(r.vec for r in rows if r.kind == "sqmin"), dtype=float)
    vmax = np.asarray(next(r.vec for r in rows if r.kind == "sqmax"), dtype=float)
    return centers, vmin, vmax


def ivfsq8_serve(
    spark: SparkSession,
    path: str,
    centers: "np.ndarray",
    vmin: "np.ndarray",
    vmax: "np.ndarray",
    qrows: list,
) -> DataFrame:
    """Probe (driver GEMM) → partition-pruned codes read → dequantize
    residual + add back the cell centroid (row-local codegen) → approx
    cosine cut to PQ_RERANK → partition-pruned flat read for the exact
    re-rank.  Identical pruning shape to ``ivfpq_serve``; only the
    scoring swaps ADC lookups for the SQ8 affine reconstruction."""
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    probes = _probe_cells(centers, Q, qids)
    cells = sorted({c for cs in probes.values() for c in cs})

    # quantizer + centroid constants as one broadcast row (see
    # _sq8_const_row) — the literal form's plan compile cost exceeded
    # half the serve pass; the projection itself is one parsed string
    # (guide §7.3 — same expressions as the Column form)
    pruned = (
        spark.read.parquet(path)
        .filter(F.col("centroid").isin(cells))
        .crossJoin(F.broadcast(_sq8_const_row(spark, vmin, vmax, centers)))
        .selectExpr(
            "vec_id AS neighbor_id",
            "centroid",
            f"zip_with({_sq8_dequant_sql()},"
            f" element_at(_cent, centroid + 1), (r, c) -> r + c) AS emb_hat",
        )
    )
    q_emb = local_df(spark,
        [(int(r[0]), [float(x) for x in r[1]]) for r in qrows],
        "query_id long, emb_q array<double>",
    )
    allow_s = "map(" + ", ".join(
        f"{q}, array({', '.join(str(c) for c in probes[q])})" for q in qids
    ) + ")"
    approx = (
        pruned.join(F.broadcast(q_emb), F.col("neighbor_id") != F.col("query_id"))
        .filter(f"array_contains(element_at({allow_s}, query_id), centroid)")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{_cosine_sql('emb_q', 'emb_hat')} AS approx_sim",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_sim"), "neighbor_id")
    cand = (
        approx.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= PQ_RERANK)
        .select("query_id", "neighbor_id")
    )
    flat = (
        spark.read.parquet(path + "_flat")
        .filter(F.col("centroid").isin(cells))
        .select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("emb_n"))
    )
    return _exact_rerank_topk(
        flat.join(F.broadcast(cand), "neighbor_id").join(F.broadcast(q_emb), "query_id")
    )


@register(
    "ivf_sq8_serve_contract",
    oracle=f"""{_EXACT_TOPK_CTE}
        SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
               CAST(count(*) AS BIGINT) AS n_exact_rows,
               CAST(sum(CAST(round(sim * 10000) AS BIGINT)) AS BIGINT)
                   AS exact_sim_sum_q4,
               TRUE AS state_roundtrip_ok,
               TRUE AS recon_err_bounded,
               TRUE AS recall_ok,
               TRUE AS retention_ok
        FROM topk
    """,
    tags=("similarity", "ivf", "sq8", "serving", "contract"),
    bench2=True,
)
def ivf_sq8_serve_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The faiss ``IVF<K>,SQ8`` chain certified end-to-end: build the
    three-artifact index, COLD-START a second server from the meta
    parquet alone, serve both, and assert

    - ``state_roundtrip_ok``: reloaded-server rows identical to the
      builder's (centers and the residual codec roundtrip parquet
      bit-exactly);
    - ``recon_err_bounded``: the SQ8 round-to-nearest bound holds over
      every RESIDUAL corpus-wide — |r − dequant(encode(r))| ≤ step/2
      per dim, draw-independent (reuses ``_sq8_recon_ok``);
    - ``recall_ok``: served hits clear IVFPQ_RECALL_MIN_PCT, the probe-
      coverage floor shared by every nprobe/IVF_K variant (recall here
      is probe-limited, not codec-limited — the multi-seed survey
      behind the floor applies verbatim);
    - ``retention_ok``: the chain retains ≥ IVFPQ_RETENTION_MIN_PCT of
      flat IVF's hits on the same probes — the residual-codec
      guarantee, draw-robust at PQ_RERANK depth exactly as the IVF-PQ
      ladder measured (SQ8's per-cosine error is ~10x smaller than
      residual PQ's, so the 90 floor is strictly easier here).

    100 TB shape: identical pruned reads to ``ivfpq_serve`` (probe →
    nprobe partitions of codes, candidates-only flat refine); the codec
    swap changes bytes-per-vector (4x vs 32x compression) but no cost
    TERM.  Reference scope: same pgvector anchor as the rest of the
    serving family (ollama_consumer.py:234)."""
    import shutil

    corpus = pin(_corpus(spark, sf_dir))
    qrows = sorted(
        corpus.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb").collect()
    )
    out_schema = (
        "n_queries long, n_exact_rows long, exact_sim_sum_q4 long,"
        " state_roundtrip_ok boolean, recon_err_bounded boolean,"
        " recall_ok boolean, retention_ok boolean"
    )
    if not qrows:
        return local_df(spark, [(0, 0, None, True, True, True, True)], out_schema)
    path = _ivfpq_path(sf_dir) + "_sq8"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_meta", ignore_errors=True)
    shutil.rmtree(path + "_flat", ignore_errors=True)
    # exact baseline over the PINNED corpus (not a fresh parquet scan —
    # guide §2.4; expressions identical to cosine_topk).  The facts
    # aggregate never consumes KMeans centers or the codec, so it runs
    # CONCURRENTLY with the whole build (guide §2.6, VERDICT r13
    # item 1): the exact-topk pass hides behind the contract's one
    # mandatory KMeans fit instead of extending the critical path.
    exact = pin(_exact_topk_rounded(corpus).select("query_id", "neighbor_id", "sim"))
    (centers, vmin, vmax), facts = run_parallel(
        lambda: ivfsq8_build_index(spark, corpus, path),
        lambda: exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count("*").alias("n_exact_rows"),
            F.sum(F.round(F.col("sim") * 10000).cast("long")).alias(
                "exact_sim_sum_q4"
            ),
        ).collect()[0],
    )
    centers2, vmin2, vmax2 = ivfsq8_load_meta(spark, path)

    # residual recon bound: rebuild the residual frame with the CODES
    # alongside, named for _sq8_recon_ok's (vec_id, emb)/(vec_id, codes);
    # centroid constants ride as one broadcast row (see _sq8_const_row)
    resid = (
        spark.read.parquet(path + "_flat")
        .crossJoin(F.broadcast(_sq8_const_row(spark, vmin, vmax, centers)))
        .selectExpr(
            "vec_id",
            "zip_with(emb, element_at(_cent, centroid + 1),"
            " (x, c) -> x - c) AS emb",
        )
    )
    # flat-IVF retention baseline served from the index's OWN flat store
    # and centers — ann_ivf_topk here re-fit the identical KMeans
    # (same corpus, k, seed) and re-scanned the corpus for nothing
    # (guide §2.4: remove the redundant pass).  Same assignment, same
    # serve path (_ivf_flat_serve), identical hit set.
    cent_df = _cent_frame(spark, centers)

    # pin both serve outputs (see ivfpq_serve_contract): each extra
    # consumer otherwise re-ran the pruned scan + dequant + refine.
    # Construction runs inside the legs so its driver-side py4j cost
    # overlaps the other legs' cluster work (guide §2.6).
    def built_leg() -> DataFrame:
        b = pin(ivfsq8_serve(spark, path, centers, vmin, vmax, qrows))
        b.count()
        return b

    def loaded_leg() -> DataFrame:
        ld = pin(ivfsq8_serve(spark, path, centers2, vmin2, vmax2, qrows))
        ld.count()
        return ld

    built, loaded, recon = run_parallel(
        built_leg,
        loaded_leg,
        lambda: _sq8_recon_ok(
            spark.read.parquet(path).select("vec_id", "codes"), resid, vmin, vmax
        ),
    )
    cols = built.columns
    only_built, only_loaded, sq8_hits, ivf_hits = run_parallel(
        lambda: built.join(loaded, cols, "left_anti").count(),
        lambda: loaded.join(built, cols, "left_anti").count(),
        lambda: loaded.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count(),
        lambda: _ivf_flat_serve(
            spark.read.parquet(path + "_flat").select("vec_id", "emb", "centroid"),
            cent_df,
        )
        .select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count(),
    )
    roundtrip_ok = only_built == 0 and only_loaded == 0
    return local_df(spark, 
        [
            (
                int(facts.n_queries),
                int(facts.n_exact_rows),
                # None when the exact top-k is empty (rows but no
                # vec_id < N_QUERIES) — the oracle emits NULL there too
                int(facts.exact_sim_sum_q4)
                if facts.exact_sim_sum_q4 is not None
                else None,
                bool(roundtrip_ok),
                bool(recon),
                bool(sq8_hits * 100 >= facts.n_exact_rows * IVFPQ_RECALL_MIN_PCT),
                bool(sq8_hits * 100 >= ivf_hits * IVFPQ_RETENTION_MIN_PCT),
            )
        ],
        out_schema,
    )


# ---------------------------------------------------------------------------
# Round 12: index-staleness audit — the re-training-cadence number.
# ---------------------------------------------------------------------------

#: the corpus "grows" by its newest 1/STALE_DELTA_DEN of vec_ids AFTER
#: the coarse quantizer is frozen — a 20% post-freeze delta, an
#: aggressive staleness scenario (ivfpq_index_append's fixed 20-row
#: delta tests visibility; this tests RECALL under drift).
STALE_DELTA_DEN = 5
#: recall floor for the STALE index on the GROWN corpus.  The fixture's
#: embeddings are i.i.d. draws (no distribution shift between base and
#: delta), so freezing centroids on an 80% prefix is statistically a
#: subsample fit — the recall distribution matches fresh IVF's
#: seven-seed 36-60% band and shares its floor.  Round-12 survey
#: (shipped sf0.01 + sf0.1 + six virgin sf0.01 reseeds 123321/456654/
#: 987123/135791/246802/369258): stale recall 42-56%, fresh 42-76% on
#: the same draws — 30 keeps the shared ~3 sd margin.
STALE_RECALL_MIN_PCT = IVF_RECALL_MIN_PCT
#: stale hits >= this pct of FRESH-fit hits on the same corpus.  Both
#: hit counts are ~Binomial(50, ~0.5) and the ratio is the noisy part:
#: the same eight-draw survey measured retention 71-122% (mean ~89,
#: sd ~16; stale occasionally BEATS fresh — KMeans on the 80% prefix
#: can land a better local optimum).  50 sits > 2 sd under the mean
#: and 21 points under the observed min, while a real regression
#: (delta rows invisible to probing, probe off frozen cells) reads
#: ~0-20%.
STALE_RETENTION_MIN_PCT = 50


def argmin_assignment_mismatches(assigned: DataFrame, cent_df: DataFrame) -> int:
    """Count of rows in ``assigned`` (vec_id, emb, centroid) whose stored
    ``centroid`` differs from the independent argmin over ``cent_df``
    (centroid INT, c_emb ARRAY<DOUBLE>).

    KMeans assigns by EUCLIDEAN distance (not cosine — centroids are
    means of unit vectors and are NOT unit-norm), so the check uses the
    same metric; min-id tie-break matches MLlib's first-minimal-index
    choice on exact ties.  Cost: |assigned| × |centroids| rows with the
    centroid side broadcast.  Trip-wire proven in
    tests/test_round12.py: a single corrupted cell makes it non-zero."""
    d2 = F.aggregate(
        F.zip_with(
            as_double(F.col("emb")), F.col("c_emb"), lambda x, c: (x - c) * (x - c)
        ),
        F.lit(0.0),
        lambda acc, el: acc + el,
    )
    wd = W.partitionBy("vec_id").orderBy("d2", "cand_centroid")
    own = (
        assigned.crossJoin(
            F.broadcast(
                cent_df.select(F.col("centroid").alias("cand_centroid"), "c_emb")
            )
        )
        .select("vec_id", "centroid", "cand_centroid", d2.alias("d2"))
        .withColumn("r", F.row_number().over(wd))
        .filter(F.col("r") == 1)
    )
    return own.filter(F.col("centroid") != F.col("cand_centroid")).count()


@register(
    "ivf_staleness_audit",
    oracle=f"""{_EXACT_TOPK_CTE},
             m AS (SELECT max(vec_id) AS mx, count(*) AS n FROM embeddings)
        SELECT CAST((SELECT count(*) FROM embeddings, m
                     WHERE vec_id < mx + 1 - n // {STALE_DELTA_DEN}) AS BIGINT)
                   AS n_base,
               CAST((SELECT count(*) FROM embeddings, m
                     WHERE vec_id >= mx + 1 - n // {STALE_DELTA_DEN}) AS BIGINT)
                   AS n_delta,
               CAST(count(*) AS BIGINT) AS n_exact_rows,
               CAST(sum(CAST(round(sim * 10000) AS BIGINT)) AS BIGINT)
                   AS exact_sim_sum_q4,
               TRUE AS delta_visible_ok,
               TRUE AS stale_recall_ok,
               TRUE AS retention_ok
        FROM topk
    """,
    tags=("similarity", "ivf", "serving", "staleness", "contract"),
    bench2=True,
)
def ivf_staleness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-ops staleness audit — the number that decides re-training
    cadence: freeze IVF coarse centroids on the corpus as it stood
    BEFORE the newest 1/``STALE_DELTA_DEN`` of vec_ids arrived, ingest
    the delta by assigning it to the FROZEN centroids (append-without-
    refit, exactly what ``ivfpq_index_append`` does to the codes), then
    measure the stale index's recall against the exact top-k of the
    GROWN corpus, and its hit retention vs a fresh full-corpus fit.

    - ``n_base`` / ``n_delta``: the freeze-cut accounting, DuckDB-
      recomputed from the same ``mx + 1 - n // den`` formula;
    - ``delta_visible_ok``: every DELTA row's stored cell equals the
      independent Euclidean argmin against the frozen centroid list —
      the append-without-refit property stated falsifiably (a refit or
      a metric drift in the ingest path flips it);
    - ``stale_recall_ok``: stale recall clears the shared probe-
      coverage floor (see STALE_RECALL_MIN_PCT's survey note);
    - ``retention_ok``: stale hits >= STALE_RETENTION_MIN_PCT% of a
      fresh fit's hits — the drift cost stays bounded, so the audit
      passing means "don't re-train yet".

    100 TB shape: the freeze-fit is KMeans on the base (sample-
    bounded in production); delta ingest is one broadcast-centroid
    argmin map over the DELTA only; serving touches nprobe/IVF_K of
    the data exactly as ``ann_ivf_topk`` — the audit adds one exact
    top-k pass (the ground-truth cost every recall measurement pays)
    and a second KMeans for the fresh baseline, both query-side-
    bounded.  Reference scope: the pgvector serving column
    (ollama_consumer.py:234) re-indexed on a cadence this number
    justifies."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    out_schema = (
        "n_base long, n_delta long, n_exact_rows long, exact_sim_sum_q4 long,"
        " delta_visible_ok boolean, stale_recall_ok boolean, retention_ok boolean"
    )
    corpus = pin(_corpus(spark, sf_dir))
    stats = corpus.agg(F.max("vec_id").alias("mx"), F.count("*").alias("n")).first()
    if not stats.n:
        return local_df(spark, [(0, 0, 0, None, True, True, True)], out_schema)
    cut = int(stats.mx) + 1 - int(stats.n) // STALE_DELTA_DEN

    vecs = corpus.withColumn("vec", array_to_vector(F.col("emb")))
    base = vecs.filter(F.col("vec_id") < cut)

    # exact baseline over the PINNED corpus (not a fresh parquet scan —
    # guide §2.4); materialize it (the facts aggregate) BEFORE forking
    # the legs so neither leg races to build the shared cache
    exact = pin(_exact_topk_rounded(corpus).select("query_id", "neighbor_id", "sim"))
    facts = exact.agg(
        F.count("*").alias("n_exact_rows"),
        F.sum(F.round(F.col("sim") * 10000).cast("long")).alias("exact_sim_sum_q4"),
    ).collect()[0]

    def stale_leg() -> tuple[int, int]:
        model = KMeans(
            k=IVF_K, seed=42, featuresCol="vec", predictionCol="centroid"
        ).fit(base)
        # frozen-centroid assignment of the GROWN corpus (base + delta) —
        # model.transform is the broadcast-argmin map; in production only
        # the delta runs through it, appending to the existing layout
        assigned = pin(model.transform(vecs).select("vec_id", "emb", "centroid"))
        assigned.count()  # materialize once before the two consumers fork
        cent_df = _cent_frame(spark, model.clusterCenters())

        # delta_visible_ok, the FALSIFIABLE form: every DELTA row's stored
        # cell must equal the independent Euclidean argmin against the
        # FROZEN centroid list — the append-without-refit property itself,
        # not a row-count identity (model.transform is row-preserving, so
        # n_index == n is a tautology; a count check could never fail).
        # serve on the frozen cells — the SAME _ivf_flat_serve as the
        # fresh fit below, so retention compares serving paths, never
        # code paths.  The two checks are independent consumers of the
        # cached assignment — overlap them (guide §2.6).
        return run_parallel(
            lambda: argmin_assignment_mismatches(
                assigned.filter(F.col("vec_id") >= cut), cent_df
            ),
            lambda: _ivf_flat_serve(assigned, cent_df)
            .select("query_id", "neighbor_id")
            .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
            .count(),
        )

    def fresh_leg() -> int:
        # fresh baseline over the ALREADY-pinned corpus (ann_ivf_topk
        # would re-scan parquet and re-run the cast lineage)
        return (
            _ivf_fresh_topk(corpus)
            .select("query_id", "neighbor_id")
            .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
            .count()
        )

    # the stale and fresh legs each run their own KMeans fit — the two
    # fits (and the n_base count) are independent job chains; running
    # them concurrently overlaps the per-iteration scheduling latency
    # that dominates an MLlib fit on a small, cached input (guide §2.6)
    (delta_misassigned, stale_hits), fresh_hits, n_base = run_parallel(
        stale_leg,
        fresh_leg,
        lambda: corpus.filter(F.col("vec_id") < cut).count(),
    )
    n_delta = int(stats.n) - n_base
    # a corpus with rows but no vec_id < N_QUERIES has an EMPTY exact
    # top-k: the sum aggregates to NULL (the oracle emits NULL too) —
    # int(None) would crash, and the recall floors hold vacuously
    sim_sum = (
        int(facts.exact_sim_sum_q4) if facts.exact_sim_sum_q4 is not None else None
    )
    return local_df(spark, 
        [
            (
                n_base,
                n_delta,
                int(facts.n_exact_rows),
                sim_sum,
                bool(delta_misassigned == 0),
                bool(stale_hits * 100 >= facts.n_exact_rows * STALE_RECALL_MIN_PCT),
                bool(stale_hits * 100 >= fresh_hits * STALE_RETENTION_MIN_PCT),
            )
        ],
        out_schema,
    )


# ---------------------------------------------------------------------------
# Round 14: margin-based bitext mining (Artetxe & Schwenk, ACL 2019).
# Score a candidate pair by its cosine RELATIVE to each side's average
# top-k neighborhood — the ratio margin that made mined bitext usable
# (absolute cosine thresholds fail because hubness inflates some
# vectors' similarities across the board).  The two "languages" are the
# standing even/odd vec_id split; the engine certifies the exact-top-k
# margin CONTRACT — at 100 TB the candidate generator swaps to the
# IVF/SQ8 serving route, same scoring.
# ---------------------------------------------------------------------------

#: mined queries: even vec_ids below this (the N_QUERIES convention,
#: sized so tiny sf0.001-SCALE draws still have a query set).
MARGIN_QUERY_MAX = 40
#: neighborhood size for the margin denominator (A&S use k = 4).
MARGIN_K = 4
#: acceptance threshold on the q3-quantized ratio margin (A&S report
#: ~1.06 for LASER bitext; 1000 = margin 1.0 — "the pair beats its
#: neighborhoods' average" — which is the natural zero point).  A
#: per-row FACT column, not an asserted floor: acceptance counts are
#: draw-dependent and both engines compute the flag from identical
#: integers.
MARGIN_ACCEPT_Q3 = 1000


@register(
    "margin_bitext_mine",
    # per-pair cosines are bit-identical cross-engine (the established
    # guarantee every ANN contract leans on) and quantize to the q4
    # integer lattice; neighborhood sums, the ratio margin, and the
    # mutual-best flag are then pure integer arithmetic with guarded
    # div (numerator and denominator both proven non-negative before
    # dividing, so truncating div == floor div on both engines).
    oracle=f"""
        WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings WHERE vec_id % 2 = 0),
        b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings WHERE vec_id % 2 = 1),
        q AS (SELECT * FROM a WHERE vec_id < {MARGIN_QUERY_MAX}),
        fwd AS (
            SELECT q.vec_id AS query_id, b.vec_id AS cand_id,
                   list_cosine_similarity(q.emb, b.emb) AS sim,
                   CAST(round(list_cosine_similarity(q.emb, b.emb) * 10000)
                        AS BIGINT) AS sim_q4,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY list_cosine_similarity(q.emb, b.emb)
                                                   DESC, b.vec_id) AS rnk
            FROM q CROSS JOIN b
        ),
        fden AS (
            SELECT query_id, CAST(sum(sim_q4) AS BIGINT) AS denom_fwd_q4
            FROM fwd WHERE rnk <= {MARGIN_K} GROUP BY 1
        ),
        best AS (
            SELECT query_id, cand_id AS best_id, sim_q4
            FROM fwd WHERE rnk = 1
        ),
        ys AS (SELECT DISTINCT best_id FROM best),
        bwd AS (
            SELECT y.best_id, a.vec_id AS back_id,
                   CAST(round(list_cosine_similarity(be.emb, a.emb) * 10000)
                        AS BIGINT) AS sim_q4,
                   row_number() OVER (PARTITION BY y.best_id
                                      ORDER BY list_cosine_similarity(be.emb, a.emb)
                                                   DESC, a.vec_id) AS rnk
            FROM ys y JOIN b be ON be.vec_id = y.best_id CROSS JOIN a
        ),
        bden AS (
            SELECT best_id, CAST(sum(sim_q4) AS BIGINT) AS denom_bwd_q4,
                   CAST(min(CASE WHEN rnk = 1 THEN back_id END) AS BIGINT)
                       AS back_best
            FROM bwd WHERE rnk <= {MARGIN_K} GROUP BY 1
        )
        SELECT be.query_id, be.best_id, be.sim_q4,
               f.denom_fwd_q4, bd.denom_bwd_q4,
               CAST(CASE WHEN f.denom_fwd_q4 + bd.denom_bwd_q4 > 0
                              AND be.sim_q4 >= 0
                         THEN (2 * {MARGIN_K} * be.sim_q4 * 1000)
                              // (f.denom_fwd_q4 + bd.denom_bwd_q4)
                         ELSE -1 END AS BIGINT) AS margin_q3,
               bd.back_best = be.query_id AS mutual,
               (bd.back_best = be.query_id)
                   AND (CASE WHEN f.denom_fwd_q4 + bd.denom_bwd_q4 > 0
                                  AND be.sim_q4 >= 0
                             THEN (2 * {MARGIN_K} * be.sim_q4 * 1000)
                                  // (f.denom_fwd_q4 + bd.denom_bwd_q4)
                             ELSE -1 END) >= {MARGIN_ACCEPT_Q3} AS accepted
        FROM best be
        JOIN fden f USING (query_id)
        JOIN bden bd USING (best_id)
    """,
    tags=("similarity", "bitext", "mining", "training-data", "north-star"),
)
def margin_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the LASER /
    CCMatrix pipeline): for each query vector on side A (even vec_ids,
    capped at MARGIN_QUERY_MAX), find its best candidate on side B
    (odd vec_ids) and score the pair by the RATIO margin —
    ``2k·cos(x,y) / (Σ topk-sims(x→B) + Σ topk-sims(y→A))`` — the
    hubness-corrected criterion that replaced absolute cosine
    thresholds for mined parallel data.  ``mutual`` flags pairs that
    are each other's argmax (the "max" mining strategy); ``accepted``
    combines mutuality with the margin threshold.

    Integer contract: per-pair cosines are bit-identical cross-engine
    and quantize to the q4 lattice (round(sim·10000) as BIGINT — the
    finding-13 idiom); neighborhood denominators are integer sums over
    the top-MARGIN_K rows (ranked by the RAW double, tie-break on
    vec_id); the margin divides only when the numerator is proven
    non-negative and the denominator positive (else −1), so truncating
    div and floor div agree.

    Scale shape: the query side (and later the mined best-y set, both
    ≤ MARGIN_QUERY_MAX rows) is **broadcast**; each corpus side streams
    ONCE per direction and the per-query top-k is the only exchange —
    the cosine_topk/hard_negative_mining shape, run twice.  At 100 TB
    the exact scan swaps for the IVF-SQ8 serving route (probed cells
    only) with this module's identical scoring — this contract pins
    the scoring layer those candidates feed."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    q = a.filter(F.col("vec_id") < MARGIN_QUERY_MAX).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    sim_q4 = lambda c: F.round(c * 10000).cast("long")  # noqa: E731
    fwd = b.join(F.broadcast(q)).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        cosine(F.col("q_emb"), F.col("emb")).alias("sim"),
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("sim"), "cand_id")
    fwd_topk = pin(
        fwd.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= MARGIN_K)
        .select("query_id", "cand_id", sim_q4(F.col("sim")).alias("sim_q4"), "rnk")
    )
    fden = fwd_topk.groupBy("query_id").agg(
        F.sum("sim_q4").cast("long").alias("denom_fwd_q4")
    )
    best = fwd_topk.filter(F.col("rnk") == 1).select(
        "query_id", F.col("cand_id").alias("best_id"), "sim_q4"
    )
    ys = best.select("best_id").distinct().join(
        b.select(F.col("vec_id").alias("best_id"), F.col("emb").alias("y_emb")),
        "best_id",
    )
    bwd = a.join(F.broadcast(ys)).select(
        "best_id",
        F.col("vec_id").alias("back_id"),
        cosine(F.col("y_emb"), F.col("emb")).alias("sim"),
    )
    wb = W.partitionBy("best_id").orderBy(F.desc("sim"), "back_id")
    bden = (
        bwd.withColumn("rnk", F.row_number().over(wb))
        .filter(F.col("rnk") <= MARGIN_K)
        .groupBy("best_id")
        .agg(
            F.sum(sim_q4(F.col("sim"))).cast("long").alias("denom_bwd_q4"),
            F.min(F.when(F.col("rnk") == 1, F.col("back_id")))
            .cast("long")
            .alias("back_best"),
        )
    )
    # every frame here is <= MARGIN_QUERY_MAX rows — broadcast both
    # sides' denominators so no exchange after the two top-k windows
    joined = best.join(F.broadcast(fden), "query_id").join(
        F.broadcast(bden), "best_id"
    )
    denom = F.col("denom_fwd_q4") + F.col("denom_bwd_q4")
    margin = (
        F.when(
            (denom > 0) & (F.col("sim_q4") >= 0),
            F.expr(
                f"(2 * {MARGIN_K} * sim_q4 * 1000) div (denom_fwd_q4 + denom_bwd_q4)"
            ),
        )
        .otherwise(F.lit(-1))
        .cast("long")
    )
    mutual = F.col("back_best") == F.col("query_id")
    return joined.select(
        "query_id",
        "best_id",
        "sim_q4",
        "denom_fwd_q4",
        "denom_bwd_q4",
        margin.alias("margin_q3"),
        mutual.alias("mutual"),
        (mutual & (margin >= MARGIN_ACCEPT_Q3)).alias("accepted"),
    )


# ---------------------------------------------------------------------------
# 16. IVF recall curve — recall@k vs nprobe, the serving-knob design table.
# ---------------------------------------------------------------------------

#: swept probe counts; the last one equals IVF_K, where probing every
#: cell makes the IVF serve IDENTICAL to brute force — a theorem the
#: oracle asserts as a hard equality, not a floor.
IVF_CURVE_NPROBES: tuple[int, ...] = (1, 2, 4, IVF_K)


@register(
    "ivf_recall_curve",
    oracle=f"""{_EXACT_TOPK_CTE},
        facts AS (
            SELECT count(DISTINCT query_id) AS n_queries,
                   count(*) AS n_exact_rows,
                   CAST(sum(CAST(round(sim * 10000) AS BIGINT)) AS BIGINT)
                       AS exact_sim_sum_q4
            FROM topk
        )
        SELECT CAST(p.nprobe AS INT) AS nprobe,
               n_queries, n_exact_rows, exact_sim_sum_q4,
               CAST(CASE WHEN p.nprobe = {IVF_K} THEN n_exact_rows END AS BIGINT)
                   AS hits_at_full,
               TRUE AS monotone_ok,
               TRUE AS recall_floor_ok
        FROM (VALUES {", ".join(f"({n})" for n in IVF_CURVE_NPROBES)}) p(nprobe)
        CROSS JOIN facts
    """,
    tags=("similarity", "ivf", "tuning", "contract"),
)
def ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe design table for IVF serving: one KMeans(IVF_K, seed
    42) fit, then the SAME ``_ivf_flat_serve`` swept over nprobe in
    {1, 2, 4, 8}, each row carrying the DuckDB-recomputed exact-side
    facts plus three engine-asserted claims:

    - ``monotone_ok`` — recall is non-decreasing in nprobe.  This is a
      THEOREM, not a tuned floor: the probe ranking (centroid sim
      desc, centroid id) is deterministic, so cell sets are nested
      across nprobe, and under the global candidate order (sim desc,
      neighbor_id) an added candidate can only displace a non-exact
      member of the top-k — hits never drop.  A violation means the
      serve path broke (probe ranking nondeterminism, tie-break
      drift), which is exactly what this row exists to catch.
    - ``hits_at_full`` — at nprobe = IVF_K every cell is probed, so the
      IVF serve IS brute force: the oracle pins hits == n_exact_rows as
      a hard equality (NULL at partial probes, where hits are engine
      facts no SQL oracle can know).
    - ``recall_floor_ok`` — the shared IVF_RECALL_MIN_PCT floor,
      asserted for nprobe >= NPROBE (the contract-surveyed operating
      point; monotonicity then extends it upward for free) and
      vacuously true below it, where single-cell probing legitimately
      misses cross-centroid neighbors.

    100 TB shape: one fit + one exact-top-k ground-truth pass (the
    price every recall measurement pays, query-side-bounded); each
    curve point touches nprobe/IVF_K of the corpus via the broadcast
    probe join of ``ann_ivf_topk``, and the per-point reduction is a
    TOP_K·|queries|-row join + count.  The curve is the artifact that
    justifies the NPROBE constant the serving ops hard-code."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    out_schema = (
        "nprobe int, n_queries long, n_exact_rows long, exact_sim_sum_q4 long,"
        " hits_at_full long, monotone_ok boolean, recall_floor_ok boolean"
    )
    corpus = _corpus(spark, sf_dir)
    if corpus.isEmpty():
        return local_df(spark, 
            [
                (n, 0, 0, None, 0 if n == IVF_K else None, True, True)
                for n in IVF_CURVE_NPROBES
            ],
            out_schema,
        )
    vecs = corpus.withColumn("vec", array_to_vector(F.col("emb")))
    model = KMeans(k=IVF_K, seed=42, featuresCol="vec", predictionCol="centroid").fit(
        vecs
    )
    assigned = pin(model.transform(vecs).select("vec_id", "emb", "centroid"))
    cent_df = _cent_frame(spark, model.clusterCenters())

    exact = pin(cosine_topk(spark, sf_dir).select("query_id", "neighbor_id", "sim"))
    exact_ids = exact.select("query_id", "neighbor_id")
    hit_rows = None
    for n in IVF_CURVE_NPROBES:
        served = _ivf_flat_serve(assigned, cent_df, nprobe=n)
        h = (
            served.select("query_id", "neighbor_id")
            .join(exact_ids, ["query_id", "neighbor_id"])
            .agg(F.count("*").alias("n_hits"))
            .select(F.lit(n).alias("nprobe"), "n_hits")
        )
        hit_rows = h if hit_rows is None else hit_rows.unionByName(h)
    facts = exact.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact_rows"),
        F.sum(F.round(F.col("sim") * 10000).cast("long")).alias("exact_sim_sum_q4"),
    )
    w = W.orderBy("nprobe")
    prev = F.lag("n_hits").over(w)
    return (
        hit_rows.crossJoin(facts)
        .select(
            "nprobe",
            "n_queries",
            "n_exact_rows",
            "exact_sim_sum_q4",
            F.when(F.col("nprobe") == IVF_K, F.col("n_hits"))
            .cast("long")
            .alias("hits_at_full"),
            (prev.isNull() | (F.col("n_hits") >= prev)).alias("monotone_ok"),
            (
                (F.col("nprobe") < NPROBE)
                | (F.col("n_hits") * 100 >= F.col("n_exact_rows") * IVF_RECALL_MIN_PCT)
            ).alias("recall_floor_ok"),
        )
    )
