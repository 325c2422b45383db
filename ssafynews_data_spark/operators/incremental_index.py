"""Incremental near-dup: a persisted MinHash band index + delta joins.

Every production dedup system ends up here: the corpus is deduped once
(the expensive nightly build), and each new crawl batch must be checked
against it WITHOUT recomputing the old corpus's signatures.  The
reference's incremental story is a per-link Postgres existence check
(``collect/consumer.py:137-150``); this operator is the content-level
generalization — the reusable artifact is the banded MinHash index:

1. **Build** (once): base docs → shingle hashes → MinHash signatures →
   (doc_id, band_idx, band_hash) rows, written to parquet partitioned
   by ``band_idx``.  This is the index; at 100 TB it is additionally
   bucketed by ``band_hash`` so the delta join below is shuffle-free on
   the index side.
2. **Delta** (per batch): ONLY the new docs pay signature cost; their
   band rows equi-join the on-disk index to produce candidates, and
   only candidates pay the exact shingle verify.  (The join probes
   every band, so ``band_idx`` partitioning is NOT pruning here — it
   enables band-at-a-time processing when a batch must fit in a memory
   budget, and at 100 TB the index is additionally bucketed by
   ``band_hash`` so the delta join shuffles only the delta side.)

Cost per batch: O(delta size + candidates), independent of the base
corpus size — the property that makes daily dedup of a 100 TB corpus a
minutes job instead of a re-run.

The registered query runs build + delta in one call (the driver's
correctness gate needs a self-contained query) with a deterministic
80/20 split, and hash-checks the verified cross-set pairs against the
exact DuckDB Jaccard of the same split — proving the index lost no
pair ≥ the threshold.  The same signature pipeline's FULL-corpus recall
is already oracle-pinned by ``minhash_verified_pairs``
(operators/dedup.py:351).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.operators.dedup import (
    _DUCK_SHINGLES,
    JACCARD_THRESHOLD,
    _doc_shingle_hashes,
    _doc_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
)
from ssafynews_data_spark.registry import register

DELTA_MOD = 5  # doc_id % 5 == 0 → the "new batch" (20%)


def _index_dir(sf_dir: str) -> str:
    import ssafynews_data_spark

    root = os.path.dirname(
        os.path.dirname(os.path.abspath(ssafynews_data_spark.__file__))
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(root, "spark-warehouse", f"minhash_index_{tag}")


def band_rows(sig_src: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) — the index's storage schema,
    derived from the same banding as ``lsh_candidate_pairs`` (it joins
    a frame of this shape against itself; here the two sides are index
    vs delta instead)."""
    from ssafynews_data_spark.operators.dedup import LSH_BANDS, MINHASH_K

    rows = MINHASH_K // LSH_BANDS
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col("sig")[b * rows + r] for r in range(rows)]
        ).alias(f"b{b}")
        for b in range(LSH_BANDS)
    ]
    return sig_src.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash")
    )


def build_index(spark: SparkSession, sf_dir: str) -> str:
    """The nightly build: base-corpus band rows, partitioned by band."""
    path = _index_dir(sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    base_h = _doc_shingle_hashes(spark, sf_dir).filter(
        F.col("doc_id") % DELTA_MOD != 0
    )
    rows = band_rows(minhash_signatures(base_h))
    rows.write.mode("overwrite").partitionBy("band_idx").parquet(path)
    return path


@register(
    "minhash_incremental_index",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh
            FROM documents
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT d.doc_id AS doc_delta, b.doc_id AS doc_base,
                   count(*) AS common
            FROM sh d JOIN sh b ON d.sh = b.sh
            WHERE d.doc_id % {DELTA_MOD} = 0 AND b.doc_id % {DELTA_MOD} != 0
            GROUP BY 1, 2
        )
        SELECT doc_delta, doc_base,
               CAST(floor(common / (sd.n + sb.n - common) * 10000) AS BIGINT)
                   AS jaccard_q4
        FROM pairs
        JOIN sizes sd ON sd.doc_id = doc_delta
        JOIN sizes sb ON sb.doc_id = doc_base
        WHERE common / (sd.n + sb.n - common) >= {JACCARD_THRESHOLD}
    """,
    tags=("dedup", "minhash", "incremental", "index"),
)
def minhash_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the base index on disk, then dedup the delta batch against
    it: delta docs compute their own signatures only, join the stored
    band rows, and exact-verify the candidates.  The verified cross-set
    pairs hash-match DuckDB's exact quadratic Jaccard of the same
    split — the index misses nothing at the threshold."""
    path = build_index(spark, sf_dir)
    # explicit schema: an empty base corpus writes zero files and the
    # read can't infer one (band_idx is the partition column)
    index = spark.read.schema("doc_id long, band_hash bigint, band_idx int").parquet(
        path
    ).select(F.col("doc_id").alias("doc_base"), "band_idx", "band_hash")
    delta_h = _doc_shingle_hashes(spark, sf_dir).filter(
        F.col("doc_id") % DELTA_MOD == 0
    )
    delta_bands = band_rows(minhash_signatures(delta_h)).select(
        F.col("doc_id").alias("doc_delta"), "band_idx", "band_hash"
    )
    cands = (
        delta_bands.join(index, ["band_idx", "band_hash"])
        .select("doc_delta", "doc_base")
        .distinct()
    )
    sh = pin(_doc_shingles(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    d = sh.select(F.col("doc_id").alias("doc_delta"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_base"), "sh")
    common = (
        cands.join(d, "doc_delta")
        .join(b, ["doc_base", "sh"])
        .groupBy("doc_delta", "doc_base")
        .agg(F.count("*").alias("common"))
    )
    sd = sizes.select(F.col("doc_id").alias("doc_delta"), F.col("n").alias("nd"))
    sb = sizes.select(F.col("doc_id").alias("doc_base"), F.col("n").alias("nb"))
    jac = F.col("common") / (F.col("nd") + F.col("nb") - F.col("common"))
    return (
        common.join(F.broadcast(sd), "doc_delta")
        .join(F.broadcast(sb), "doc_base")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_delta", "doc_base", F.floor(jac * 10000).alias("jaccard_q4"))
    )
