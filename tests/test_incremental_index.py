"""Incremental MinHash index invariants beyond the oracle gate."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ssafynews_data_spark.operators import incremental_index as II
from ssafynews_data_spark.operators.dedup import LSH_BANDS


def test_index_is_band_partitioned(spark, sf_dir):
    path = II.build_index(spark, sf_dir)
    bands = sorted(
        d for d in os.listdir(path) if d.startswith("band_idx=")
    )
    assert len(bands) == LSH_BANDS  # one partition dir per band


def test_index_contains_only_base_docs(spark, sf_dir):
    path = II.build_index(spark, sf_dir)
    idx = spark.read.parquet(path)
    assert idx.filter(F.col("doc_id") % II.DELTA_MOD == 0).count() == 0


def test_delta_run_is_deterministic(spark, sf_dir):
    r1 = {
        (r.doc_delta, r.doc_base, r.jaccard_q4)
        for r in II.minhash_incremental_index(spark, sf_dir).collect()
    }
    r2 = {
        (r.doc_delta, r.doc_base, r.jaccard_q4)
        for r in II.minhash_incremental_index(spark, sf_dir).collect()
    }
    assert r1 == r2
    # split contract: left side delta, right side base, every pair
    for dd, db, q4 in r1:
        assert dd % II.DELTA_MOD == 0
        assert db % II.DELTA_MOD != 0
        assert q4 >= 5000  # threshold 0.5, quantized x1e4


def test_streaming_index_ingest_contract_row(spark, sf_dir):
    """The streamed index equals the batch build, ingest ran in >= 2
    micro-batches, and full redelivery left it unchanged."""
    from ssafynews_data_spark.operators.incremental_index import (
        streaming_index_ingest_contract,
    )

    row = streaming_index_ingest_contract(spark, sf_dir).collect()[0]
    assert row.multi_batch_ingest
    assert row.index_matches_batch_build
    assert row.redelivery_idempotent
    assert row.n_delta_docs > 0
