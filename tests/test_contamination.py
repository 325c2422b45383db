"""Decontamination + incremental-dedup semantics and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.operators import contamination
from ssafynews_data_spark.operators.contamination import (
    BATCH_MOD,
    BENCH_MOD,
    CONTAM_W,
    _shingle_hashes,
)
from ssafynews_data_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_flags_only_nonbench_docs(spark, sf_dir):
    out = contamination.decontaminate_docs(spark, sf_dir).collect()
    assert out, "synthetic corpus should contain at least one overlap"
    for r in out:
        assert r.doc_id % BENCH_MOD != 0  # eval docs never self-flag
        assert r.n_hit_ngrams >= 1
        assert 0 <= r.contam_ratio_q4 <= 10000


def test_decontaminate_hits_are_true_overlaps(spark, sf_dir):
    """Every flagged doc really shares >=1 distinct shingle hash with the
    eval set, and the hit count equals the exact intersection size."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_hashes(docs, CONTAM_W)
    bench = set(
        r.h
        for r in sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("h").distinct().collect()
    )
    corpus = (
        sh.filter(F.col("doc_id") % BENCH_MOD != 0)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
        .collect()
    )
    expected = {
        r.doc_id: len(set(r.hs) & bench) for r in corpus if set(r.hs) & bench
    }
    got = {
        r.doc_id: r.n_hit_ngrams
        for r in contamination.decontaminate_docs(spark, sf_dir).collect()
    }
    assert got == expected


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    plan = _plan(contamination.decontaminate_docs(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # eval shingle set is the small side


def test_incremental_dedup_excludes_history(spark, sf_dir):
    """No surviving batch fingerprint may exist in the historical side."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[\\s\\x0B]+", " "))
    fp = docs.select(F.md5(norm.cast("binary")).alias("fp"), "doc_id")
    hist = set(
        r.fp for r in fp.filter(F.col("doc_id") % BATCH_MOD != 0).collect()
    )
    out = contamination.dedup_incremental_batch(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.fp not in hist
        assert r.keeper_id % BATCH_MOD == 0
        assert r.batch_dups >= 1


def test_incremental_dedup_keeps_first_in_batch(spark, sf_dir):
    out = contamination.dedup_incremental_batch(spark, sf_dir)
    # keeper is the min doc_id of its fingerprint group within the batch
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[\\s\\x0B]+", " "))
    batch = (
        docs.filter(F.col("doc_id") % BATCH_MOD == 0)
        .select(F.md5(norm.cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("want"))
    )
    joined = out.join(batch, "fp").collect()
    assert joined and all(r.keeper_id == r.want for r in joined)


def test_repeated_spans_are_true_cross_doc_shares(spark, sf_dir):
    """Every reported span count equals the doc's exact number of
    distinct spans that occur in at least one other document."""
    from ssafynews_data_spark.operators.contamination import (
        SPAN_W,
        repeated_span_groups,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_hashes(docs, SPAN_W).collect()
    by_doc: dict[int, set[int]] = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, set()).add(r.h)
    from collections import Counter

    owners = Counter()
    for d, hs in by_doc.items():
        for h in hs:
            owners[h] += 1
    expected = {}
    for d, hs in by_doc.items():
        n = sum(1 for h in hs if owners[h] >= 2)
        if n:
            expected[d] = n
    got = {
        r.doc_id: r.n_shared_spans
        for r in repeated_span_groups(spark, sf_dir).collect()
    }
    assert got == expected
