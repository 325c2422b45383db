"""Prefix-filter set-similarity join: completeness is structural, not
fixture luck — these tests pin the lemma's moving parts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ssafynews_data_spark.operators import setjoin
from ssafynews_data_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _doc_shingles,
    ngram_jaccard_pairs,
)


def test_prefix_lengths_follow_lemma(spark, sf_dir):
    sh = _doc_shingles(spark, sf_dir)
    pref = setjoin.prefix_rows(sh, JACCARD_THRESHOLD)
    got = {r.doc_id: r.cnt for r in pref.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    sizes = {r.doc_id: r.n for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for doc_id, n in sizes.items():
        expect = n - math.ceil(JACCARD_THRESHOLD * n) + 1
        assert got.get(doc_id, 0) == expect, (doc_id, n)


def test_matches_exact_pairs(spark, sf_dir):
    """The whole point: verified prefix-filter candidates EQUAL the
    exact quadratic join's output."""
    got = {
        (r.doc_a, r.doc_b, r.jaccard_q4)
        for r in setjoin.prefix_filter_jaccard_pairs(spark, sf_dir).collect()
    }
    exact = {
        (r.doc_a, r.doc_b, r.jaccard_q4)
        for r in ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    assert got == exact


def test_prefix_join_is_smaller_than_full_join(spark, sf_dir):
    """Candidate economy: the prefix join must touch fewer rows than
    the all-shingles self-join would."""
    sh = _doc_shingles(spark, sf_dir)
    pref = setjoin.prefix_rows(sh, JACCARD_THRESHOLD)
    assert pref.count() < sh.count()
