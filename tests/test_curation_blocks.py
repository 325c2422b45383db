"""Invariants for the block-level curation ops (curation_blocks.py):
boilerplate removal reconstructs exactly, chunk windows cover every
token, count-min estimates are one-sided and mergeable, mapInArrow
matches the JVM byte/char functions."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from ssafynews_data_spark.operators.curation_blocks import (
    BLOCK_W,
    BOILER_MIN_DOCS,
    CHUNK_L,
    CHUNK_S,
    arrow_byte_stats,
    boilerplate_block_removal,
    cms_daily_sketches,
    cms_heavy_hitters,
    token_chunk_windows,
)
from ssafynews_data_spark.sources.readers import load_table

# mirror of tokenize_words' [^\p{L}\p{N}]+ : \W is non-[letter,digit,_]
# so splitting on [\W_]+ splits on exactly the non-alphanumerics.
_TOK = re.compile(r"[\W_]+", re.UNICODE)


def _py_tokens(text: str) -> list[str]:
    return [t for t in _TOK.split(text.lower()) if t]


def _load_texts(spark, sf_dir) -> dict[int, list[str]]:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    return {r.doc_id: _py_tokens(r.text) for r in docs}


def test_boilerplate_removal_reconstructs(spark, sf_dir):
    """Pure-python recompute: block the tokens, count distinct docs per
    block string, drop frequent blocks, compare reassembly per doc."""
    toks = _load_texts(spark, sf_dir)
    blocks = {
        d: [t[i : i + BLOCK_W] for i in range(0, len(t), BLOCK_W)]
        for d, t in toks.items()
    }
    doc_count = Counter()
    for d, bs in blocks.items():
        for b in set(map(tuple, bs)):
            doc_count[b] += 1
    expect = {}
    for d, bs in blocks.items():
        kept = [b for b in bs if doc_count[tuple(b)] < BOILER_MIN_DOCS]
        expect[d] = (
            len(bs),
            len(kept),
            " ".join(tok for b in kept for tok in b),
        )
    got = {
        r.doc_id: (r.n_blocks, r.n_kept_blocks, r.kept_text)
        for r in boilerplate_block_removal(spark, sf_dir).collect()
    }
    assert got == expect
    # the op actually removes something on this corpus (non-degenerate)
    assert any(g[1] < g[0] for g in got.values())


def test_boilerplate_plan_has_no_cartesian(spark, sf_dir):
    df = boilerplate_block_removal(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_windows_cover_all_tokens(spark, sf_dir):
    """Stitching chunk i's last L-S tokens onto chunk 0 reproduces the
    original token stream; every chunk is <= L tokens and starts at
    stride S."""
    toks = _load_texts(spark, sf_dir)
    rows = token_chunk_windows(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, t in toks.items():
        if not t:
            assert d not in by_doc
            continue
        chunks = sorted(by_doc[d], key=lambda r: r.chunk_id)
        assert chunks[0].chunk_id == 1
        stitched: list[str] = []
        for r in chunks:
            ctoks = r.chunk_text.split(" ") if r.chunk_text else []
            assert len(ctoks) == r.n_chunk_tokens <= CHUNK_L
            start = (r.chunk_id - 1) * CHUNK_S
            assert ctoks == t[start : start + CHUNK_L]
            stitched[start:] = ctoks
        assert stitched == t


def test_cms_estimates_one_sided_and_mergeable(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    top = cms_heavy_hitters(spark, sf_dir).collect()
    assert len(top) == 10
    for r in top:
        assert r.est_count >= r.exact_count, r
    # merging per-day sketches cell-wise == sketch of the whole range
    daily = cms_daily_sketches(ev)
    merged = {
        (r.r, r.b): r.cnt
        for r in daily.groupBy("r", "b").agg(F.sum("cnt").alias("cnt")).collect()
    }
    whole = {
        (r.r, r.b): r.cnt
        for r in cms_daily_sketches(ev.withColumn("ts", F.lit("2024-01-01").cast("timestamp")))
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == whole


def test_arrow_byte_stats_match_jvm(spark, sf_dir):
    got = {
        r.doc_id: (r.n_bytes, r.n_chars, r.n_multibyte_extra)
        for r in arrow_byte_stats(spark, sf_dir).collect()
    }
    jvm = {
        r.doc_id: (r.nb, r.nc, r.nb - r.nc)
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.octet_length("text").cast("long").alias("nb"),
            F.length("text").cast("long").alias("nc"),
        )
        .collect()
    }
    assert got == jvm


def test_token_rarity_bounds(spark, sf_dir):
    from ssafynews_data_spark.operators.curation_blocks import token_rarity_scores

    rows = token_rarity_scores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.min_freq_ppm <= r.avg_freq_ppm <= 1_000_000, r


def test_dq_checks_clean_fixture(spark, sf_dir):
    from ssafynews_data_spark.operators.curation_blocks import dq_constraint_checks

    rows = {r.constraint_name: r for r in dq_constraint_checks(spark, sf_dir).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r.n_checked > 0
        assert r.n_violations == 0, r


def test_bm25_topk_contains_query_terms(spark, sf_dir):
    from ssafynews_data_spark.operators.curation_blocks import BM25_TERMS, bm25_topk

    rows = bm25_topk(spark, sf_dir).collect()
    assert len(rows) == 20
    assert rows == sorted(rows, key=lambda r: (-r.bm25, r.doc_id))
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows[:5]:  # the best matches must actually mention the query
        assert any(t in docs[r.doc_id].lower() for t in BM25_TERMS), r
