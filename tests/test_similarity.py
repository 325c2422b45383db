"""Similarity-search invariants: ANN variants vs the exact baseline."""

from __future__ import annotations

from ssafynews_data_spark.operators import similarity


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_exact_topk_shape(spark, sf_dir):
    df = similarity.cosine_topk(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == similarity.N_QUERIES * similarity.TOP_K
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        sims = [r.sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rs)


def test_lsh_recall_vs_exact(spark, sf_dir):
    exact = _topk_sets(similarity.cosine_topk(spark, sf_dir))
    approx = _topk_sets(similarity.ann_lsh_topk(spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, (hits, total)


def test_ivf_recall_vs_exact(spark, sf_dir):
    exact = _topk_sets(similarity.cosine_topk(spark, sf_dir))
    approx = _topk_sets(similarity.ann_ivf_topk(spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.4, (hits, total)


def test_near_dup_pairs_ordered(spark, sf_dir):
    rows = similarity.embedding_near_dup(spark, sf_dir).collect()
    assert rows, "threshold should catch within-blob pairs"
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.cos_sim >= similarity.NEAR_DUP_COS for r in rows)
