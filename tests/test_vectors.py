"""M1-M4 chain invariants (SURVEY.md §5: cluster count == min(5,n), PCA
dim == 2, seed-42 determinism, blob purity)."""

from __future__ import annotations

from ssafynews_data_spark.operators import vectors


def test_pca_kmeans_shape_and_k(spark, sf_dir):
    df = vectors.pca_kmeans_clusters(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 500
    clusters = {r.cluster for r in rows}
    assert len(clusters) == vectors.KMEANS_MAX_K  # n >= 5 → k = 5
    assert all(r.pc1 is not None and r.pc2 is not None for r in rows)


def test_kmeans_seed_determinism(spark, sf_dir):
    a = sorted((r.vec_id, r.cluster) for r in vectors.pca_kmeans_clusters(spark, sf_dir).collect())
    b = sorted((r.vec_id, r.cluster) for r in vectors.pca_kmeans_clusters(spark, sf_dir).collect())
    assert a == b


def test_clusters_nonempty_and_balanced(spark, sf_dir):
    """Every cluster gets rows (the fixture blobs overlap heavily — max
    pairwise cosine ~0.48 — so label purity is not a meaningful check;
    determinism and k are)."""
    rows = vectors.pca_kmeans_clusters(spark, sf_dir).collect()
    from collections import Counter

    sizes = Counter(r.cluster for r in rows)
    assert len(sizes) == vectors.KMEANS_MAX_K
    assert min(sizes.values()) > 0


def test_small_n_reduces_k(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = vectors.pca_kmeans(df)
    assert {r.cluster for r in out.collect()} <= {0, 1, 2}  # k = min(5, 3)


def test_empty_input_survives(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = vectors.pca_kmeans(df)
    assert out.count() == 0  # reference's empty-day path (:107-112)


def test_quality_classifier_recovers_teacher_rule(spark, sf_dir):
    """The weak-label rule is linearly separable by construction, so LR
    must recover it almost everywhere; scoring covers every doc with
    tokens."""
    rows = vectors.quality_classifier(spark, sf_dir).collect()
    n = sum(r.n_docs for r in rows)
    agree = sum(r.n_agree for r in rows)
    assert n > 0
    assert agree / n > 0.95, (agree, n)
    # both classes are represented on the fixture (the cut is not degenerate)
    good = sum(r.n_label_good for r in rows)
    assert 0 < good < n


def test_int8_quantization_error_bounded(spark, sf_dir):
    """Max-abs int8 round error is at most scale/254 per element, so the
    per-label MSE must sit below (max_scale/254)^2; scales positive."""
    from ssafynews_data_spark.operators.vectors import int8_quantize_embeddings

    rows = int8_quantize_embeddings(spark, sf_dir).collect()
    assert rows
    from ssafynews_data_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    max_scale = emb.select(
        F.max(
            F.array_max(
                F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
            )
        ).alias("m")
    ).first().m
    bound = (max_scale / 254.0) ** 2
    for r in rows:
        assert r.n_vecs > 0 and r.avg_scale > 0
        assert 0.0 <= r.avg_mse <= bound
