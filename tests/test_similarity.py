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


def test_near_dup_guard_rejects_large_corpus(spark, sf_dir, monkeypatch):
    """The exact verify form materializes the corpus on the driver; above
    the cap it must refuse loudly (pointing at near_dup_auto), not OOM."""
    import pytest

    monkeypatch.setattr(similarity, "EXACT_NEAR_DUP_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="near_dup_auto"):
        similarity.embedding_near_dup(spark, sf_dir)


def test_router_never_exceeds_exact_hard_cap(spark, sf_dir, monkeypatch):
    """The ONE shared cap (VERDICT r6 item 5): even a caller demanding
    the exact branch (exact_limit=maxint) is clamped to
    EXACT_NEAR_DUP_MAX_ROWS — above it the router must take the SRP-LSH
    plan (band posexplode + equi-join), never the quadratic
    nested-loop self-join."""
    corpus = similarity._corpus(spark, sf_dir)
    assert similarity.EXACT_NEAR_DUP_ROUTE_ROWS <= similarity.EXACT_NEAR_DUP_MAX_ROWS
    monkeypatch.setattr(similarity, "EXACT_NEAR_DUP_MAX_ROWS", 10)
    routed = similarity.near_dup_auto(corpus, exact_limit=2_000_000_000)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_ivfpq_recall_and_pruned_read(spark, sf_dir, tmp_path):
    """IVF-PQ composite: recall@k vs exact must clear the contract
    floor, the codes index must be centroid-partitioned with ONLY
    (vec_id, codes) payload (PQ_M small ints, not vectors), and the
    probe read must reach the scan as PartitionFilters."""
    from pyspark.sql import functions as F

    corpus = similarity._corpus(spark, sf_dir)
    path = str(tmp_path / "ivfpq")
    out = similarity.ivfpq_topk_frame(spark, corpus, path)
    approx = _topk_sets(out)
    exact = _topk_sets(similarity.cosine_topk(spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits * 100 >= total * similarity.IVFPQ_RECALL_MIN_PCT, (hits, total)

    back = spark.read.parquet(path)
    assert set(back.columns) == {"vec_id", "codes", "centroid"}
    row = back.first()
    assert len(row.codes) == similarity.PQ_M
    assert all(0 <= c < similarity.PQ_K for c in row.codes)
    probe = back.filter(F.col("centroid").isin([0, 1]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "centroid" in pf  # pruning predicate reached the scan

    # the r8 flat companion (inverted-list raw vectors for the refine
    # step) must be centroid-partitioned and prune identically — serve
    # never scans the corpus
    flat = spark.read.parquet(path + "_flat")
    assert set(flat.columns) == {"vec_id", "emb", "centroid"}
    fprobe = flat.filter(F.col("centroid").isin([0, 1]))
    fplan = fprobe._jdf.queryExecution().executedPlan().toString()
    fpf = fplan.split("PartitionFilters: [")[1].split("]")[0]
    assert "centroid" in fpf


def test_ivfpq_contract_row(spark, sf_dir):
    r = similarity.ivfpq_recall_contract(spark, sf_dir).collect()[0]
    assert r.recall_ok
    # the residual-encoding guarantee: quantized serving keeps >=95% of
    # flat IVF's hits on the same probes, independent of embedding draw
    assert r.retention_ok
    assert r.n_queries == similarity.N_QUERIES
    assert r.n_exact_rows == similarity.N_QUERIES * similarity.TOP_K


def test_semantic_dedup_keepers_have_no_smaller_dup_in_cluster(spark, sf_dir):
    """A kept vector may not have a smaller-id kept neighbor >= eps in
    its own cluster; every dropped vector must have SOME smaller-id
    in-cluster neighbor >= eps (greedy keep-lowest-id semantics)."""
    from pyspark.sql import functions as F

    out = similarity.semantic_dedup(spark, sf_dir)
    kept = {r.vec_id: r.centroid for r in out.collect()}
    assert kept

    # rebuild the same clustering + exact pair set independently
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = similarity._corpus(spark, sf_dir).withColumn(
        "vec", array_to_vector(F.col("emb"))
    )
    km = KMeans(
        k=similarity.SEMDEDUP_K, seed=42, maxIter=similarity.SEMDEDUP_MAXITER,
        featuresCol="vec", predictionCol="centroid",
    )
    assigned = km.fit(corpus).transform(corpus).select("vec_id", "emb", "centroid")
    a = assigned.select("centroid", F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"))
    b = assigned.select("centroid", F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"))
    pairs = [
        (r.id_a, r.id_b)
        for r in a.join(b, "centroid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            similarity.cosine(F.col("emb_a"), F.col("emb_b")) >= similarity.SEMDEDUP_EPS
        )
        .select("id_a", "id_b")
        .collect()
    ]
    all_ids = {r.vec_id for r in assigned.select("vec_id").collect()}
    dropped = all_ids - set(kept)
    assert dropped, "fixture blobs should contain in-cluster near-dups"
    has_smaller = {ib for (ia, ib) in pairs}
    for d in dropped:
        assert d in has_smaller
    for ia, ib in pairs:
        # both endpoints kept would violate the dedup contract
        assert not (ia in kept and ib in kept)


def test_capped_clusters_respect_cap(spark, sf_dir):
    """With a small cap, every cluster ends at or under the cap (up to
    max_depth), the hierarchy labels nest properly, and no vector is
    lost or duplicated."""
    corpus = similarity._corpus(spark, sf_dir)
    n_total = corpus.count()
    out = similarity.assign_capped_clusters(corpus, k=4, cap=60, max_depth=4)
    rows = out.select("vec_id", "cluster").collect()
    assert len(rows) == n_total
    assert len({r.vec_id for r in rows}) == n_total
    from collections import Counter

    sizes = Counter(r.cluster for r in rows)
    assert max(sizes.values()) <= 60
    # hierarchy labels: child labels extend a parent path with "/"
    assert any("/" in c for c in sizes), "cap should force at least one split"


def test_contract_queries_hold(spark, sf_dir):
    """The driver-facing contract frames must report their guarantees as
    satisfied on the fixture (the driver hash-checks the same facts
    against DuckDB; this pins them in-repo)."""
    from ssafynews_data_spark.operators import vectors

    r = similarity.ann_lsh_recall_contract(spark, sf_dir).collect()[0]
    assert r.recall_ok and r.n_exact_rows == r.n_queries * similarity.TOP_K
    r = similarity.ann_ivf_recall_contract(spark, sf_dir).collect()[0]
    assert r.recall_ok
    r = similarity.semantic_dedup_contract(spark, sf_dir).collect()[0]
    assert r.orphan_drops == 0
    assert r.both_kept_incluster_pairs == 0
    assert r.n_accounted == r.n_total
    r = vectors.pca_kmeans_summary(spark, sf_dir).collect()[0]
    assert r.cluster_min == 0 and r.cluster_max == r.n_clusters - 1
    assert r.n_pc_complete == r.n_rows


def test_near_dup_lsh_verified_containment_and_recall(spark, sf_dir):
    """The benched LSH headline must emit a SUBSET of the exact pair set
    (every emitted pair is exact-verified) with recall >= 0.8, and the
    oracle twin (exact_limit=2500) must equal the exact set."""
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.near_dup_auto_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.near_dup_lsh_verified(spark, sf_dir).collect()
    }
    assert exact
    assert set(lsh) <= set(exact)
    for pair, sim in lsh.items():
        assert sim == exact[pair]
    assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))


def test_pq_recall_vs_exact(spark, sf_dir):
    """PQ-ANN (codes + ADC + exact re-rank) must keep the contract
    floor's aggregate recall against exact top-k, and its output must
    be well-formed per query (<= TOP_K rows, exact sims, rank order)."""
    exact = _topk_sets(similarity.cosine_topk(spark, sf_dir))
    rows = similarity.ann_pq_topk(spark, sf_dir).collect()
    approx = {}
    for r in rows:
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert 1 <= r.rank <= similarity.TOP_K
        assert r.neighbor_id != r.query_id
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= similarity.PQ_RECALL_MIN_PCT / 100, (hits, total)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= similarity.TOP_K
        sims = [r.sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_adc_literal_and_batch_paths_identical(spark, sf_dir):
    """The ADC router's two forms — literal maps compiled into the plan
    vs one broadcast lookup row (ADC_LITERAL_MAX_QUERIES) — must produce
    IDENTICAL (query_id, neighbor_id, adc_sim) rows: same lookups, same
    accumulation order, only where the table lives differs."""
    import numpy as np
    from pyspark.sql import functions as F

    corpus = similarity.pin(similarity._corpus(spark, sf_dir))
    qrows = sorted(
        corpus.filter(F.col("vec_id") < similarity.N_QUERIES)
        .select("vec_id", "emb")
        .collect()
    )
    books = similarity._pq_codebooks(corpus)
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    qnorm = np.sqrt((Q * Q).sum(1))
    coded = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        similarity._pq_encode(books)(F.col("emb")).alias("codes"),
    )

    def rows(use_literal):
        out = similarity._adc_explode(
            coded, books, Q, qids, qnorm, use_literal=use_literal
        )
        return sorted(
            (r.query_id, r.neighbor_id, r.adc_sim) for r in out.collect()
        )

    lit_rows, batch_rows = rows(True), rows(False)
    assert lit_rows == batch_rows  # bit-identical, not approx
    assert len(lit_rows) > 0


def test_adc_router_switches_on_query_count(spark, sf_dir, monkeypatch):
    """Routing: at |Q| <= ADC_LITERAL_MAX_QUERIES the plan carries the
    literal maps (no join); above it the broadcast lookup row appears
    as a BroadcastNestedLoopJoin of the 1-row lut frame."""
    import numpy as np
    from pyspark.sql import functions as F

    corpus = similarity._corpus(spark, sf_dir).limit(200)
    qrows = sorted(
        corpus.filter(F.col("vec_id") < similarity.N_QUERIES)
        .select("vec_id", "emb")
        .collect()
    )
    books = similarity._pq_codebooks(corpus)
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    qnorm = np.sqrt((Q * Q).sum(1))
    coded = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        similarity._pq_encode(books)(F.col("emb")).alias("codes"),
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # default (threshold 0 since r13 — the literal plan's compile cost
    # exceeds the broadcast row's execution): the broadcast lut row
    p_default = plan(similarity._adc_explode(coded, books, Q, qids, qnorm))
    assert "_adc_lut" in p_default and "Broadcast" in p_default

    # raise the threshold above |Q|: the literal form must come back
    monkeypatch.setattr(similarity, "ADC_LITERAL_MAX_QUERIES", 1_000_000)
    p_lit = plan(similarity._adc_explode(coded, books, Q, qids, qnorm))
    assert "_adc_lut" not in p_lit


def test_residual_adc_literal_and_batch_paths_identical(spark, sf_dir, monkeypatch):
    """The residual router's two forms — literal maps (incl. the
    centroid-keyed qc/cn2/cross terms) vs the one broadcast lut row —
    must produce IDENTICAL (query_id, neighbor_id, adc_sim) rows, and
    the router must switch on ADC_LITERAL_MAX_QUERIES exactly like the
    flat path (ivfpq_serve is the bulk-batch serving half, so its plan
    size must not grow with the query count)."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = similarity.pin(similarity._corpus(spark, sf_dir).limit(300))
    vecs = corpus.withColumn("vec", array_to_vector(F.col("emb")))
    model = KMeans(
        k=similarity.IVF_K, seed=42, featuresCol="vec", predictionCol="centroid"
    ).fit(vecs)
    centers = np.stack([np.asarray(c, dtype=float) for c in model.clusterCenters()])
    assigned = similarity.pin(
        model.transform(vecs).select("vec_id", "emb", "centroid")
    )
    books = similarity._pq_codebooks_residual(assigned, centers)
    qrows = sorted(
        corpus.filter(F.col("vec_id") < similarity.N_QUERIES)
        .select("vec_id", "emb")
        .collect()
    )
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    qnorm = np.sqrt((Q * Q).sum(1))
    coded = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid",
        similarity._pq_encode_residual(books, centers)(
            F.col("emb"), F.col("centroid")
        ).alias("codes"),
    )

    def rows(use_literal):
        out = similarity._adc_explode_residual(
            coded, books, Q, qids, qnorm, centers, use_literal=use_literal
        )
        return sorted(
            (r.query_id, r.neighbor_id, r.centroid, r.adc_sim) for r in out.collect()
        )

    lit_rows, batch_rows = rows(True), rows(False)
    assert lit_rows == batch_rows  # bit-identical, not approx
    assert len(lit_rows) > 0

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # default (threshold 0 since r13 — see ADC_LITERAL_MAX_QUERIES):
    # the broadcast lut row with the centroid-keyed cross terms
    p_default = plan(
        similarity._adc_explode_residual(coded, books, Q, qids, qnorm, centers)
    )
    assert "_adc_cross" in p_default and "Broadcast" in p_default

    # raise the threshold above |Q|: the literal form must come back
    monkeypatch.setattr(similarity, "ADC_LITERAL_MAX_QUERIES", 1_000_000)
    p_lit = plan(
        similarity._adc_explode_residual(coded, books, Q, qids, qnorm, centers)
    )
    assert "_adc_cross" not in p_lit


def test_residual_adc_matches_numpy_reconstruction(spark, sf_dir, tmp_path):
    """Residual-ADC is exact over the RECONSTRUCTION: for every scored
    (query, neighbor) row, adc_sim must equal the numpy cosine between
    the query and center[centroid] + decode(codes) — the cross-term and
    norm bookkeeping of by_residual has no approximation of its own."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = similarity.pin(similarity._corpus(spark, sf_dir).limit(300))
    vecs = corpus.withColumn("vec", array_to_vector(F.col("emb")))
    model = KMeans(
        k=similarity.IVF_K, seed=42, featuresCol="vec", predictionCol="centroid"
    ).fit(vecs)
    centers = np.stack([np.asarray(c, dtype=float) for c in model.clusterCenters()])
    assigned = model.transform(vecs).select("vec_id", "emb", "centroid")
    books = similarity._pq_codebooks_residual(assigned, centers)

    qrows = sorted(
        corpus.filter(F.col("vec_id") < similarity.N_QUERIES)
        .select("vec_id", "emb")
        .collect()
    )
    Q = np.stack([np.asarray(r[1], dtype=float) for r in qrows])
    qids = [int(r[0]) for r in qrows]
    qnorm = np.sqrt((Q * Q).sum(1))

    coded = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid",
        similarity._pq_encode_residual(books, centers)(
            F.col("emb"), F.col("centroid")
        ).alias("codes"),
    )
    rows = similarity._adc_explode_residual(
        coded, books, Q, qids, qnorm, centers
    ).collect()
    assert rows

    qpos = {q: i for i, q in enumerate(qids)}
    code_rows = {r.neighbor_id: (r.centroid, list(r.codes)) for r in coded.collect()}
    sub = books[0].shape[1]
    checked = 0
    for r in rows[:500]:
        cent, codes = code_rows[r.neighbor_id]
        recon = centers[cent].copy()
        for m, k in enumerate(codes):
            recon[m * sub : (m + 1) * sub] += books[m][k]
        q = Q[qpos[r.query_id]]
        expect = float(q @ recon / (np.linalg.norm(q) * np.linalg.norm(recon)))
        assert abs(r.adc_sim - expect) < 1e-9, (r, expect)
        checked += 1
    assert checked > 0


def test_ivfpq_append_visible_to_serve(spark, sf_dir, tmp_path):
    """Incremental append correctness: a vector appended AFTER the index
    build (a near-copy of an existing one) must be found by the probe
    path — appended rows land in the right centroid partition and serve
    reads them with no re-fit."""
    from pyspark.sql import functions as F

    corpus = similarity.pin(similarity._corpus(spark, sf_dir).limit(300))
    path = str(tmp_path / "ivfpq_append")
    books, centers = similarity.ivfpq_build_index(spark, corpus, path)

    # the appended twin: vec_id 9_000_000, almost identical to vec 0
    twin_src = corpus.filter(F.col("vec_id") == 0).collect()[0].emb
    twin = [float(x) + 1e-4 for x in twin_src]
    delta = spark.createDataFrame(
        [(9_000_000, twin)], "vec_id long, emb array<double>"
    )
    coded = delta.select(
        "vec_id",
        similarity._assign_centroids(centers)(F.col("emb")).alias("centroid"),
        "emb",
    )
    coded.select(
        "vec_id",
        "centroid",
        similarity._pq_encode_residual(books, centers)(
            F.col("emb"), F.col("centroid")
        ).alias("codes"),
    ).write.mode("append").partitionBy("centroid").parquet(path)
    coded.select("vec_id", "emb", "centroid").write.mode("append").partitionBy(
        "centroid"
    ).parquet(path + "_flat")

    qrows = [(0, list(twin_src))]
    out = similarity.ivfpq_serve(spark, path, books, centers, qrows).collect()
    got = {r.neighbor_id: r.rank for r in out}
    # the twin is ~cos 1.0 with the query: it must be the top neighbor
    assert got.get(9_000_000) == 1, got


def test_ivfpq_meta_roundtrips_serving_state(spark, sf_dir, tmp_path):
    """The persisted quantizer meta (ivfpq_build_index's third file)
    must reload to numerically IDENTICAL codebooks and centroids —
    the cold-start requirement ivfpq_serve_contract certifies
    end-to-end at the serve level."""
    import numpy as np
    from pyspark.sql import functions as F

    corpus = similarity.pin(similarity._corpus(spark, sf_dir).limit(300))
    path = str(tmp_path / "ivfpq_meta_rt")
    books, centers = similarity.ivfpq_build_index(spark, corpus, path)
    books2, centers2 = similarity.ivfpq_load_meta(spark, path)
    assert np.array_equal(centers, centers2)
    assert len(books) == len(books2)
    for b, b2 in zip(books, books2):
        assert np.array_equal(b, b2)


def test_hard_negatives_are_cross_label_and_hardest(spark, sf_dir):
    """Every mined negative has a label different from its anchor's,
    each anchor gets exactly TOP_K rows, and no skipped same-label row
    outranks a kept negative (the 'hard' in hard negative)."""
    from pyspark.sql import functions as F

    out = similarity.hard_negative_mining(spark, sf_dir).collect()
    labels = {
        r.vec_id: r.label
        for r in similarity.load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    by_anchor: dict[int, list] = {}
    for r in out:
        assert labels[r.neighbor_id] != labels[r.anchor_id]
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for a, rs in by_anchor.items():
        assert len(rs) == similarity.TOP_K
        # sim_q4 = round(sim*10000) as integer (the q4 lattice, tie-free
        # cross-engine); rank order is by the raw double, so quantized
        # values are non-increasing (ties possible on the lattice)
        sims = [r.sim_q4 for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(isinstance(s, int) for s in sims)


def test_isotropy_participation_ratio_bounds(spark, sf_dir):
    """1 <= participation ratio <= d always; the fixture's near-random
    unit vectors should use most of the space (PR well above d/2), and
    trace(G) must equal the vector count (unit norms)."""
    from ssafynews_data_spark.operators import vectors

    r = vectors.embedding_isotropy_stats(spark, sf_dir).collect()[0]
    assert 1.0 <= r.participation_ratio <= vectors.EMB_DIM
    assert r.participation_ratio > vectors.EMB_DIM / 2
    assert abs(r.trace_g - r.n_vectors) < 0.01 * r.n_vectors


def test_opq_fit_invariants(spark, sf_dir):
    """OPQ (Ge et al. 2013) invariants that hold on ANY draw: the
    Procrustes rotation is orthogonal to machine precision, trained
    sample-SSE never exceeds plain PQ's (best-so-far includes the
    R = I iteration), and the contract's booleans are all true."""
    import numpy as np

    corpus = similarity._corpus(spark, sf_dir)
    X = np.stack(
        [np.asarray(r.emb, dtype=float) for r in corpus.limit(600).collect()]
    )
    R, opq_books, plain_books, plain_sse, opq_sse = similarity._opq_fit(X)
    d = X.shape[1]
    assert np.abs(R.T @ R - np.eye(d)).max() < 1e-10
    assert opq_sse <= plain_sse
    assert len(opq_books) == similarity.PQ_M
    assert all(b.shape == (similarity.PQ_K, d // similarity.PQ_M) for b in opq_books)

    row = similarity.opq_rotation_contract(spark, sf_dir).collect()[0]
    assert row.rotation_orthogonal_ok
    assert row.opq_train_sse_le_plain
    assert row.opq_corpus_sse_ok
    assert row.n_vectors == corpus.count()


def test_opq_ivfpq_contract_and_mismatch_detector_fires(spark, sf_dir, tmp_path):
    """The composed OPQ→IVF-PQ contract holds on the fixture, and the
    rotation-preservation detector is NOT vacuous: a deliberately
    non-orthogonal 'rotation' (a projection that zeroes half the
    dimensions) must change the exact top-k sets and be caught."""
    import numpy as np
    from pyspark.sql import functions as F

    row = similarity.opq_ivfpq_serve_contract(spark, sf_dir).collect()[0]
    assert row.rotation_preserves_exact_topk
    assert row.recall_ok
    assert row.n_queries == similarity.N_QUERIES
    assert row.n_exact_rows == similarity.N_QUERIES * similarity.TOP_K

    corpus = similarity._corpus(spark, sf_dir)
    d = len(corpus.first().emb)
    bad = np.eye(d)
    bad[d // 2 :, d // 2 :] = 0.0  # rank-deficient: kills half the space
    broken = corpus.select(
        "vec_id", similarity._rotate_embeddings(bad)(F.col("emb")).alias("emb")
    )
    orig = similarity._exact_topk_frame(corpus)
    rot = similarity._exact_topk_frame(broken)
    # the PRODUCTION detector (boundary-banded symmetric difference)
    # must fire — a broken rotation perturbs sims at O(1), far beyond
    # the ROTATION_TIE_EPS exclusion band
    n_mismatch = similarity._rotation_mismatches(orig, rot).count()
    assert n_mismatch > 0, "projection must perturb exact top-k sets"
    # and the band must be a no-op on the identity "rotation"
    assert similarity._rotation_mismatches(orig, orig).count() == 0


def test_sq8_codec_roundtrip_and_detector_fires(spark, sf_dir, tmp_path):
    """The SQ8 round-to-nearest bound holds for the real codec and the
    corpus-wide bound check is NOT vacuous: a truncating encoder
    (floor instead of round) must violate step/2 and be caught."""
    from pyspark.sql import functions as F

    corpus = similarity._corpus(spark, sf_dir)
    if corpus.isEmpty():
        pytest.skip("empty corpus")
    path = str(tmp_path / "sq8")
    vmin, vmax = similarity.sq8_build_index(spark, corpus, path)
    codes = spark.read.parquet(path)
    assert similarity._sq8_recon_ok(codes, corpus, vmin, vmax)

    # truncating codec: codes systematically one level low for ~half
    # the entries -> reconstruction error up to a full step
    lo, rng = similarity._sq8_lit(vmin), similarity._sq8_lit(vmax - vmin)
    floor_codes = corpus.select(
        "vec_id",
        F.transform(
            F.col("emb"),
            lambda x, i: F.when(
                F.element_at(rng, i + 1) > 0.0,
                F.floor(
                    (x - F.element_at(lo, i + 1))
                    * similarity.SQ_LEVELS
                    / F.element_at(rng, i + 1)
                ).cast("int"),
            ).otherwise(F.lit(0)),
        ).alias("codes"),
    )
    assert not similarity._sq8_recon_ok(floor_codes, corpus, vmin, vmax)


def test_sq8_serve_contract_row(spark, sf_dir):
    row = similarity.sq8_serve_contract(spark, sf_dir).collect()[0]
    assert row.state_roundtrip_ok
    assert row.recon_err_bounded
    assert row.recall_ok
    assert row.n_queries == similarity.N_QUERIES
    assert row.n_exact_rows == similarity.N_QUERIES * similarity.TOP_K


def test_sq8_meta_cold_start_matches_train(spark, sf_dir, tmp_path):
    """The persisted quantizer meta reloads to the exact trained
    arrays (doubles roundtrip parquet bit-exactly)."""
    import numpy as np

    corpus = similarity._corpus(spark, sf_dir)
    if corpus.isEmpty():
        pytest.skip("empty corpus")
    path = str(tmp_path / "sq8meta")
    vmin, vmax = similarity.sq8_build_index(spark, corpus, path)
    vmin2, vmax2 = similarity.sq8_load_meta(spark, path)
    assert np.array_equal(vmin, vmin2)
    assert np.array_equal(vmax, vmax2)


def test_contrastive_triplet_invariants(spark, sf_dir):
    """Triplets: the positive shares the anchor's label, every negative
    differs, neg ranks are 1..TOP_K dense per anchor, and margin_q4 is
    the exact integer difference."""
    from collections import defaultdict

    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    rows = similarity.contrastive_triplet_mining(spark, sf_dir).collect()
    if not labels:
        assert rows == []
        return
    assert rows
    per_anchor = defaultdict(set)
    for t in rows:
        assert labels[t.positive_id] == labels[t.anchor_id]
        assert labels[t.negative_id] != labels[t.anchor_id]
        assert t.margin_q4 == t.pos_sim_q4 - t.neg_sim_q4
        per_anchor[t.anchor_id].add(t.neg_rank)
    for a, ranks in per_anchor.items():
        assert ranks == set(range(1, len(ranks) + 1))
        assert len(ranks) <= similarity.TOP_K


def test_ivf_sq8_serve_contract_row(spark, sf_dir):
    row = similarity.ivf_sq8_serve_contract(spark, sf_dir).collect()[0]
    assert row.state_roundtrip_ok
    assert row.recon_err_bounded
    assert row.recall_ok
    assert row.retention_ok
    assert row.n_queries == similarity.N_QUERIES
    assert row.n_exact_rows == similarity.N_QUERIES * similarity.TOP_K


def test_ivf_sq8_pruned_reads(spark, sf_dir, tmp_path):
    """The IVF-SQ8 codes and flat tables are centroid-partitioned and a
    probe read prunes to the probed partitions (PartitionFilters), the
    same serving guarantee the IVF-PQ family pins."""
    from pyspark.sql import functions as F

    corpus = similarity._corpus(spark, sf_dir)
    if corpus.isEmpty():
        pytest.skip("empty corpus")
    path = str(tmp_path / "ivfsq8")
    centers, vmin, vmax = similarity.ivfsq8_build_index(spark, corpus, path)
    back = spark.read.parquet(path)
    assert set(back.columns) == {"vec_id", "codes", "centroid"}
    row = back.first()
    assert len(row.codes) == len(vmin)
    assert all(0 <= c <= similarity.SQ_LEVELS for c in row.codes)
    for suffix in ("", "_flat"):
        probe = spark.read.parquet(path + suffix).filter(
            F.col("centroid").isin([0, 1])
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        pf = plan.split("PartitionFilters: [")[1].split("]")[0]
        assert "centroid" in pf


def test_ivfpq_recall_contract_rows_but_no_query_ids(spark, tmp_path):
    """Rows but no vec_id < N_QUERIES (a shape tiny reseeds can draw):
    ivfpq_index_topk never builds the artifact (there is nothing to
    serve), so the contract must emit the vacuous row — counts 0, NULL
    sim sum, both floors TRUE — WITHOUT touching the (nonexistent or
    stale) meta/flat paths for its flat-IVF retention baseline (r13
    optimization-round regression guard)."""
    import os

    from ssafynews_data_spark.registry import load_all
    from ssafynews_data_spark.schemas import TESTDATA_SCHEMAS

    d = str(tmp_path / "noq_sf")
    for name, schema in TESTDATA_SCHEMAS.items():
        rows = []
        if name == "embeddings":
            rows = [
                (
                    similarity.N_QUERIES + i,
                    [float(i + j) / 8.0 for j in range(8)],
                    i % 3,
                )
                for i in range(30)
            ]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(d, f"{name}.parquet")
        )
    out = load_all()["ivfpq_recall_contract"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_queries == 0
    assert r.n_exact_rows == 0
    assert r.exact_sim_sum_q4 is None
    assert bool(r.recall_ok) and bool(r.retention_ok)


def test_sq8_sql_twins_match_column_forms(spark):
    """r14 optimization guard: the SQL-string twins (_cosine_sql,
    _sq8_encode_sql, _sq8_dequant_sql, _arr_sql/_arr2_sql) must produce
    BIT-IDENTICAL doubles/ints to the Column-API forms they replaced on
    the hot construction paths (guide §7.3 — one parse instead of
    hundreds of py4j round-trips).  Exact ==, not approx."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    vecs = [[float(x) for x in rng.uniform(-1.3, 2.7, 16)] for _ in range(40)]
    df = spark.createDataFrame(
        [(i, vecs[i], vecs[(i * 7 + 3) % 40]) for i in range(40)],
        "id long, a array<double>, b array<double>",
    )

    # cosine
    col_rows = df.select("id", similarity.cosine(F.col("a"), F.col("b")).alias("s")).collect()
    sql_rows = df.selectExpr("id", f"{similarity._cosine_sql('a', 'b')} AS s").collect()
    assert sorted((r.id, r.s) for r in col_rows) == sorted((r.id, r.s) for r in sql_rows)

    # encode: Column _sq8_encode vs _sq8_encode_sql on the same bounds
    X = np.array(vecs)
    vmin, vmax = X.min(0), X.max(0)
    vmax[3] = vmin[3]  # one constant dim exercises the ELSE 0 branch
    enc_col = df.select(
        "id", similarity._sq8_encode(vmin, vmax, F.col("a")).alias("c")
    ).collect()
    enc_sql = df.selectExpr(
        "id", f"{similarity._sq8_encode_sql(vmin, vmax, 'a')} AS c"
    ).collect()
    assert sorted((r.id, list(r.c)) for r in enc_col) == sorted(
        (r.id, list(r.c)) for r in enc_sql
    )

    # dequant: Column _sq8_dequant_col vs _sq8_dequant_sql over a coded
    # frame joined with the quantizer const row
    coded = df.selectExpr(
        "id", f"{similarity._sq8_encode_sql(vmin, vmax, 'a')} AS codes"
    ).crossJoin(F.broadcast(similarity._sq8_const_row(spark, vmin, vmax)))
    deq_col = coded.select("id", similarity._sq8_dequant_col().alias("d")).collect()
    deq_sql = coded.selectExpr("id", f"{similarity._sq8_dequant_sql()} AS d").collect()
    assert sorted((r.id, list(r.d)) for r in deq_col) == sorted(
        (r.id, list(r.d)) for r in deq_sql
    )

    # array literals: parsed repr round-trip == F.lit doubles
    mat = np.array(vecs[:3])
    lit_col = df.limit(1).select(
        F.array(*[similarity._sq8_lit(row) for row in mat]).alias("m")
    ).collect()[0].m
    lit_sql = df.limit(1).selectExpr(
        f"{similarity._arr2_sql(mat)} AS m"
    ).collect()[0].m
    assert [list(r) for r in lit_col] == [list(r) for r in lit_sql]
