"""Dedup-suite invariants: approximate methods validated against the
exact Jaccard ground truth (SURVEY.md §5 strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.operators import dedup
from ssafynews_data_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingles_col,
)


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one two",), ("a b c d",)], "text string")
    vals = df.select(shingles_col(F.col("text")).alias("sh")).collect()
    assert vals[0].sh == []
    assert vals[1].sh == ["a b c", "b c d"]


def test_exact_dedup_finds_planted_duplicates(spark):
    rows = [(1, "alpha beta gamma"), (2, "alpha  BETA gamma"), (3, "unique doc here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    groups = (
        df.select(F.md5(norm.cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
        .collect()
    )
    sizes = sorted(g.n for g in groups)
    assert sizes == [1, 2]  # docs 1+2 normalize identically


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """Every truly-similar pair (exact jaccard >= threshold) must be
    recovered by the MinHash/LSH candidates — banding with 8 bands of 4
    rows has >99% recall at j=0.5."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert exact, "fixture should contain at least one near-dup pair"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))


def test_minhash_estimates_close(spark, sf_dir):
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard_q4 / 10000.0
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    common = set(est) & set(exact)
    assert common
    for pair in common:
        assert abs(est[pair] - exact[pair]) < 0.35  # 32 hashes → se ~ 0.09


def test_lsh_candidates_subset_consistency(spark, sf_dir):
    sh = dedup._doc_shingles(spark, sf_dir)
    sigs = minhash_signatures(sh)
    cands = lsh_candidate_pairs(sigs)
    rows = cands.collect()
    assert all(r.doc_a < r.doc_b for r in rows)


def test_simhash_pairs_symmetric_threshold(spark, sf_dir):
    rows = dedup.simhash_pairs(spark, sf_dir).collect()
    assert all(r.doc_a < r.doc_b for r in rows)
    assert all(0 <= r.hamming <= dedup.HAMMING_THRESHOLD for r in rows)


def test_connected_components_consistent_with_pairs(spark, sf_dir):
    """Every near-dup pair lands in one component; every component id is
    the min doc_id of its member set; docs without any pair are absent."""
    from ssafynews_data_spark.operators.dedup import (
        dedup_connected_components,
        ngram_jaccard_pairs,
    )

    pairs = [(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, sf_dir).collect()]
    comp = {
        r.doc_id: r.component_id
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    assert pairs and comp
    for a, b in pairs:
        assert comp[a] == comp[b], (a, b)
    # component id == min member id
    members: dict[int, list[int]] = {}
    for node, c in comp.items():
        members.setdefault(c, []).append(node)
    for c, nodes in members.items():
        assert c == min(nodes)
    # membership is exactly the union-find closure of the pair list
    parent = {n: n for n in comp}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in comp:
        assert comp[n] == find(n)


def test_pagerank_conserves_mass_and_ranks_hubs(spark):
    """On a star graph the hub must dominate; total mass stays ≈ |nodes|
    (non-normalized damped formulation); reruns agree at 1e-6."""
    from ssafynews_data_spark.operators.dedup import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(10, 11)], "a long, b long"
    )
    rows = {r.node: r.pr for r in pagerank(edges).collect()}
    n = len(rows)
    assert abs(sum(rows.values()) - n) < 0.15 * n  # dangling-free graph
    assert rows[0] == max(rows.values())  # star hub dominates
    assert all(abs(rows[i] - rows[1]) < 1e-9 for i in range(2, 6))  # leaf symmetry
    again = {r.node: r.pr for r in pagerank(edges).collect()}
    assert all(abs(again[k] - v) < 1e-6 for k, v in rows.items())


def test_pagerank_canonical_per_component(spark, sf_dir):
    """Every near-dup component must get ranks for exactly its nodes."""
    from ssafynews_data_spark.operators.dedup import (
        dedup_connected_components,
        dedup_graph_pagerank,
    )

    pr = {r.doc_id for r in dedup_graph_pagerank(spark, sf_dir).collect()}
    cc = {r.doc_id for r in dedup_connected_components(spark, sf_dir).collect()}
    assert pr == cc


def _union_find_labels(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_largestar_cc_matches_union_find_on_adversarial_graphs(spark):
    """Large-star/small-star must match union-find ground truth on the
    graphs that defeat O(diameter) propagation: a 60-node path (diameter
    59 > the propagation round cap), plus seeded random graphs."""
    import random

    from ssafynews_data_spark.operators.dedup import connected_components_star

    cases = [[(i, i + 1) for i in range(60)]]  # long chain
    for seed in (1, 7):
        rng = random.Random(seed)
        n = 80
        cases.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        )
    # descending chain ids: minimum at the FAR end of the path
    cases.append([(100 - i, 99 - i) for i in range(50)])
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        nodes = {x for e in edges for x in e}
        truth = _union_find_labels(edges, nodes)
        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            r.node: r.label
            for r in connected_components_star(df).collect()
        }
        assert got == truth


def test_largestar_cc_equals_propagation_on_fixture(spark, sf_dir):
    """Both registered CC queries (propagation and star alternation) must
    produce the identical component map on the near-dup fixture graph."""
    from ssafynews_data_spark.operators.dedup import (
        dedup_cc_largestar,
        dedup_connected_components,
    )

    a = {
        (r.doc_id, r.component_id)
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    b = {
        (r.doc_id, r.component_id)
        for r in dedup_cc_largestar(spark, sf_dir).collect()
    }
    assert a == b and a


def test_minhash_verified_subset_and_recall(spark, sf_dir):
    """The banded chain's honest contract (r8 — the exact-equality claim
    moved to the deterministic prefix-filter twin after a reseeded
    fixture planted a Jaccard-boundary pair the 4×8 banding legitimately
    missed): every emitted pair is in the exact set with the identical
    quantized Jaccard (precision 1.0 — the verify step is exact), and
    recall stays above the S-curve expectation for the fixture's
    comfortably-above-threshold pairs."""
    exact = {
        (r.doc_a, r.doc_b, r.jaccard_q4)
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    verified = {
        (r.doc_a, r.doc_b, r.jaccard_q4)
        for r in dedup.minhash_verified_pairs(spark, sf_dir).collect()
    }
    assert exact and verified
    assert verified <= exact  # precision 1.0, values bit-identical
    assert len(verified) >= 0.9 * len(exact), (len(verified), len(exact))


def test_prefix_filter_equals_exact(spark, sf_dir):
    """The deterministic twin really is complete: prefix-filtered
    candidates + exact verify EQUAL the exact pair set (the guarantee
    the driver oracle states)."""
    from ssafynews_data_spark.operators.setjoin import prefix_filter_jaccard_pairs

    exact = {
        (r.doc_a, r.doc_b, r.jaccard_q4)
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    pf = {
        (r.doc_a, r.doc_b, r.jaccard_q4)
        for r in prefix_filter_jaccard_pairs(spark, sf_dir).collect()
    }
    assert exact and pf == exact


def test_winnowing_guarantee_shared_substring(spark, tmp_path):
    """Winnowing's core guarantee: two documents sharing a token run of
    length >= W+K-1 must share at least one fingerprint; fingerprints
    are ~2/(W+1) of the k-gram count on long docs."""
    import os

    from pyspark.sql import functions as F

    from ssafynews_data_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        _WINNOW_ENC,
        winnow_fingerprints,
    )

    import hashlib
    import re

    def py_winnow_hashes(text):
        """Reference implementation of the same algorithm (md5-derived
        32-bit k-gram hashes, window-min, rightmost tie-break),
        returning the HASH parts (position-stripped) for overlap checks."""
        toks = [t for t in re.split(r"[^\w]+", text.lower()) if t]
        grams = [
            " ".join(toks[i : i + WINNOW_K])
            for i in range(len(toks) - WINNOW_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        sel = set()
        for j in range(max(len(hs) - WINNOW_W + 1, 1) if hs else 0):
            win = hs[j : j + WINNOW_W]
            mn = min(win)
            pos = j + len(win) - 1 - win[::-1].index(mn)
            sel.add((pos, mn))
        return sel

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 >= W+K-1 = 6
    texts = {
        1: f"one two {shared} three four five six seven",
        2: f"nine ten {shared} eleven twelve thirteen fourteen",
        3: "совершенно другой текст без общих слов вовсе",
    }
    docs = spark.createDataFrame(
        [(i, t, "en", "s", 10) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    rows = {r.doc_id: r for r in winnow_fingerprints(spark, d).collect()}

    ref = {i: py_winnow_hashes(t) for i, t in texts.items()}
    # the guarantee, on the reference sets: shared run => shared hash
    h1 = {h for _, h in ref[1]}
    h2 = {h for _, h in ref[2]}
    h3 = {h for _, h in ref[3]}
    assert h1 & h2, "shared >= W+K-1 token run must share a fingerprint hash"
    assert not (h1 & h3)
    # the Spark frame must agree with the reference implementation
    for i in texts:
        assert rows[i].n_fingerprints == len(ref[i]), i
        assert rows[i].fp_sum == sum(
            (pos + 1) * _WINNOW_ENC + h for pos, h in ref[i]
        ), i


def test_exact_substring_spans_semantics(spark, tmp_path):
    """Planted corpus pins the Lee-et-al. span semantics: a shared
    >=L-token run is found in BOTH docs and overlapping windows merge
    into ONE maximal span of exactly the shared length; unique text
    reports zero; within-doc repetition counts without a second doc;
    sub-L sharing is invisible."""
    import os

    from ssafynews_data_spark.operators.dedup import EXSUB_L, exact_substring_spans

    shared = " ".join(f"tok{i}" for i in range(EXSUB_L + 4))  # L+4 tokens
    rep = " ".join(f"rep{i}" for i in range(EXSUB_L))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta", "en", "s", 10),
            (2, f"zeta {shared} eta theta iota", "en", "s", 10),
            (3, "totally unique words only here never repeated anywhere at all ok", "en", "s", 10),
            (4, f"{rep} filler0 filler1 filler2 {rep}", "en", "s", 10),
            (5, "short shared run tok0 tok1 tok2 ends", "en", "s", 10),  # < L overlap
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in exact_substring_spans(spark, d).collect()}

    # docs 1 and 2: one merged span of exactly len(shared) = L+4 tokens
    for doc in (1, 2):
        assert out[doc].n_dup_spans == 1, out[doc]
        assert out[doc].n_dup_tokens == EXSUB_L + 4, out[doc]
    # unique doc: clean
    assert out[3].n_dup_spans == 0 and out[3].n_dup_tokens == 0
    # within-doc repetition: two spans of exactly L each (separated by
    # 3 filler tokens > 0, so they do NOT merge)
    assert out[4].n_dup_spans == 2 and out[4].n_dup_tokens == 2 * EXSUB_L
    # sub-L sharing with doc 1's tokens: invisible
    assert out[5].n_dup_spans == 0
    # frac sanity
    assert abs(out[1].dup_frac - (EXSUB_L + 4) / out[1].n_tokens) < 1e-3


def test_substring_span_removal_semantics(spark, tmp_path):
    """The removal consumer keeps ONE canonical occurrence corpus-wide:
    with the same planted corpus, doc 1 (first in (doc_id, pos) order)
    keeps the shared run intact while doc 2 loses exactly it; the
    within-doc repeat keeps its first occurrence and drops the second;
    clean docs pass through byte-identical."""
    import hashlib
    import os

    from ssafynews_data_spark.operators.dedup import EXSUB_L, substring_span_removal

    shared = " ".join(f"tok{i}" for i in range(EXSUB_L + 4))  # L+4 tokens
    rep = " ".join(f"rep{i}" for i in range(EXSUB_L))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta", "en", "s", 10),
            (2, f"zeta {shared} eta theta iota", "en", "s", 10),
            (3, "totally unique words only here never repeated anywhere at all ok", "en", "s", 10),
            (4, f"{rep} filler0 filler1 filler2 {rep}", "en", "s", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in substring_span_removal(spark, d).collect()}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 1 is canonical for every shared window: untouched
    assert out[1].n_removed_tokens == 0
    assert out[1].n_kept_tokens == out[1].n_tokens == EXSUB_L + 8
    assert out[1].cleaned_md5 == md5(f"alpha beta {shared} gamma delta")
    # doc 2 loses exactly the shared run, surrounding text survives
    assert out[2].n_removed_tokens == EXSUB_L + 4
    assert out[2].n_kept_tokens == 4
    assert out[2].cleaned_md5 == md5("zeta eta theta iota")
    # clean doc: byte-identical pass-through
    assert out[3].n_removed_tokens == 0
    assert out[3].cleaned_md5 == md5(
        "totally unique words only here never repeated anywhere at all ok"
    )
    # within-doc repeat: first occurrence canonical, second removed
    assert out[4].n_removed_tokens == EXSUB_L
    assert out[4].n_kept_tokens == EXSUB_L + 3
    assert out[4].cleaned_md5 == md5(f"{rep} filler0 filler1 filler2")
    # conservation: kept + removed == total, every doc
    for r in out.values():
        assert r.n_kept_tokens + r.n_removed_tokens == r.n_tokens, r


def test_substring_span_removal_packing_bounds_raise(spark, tmp_path):
    """The (doc_id, pos) long-packing is bounds-ENFORCED at runtime: a
    doc_id beyond _EXSUB_DOC_MAX must raise from inside the plan rather
    than silently electing the wrong canonical occurrence (overflowed
    longs order arbitrarily)."""
    import os

    import pytest

    from ssafynews_data_spark.operators.dedup import (
        _EXSUB_DOC_MAX,
        EXSUB_L,
        substring_span_removal,
    )

    shared = " ".join(f"tok{i}" for i in range(EXSUB_L + 2))
    docs = spark.createDataFrame(
        [
            (_EXSUB_DOC_MAX + 7, f"a {shared} b", "en", "s", 10),
            (1, f"c {shared} d", "en", "s", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    with pytest.raises(Exception, match="packing bounds"):
        substring_span_removal(spark, d).collect()


def test_dedup_token_accounting_sums_to_corpus(spark, sf_dir):
    """Per-source rows sum to the corpus totals: total dup docs equal
    n_docs - distinct fingerprints, removed tokens never exceed the
    source's total, and every emission is a non-negative integer."""
    from pyspark.sql import functions as F

    from ssafynews_data_spark.operators.dedup import dedup_token_accounting
    from ssafynews_data_spark.sources.readers import load_table

    rows = dedup_token_accounting(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    if n_docs == 0:
        assert rows == []
        return
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[\\s\\x0B]+", " "))
    n_fps = docs.select(F.md5(norm.cast("binary"))).distinct().count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_dup_docs for r in rows) == n_docs - n_fps
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert 0 <= r.tokens_removed <= r.tokens_total
