"""Round-13 operator invariants: eval-overlap matrix, T5 span
corruption, curriculum-aware packing, capped mixture composition,
tokenizer staleness.

Oracles prove cross-engine parity; these tests prove the properties the
hash can't see (lattice geometry, order preservation, composition
exactness, band trip-wires).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.operators.bpe import (
    N_MERGES,
    bpe_encode,
    learn_bpe,
    tokenizer_staleness_audit,
)
from ssafynews_data_spark.operators.contamination import (
    BENCH_MOD,
    CONTAM_W,
    eval_overlap_matrix,
)
from ssafynews_data_spark.operators.sampling import (
    CAP_SALT,
    CAPMIX_SALT,
    DOMAIN_CAP,
    _md5_key,
    capped_mixture_pipeline,
    curriculum_schedule,
    hash_bucket,
)
from ssafynews_data_spark.operators.text import (
    GREEDY_PACK_CAPACITY,
    SPAN_CORRUPT_PCT,
    SPAN_MEAN_LEN,
    SPAN_SENTINEL_BASE,
    curriculum_pack_compose,
    span_corruption_masks,
    tokens_col,
)
from ssafynews_data_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# eval_overlap_matrix
# ---------------------------------------------------------------------------


def test_eval_overlap_matrix_is_dense_and_bounded(spark, sf_dir):
    rows = eval_overlap_matrix(spark, sf_dir).collect()
    trains = {r.train_source for r in rows}
    evals = {r.eval_source for r in rows}
    # dense: every (train, eval) cell present exactly once
    assert len(rows) == len(trains) * len(evals)
    assert len({(r.train_source, r.eval_source) for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r.n_shared_ngrams <= r.n_eval_ngrams
        assert 0 <= r.containment_q4 <= 10000
        assert r.containment_q4 == r.n_shared_ngrams * 10000 // r.n_eval_ngrams


def test_eval_overlap_matrix_matches_bruteforce(spark, sf_dir):
    """One cell re-derived by brute force over raw text (python-side
    shingling, no xxhash) must match the engine's hashed-join count."""
    import re

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tr_sh: dict[str, set] = defaultdict(set)
    ev_sh: dict[str, set] = defaultdict(set)
    for r in docs.collect():
        toks = [w for w in re.split(r"[^\w]+", (r.text or "").lower()) if w]
        sh = {
            " ".join(toks[i : i + CONTAM_W])
            for i in range(len(toks) - CONTAM_W + 1)
        }
        (ev_sh if r.doc_id % BENCH_MOD == 0 else tr_sh)[r.source] |= sh
    got = {
        (r.train_source, r.eval_source): (r.n_shared_ngrams, r.n_eval_ngrams)
        for r in eval_overlap_matrix(spark, sf_dir).collect()
    }
    assert set(got) == {(t, e) for t in tr_sh for e in ev_sh}
    for (t, e), (n_shared, n_eval) in got.items():
        assert n_eval == len(ev_sh[e])
        assert n_shared == len(tr_sh[t] & ev_sh[e])


# ---------------------------------------------------------------------------
# span_corruption_masks
# ---------------------------------------------------------------------------


def _doc_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tokens_col(F.col("text"))).alias("n")
        ).collect()
    }


def test_span_lattice_geometry(spark, sf_dir):
    """Spans stay inside the doc, never overlap, sum to the corrupt
    budget, and short docs emit nothing — the invariants T5's collator
    depends on."""
    n_tokens = _doc_tokens(spark, sf_dir)
    by_doc: dict[int, list] = defaultdict(list)
    for r in span_corruption_masks(spark, sf_dir).collect():
        by_doc[r.doc_id].append(r)
    min_corruptible = 100 // SPAN_CORRUPT_PCT + 1  # nc >= 1
    for doc_id, n in n_tokens.items():
        nc = n * SPAN_CORRUPT_PCT // 100
        if nc == 0:
            assert doc_id not in by_doc
            assert n < min_corruptible
            continue
        spans = sorted(by_doc[doc_id], key=lambda r: r.span_idx)
        ns = max(1, nc // SPAN_MEAN_LEN)
        assert len(spans) == ns
        assert [s.span_idx for s in spans] == list(range(ns))
        assert sum(s.span_len for s in spans) == nc
        prev_end = 0
        for s in spans:
            assert s.span_len >= 1
            assert s.span_start >= prev_end  # ordered, non-overlapping
            prev_end = s.span_start + s.span_len
            assert s.sentinel_id == SPAN_SENTINEL_BASE - s.span_idx
            assert s.enc_len == n - nc + ns
            assert s.dec_len == nc + ns + 1
        assert prev_end <= n  # last span inside the doc


def test_span_seq_coordinates_ride_the_packing(spark, sf_dir):
    """seq_start must equal the doc's packed block_pos + span_start —
    i.e. the mask layout and the packing can never drift apart."""
    from ssafynews_data_spark.operators.text import greedy_pack_layout

    packed = {
        r.doc_id: r for r in greedy_pack_layout(spark, sf_dir).collect()
    }
    for r in span_corruption_masks(spark, sf_dir).collect():
        p = packed[r.doc_id]
        assert r.bucket == p.bucket and r.block_id == p.block_id
        assert r.seq_start == p.block_pos + r.span_start
        assert r.seq_start + r.span_len <= p.block_pos + p.n_tokens


# ---------------------------------------------------------------------------
# curriculum_pack_compose
# ---------------------------------------------------------------------------


def test_curriculum_pack_preserves_schedule_order(spark, sf_dir):
    """pos_in_shard must equal curriculum_schedule's position for every
    doc, and within each (bin, shard) the packing must be monotone:
    block_id non-decreasing in schedule order, block_doc_idx counting up
    inside each block — packing never reorders the curriculum."""
    sched = {
        (r.bin, r.shard, r.doc_id): r.pos_in_shard
        for r in curriculum_schedule(spark, sf_dir).collect()
    }
    rows = curriculum_pack_compose(spark, sf_dir).collect()
    assert len(rows) == len(sched)
    by_shard: dict[tuple, list] = defaultdict(list)
    for r in rows:
        assert sched[(r.bin, r.shard, r.doc_id)] == r.pos_in_shard
        by_shard[(r.bin, r.shard)].append(r)
    for grp in by_shard.values():
        grp.sort(key=lambda r: r.pos_in_shard)
        assert [r.pos_in_shard for r in grp] == list(range(1, len(grp) + 1))
        prev_block, prev_idx = -1, -1
        for r in grp:
            if r.block_id == prev_block:
                assert r.block_doc_idx == prev_idx + 1
            else:
                assert r.block_id == prev_block + 1
                assert r.block_doc_idx == 0
            prev_block, prev_idx = r.block_id, r.block_doc_idx


def test_curriculum_pack_respects_capacity(spark, sf_dir):
    """Block fill <= capacity except the single-overlong-doc case, and
    block_pos is the running fill — the greedy no-split guarantees."""
    rows = curriculum_pack_compose(spark, sf_dir).collect()
    fills: dict[tuple, int] = defaultdict(int)
    docs_in: dict[tuple, int] = defaultdict(int)
    for r in rows:
        key = (r.bin, r.shard, r.block_id)
        assert r.block_pos == fills[key]  # contiguous, no gaps
        fills[key] += r.n_tokens
        docs_in[key] += 1
    for key, fill in fills.items():
        assert fill <= GREEDY_PACK_CAPACITY or docs_in[key] == 1


# ---------------------------------------------------------------------------
# capped_mixture_pipeline
# ---------------------------------------------------------------------------


def test_capped_mixture_accounting(spark, sf_dir):
    rows = capped_mixture_pipeline(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert {r.source for r in rows} == set(totals)
    for r in rows:
        assert r.n_docs == totals[r.source]
        assert r.n_capped == min(r.n_docs, DOMAIN_CAP)
        assert 0 <= r.n_final <= r.n_capped
        assert 0 <= r.threshold_bp <= 10000
        assert (r.n_final == 0) == (r.final_id_sum == 0) or r.final_id_sum > 0


def test_capped_mixture_equals_naive_composition(spark, sf_dir):
    """The fused two-phase pipeline must select EXACTLY the set the
    naive composition (single cap window, then threshold filter on the
    capped counts) selects — checked via the final_id_sum checksum."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("k", "doc_id")
    capped = (
        docs.select(
            "source", "doc_id", _md5_key(CAP_SALT, F.col("doc_id")).alias("k")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= DOMAIN_CAP)
    )
    counts = {
        r.source: r.n
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    import math

    weights = {s: math.floor(math.sqrt(n) * 1000) for s, n in counts.items()}
    total, wsum = sum(counts.values()), sum(weights.values())
    th = {
        s: min(10000, ((total // 2) * 10000 // wsum) * weights[s] // counts[s])
        for s in counts
    }
    b = hash_bucket(
        F.concat(F.lit(CAPMIX_SALT), F.col("doc_id").cast("string")), 10000
    )
    naive = defaultdict(int)
    for r in capped.withColumn("b", b).collect():
        if r.b < th[r.source]:
            naive[r.source] += r.doc_id
    result = capped_mixture_pipeline(spark, sf_dir).collect()
    got = {r.source: r.final_id_sum for r in result}
    got_th = {r.source: r.threshold_bp for r in result}
    for s in counts:
        assert got[s] == naive.get(s, 0)
    assert got_th == th


# ---------------------------------------------------------------------------
# tokenizer_staleness_audit
# ---------------------------------------------------------------------------


def test_tokenizer_staleness_contract_row(spark, sf_dir):
    rows = tokenizer_staleness_audit(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert r.n_docs_base + r.n_docs_delta == n_docs
    assert 0 <= r.n_delta_new_words <= r.n_delta_distinct_words
    assert r.stale_bounds_ok and r.fresh_bounds_ok
    assert r.fertility_band_ok and r.merge_overlap_ok and r.merges_ok


def test_staleness_identical_corpora_trip_wire():
    """Band sanity on a corpus with NO delta drift: training on the same
    histogram twice gives identical merge tables (overlap == full) and
    fertility ratio exactly 1000 — the fixed point the band is centered
    on.  A broken ratio or overlap computation would miss this."""
    freqs = [("banana", 5), ("bandana", 3), ("cabana", 2), ("nab", 7)]
    a = learn_bpe(freqs, N_MERGES)
    b = learn_bpe(list(freqs), N_MERGES)
    assert a == b and len(set(a) & set(b)) == len(a)
    ranks = {p: i for i, p in enumerate(a)}
    s = sum(len(bpe_encode(w, ranks)) * n for w, n in freqs)
    assert s * 1000 // s == 1000


def test_staleness_new_words_inflate_fertility():
    """Direction check: a stale table trained WITHOUT the delta's new
    vocabulary must tokenize that vocabulary into at least as many
    subwords as a fresh table that saw it — the drift the audit
    exists to measure."""
    base = [("alpha", 10), ("beta", 8), ("gamma", 6)]
    delta_word = "zephyrblaster"
    fresh = learn_bpe(base + [(delta_word, 20)], N_MERGES)
    stale = learn_bpe(base, N_MERGES)
    sr = {p: i for i, p in enumerate(stale)}
    fr = {p: i for i, p in enumerate(fresh)}
    assert len(bpe_encode(delta_word, sr)) >= len(bpe_encode(delta_word, fr))


def test_staleness_bands_are_falsifiable(spark, sf_dir, monkeypatch):
    """The band booleans must actually FIRE when the bands exclude the
    observed values — otherwise a typo'd band check (e.g. between on a
    null) would read as eternally green.  Impossible bands → False."""
    import ssafynews_data_spark.operators.bpe as B

    monkeypatch.setattr(B, "STALE_FERTILITY_MIN_Q3", 10_000)
    monkeypatch.setattr(B, "STALE_FERTILITY_MAX_Q3", 10_001)
    monkeypatch.setattr(B, "STALE_MERGE_OVERLAP_MIN", N_MERGES + 1)
    r = B.tokenizer_staleness_audit(spark, sf_dir).collect()[0]
    assert not r.fertility_band_ok
    assert not r.merge_overlap_ok
    # exact facts are band-independent
    assert r.ws_tokens_delta > 0 and r.n_docs_delta > 0


def test_span_lattice_room_nonnegative_for_all_lengths():
    """The docstring's geometry claim, checked directly on the integer
    formulas for every doc length up to 5000 plus a log-spaced tail to
    10^7: each span fits its segment (room >= 0 — segments are
    disjoint by construction, so fit implies no overlap/escape) and
    lengths sum exactly to the corrupt budget.  Pure python — no
    Spark; a one-shot numpy sweep measured min room = 6 over all
    n <= 100000 (at n = 7)."""
    from ssafynews_data_spark.operators.text import (
        SPAN_CORRUPT_PCT as PCT,
        SPAN_MEAN_LEN as MEAN,
    )

    lengths = list(range(7, 5001)) + [10**4, 10**5 + 3, 10**6 + 7, 10**7 + 9]
    for n in lengths:
        nc = n * PCT // 100
        ns = max(1, nc // MEAN)
        total = 0
        for i in range(min(ns, 64)):  # all spans for small n, prefix for huge
            ln = nc // ns + (1 if i < nc % ns else 0)
            seg = (i + 1) * n // ns - i * n // ns
            assert seg - ln >= 0, (n, i, seg, ln)
        for i in range(ns - min(ns, 8), ns):  # and the tail segments
            ln = nc // ns + (1 if i < nc % ns else 0)
            seg = (i + 1) * n // ns - i * n // ns
            assert seg - ln >= 0, (n, i, seg, ln)
        if ns <= 64:
            total = sum(
                nc // ns + (1 if i < nc % ns else 0) for i in range(ns)
            )
            assert total == nc, (n, total, nc)
