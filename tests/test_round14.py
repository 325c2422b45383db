"""Round-14 operator invariants: data-constrained epoching, length-
bucketed batching, multi-turn SFT masks, LSM compaction planning,
margin bitext mining.

Oracles prove cross-engine parity; these tests prove the properties the
hash can't see — budget exactness, batching feasibility, lattice
geometry against an independent Python re-derivation, the closed-form
compaction schedule against an actual arrival simulation, and the
margin math against brute-force numpy.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from ssafynews_data_spark.operators.incremental_index import (
    COMPACT_FANOUT,
    N_COMPACT_BATCHES,
    index_compaction_plan,
)
from ssafynews_data_spark.operators.sampling import (
    EPOCH_MAX_REPEATS,
    EPOCH_PLAN_BUDGET,
    LB_BAND_WIDTH,
    LB_SALT,
    LB_SHARDS,
    LB_TOKEN_BUDGET,
    length_bucket_batches,
    source_epoch_plan,
)
from ssafynews_data_spark.operators.similarity import (
    MARGIN_ACCEPT_Q3,
    MARGIN_K,
    MARGIN_QUERY_MAX,
    margin_bitext_mine,
)
from ssafynews_data_spark.operators.text import (
    CHAT_MAX_ROUNDS,
    CHAT_SALT,
    chat_turn_mask_spans,
    greedy_pack_layout,
    tokens_col,
)
from ssafynews_data_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# source_epoch_plan
# ---------------------------------------------------------------------------


def test_epoch_plan_budget_is_exact_and_rows_reconcile(spark, sf_dir):
    rows = source_epoch_plan(spark, sf_dir).collect()
    assert sum(r.quota_tokens for r in rows) == EPOCH_PLAN_BUDGET
    for r in rows:
        assert 0 <= r.n_full_epochs <= EPOCH_MAX_REPEATS
        if r.n_tokens > 0:
            # quota = epochs*supply + partial + unfilled, exactly
            assert (
                r.n_full_epochs * r.n_tokens + r.partial_tokens + r.unfilled_tokens
                == r.quota_tokens
            )
            assert 0 <= r.partial_tokens < r.n_tokens
            # unfilled only when the repeat cap binds
            assert (r.unfilled_tokens > 0) <= (r.n_full_epochs == EPOCH_MAX_REPEATS)
            assert r.repeated == (r.quota_tokens >= r.n_tokens)
        else:
            assert (r.n_full_epochs, r.partial_tokens) == (0, 0)
            assert r.unfilled_tokens == r.quota_tokens


def test_epoch_plan_matches_python_hamilton(spark, sf_dir):
    """Re-derive the whole plan in pure Python from per-source token
    counts — weights, Hamilton quotas, epoch split."""
    import math

    docs = load_table(spark, sf_dir, "documents")
    per_src = {
        r.source: r.n
        for r in docs.select(
            "source", F.size(tokens_col(F.col("text"))).cast("long").alias("n")
        )
        .groupBy("source")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    w = {s: math.isqrt(n) for s, n in per_src.items()}
    tot = sum(w.values())
    quota = {s: EPOCH_PLAN_BUDGET * w[s] // tot for s in w}
    rem = {s: EPOCH_PLAN_BUDGET * w[s] - quota[s] * tot for s in w}
    leftover = EPOCH_PLAN_BUDGET - sum(quota.values())
    for s in sorted(w, key=lambda s: (-rem[s], s))[:leftover]:
        quota[s] += 1
    got = {r.source: r for r in source_epoch_plan(spark, sf_dir).collect()}
    assert set(got) == set(per_src)
    for s, r in got.items():
        assert r.weight == w[s], s
        assert r.quota_tokens == quota[s], s
        full = min(quota[s] // per_src[s], EPOCH_MAX_REPEATS)
        assert r.n_full_epochs == full, s


# ---------------------------------------------------------------------------
# length_bucket_batches
# ---------------------------------------------------------------------------


def test_length_bucket_batches_cover_corpus_and_fit_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    rows = length_bucket_batches(spark, sf_dir).collect()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    batches = defaultdict(list)
    for r in rows:
        assert r.padded_len == (r.band + 1) * LB_BAND_WIDTH
        assert 0 <= r.pad_waste < LB_BAND_WIDTH
        assert r.shard == r.doc_id % LB_SHARDS
        batches[(r.band, r.shard, r.batch_id)].append(r)
    for (band, shard, _), members in batches.items():
        padded = (band + 1) * LB_BAND_WIDTH
        cap = max(1, LB_TOKEN_BUDGET // padded)
        assert len(members) <= cap
        # slots are a contiguous 0..n-1 run
        assert sorted(m.slot for m in members) == list(range(len(members)))
        # a non-oversize batch fits the token budget when padded
        if padded <= LB_TOKEN_BUDGET:
            assert len(members) * padded <= LB_TOKEN_BUDGET


def test_length_bucket_batches_only_last_batch_is_partial(spark, sf_dir):
    """Within each (band, shard), every batch except the highest id is
    FULL — the property that makes the padding-efficiency claim real."""
    rows = length_bucket_batches(spark, sf_dir).collect()
    sizes = defaultdict(dict)
    for r in rows:
        sizes[(r.band, r.shard)][r.batch_id] = (
            sizes[(r.band, r.shard)].get(r.batch_id, 0) + 1
        )
    for (band, _), by_batch in sizes.items():
        padded = (band + 1) * LB_BAND_WIDTH
        cap = max(1, LB_TOKEN_BUDGET // padded)
        last = max(by_batch)
        assert set(by_batch) == set(range(last + 1))  # batch ids contiguous
        for bid, n in by_batch.items():
            if bid < last:
                assert n == cap, (band, bid, n, cap)


def test_length_bucket_batches_order_is_the_salted_md5(spark, sf_dir):
    """Slot order within a batch follows the salted-md5 shuffle — the
    determinism that makes the batch plan restartable."""
    rows = length_bucket_batches(spark, sf_dir).collect()

    def key(doc_id: int) -> str:
        return hashlib.md5(f"{LB_SALT}{doc_id}".encode()).hexdigest()

    by_group = defaultdict(list)
    for r in rows:
        by_group[(r.band, r.shard)].append(r)
    for members in by_group.values():
        members.sort(key=lambda r: (r.batch_id, r.slot))
        keys = [key(r.doc_id) for r in members]
        assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# chat_turn_mask_spans
# ---------------------------------------------------------------------------


def _expected_turns(doc_id: int, n_tokens: int) -> list[tuple[int, int, int, int]]:
    """(n_turns, turn_idx, start, end) for every non-empty assistant
    turn — the Python mirror of the md5 lattice."""
    phase = int(hashlib.md5(f"{CHAT_SALT}{doc_id}".encode()).hexdigest()[:8], 16)
    n_turns = 2 * (1 + phase % CHAT_MAX_ROUNDS)
    out = []
    for t in range(1, n_turns, 2):
        start = t * n_tokens // n_turns
        end = (t + 1) * n_tokens // n_turns
        if end > start:
            out.append((n_turns, t, start, end))
    return out


def test_chat_turn_spans_match_python_lattice(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("n")
        ).collect()
    }
    got = defaultdict(list)
    for r in chat_turn_mask_spans(spark, sf_dir).collect():
        assert r.n_turns in {2, 4, 6}
        assert r.turn_idx % 2 == 1  # assistant turns only
        got[r.doc_id].append((r.n_turns, r.turn_idx, r.turn_start, r.turn_start + r.turn_len))
    for doc_id, n in n_tok.items():
        exp = _expected_turns(doc_id, n)
        assert sorted(got.get(doc_id, [])) == sorted(exp), doc_id


def test_chat_turn_spans_are_disjoint_and_packed_coords_hold(spark, sf_dir):
    pos = {
        r.doc_id: r.block_pos for r in greedy_pack_layout(spark, sf_dir).collect()
    }
    by_doc = defaultdict(list)
    for r in chat_turn_mask_spans(spark, sf_dir).collect():
        assert r.seq_start == pos[r.doc_id] + r.turn_start
        assert r.seq_end == r.seq_start + r.turn_len
        assert r.turn_len > 0
        by_doc[r.doc_id].append((r.turn_start, r.turn_start + r.turn_len))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2  # assistant turns never overlap


# ---------------------------------------------------------------------------
# index_compaction_plan
# ---------------------------------------------------------------------------


def _simulate_tiered_compaction() -> tuple[dict[int, int], int]:
    """Actually simulate arrivals: each batch lands as an L0 segment;
    whenever FANOUT segments exist at a level, they merge into one at
    the next.  Returns (merge count per batch, final segment count) —
    the ground truth the operator's closed form must equal."""
    levels: dict[int, list[list[int]]] = defaultdict(list)  # level -> segments
    merged = defaultdict(int)
    for b in range(N_COMPACT_BATCHES):
        levels[0].append([b])
        lvl = 0
        while len(levels[lvl]) == COMPACT_FANOUT:
            group = [x for seg in levels[lvl] for x in seg]
            levels[lvl] = []
            for x in group:
                merged[x] += 1
            levels[lvl + 1].append(group)
            lvl += 1
    n_segments = sum(len(v) for v in levels.values())
    return dict(merged), n_segments


def test_compaction_closed_form_matches_simulation(spark, sf_dir):
    merged, n_segments = _simulate_tiered_compaction()
    rows = {r.batch_id: r for r in index_compaction_plan(spark, sf_dir).collect()}
    assert set(rows) == set(range(N_COMPACT_BATCHES))  # all 13, always
    for b, r in rows.items():
        assert r.n_merges == merged.get(b, 0), b
        assert r.tokens_written == r.n_tokens * (1 + r.n_merges)
        assert r.n_final_segments == n_segments
    total_in = sum(r.n_tokens for r in rows.values())
    total_out = sum(r.tokens_written for r in rows.values())
    if total_in:
        assert rows[0].write_amp_q4 == total_out * 10000 // total_in


def test_compaction_counts_cover_the_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(tokens_col(F.col("text"))).cast("long")).alias("n")
    ).collect()[0].n
    rows = index_compaction_plan(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_tokens for r in rows) == (n_tokens or 0)


# ---------------------------------------------------------------------------
# margin_bitext_mine
# ---------------------------------------------------------------------------


def test_margin_mining_matches_bruteforce_numpy(spark, sf_dir):
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    a_ids = sorted(v for v in emb if v % 2 == 0)
    b_ids = sorted(v for v in emb if v % 2 == 1)
    q_ids = [v for v in a_ids if v < MARGIN_QUERY_MAX]

    def cos(x, y):
        return float(emb[x] @ emb[y] / (np.linalg.norm(emb[x]) * np.linalg.norm(emb[y])))

    def topk(src, pool):
        sims = sorted(((cos(src, p), -p) for p in pool), reverse=True)[:MARGIN_K]
        return [(s, -nid) for s, nid in sims]

    rows = {r.query_id: r for r in margin_bitext_mine(spark, sf_dir).collect()}
    assert set(rows) == set(q_ids)
    for q in q_ids:
        fwd = topk(q, b_ids)
        best_sim, best_id = fwd[0]
        denom_f = sum(round(s * 10000) for s, _ in fwd)
        bwd = topk(best_id, a_ids)
        denom_b = sum(round(s * 10000) for s, _ in bwd)
        r = rows[q]
        assert r.best_id == best_id, q
        assert r.sim_q4 == round(best_sim * 10000), q
        assert r.denom_fwd_q4 == denom_f and r.denom_bwd_q4 == denom_b, q
        if denom_f + denom_b > 0 and r.sim_q4 >= 0:
            exp_margin = (2 * MARGIN_K * r.sim_q4 * 1000) // (denom_f + denom_b)
        else:
            exp_margin = -1
        assert r.margin_q3 == exp_margin, q
        assert r.mutual == (bwd[0][1] == q), q
        assert r.accepted == (r.mutual and r.margin_q3 >= MARGIN_ACCEPT_Q3), q


def test_margin_sides_never_mix(spark, sf_dir):
    for r in margin_bitext_mine(spark, sf_dir).collect():
        assert r.query_id % 2 == 0 and r.query_id < MARGIN_QUERY_MAX
        assert r.best_id % 2 == 1
