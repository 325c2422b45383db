"""Round-12 operator invariants: domain capping, curriculum ordering,
PII scrub accounting, pack provenance, index staleness.

Oracles prove cross-engine parity; these tests prove the properties the
hash can't see (two-phase cap exactness, span contiguity, the injected
scrub arithmetic end-to-end, floor trip-wires).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.operators.sampling import (
    CAP_SALT,
    CURRICULUM_CUT_HIGH,
    CURRICULUM_CUT_MID,
    CURRICULUM_SHARDS,
    DOMAIN_CAP,
    _md5_key,
    curriculum_schedule,
    domain_cap_sample,
)
from ssafynews_data_spark.operators.similarity import ivf_staleness_audit
from ssafynews_data_spark.operators.text import (
    GREEDY_PACK_CAPACITY,
    PII_EMAIL_MOD,
    PII_IP_MOD,
    PII_PHONE_MOD,
    greedy_pack_layout,
    pack_provenance_lookup,
    pii_scrub_accounting,
)
from ssafynews_data_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# domain_cap_sample
# ---------------------------------------------------------------------------


def test_domain_cap_counts_and_accounting(spark, sf_dir):
    rows = domain_cap_sample(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert {r.source for r in rows} == set(totals)
    for r in rows:
        assert r.n_docs == totals[r.source]
        assert r.n_kept == min(r.n_docs, DOMAIN_CAP)
        assert r.n_kept + r.n_dropped == r.n_docs


def test_domain_cap_two_phase_equals_naive(spark, sf_dir):
    """The sharded phase-1 prefilter must return EXACTLY the naive
    single-window answer (the containment argument in the docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("k", "doc_id")
    naive = (
        docs.select("source", "doc_id", _md5_key(CAP_SALT, F.col("doc_id")).alias("k"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= DOMAIN_CAP)
        .groupBy("source")
        .agg(F.sum("doc_id").alias("kept_id_sum"))
    )
    expected = {r.source: r.kept_id_sum for r in naive.collect()}
    got = {r.source: r.kept_id_sum for r in domain_cap_sample(spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# curriculum_schedule
# ---------------------------------------------------------------------------


def test_curriculum_positions_contiguous_and_bins_consistent(spark, sf_dir):
    rows = curriculum_schedule(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # every tokenizable doc is scheduled
    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r.shard < CURRICULUM_SHARDS
        if r.qscore_q4 >= CURRICULUM_CUT_HIGH:
            assert r.bin == 0
        elif r.qscore_q4 >= CURRICULUM_CUT_MID:
            assert r.bin == 1
        else:
            assert r.bin == 2
        by_shard[(r.bin, r.shard)].append(r.pos_in_shard)
    for pos in by_shard.values():
        assert sorted(pos) == list(range(1, len(pos) + 1))  # dense 1..n


def test_curriculum_deterministic(spark, sf_dir):
    a = sorted((r.doc_id, r.bin, r.shard, r.pos_in_shard) for r in curriculum_schedule(spark, sf_dir).collect())
    b = sorted((r.doc_id, r.bin, r.shard, r.pos_in_shard) for r in curriculum_schedule(spark, sf_dir).collect())
    assert a == b


# ---------------------------------------------------------------------------
# pii_scrub_accounting
# ---------------------------------------------------------------------------


def test_pii_scrub_accounting_exact_arithmetic(spark, sf_dir):
    """The fixture text is digit- and @-free, so every count and the
    char delta are computable in closed form from the injected footers —
    this pins the whole regex/replace chain end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    exp_emails = sum(1 for i in ids if i % PII_EMAIL_MOD == 0)
    exp_phones = sum(1 for i in ids if i % PII_PHONE_MOD == 0)
    exp_ips = sum(1 for i in ids if i % PII_IP_MOD == 0)
    exp_delta = 0
    for i in ids:
        if i % PII_EMAIL_MOD == 0:  # 'user<i>@example.com' -> '[EMAIL]'
            exp_delta += len(f"user{i}@example.com") - len("[EMAIL]")
        if i % PII_PHONE_MOD == 0:  # '010-1234-XXXX' -> '[PHONE]'
            exp_delta += 13 - len("[PHONE]")
        if i % PII_IP_MOD == 0:  # '10.A.0.B' -> '[IP]'
            exp_delta += len(f"10.{i % 250}.0.{i % 100}") - len("[IP]")
    rows = pii_scrub_accounting(spark, sf_dir).collect()
    assert sum(r.n_emails for r in rows) == exp_emails
    assert sum(r.n_phones for r in rows) == exp_phones
    assert sum(r.n_ips for r in rows) == exp_ips
    assert sum(r.chars_redacted for r in rows) == exp_delta
    assert sum(r.n_docs for r in rows) == len(ids)


# ---------------------------------------------------------------------------
# pack_provenance_lookup
# ---------------------------------------------------------------------------


def test_pack_provenance_spans_contiguous_and_probe_is_argmax(spark, sf_dir):
    out = pack_provenance_lookup(spark, sf_dir).collect()
    packed = greedy_pack_layout(spark, sf_dir).collect()
    # per bucket: the probed block really is the most-doc block (min id tie-break)
    counts = defaultdict(int)
    for p in packed:
        counts[(p.bucket, p.block_id)] += 1
    best = {}
    for (bucket, block), n in counts.items():
        cur = best.get(bucket)
        if cur is None or (n, -block) > (cur[1], -cur[0]):
            best[bucket] = (block, n)
    probed = {(r.bucket, r.block_id) for r in out}
    assert probed == {(b, blk) for b, (blk, _) in best.items()}
    # spans: contiguous from 0, disjoint, fill/doc-count reconcile
    by_block = defaultdict(list)
    for r in out:
        by_block[(r.bucket, r.block_id)].append(r)
    for (bucket, block), rows in by_block.items():
        rows.sort(key=lambda r: r.tok_start)
        assert rows[0].tok_start == 0
        for a, b in zip(rows, rows[1:]):
            assert b.tok_start == a.tok_end  # greedy packs with no gaps
        fill = rows[-1].tok_end
        assert all(r.block_fill == fill for r in rows)
        assert all(r.n_docs_in_block == len(rows) for r in rows)
        # no-split guarantee: within capacity unless a single overlong doc
        assert fill <= GREEDY_PACK_CAPACITY or len(rows) == 1


# ---------------------------------------------------------------------------
# ivf_staleness_audit
# ---------------------------------------------------------------------------


def test_ivf_staleness_audit_contract_row(spark, sf_dir):
    rows = ivf_staleness_audit(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    n = load_table(spark, sf_dir, "embeddings").count()
    assert r.n_base + r.n_delta == n
    assert r.n_delta == n // 5  # dense vec_ids: the cut removes exactly n//5
    assert r.delta_visible_ok and r.stale_recall_ok and r.retention_ok


def test_argmin_mismatch_tripwire(spark):
    """delta_visible_ok's engine: zero on a correct assignment, non-zero
    the moment one stored cell is corrupted — the check is falsifiable,
    not a tautology (VERDICT-style trip-wire proof)."""
    from ssafynews_data_spark.operators.similarity import (
        argmin_assignment_mismatches,
    )

    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "centroid INT, c_emb ARRAY<DOUBLE>"
    )
    ok = spark.createDataFrame(
        [(1, [0.1, 0.2], 0), (2, [9.9, 9.8], 1), (3, [0.3, 0.1], 0)],
        "vec_id LONG, emb ARRAY<DOUBLE>, centroid INT",
    )
    assert argmin_assignment_mismatches(ok, cent) == 0
    bad = spark.createDataFrame(
        [(1, [0.1, 0.2], 0), (2, [9.9, 9.8], 0), (3, [0.3, 0.1], 0)],
        "vec_id LONG, emb ARRAY<DOUBLE>, centroid INT",
    )
    assert argmin_assignment_mismatches(bad, cent) == 1


def test_argmin_tie_breaks_to_min_centroid_id(spark):
    """Exact-tie rows must match MLlib's first-minimal-index choice."""
    from ssafynews_data_spark.operators.similarity import (
        argmin_assignment_mismatches,
    )

    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])], "centroid INT, c_emb ARRAY<DOUBLE>"
    )
    equidistant = spark.createDataFrame(
        [(1, [0.0, 5.0], 0)], "vec_id LONG, emb ARRAY<DOUBLE>, centroid INT"
    )
    assert argmin_assignment_mismatches(equidistant, cent) == 0
