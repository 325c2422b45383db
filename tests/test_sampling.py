"""Sampling/split/rollup invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.operators.sampling import (
    stratified_sample_langs,
    time_rollup_events,
    train_test_split,
)
from ssafynews_data_spark.sources.readers import load_table


def test_split_deterministic_and_proportional(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in train_test_split(docs, "doc_id").collect()}
    b = {r.doc_id: r.split for r in train_test_split(docs, "doc_id").collect()}
    assert a == b  # content-hash split: identical across runs
    n_test = sum(1 for v in a.values() if v == "test")
    assert 0.1 < n_test / len(a) < 0.3  # ~20%


def test_split_stable_under_subset(spark, sf_dir):
    """A doc keeps its split assignment no matter which subset it's in —
    the property rand()-based splits lack."""
    docs = load_table(spark, sf_dir, "documents")
    full = {r.doc_id: r.split for r in train_test_split(docs, "doc_id").collect()}
    half = {
        r.doc_id: r.split
        for r in train_test_split(docs.filter(F.col("doc_id") % 2 == 0), "doc_id").collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_stratified_sample_deterministic(spark, sf_dir):
    a = sorted((r.lang, r.n) for r in stratified_sample_langs(spark, sf_dir).collect())
    b = sorted((r.lang, r.n) for r in stratified_sample_langs(spark, sf_dir).collect())
    assert a == b  # seeded sampler
    counts = dict(a)
    totals = {
        r.lang: r.c
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    # en sampled ~50%, others ~10% (Bernoulli: loose bounds)
    assert 0.3 < counts["en"] / totals["en"] < 0.7
    for lang in ("de", "fr", "es", "zh"):
        assert counts.get(lang, 0) / totals[lang] < 0.3


def test_time_rollup_hierarchy_consistent(spark, sf_dir):
    rows = time_rollup_events(spark, sf_dir).collect()
    by_grain: dict[str, int] = {}
    for r in rows:
        by_grain[r.grain] = by_grain.get(r.grain, 0) + r.n
    total = load_table(spark, sf_dir, "events").count()
    # every grain partitions the same events
    assert by_grain == {"hour": total, "day": total, "month": total}


def test_domain_mix_rates(spark, sf_dir):
    """Kept fraction per language lands near its target rate, and the
    sample is decorrelated from the train/test split buckets."""
    from pyspark.sql import functions as F

    from ssafynews_data_spark.operators.sampling import MIX_WEIGHTS, domain_mix_sample

    docs = load_table(spark, sf_dir, "documents")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n_kept for r in domain_mix_sample(spark, sf_dir).collect()}
    for lang, rate in MIX_WEIGHTS.items():
        if totals.get(lang, 0) < 20:
            continue
        frac = kept.get(lang, 0) / totals[lang]
        assert abs(frac - rate / 100) < 0.25, (lang, frac, rate)


def test_temperature_resample_flattens_and_is_exact(spark, sf_dir):
    """Rare sources keep a higher fraction than common ones (the point
    of temperature sampling), thresholds are integer basis points, and
    n_kept is consistent with an independent recount."""
    from pyspark.sql import functions as F

    from ssafynews_data_spark.operators.sampling import (
        TEMP_SALT,
        hash_bucket,
        temperature_resample,
    )

    rows = {r.source: r for r in temperature_resample(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r.threshold_bp <= 10000
        assert 0 <= r.n_kept <= r.n_docs
    # α=0.5 flattening: if source sizes differ enough, the smaller
    # source's keep-threshold must be >= the larger's
    by_size = sorted(rows.values(), key=lambda r: r.n_docs)
    if by_size[0].n_docs * 2 <= by_size[-1].n_docs:
        assert by_size[0].threshold_bp >= by_size[-1].threshold_bp
    # recount independently with the same salt + buckets
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.concat(F.lit(TEMP_SALT), F.col("doc_id").cast("string")), 10000)
    th = {r.source: r.threshold_bp for r in rows.values()}
    recount = {
        r.source: r.n
        for r in docs.filter(
            b < F.coalesce(*[F.when(F.col("source") == s, F.lit(t)) for s, t in th.items()])
        ).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, r in rows.items():
        assert recount.get(s, 0) == r.n_kept, s


def test_dsir_scores_favor_target_domain(spark, sf_dir):
    """Smoothed log-ratio weights must (a) cover every tokenized doc,
    (b) be finite, and (c) rank the target-domain slice at or above the
    rest on average — src0's own tokens are what the target
    distribution is built from."""
    from ssafynews_data_spark.operators.sampling import (
        DSIR_TARGET_SOURCE,
        dsir_importance_weights,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = dsir_importance_weights(spark, sf_dir).join(docs, "doc_id")
    rows = w.collect()
    assert rows and all(r.n_tokens > 0 for r in rows)
    import math

    assert all(math.isfinite(r.dsir_score) for r in rows)
    tgt = [r.dsir_score for r in rows if r.source == DSIR_TARGET_SOURCE]
    rest = [r.dsir_score for r in rows if r.source != DSIR_TARGET_SOURCE]
    assert tgt and rest
    assert sum(tgt) / len(tgt) >= sum(rest) / len(rest)


def test_epoch_shuffle_layout_deterministic_and_dense(spark, sf_dir):
    """Same seed → identical layout across runs; positions are dense
    1..shard_size within every shard; every doc appears exactly once."""
    from ssafynews_data_spark.operators.sampling import epoch_shuffle_layout

    a = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in epoch_shuffle_layout(spark, sf_dir).collect()
    )
    b = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in epoch_shuffle_layout(spark, sf_dir).collect()
    )
    assert a == b and a
    assert len({d for d, _, _ in a}) == len(a)
    by_shard = {}
    for _, s, p in a:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_length_buckets_ordered_and_exhaustive(spark, sf_dir):
    """Buckets tile the corpus: counts sum to n_docs, bucket token
    ranges are non-overlapping and ascending."""
    from ssafynews_data_spark.operators.sampling import length_bucket_stats

    rows = sorted(
        length_bucket_stats(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert prev.max_tokens <= cur.min_tokens
        assert prev.min_tokens <= prev.max_tokens


# --- DoReMi mixture weights -------------------------------------------------


def test_doremi_weights_mass_and_order(spark, sf_dir):
    """Invariants of the multiplicative-weights average: (a) the final
    weights are a near-distribution (floor losses only: each of the T
    averaged steps loses < 1 bp per domain), (b) weight order follows
    excess order (m is monotone in excess and x^t preserves order),
    (c) every weight is positive (m >= 100 > 0)."""
    from ssafynews_data_spark.operators.sampling import doremi_mixture_weights

    rows = doremi_mixture_weights(spark, sf_dir).collect()
    d = len(rows)
    assert d >= 2
    total = sum(r.weight_bp for r in rows)
    assert 10000 - 2 * d <= total <= 10000
    assert all(r.weight_bp > 0 for r in rows)
    by_excess = sorted(rows, key=lambda r: r.excess)
    for lo, hi in zip(by_excess, by_excess[1:]):
        assert lo.weight_bp <= hi.weight_bp or lo.excess == hi.excess


def test_doremi_uniform_when_no_excess(spark, sf_dir):
    """All-equal losses (excess 0 everywhere) must yield the uniform
    mixture — multiplicative weights with identical multipliers can't
    move off the simplex center."""
    from ssafynews_data_spark.operators.sampling import doremi_mixture_weights

    out = doremi_mixture_weights(spark, sf_dir)
    rows = out.collect()
    if all(r.excess == 0 for r in rows):  # fixture-dependent branch
        assert len({r.weight_bp for r in rows}) == 1
    else:  # the fixture has spread — uniform case covered by arithmetic:
        # domains with equal excess must get equal weight
        by_excess = {}
        for r in rows:
            by_excess.setdefault(r.excess, set()).add(r.weight_bp)
        assert all(len(v) == 1 for v in by_excess.values())
