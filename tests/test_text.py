"""Text-op tests on news-shaped fixtures (FIXTURES.md §1-2) — exercising
the Korean-text paths the synthetic documents table can't."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.functions.strings import (
    first_sentence,
    korean_line_filter,
    normalize_whitespace,
    split_trim_csv,
    strip_control_chars,
    tokenize_words,
    truncate,
)
from ssafynews_data_spark.operators.text import assign_block_ids


def _articles(spark):
    rows = [
        ("먼저 전진한다. 그 다음 문장.", "김철수 기자", "a\nb\r\tc"),
        ("마침표 없는 본문", "Very Long Junk Author Name That Exceeds Limits 123456", "x\ty"),
        (None, "이영희 기자", "줄1 한국어입니다\nline2 english only\n줄3 다시 한국어 문장"),
    ]
    return spark.createDataFrame(rows, "content string, author string, raw string")


def test_strip_control_chars(spark):
    df = _articles(spark).select(strip_control_chars(F.col("raw")).alias("s"))
    vals = [r.s for r in df.collect()]
    assert vals[0] == "abc"
    assert vals[1] == "xy"


def test_first_sentence_korean(spark):
    df = _articles(spark).select(first_sentence(F.col("content")).alias("s"))
    vals = [r.s for r in df.collect()]
    assert vals[0] == "먼저 전진한다."
    assert vals[1] == "마침표 없는 본문"  # fallback: first 40 chars
    assert vals[2] is None


def test_truncate_author(spark):
    df = _articles(spark).select(truncate(F.col("author"), 10).alias("a"))
    assert all(len(r.a) <= 10 for r in df.collect())


def test_korean_line_filter(spark):
    df = _articles(spark).select(korean_line_filter(F.col("raw")).alias("k"))
    vals = [r.k for r in df.collect()]
    assert vals[2] == "줄1 한국어입니다 줄3 다시 한국어 문장"


def test_split_trim_csv(spark):
    df = spark.createDataFrame([(" a , b,c ",)], "s string").select(
        split_trim_csv(F.col("s")).alias("arr")
    )
    assert df.collect()[0].arr == ["a", "b", "c"]


def test_tokenize_words_cjk_and_latin(spark):
    df = spark.createDataFrame([("Hello, World! 한국어 단어",)], "s string").select(
        tokenize_words(F.col("s")).alias("t")
    )
    assert df.collect()[0].t == ["hello", "world", "한국어", "단어"]


def test_normalize_whitespace_modes(spark):
    df = spark.createDataFrame([("  a \t b\n\nc ",)], "s string")
    keep = df.select(normalize_whitespace(F.col("s")).alias("x")).collect()[0].x
    drop = df.select(normalize_whitespace(F.col("s"), False).alias("x")).collect()[0].x
    assert keep == "a b c"
    assert drop == "abc"


def test_assign_block_ids_matches_global_order(spark, sf_dir):
    from ssafynews_data_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = assign_block_ids(docs, "doc_id", num_partitions=7)
    rows = sorted((r.doc_id, r.seq_id) for r in out.collect())
    # ids are dense 1..n and follow doc_id order
    assert [s for _, s in rows] == list(range(1, len(rows) + 1))


def test_redact_pii_replaces_emails_and_phones(spark):
    from ssafynews_data_spark.operators.text import _EMAIL_RE, _PHONE_RE

    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@example.co.uk or call +82 10-1234-5678 now"),
            (2, "no pii here"),
            (3, "two mails a@b.io c@d.org"),
        ],
        "doc_id long, text string",
    )
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    rows = {r.doc_id: r.r for r in df.select("doc_id", red.alias("r")).collect()}
    assert rows[1] == "mail me at [EMAIL] or call [PHONE] now"
    assert rows[2] == "no pii here"
    assert rows[3] == "two mails [EMAIL] [EMAIL]"


def test_repetition_scores_flag_repeats(spark, tmp_path):
    import os

    from ssafynews_data_spark.operators.text import repetition_scores

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),     # one distinct bigram of 4
            (1, "all words here are distinct"),  # no repeated bigrams
            (2, "line\nline\nline"),             # duplicate lines
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: (r.bigram_rep_q4, r.dup_line_q4)
           for r in repetition_scores(spark, d).collect()}
    assert got[0] == (7500, 0)   # 1 distinct / 4 bigrams -> 0.75
    assert got[1] == (0, 0)
    assert got[2][1] == 6666     # 1 distinct / 3 lines -> floor(2/3*1e4)


def test_gopher_filter_flags_consistent(spark, sf_dir):
    """passes == conjunction of the three rule predicates, recomputed
    from the emitted signal columns."""
    from ssafynews_data_spark.operators.text import (
        GOPHER_MAX_MEAN_LEN_Q4,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_LEN_Q4,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        gopher_quality_filter,
    )

    rows = gopher_quality_filter(spark, sf_dir).collect()
    assert rows
    n_pass = 0
    for r in rows:
        want = (
            GOPHER_MIN_WORDS <= r.n_words <= GOPHER_MAX_WORDS
            and GOPHER_MIN_MEAN_LEN_Q4 <= r.mean_word_len_q4 <= GOPHER_MAX_MEAN_LEN_Q4
            and r.n_stop_distinct >= GOPHER_MIN_STOPWORDS
        )
        assert r.passes == want
        n_pass += want
    assert 0 < n_pass < len(rows)  # the gate must split the corpus


def test_char_stats_handles_astral_and_empty(spark):
    """Codepoint (not UTF-16 code unit) granularity: an astral emoji is
    ONE character on both engines, and empty/null-ish docs yield zeros."""
    from ssafynews_data_spark.operators.textstats import _char_stats
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a\U0001F600\U0001F600b"), (2, ""), (3, "aaaa")], "doc_id int, text string"
    )
    rows = {
        r.doc_id: (r.s.n_distinct_chars, r.s.top_cnt)
        for r in df.select("doc_id", _char_stats("text").alias("s")).collect()
    }
    assert rows[1] == (3, 2)  # a, 😀(×2), b — emoji counted once per occurrence
    assert rows[2] == (0, 0)
    assert rows[3] == (1, 4)


def test_tokenizer_fertility_invariants(spark, sf_dir):
    """Every token costs >= 1 byte, and the per-group sums must recount
    from the doc-level columns."""
    from ssafynews_data_spark.operators.text import tokenizer_fertility_stats

    rows = tokenizer_fertility_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.total_bytes >= r.total_tokens >= r.n_docs  # >=1 token/doc fixture
        assert r.bytes_per_token >= 1.0
        assert abs(r.tokens_per_doc - r.total_tokens / r.n_docs) < 1e-3


def test_compression_ratio_orders_repetition(spark, sf_dir):
    """Repeated text must compress harder (lower ratio) than high-entropy
    text; fixture docs sit between; ratios are positive and reproducible."""
    from ssafynews_data_spark.operators.text import (
        compression_quality_scores,
    )

    rows = compression_quality_scores(spark, sf_dir).collect()
    assert rows and all(r.n_compressed > 0 for r in rows)
    assert all(r.compress_ratio > 0 for r in rows)
    again = {r.doc_id: r.compress_ratio for r in compression_quality_scores(spark, sf_dir).collect()}
    assert again == {r.doc_id: r.compress_ratio for r in rows}

    import random
    import string

    rng = random.Random(42)
    noise = "".join(rng.choices(string.printable, k=2000))
    probe = spark.createDataFrame(
        [(1, "spam " * 400, "s"), (2, noise, "s")],
        "doc_id long, text string, source string",
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        probe.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.doc_id: r
            for r in compression_quality_scores(spark, d).collect()
        }
    assert out[1].compress_ratio < 0.05          # template spam: collapses
    assert out[2].compress_ratio > 0.7           # entropy: barely shrinks
    assert not out[1].passes and out[2].passes


def test_homoglyph_fold_catches_evasion(spark, tmp_path):
    """A doc with Cyrillic lookalikes and one with fullwidth ASCII must
    collapse into the plain-ASCII doc's fingerprint group; a genuinely
    different doc must not."""
    import os

    from ssafynews_data_spark.operators.text import homoglyph_fold_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en", "s", 19),
            (2, "the quick brоwn fоx", "en", "s", 19),   # Cyrillic о (U+043E)
            (3, "ｔｈｅ ｑｕｉｃｋ ｂｒｏｗｎ ｆｏｘ", "en", "s", 19),  # fullwidth
            (4, "an entirely different doc", "en", "s", 25),
            (5, "The Quick Brown Fox", "en", "s", 19),    # Latin mixed case
            # UPPERCASE Cyrillic Т (U+0422) and В (U+0412): these lowercase
            # to codepoints outside the fold table, so the fold must run
            # BEFORE lower() or this row evades the group.
            (6, "Тhе Quick Вrоwn Fох", "en", "s", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    groups = {r.fp: r for r in homoglyph_fold_fingerprints(spark, d).collect()}
    sizes = sorted(r.group_size for r in groups.values())
    assert sizes == [1, 5]
    big = next(r for r in groups.values() if r.group_size == 5)
    assert big.keeper_id == 1


def test_mojibake_repair_roundtrip(spark, tmp_path):
    """Single- and double-mangled UTF-8 repair to the original; clean
    text (including Korean and math symbols) passes byte-identical."""
    import os

    from ssafynews_data_spark.operators.text import _fix_mojibake, mojibake_repair_docs

    orig = "café — naïve résumé 한국어 ∑"
    once = orig.encode("utf-8").decode("latin-1")
    twice = once.encode("utf-8").decode("latin-1")
    assert _fix_mojibake(once) == orig
    assert _fix_mojibake(twice) == orig
    assert _fix_mojibake(orig) == orig
    assert _fix_mojibake("plain ascii") == "plain ascii"

    docs = spark.createDataFrame(
        [
            (1, once, "en", "s", 10),
            (2, orig, "en", "s", 10),
            (3, twice, "en", "s", 10),
            (4, None, "en", "s", 0),  # NULL text: flag must be false, not NULL
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in mojibake_repair_docs(spark, d).collect()}
    assert out[1].text_fixed == orig and out[1].was_mojibake
    assert out[2].text_fixed == orig and not out[2].was_mojibake
    assert out[3].text_fixed == orig and out[3].was_mojibake
    assert out[4].text_fixed is None and out[4].was_mojibake is False


def test_quality_contracts_on_planted_corpus(spark, tmp_path):
    """The round-6 contract twins (compression / mojibake) must hold —
    and their facts must be exact — on a corpus that exercises every
    branch the natural testdata lacks: empty text, NULL text, planted
    mojibake, template spam, and clean Korean."""
    import os

    from ssafynews_data_spark.operators.text import (
        compression_quality_contract,
        mojibake_repair_contract,
    )

    orig = "café — naïve résumé 한국어 ∑"
    mangled = orig.encode("utf-8").decode("latin-1")
    docs = spark.createDataFrame(
        [
            (1, "spam " * 400, "en", "s", 2000),
            (2, mangled, "en", "s", 30),
            (3, orig, "ko", "s", 30),
            (4, "", "en", "s", 0),
            (5, None, "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))

    c = compression_quality_contract(spark, d).collect()[0]
    assert c.n_docs == 5
    assert c.n_empty_docs == 2  # "" and NULL both have 0 bytes
    assert c.total_bytes == sum(
        len((t or "").encode("utf-8")) for t in ["spam " * 400, mangled, orig, "", None]
    )
    assert c.ratio_bounds_ok and c.flag_consistent and c.deterministic

    m = mojibake_repair_contract(spark, d).collect()[0]
    assert m.n_docs == 5
    assert m.n_marked_docs == 1  # only the mangled doc carries markers
    assert m.repaired_subset_of_marked and m.clean_passthrough and m.idempotent


# --- n-gram novelty curve ----------------------------------------------------


def test_novelty_curve_invariants(spark, sf_dir):
    """cum_distinct is the running sum of new_grams and ends at the true
    corpus-wide distinct trigram count; novelty never exceeds volume."""
    from ssafynews_data_spark.operators.text import tokens_col
    from ssafynews_data_spark.operators.textstats import (
        NOVELTY_W,
        ngram_novelty_curve,
    )
    from ssafynews_data_spark.sources.readers import load_table

    rows = ngram_novelty_curve(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == sorted(r.bucket for r in rows)
    run = 0
    for r in rows:
        assert 0 <= r.new_grams <= r.occurrences
        run += r.new_grams
        assert r.cum_distinct == run

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens_col(F.col("text")).alias("toks"))
    n = F.size("toks")
    grams = toks.select(
        F.explode(
            F.when(
                n >= NOVELTY_W,
                F.transform(
                    F.sequence(F.lit(1), n - (NOVELTY_W - 1)),
                    lambda i: F.xxhash64(F.slice(F.col("toks"), i, NOVELTY_W)),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("h")
    )
    assert rows[-1].cum_distinct == grams.distinct().count()
    assert sum(r.n_docs for r in rows) == docs.count()


def test_greedy_pack_layout_invariants(spark, sf_dir):
    """No sequence exceeds capacity unless it holds exactly one
    oversized doc; every doc appears once; block ids are contiguous
    from 0 per bucket; packing is greedy (a doc that STARTS a new
    block must not have fit in the previous one)."""
    from collections import defaultdict

    from ssafynews_data_spark.operators import text as T

    rows = sorted(
        T.greedy_pack_layout(spark, sf_dir).collect(),
        key=lambda r: (r.bucket, r.doc_id),
    )
    n_docs = T.load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    blocks = defaultdict(list)
    for r in rows:
        blocks[(r.bucket, r.block_id)].append(r)
        assert r.block_pos >= 0
    for (bucket, bid), members in blocks.items():
        total = sum(r.n_tokens for r in members)
        if total > T.GREEDY_PACK_CAPACITY:
            assert len(members) == 1  # a single oversized doc
    for (bucket, bid) in blocks:
        if bid > 0:
            assert (bucket, bid - 1) in blocks  # contiguous ids
    # greediness: the first doc of block b+1 must overflow block b
    per_bucket = defaultdict(list)
    for r in rows:
        per_bucket[r.bucket].append(r)
    for bucket, rs in per_bucket.items():
        for prev, cur in zip(rs, rs[1:]):
            if cur.block_id == prev.block_id + 1:
                used = prev.block_pos + prev.n_tokens
                assert used + cur.n_tokens > T.GREEDY_PACK_CAPACITY


def test_pack_efficiency_audit_reconciles_with_layout(spark, sf_dir):
    """The audit's integers must reconcile exactly with the layout it
    audits: per bucket, sequences = max block_id + 1, padding = sum of
    per-block max(0, capacity - fill), chunk numbers = pure functions
    of the token total; allocation identity capacity*seqs =
    tokens + pad - overflow(overlong blocks)."""
    from collections import defaultdict

    from ssafynews_data_spark.operators import text as T

    layout = T.greedy_pack_layout(spark, sf_dir).collect()
    audit = {r.bucket: r for r in T.pack_efficiency_audit(spark, sf_dir).collect()}
    cap = T.GREEDY_PACK_CAPACITY

    fills: dict[tuple, int] = defaultdict(int)
    per_bucket_docs: dict[int, int] = defaultdict(int)
    per_bucket_tokens: dict[int, int] = defaultdict(int)
    per_bucket_overlong: dict[int, int] = defaultdict(int)
    for r in layout:
        fills[(r.bucket, r.block_id)] += r.n_tokens
        per_bucket_docs[r.bucket] += 1
        per_bucket_tokens[r.bucket] += r.n_tokens
        per_bucket_overlong[r.bucket] += int(r.n_tokens > cap)

    assert set(audit) == set(per_bucket_docs)
    for b, row in audit.items():
        blocks = {blk: f for (bk, blk), f in fills.items() if bk == b}
        assert row.n_docs == per_bucket_docs[b]
        assert row.total_tokens == per_bucket_tokens[b]
        assert row.n_overlong_docs == per_bucket_overlong[b]
        assert row.greedy_n_seqs == len(blocks) == max(blocks) + 1
        assert row.greedy_pad_tokens == sum(max(0, cap - f) for f in blocks.values())
        assert row.chunk_n_blocks == -(-row.total_tokens // cap)
        assert row.chunk_tail_pad == row.chunk_n_blocks * cap - row.total_tokens
        # no-split costs at least as much padding as concat-then-chunk
        assert row.greedy_pad_tokens >= row.chunk_tail_pad or row.n_overlong_docs


def test_pack_mask_spans_within_capacity_and_cover_completions(spark, sf_dir):
    """Spans stay inside their sequence (except overlong solo docs),
    never overlap within a sequence, and n_loss_tokens + prompt_len
    reconstructs the doc's token count."""
    from collections import defaultdict

    from ssafynews_data_spark.operators import text as T

    layout = {r.doc_id: r for r in T.greedy_pack_layout(spark, sf_dir).collect()}
    spans = T.pack_mask_spans(spark, sf_dir).collect()
    cap = T.GREEDY_PACK_CAPACITY
    assert len(spans) == len(layout)

    by_seq = defaultdict(list)
    for s in spans:
        lay = layout[s.doc_id]
        n = lay.n_tokens
        assert s.prompt_len == n // T.SFT_PROMPT_DIV
        assert s.n_loss_tokens == n - s.prompt_len
        assert s.loss_start == lay.block_pos + s.prompt_len
        assert s.loss_end == lay.block_pos + n
        assert s.starts_sequence == (lay.block_pos == 0)
        if n <= cap:
            assert s.loss_end <= cap
        by_seq[(s.bucket, s.block_id)].append(s)
    for (b, blk), ss in by_seq.items():
        ss = sorted(ss, key=lambda s: s.loss_start)
        for prev, cur in zip(ss, ss[1:]):
            # cur's DOC starts at loss_start - prompt_len; the previous
            # doc must end at or before that (equality for adjacent
            # docs under the greedy recurrence) — ADVICE r10 tightened
            # this from `+ prompt_len`, which tolerated 2*prompt_len of
            # overlap
            assert prev.loss_end <= cur.loss_start - cur.prompt_len
        assert sum(s.starts_sequence for s in ss) == 1


def test_token_budget_allocation_exact_apportionment(spark, sf_dir):
    """Hamilton's method invariants: allocations are non-negative
    integers summing to EXACTLY the budget, each within 1 of its real
    quota (no source gains more than one leftover token), and extras
    go to the largest remainders first."""
    from ssafynews_data_spark.operators import text as T

    rows = T.token_budget_allocation(spark, sf_dir).collect()
    assert rows
    B = T.TOKEN_BUDGET
    total = sum(r.n_tokens for r in rows)
    assert sum(r.allocation for r in rows) == B
    for r in rows:
        assert r.extra_token in (0, 1)
        assert r.allocation == r.quota_base + r.extra_token
        assert r.quota_base == (B * r.n_tokens) // total
    # largest-remainder priority: every source that got an extra token
    # has remainder >= every source that did not (ties broken by name)
    got = [(B * r.n_tokens) % total for r in rows if r.extra_token]
    not_got = [(B * r.n_tokens) % total for r in rows if not r.extra_token]
    if got and not_got:
        assert min(got) >= max(not_got) - 0  # strict by construction up to ties
