"""BPE tokenizer invariants: hand-computed merges, encode/decode
consistency, determinism, and the Spark audit query's accounting."""

from __future__ import annotations

from ssafynews_data_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_token_stats,
    learn_bpe,
)


def test_learn_bpe_hand_computed():
    """'low' x5 + 'lower' x2 (the Sennrich example shape): ('l','o')
    wins with count 7; 'low' ends in 'w</w>' so ('lo','w</w>') follows
    at 5; the remaining pairs all have count 2 and the lexicographic
    tie-break orders ('e','r</w>') before ('lo','w')."""
    merges = learn_bpe([("low", 5), ("lower", 2)], n_merges=4)
    assert merges == [
        ("l", "o"),
        ("lo", "w" + EOW),
        ("e", "r" + EOW),
        ("lo", "w"),
    ]


def test_bpe_encode_greedy_rank_order():
    merges = learn_bpe([("low", 5), ("lower", 2)], n_merges=4)
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode("low", ranks) == ["low" + EOW]
    # the learned 'low' stem survives inside the longer word
    assert bpe_encode("lower", ranks) == ["low", "er" + EOW]
    # unseen word: falls back to finer segments but stays lossless
    out = bpe_encode("slow", ranks)
    assert out == ["s", "low" + EOW]
    assert "".join(out) == "slow" + EOW


def test_learn_bpe_deterministic_vs_input_order():
    a = learn_bpe([("abc", 3), ("abd", 3), ("xyz", 1)], n_merges=5)
    b = learn_bpe([("xyz", 1), ("abd", 3), ("abc", 3)], n_merges=5)
    assert a == b


def test_bpe_token_stats_accounting(spark, sf_dir):
    """Per-source audit: BPE subword count >= whitespace token count is
    NOT guaranteed per doc (merged stems can't cross words, so every
    word yields >= 1 subword => n_bpe >= n_ws only when no word fully
    merges...); what IS guaranteed: n_bpe >= n_docs' word minimum — use
    the solid invariants: counts positive, fertility quantized
    consistently, totals additive."""
    rows = bpe_token_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bpe_tokens >= r.ws_tokens  # a word is >= 1 subword;
        # only fully-merged single-token words hit equality
        assert r.subwords_per_word_q4 >= 10000
        assert r.subwords_per_word_q4 == r.bpe_tokens * 10000 // r.ws_tokens


def test_training_contract_degenerate_single_char_corpus(spark, tmp_path):
    """A corpus whose words are all single characters has no adjacent
    symbol pair, so zero learned merges is CORRECT behavior — the
    contract's merges_ok must hold, not fail (ADVICE r6)."""
    import os

    from ssafynews_data_spark.operators.bpe import bpe_training_contract

    docs = spark.createDataFrame(
        [(1, "a b c d", "en", "s", 7), (2, "e f g", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    row = bpe_training_contract(spark, d).collect()[0]
    assert row.merges_ok, row
    assert row.bounds_ok and row.reconstruct_ok
    assert row.ws_tokens == 7 and row.word_chars == 7


def test_bpe_lossless_property():
    """Property: for ANY word, the concatenation of its BPE segments
    reconstructs word+EOW exactly (merges never lose or invent chars)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    merges = learn_bpe(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], n_merges=20
    )
    ranks = {p: i for i, p in enumerate(merges)}

    @given(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll",)),
            min_size=1,
            max_size=16,
        )
    )
    @settings(max_examples=200, deadline=None)
    def check(word):
        assert "".join(bpe_encode(word, ranks)) == word + EOW

    check()
