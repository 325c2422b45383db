"""Enrichment UDF surface (SURVEY.md §2.11 U1-U7) — Arrow pandas_udfs
with pluggable providers.

The reference enriches per-record with network calls: crawl the article
URL (U1, collect/consumer.py:92-113), LLM category classification (U2,
:116-131), LLM keyword extraction (U3, :135-142), embedding generation
(U4, :144-149), HF sentiment in a driver-side loop (U6,
spark_daily_report.py:121-125), Okt noun extraction (U7, :31-36).

The engine ships the *mock* provider: deterministic, pure functions of
the input, so the full pipeline is reproducible with no network or
models (SURVEY.md §7 stage 3 — deviation by design).  Real providers
plug in behind the same signatures; model handles must be lazy
module-level singletons (the Flink ``open()`` analog, consumer2.py:81-95)
so each executor loads once.

Everything is ``pandas_udf`` — Arrow-batched, never row-at-a-time (the
reference's driver-side sentiment loop is the anti-pattern, §2.11 U6).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssafynews_data_spark.schemas import CATEGORIES, CATEGORY_FALLBACK

EMBED_DIM = 8  # test dim; shape-parity 768 per ollama_consumer.py:234

#: tiny keyword→category rules for the mock classifier (U2's 17-enum with
#: 미분류 fallback, consumer.py:131).
_CATEGORY_RULES: list[tuple[str, str]] = [
    ("spark", "IT_과학"),
    ("vector", "IT_과학"),
    ("query", "IT_과학"),
    ("customer", "경제"),
    ("value", "경제"),
    ("fast", "스포츠"),
    ("slow", "건강"),
    ("stream", "문화"),
]

#: explicit whitespace class shared with the DuckDB oracles: RE2's \s is
#: [ \t\n\f\r] (no \x0B) while Python str.split() splits on ALL Unicode
#: whitespace (\x0B, NBSP, \u2028, ...).  Both sides tokenize on exactly
#: this set — the oracle side uses '[\s\x0B]+' which is the same class.
_WS_RE = re.compile(r"[ \t\n\r\f\x0B]+")


def _ws_tokens(t: str) -> list[str]:
    return [w for w in _WS_RE.split(t) if w]


_POS_WORDS = frozenset({"fast", "big", "merge", "join"})
_NEG_WORDS = frozenset({"slow", "error", "small"})


@F.pandas_udf(T.StringType())
def classify_category(text: pd.Series) -> pd.Series:
    """U2 mock: first matching keyword rule, else 미분류."""

    def one(t: str | None) -> str:
        low = (t or "").lower()
        for kw, cat in _CATEGORY_RULES:
            if kw in low:
                assert cat in CATEGORIES
                return cat
        return CATEGORY_FALLBACK

    return text.map(one)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_keywords(text: pd.Series) -> pd.Series:
    """U3 mock: top-5 tokens by (count desc, token asc) — deterministic
    stand-in for the LLM's '5 comma-separated keywords'."""

    def one(t: str | None) -> list[str]:
        toks = _ws_tokens((t or "").lower())
        counts: dict[str, int] = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        return [w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]

    return text.map(one)


def _seeded_vec(text: str, dim: int) -> list[float]:
    """Seeded hash → R^dim unit-ish vector (U4 mock): md5 drives a
    deterministic PRNG so equal text ⇒ equal embedding on any executor."""
    seed = int.from_bytes(hashlib.md5((text or "").encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    n = float(np.linalg.norm(v)) or 1.0
    return [float(x / n) for x in v]


@F.pandas_udf(T.ArrayType(T.FloatType()))
def generate_embedding(text: pd.Series) -> pd.Series:
    """U4 mock embedding generator (real: SentenceTransformer
    all-mpnet-base-v2, 768-d — ollama_consumer.py:196)."""
    return text.map(lambda t: _seeded_vec(t, EMBED_DIM))


@F.pandas_udf(T.StringType())
def sentiment(text: pd.Series) -> pd.Series:
    """U6 mock lexicon sentiment over the first 300 chars (truncation per
    spark_daily_report.py:177); labels 긍정/부정/중립, '-' on empty like
    the reference's error path (:124-125)."""

    def one(t: str | None) -> str:
        if not t:
            return "-"
        toks = _ws_tokens(t[:300].lower())
        pos = sum(w in _POS_WORDS for w in toks)
        neg = sum(w in _NEG_WORDS for w in toks)
        if pos > neg:
            return "긍정"
        if neg > pos:
            return "부정"
        return "중립"

    return text.map(one)


@F.pandas_udf(T.StringType())
def crawl_article(url: pd.Series) -> pd.Series:
    """U1 mock crawler: deterministic text keyed on the url hash ('' for
    null, matching consumer.py:113's error path)."""

    def one(u: str | None) -> str:
        if not u:
            return ""
        h = hashlib.md5(u.encode()).hexdigest()
        return f"mock article body for {u} [{h[:12]}]"

    return url.map(one)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_nouns(text: pd.Series) -> pd.Series:
    """U7 mock tokenizer standing in for konlpy Okt
    (spark_daily_report.py:31-36): words of length ≥2, lowered."""
    return text.map(lambda t: [w.lower() for w in _ws_tokens(t or "") if len(w) >= 2])


def enrich(df, text_col: str = "summary", url_col: str = "link"):
    """U1-U4 chain (consumer.py:165-168) as one narrow stage: four
    Arrow-batched UDFs, no shuffle, executor-parallel — the engine form
    of the reference's sequential per-record loop."""
    return (
        df.withColumn("full_text", crawl_article(F.col(url_col)))
        .withColumn("category", classify_category(F.col(text_col)))
        .withColumn("keywords", extract_keywords(F.col(text_col)))
        .withColumn("embedding", generate_embedding(F.col(text_col)))
    )


# ---------------------------------------------------------------------------
# Pluggable REAL-model providers — lazy executor-side singletons.
# ---------------------------------------------------------------------------

#: per-Python-worker model handles.  Executor processes each materialize
#: a handle once, on the first Arrow batch that needs it — the Flink
#: ``open()`` analog (collect/consumer2.py:81-95) and the documented
#: pattern for SentenceTransformer / KR-FinBert loading
#: (ollama_consumer.py:196, spark_daily_report.py:121-125).
_PROVIDERS: dict[str, object] = {}


def get_provider(name: str, factory):
    """Return the worker-local singleton for ``name``, creating it with
    ``factory()`` exactly once per Python worker process.  ``factory``
    must be picklable (module-level callable) — it ships to executors
    inside the UDF closure; the heavy model object itself never does."""
    if name not in _PROVIDERS:
        _PROVIDERS[name] = factory()
    return _PROVIDERS[name]


def make_noun_udf(factory, name: str = "nouns"):
    """Arrow UDF over a real Korean tokenizer provider: ``model.nouns(
    text) -> list[str]`` (the konlpy Okt contract,
    spark_daily_report.py:31-36).  Same lazy once-per-worker handle as
    the embedding/sentiment factories."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def nouns(text: pd.Series) -> pd.Series:
        model = get_provider(name, factory)
        return text.map(lambda t: [str(w) for w in model.nouns(t or "")])

    return nouns


def make_embedding_udf(factory, name: str = "embedding"):
    """Arrow UDF over a real embedding provider: ``factory() -> model``
    with ``model.encode(text) -> sequence[float]`` (the
    SentenceTransformer contract).  The model loads lazily per worker;
    the mock (``generate_embedding``) needs no provider at all."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(text: pd.Series) -> pd.Series:
        model = get_provider(name, factory)
        return text.map(lambda t: [float(x) for x in model.encode(t or "")])

    return embed


def make_sentiment_udf(factory, name: str = "sentiment"):
    """Arrow UDF over a real classifier provider: ``model.predict(text)
    -> label`` (the HF-pipeline contract, spark_daily_report.py:121-125
    — which the reference ran in a driver-side loop; here it is
    executor-parallel with one lazy model handle per worker)."""

    @F.pandas_udf(T.StringType())
    def sent(text: pd.Series) -> pd.Series:
        model = get_provider(name, factory)
        return text.map(lambda t: "-" if not t else str(model.predict(t[:300])))

    return sent


def make_crawl_udf(factory, name: str = "crawler"):
    """Arrow UDF over a real fetch provider: ``factory() -> model`` with
    ``model.fetch(url) -> str`` (the requests/urllib contract the mock
    ``crawl_article`` stands in for, consumer.py:113).  One lazy handle
    per worker; crawl failures yield '' so the pipeline keeps flowing."""

    @F.pandas_udf(T.StringType())
    def crawl(url: pd.Series) -> pd.Series:
        model = get_provider(name, factory)
        return url.map(lambda u: model.fetch(u or ""))

    return crawl
