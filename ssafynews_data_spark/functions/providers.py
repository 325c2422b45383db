"""Provider implementations for the real-model UDF factories.

``make_embedding_udf`` / ``make_sentiment_udf`` (functions/udfs.py) take
any picklable factory returning an object with the provider contract:

- embedding: ``model.encode(text) -> sequence[float]``
  (the SentenceTransformer contract, collect/ollama_consumer.py:196)
- sentiment: ``model.predict(text) -> label``
  (the HF-pipeline contract, dags/scripts/spark_daily_report.py:121-125)

``default_embedding_factory`` loads the real model when the library is
installed and degrades to the deterministic hash model otherwise, so the
same pipeline code runs in CI (no models, no network) and in production
unchanged.  Classes live in the package — NOT in test modules — because
factories ship to executor Python workers by pickle reference.
"""

from __future__ import annotations

import os
import uuid

from ssafynews_data_spark.functions.udfs import (
    _NEG_WORDS,
    _POS_WORDS,
    _seeded_vec,
    _ws_tokens,
    EMBED_DIM,
)


class HashEmbeddingModel:
    """Deterministic stand-in with the SentenceTransformer contract:
    equal text ⇒ equal unit vector, on any worker."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim

    def encode(self, text: str):
        return _seeded_vec(text or "", self.dim)


class LexiconSentimentModel:
    """Deterministic stand-in with the classifier contract — same rules
    as the ``sentiment`` mock UDF (±lexicon over the first 300 chars)."""

    def predict(self, text: str) -> str:
        toks = _ws_tokens((text or "")[:300].lower())
        pos = sum(w in _POS_WORDS for w in toks)
        neg = sum(w in _NEG_WORDS for w in toks)
        return "긍정" if pos > neg else ("부정" if neg > pos else "중립")


def default_embedding_factory():
    """Real model when installed, deterministic fallback otherwise."""
    try:  # pragma: no cover - model lib absent in the test image
        from sentence_transformers import SentenceTransformer

        return SentenceTransformer("all-mpnet-base-v2")
    except ImportError:
        return HashEmbeddingModel()


#: common Korean particles (josa) + copula, longest-match-first — the
#: suffixes stripped from Hangul runs to approximate noun stems.
_JOSA = tuple(
    sorted(
        (
            "에서", "으로", "부터", "까지", "께서", "에게", "한테", "보다",
            "처럼", "이다", "은", "는", "이", "가", "을", "를", "의", "에",
            "로", "와", "과", "도", "만",
        ),
        key=len,
        reverse=True,
    )
)


#: explicit verbal/copular endings dropped as non-nouns.
_VERB_ENDINGS = ("했다", "한다", "하다", "된다", "됐다", "였다", "있다", "없다")


class HeuristicKoreanNounExtractor:
    """Dependency-free Korean noun extraction with the konlpy Okt
    contract (``nouns(text) -> list[str]``, spark_daily_report.py:31-36):
    Hangul runs with longest-match josa/copula suffix stripping, stems
    shorter than 2 chars keep the original run, common verbal endings
    (했다/한다/하다/된다/됐다/였다/있다/없다) are dropped — a plain
    다-final filter would wrongly drop nouns like 바다.  A heuristic,
    not a morphological analyzer —
    it exists so the provider interface has a REAL, deterministic,
    picklable implementation in environments without konlpy; swap in
    ``default_noun_factory`` resolves Okt when installed."""

    def nouns(self, text: str) -> list[str]:
        import re

        out = []
        for run in re.findall(r"[가-힣]+", text or ""):
            w = run
            for j in _JOSA:
                if w.endswith(j) and len(w) - len(j) >= 2:
                    w = w[: -len(j)]
                    break
            if len(w) >= 2 and not w.endswith(_VERB_ENDINGS):
                out.append(w)
        return out


def default_noun_factory():
    """konlpy Okt when installed, the heuristic extractor otherwise."""
    try:  # pragma: no cover - konlpy absent in the test image
        from konlpy.tag import Okt

        okt = Okt()

        class _OktAdapter:
            def nouns(self, text: str) -> list[str]:
                return okt.nouns(text or "")

        return _OktAdapter()
    except ImportError:
        return HeuristicKoreanNounExtractor()


class OpenAIEmbeddingModel:
    """Real embedding provider over the public OpenAI REST API
    (https://api.openai.com/v1/embeddings) with the same ``encode(text)
    -> sequence[float]`` contract as :class:`HashEmbeddingModel` — the
    engine analog of the reference's OpenAI embedding call
    (collect/consumer.py:116-149), restructured for executors:

    - the *factory* (:func:`openai_embedding_factory`) ships by pickle
      reference; each Python worker builds ONE model on its first Arrow
      batch (``get_provider`` — the Flink ``open()`` analog,
      collect/consumer2.py:81-95), so the HTTP session/key setup happens
      once per worker, not once per row;
    - the instance holds only strings (key, model name, endpoint) — it
      is picklable, but never actually pickled after construction;
    - stdlib ``urllib`` only: no client-library dependency to gate.

    Env-gated: requires ``OPENAI_API_KEY``; the test image has neither
    the key nor network, so tests/test_real_providers_gated.py skips
    there and runs wherever a key exists.
    """

    ENDPOINT = "https://api.openai.com/v1/embeddings"

    def __init__(
        self,
        api_key: str,
        model: str = "text-embedding-3-small",
        timeout: float = 30.0,
    ):
        self.api_key = api_key
        self.model = model
        self.timeout = timeout

    def encode(self, text: str):
        import json
        import urllib.request

        req = urllib.request.Request(
            self.ENDPOINT,
            data=json.dumps(
                {"model": self.model, "input": text or " "}
            ).encode(),
            headers={
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            payload = json.load(resp)
        return payload["data"][0]["embedding"]


def openai_embedding_factory():
    """Factory for :func:`make_embedding_udf`: real OpenAI embeddings
    when ``OPENAI_API_KEY`` is set, loud failure otherwise (silent
    fallback to the hash mock would corrupt a real corpus build)."""
    key = os.environ.get("OPENAI_API_KEY")
    if not key:
        raise RuntimeError(
            "OPENAI_API_KEY is not set; use default_embedding_factory "
            "(deterministic hash model) for offline runs"
        )
    return OpenAIEmbeddingModel(
        api_key=key,
        model=os.environ.get("OPENAI_EMBED_MODEL", "text-embedding-3-small"),
    )


class MarkingFactory:
    """Test instrumentation: a factory that records every instantiation
    as a unique pid-tagged file in ``marker_dir`` — counting files vs
    distinct pids proves get_provider's once-per-worker guarantee."""

    def __init__(self, marker_dir: str):
        self.marker_dir = marker_dir

    def __call__(self) -> HashEmbeddingModel:
        fname = f"pid_{os.getpid()}_{uuid.uuid4().hex}"
        with open(os.path.join(self.marker_dir, fname), "w") as f:
            f.write("x")
        return HashEmbeddingModel(dim=2)


class HttpFetcher:
    """Real crawl provider with the ``fetch(url) -> str`` contract the
    mock ``crawl_article`` UDF stands in for (collect/consumer.py:113:
    crawl errors yield '' and the pipeline continues).  stdlib urllib,
    per-worker instance via ``get_provider`` so connection setup and the
    politeness timeout are worker-local, not per-row.  Env-gated tests:
    the test image has no network."""

    def __init__(self, timeout: float = 10.0, max_bytes: int = 1_000_000):
        self.timeout = timeout
        self.max_bytes = max_bytes

    def fetch(self, url: str) -> str:
        import urllib.request

        if not url:
            return ""
        try:
            req = urllib.request.Request(
                url, headers={"User-Agent": "ssafynews-data-spark/1.0"}
            )
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                body = resp.read(self.max_bytes)
            return body.decode("utf-8", errors="replace")
        except Exception:
            return ""  # reference error path: empty text, row survives
