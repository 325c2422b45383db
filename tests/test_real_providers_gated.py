"""Real-provider wiring, gated on a live OPENAI_API_KEY.

The engine ships deterministic mock providers for CI (no network, no
models); this module proves the SAME UDF machinery — picklable factory,
once-per-worker ``get_provider`` handle, Arrow batches — drives a real
public API when credentials exist.  The test image has neither key nor
network, so everything here skips cleanly; the offline test asserts the
factory's loud-failure contract instead.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ssafynews_data_spark.functions.providers import (
    OpenAIEmbeddingModel,
    openai_embedding_factory,
)
from ssafynews_data_spark.functions.udfs import make_embedding_udf


def test_factory_fails_loudly_without_key(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(RuntimeError, match="OPENAI_API_KEY"):
        openai_embedding_factory()


def test_model_is_picklable():
    """The factory ships to executors by pickle reference; the model it
    builds must also pickle (it holds only strings)."""
    import pickle

    m = OpenAIEmbeddingModel(api_key="sk-test", model="text-embedding-3-small")
    m2 = pickle.loads(pickle.dumps(m))
    assert m2.model == m.model and m2.api_key == m.api_key


@pytest.mark.skipif(
    not os.environ.get("OPENAI_API_KEY"),
    reason="OPENAI_API_KEY not set (offline test image)",
)
def test_openai_embeddings_via_udf(spark):
    """Live path: the real provider through the standard UDF factory —
    same graph as the mock, different factory."""
    embed = make_embedding_udf(openai_embedding_factory, name="openai_emb")
    df = spark.createDataFrame(
        [("a", "hello world"), ("b", "spark engines")], "id string, text string"
    ).withColumn("emb", embed(F.col("text")))
    rows = {r.id: r.emb for r in df.collect()}
    assert len(rows) == 2
    # text-embedding-3-small returns 1536-d unit-norm-ish vectors
    assert all(len(v) > 100 for v in rows.values())
    assert rows["a"] != rows["b"]


def test_http_fetcher_contract_offline():
    """Offline contract: empty url and unreachable hosts both yield ''
    (the reference's crawl-error path) instead of raising."""
    from ssafynews_data_spark.functions.providers import HttpFetcher

    f = HttpFetcher(timeout=0.2)
    assert f.fetch("") == ""
    assert f.fetch("http://127.0.0.1:1/nope") == ""


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_ALLOW_NET"),
    reason="network-gated (set SPARK_GRAFT_ALLOW_NET to run)",
)
def test_http_crawl_via_udf(spark):
    from ssafynews_data_spark.functions.providers import HttpFetcher
    from ssafynews_data_spark.functions.udfs import make_crawl_udf

    crawl = make_crawl_udf(HttpFetcher, name="http_crawl")
    df = spark.createDataFrame(
        [("a", "https://example.com")], "id string, url string"
    ).withColumn("body", crawl(F.col("url")))
    row = df.collect()[0]
    assert "Example Domain" in row.body
