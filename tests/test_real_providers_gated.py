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


def test_pg_upsert_sql_contract_offline():
    """The Postgres upsert statement (consumer2.py:164-186 shape) is a
    pure function: quoted identifiers, one placeholder per column, the
    conflict clause on the key — unit-tested without a database."""
    from ssafynews_data_spark.sources.sinks import _pg_upsert_sql

    sql = _pg_upsert_sql("news", ["link", "title", "ts"], key="link")
    assert sql == (
        'INSERT INTO "news" ("link", "title", "ts") VALUES (%s, %s, %s) '
        'ON CONFLICT ("link") DO NOTHING'
    )


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_PG_DSN"),
    reason="SPARK_GRAFT_PG_DSN not set (no Postgres in the test image)",
)
def test_postgres_upsert_idempotent_gated(spark):
    """Live path: run the foreachBatch Postgres upsert twice over the
    same micro-batch; the ON CONFLICT clause must leave exactly one row
    per key (the S5/S6 effectively-once contract on a real database)."""
    import uuid as _uuid

    import psycopg2

    from ssafynews_data_spark.sources.sinks import foreach_batch_postgres_upsert

    dsn = os.environ["SPARK_GRAFT_PG_DSN"]
    table = f"upsert_test_{_uuid.uuid4().hex[:8]}"
    conn = psycopg2.connect(dsn)
    try:
        with conn, conn.cursor() as cur:
            cur.execute(
                f'CREATE TABLE "{table}" ("link" TEXT PRIMARY KEY, "title" TEXT)'
            )
        batch = spark.createDataFrame(
            [("u1", "a"), ("u2", "b"), ("u2", "b")], "link string, title string"
        )
        sink = foreach_batch_postgres_upsert(dsn, table, key="link")
        sink(batch, 0)
        sink(batch, 1)  # redelivery: must be a no-op
        with conn, conn.cursor() as cur:
            cur.execute(f'SELECT count(*) FROM "{table}"')
            assert cur.fetchone()[0] == 2
    finally:
        with conn, conn.cursor() as cur:
            cur.execute(f'DROP TABLE IF EXISTS "{table}"')
        conn.close()


def test_okt_noun_provider_gated(spark):
    """konlpy-gated: when Okt is installed the default factory must
    resolve the REAL morphological analyzer (not the heuristic) and
    drive it through the standard per-worker UDF machinery — the same
    provider-swap proof as the OpenAI/HTTP gates
    (dags/scripts/spark_daily_report.py:31-36)."""
    pytest.importorskip("konlpy", reason="konlpy/Okt not installed (offline image)")
    from ssafynews_data_spark.functions.providers import default_noun_factory
    from ssafynews_data_spark.functions.udfs import make_noun_udf

    m = default_noun_factory()
    assert type(m).__name__ == "_OktAdapter"
    assert "국회" in m.nouns("대통령이 국회에서 연설을 했다")

    nouns = make_noun_udf(default_noun_factory, name="okt_nouns_gated")
    df = spark.createDataFrame([(1, "한국의 수도는 서울이다")], "i int, s string")
    row = df.select(nouns(F.col("s")).alias("n")).collect()[0]
    assert "서울" in row.n
