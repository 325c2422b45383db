"""Enrichment UDF surface (U1-U7 mocks): determinism + contract shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.functions import udfs
from ssafynews_data_spark.schemas import CATEGORIES, CATEGORY_FALLBACK


def _articles(spark):
    rows = [
        ("https://news.example/1", "spark query engines are fast"),
        ("https://news.example/2", "slow markets worry customer value"),
        (None, None),
        ("https://news.example/3", "zzz nothing matches here"),
    ]
    return spark.createDataFrame(rows, "link string, summary string")


def test_enrich_chain_schema(spark):
    out = udfs.enrich(_articles(spark))
    assert {"full_text", "category", "keywords", "embedding"} <= set(out.columns)
    rows = out.collect()
    assert len(rows) == 4


def test_classifier_enum_and_fallback(spark):
    rows = udfs.enrich(_articles(spark)).collect()
    cats = [r.category for r in rows]
    assert all(c in CATEGORIES or c == CATEGORY_FALLBACK for c in cats)
    assert cats[3] == CATEGORY_FALLBACK  # consumer.py:131 fallback path
    assert cats[0] == "IT_과학"


def test_embedding_deterministic_and_unit(spark):
    df = _articles(spark)
    a = df.select(udfs.generate_embedding(F.col("summary")).alias("e")).collect()
    b = df.select(udfs.generate_embedding(F.col("summary")).alias("e")).collect()
    assert [r.e for r in a] == [r.e for r in b]
    v = a[0].e
    assert len(v) == udfs.EMBED_DIM
    assert abs(sum(x * x for x in v) - 1.0) < 1e-3


def test_keywords_top5_deterministic(spark):
    df = spark.createDataFrame([("b b b a a c d e f",)], "summary string")
    out = df.select(udfs.extract_keywords(F.col("summary")).alias("k")).collect()[0].k
    assert out == ["b", "a", "c", "d", "e"]


def test_sentiment_labels(spark):
    df = spark.createDataFrame(
        [("fast big merge win",), ("slow error day",), ("neutral words only",), (None,)],
        "t string",
    )
    out = [r.s for r in df.select(udfs.sentiment(F.col("t")).alias("s")).collect()]
    assert out == ["긍정", "부정", "중립", "-"]


def test_extract_nouns_tokenizer(spark):
    df = spark.createDataFrame([("한국어 단어 a bb 기사 내용",)], "t string")
    out = df.select(udfs.extract_nouns(F.col("t")).alias("n")).collect()[0].n
    assert out == ["한국어", "단어", "bb", "기사", "내용"]  # len>=2 filter


def test_crawler_mock_deterministic(spark):
    df = _articles(spark)
    a = [r.f for r in df.select(udfs.crawl_article(F.col("link")).alias("f")).collect()]
    assert a[2] == ""  # error path returns '' (consumer.py:113)
    assert a[0].startswith("mock article body for https://news.example/1")
