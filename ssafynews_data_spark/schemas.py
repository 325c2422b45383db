"""Explicit schemas for every table the engine touches.

The reference declares its article schema in four diverging places
(SQLAlchemy ``collect/consumer.py:45-59``, Flink DDL
``collect/consumer2.py:136-186``, archive JSON
``data/news_archive/sample.json``, preprocess CSV
``preprocess/datashow.ipynb`` cell 49) and lets Spark *infer* the batch
schema (``dags/scripts/spark_daily_report.py:55``).  Inference on 100 TB
of JSON is a full extra read — the engine declares everything.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# News-article data model (SURVEY.md §1.1) — the unified schema.
# ---------------------------------------------------------------------------

#: Kafka wire message, collect/producer.py:42-48.
ARTICLE_WIRE = T.StructType(
    [
        T.StructField("author", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("updated", T.StringType()),  # ISO string on the wire
    ]
)

#: Enriched article, union of DB schema (collect/consumer.py:45-59) and the
#: archive JSON shape (data/news_archive/sample.json:2-9).
ARTICLE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("content", T.StringType()),  # aka full_text in the DB shape
        T.StructField("published_at", T.TimestampType()),
        T.StructField("category", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

#: Raw historical CSV (preprocess/datashow.ipynb cells 4/9/27; sep='|').
ARTICLE_RAW_CSV = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("reporter", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("article", T.StringType()),
        T.StructField("published", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("category_str", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

#: 17-value category enum, collect/consumer.py:117-118 / consumer2.py:36-38.
CATEGORIES = [
    "IT_과학", "건강", "경제", "교육", "국제", "라이프스타일", "문화",
    "사건사고", "사회일반", "산업", "스포츠", "여성복지", "여행레저",
    "연예", "정치", "지역", "취미",
]
#: Out-of-vocabulary fallback, collect/consumer.py:131 / consumer2.py:57.
CATEGORY_FALLBACK = "미분류"

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/ — TESTDATA.md).
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

#: Multimodal asset table (engine extension; no driver fixture — built in
#: tests).  Media payloads are opaque binary + typed metadata, processed by
#: Arrow-batched UDFs (SURVEY.md north-star; operators/multimodal.py).
MEDIA_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
