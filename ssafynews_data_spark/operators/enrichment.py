"""Oracle-checked enrichment queries — the pandas_udf path under the
driver's correctness gate.

The mock providers (functions/udfs.py) are deterministic closed-form
functions, so the *Arrow UDF execution itself* can be oracle-checked:
the DuckDB SQL re-states the same rules, and any drift between the
pandas batch path and the JVM plan (null handling, truncation, batch
boundaries) becomes a hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.functions.udfs import (
    _CATEGORY_RULES,
    _NEG_WORDS,
    _POS_WORDS,
    classify_category,
    extract_keywords,
    generate_embedding,
    sentiment,
)
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


def _classify_case_sql() -> str:
    whens = "\n".join(
        f"WHEN contains(lower(text), '{kw}') THEN '{cat}'"
        for kw, cat in _CATEGORY_RULES
    )
    return f"CASE {whens} ELSE '미분류' END"


def _sentiment_case_sql() -> str:
    pos = ", ".join(f"'{w}'" for w in sorted(_POS_WORDS))
    neg = ", ".join(f"'{w}'" for w in sorted(_NEG_WORDS))
    # mirror of udfs.sentiment: truncate to 300 chars, whitespace split
    toks = "list_filter(string_split_regex(lower(substr(text, 1, 300)), '[\\s\\x0B]+'), x -> x <> '')"
    return f"""
        CASE WHEN text IS NULL OR text = '' THEN '-'
             WHEN len(list_filter({toks}, x -> x IN ({pos})))
                > len(list_filter({toks}, x -> x IN ({neg}))) THEN '긍정'
             WHEN len(list_filter({toks}, x -> x IN ({neg})))
                > len(list_filter({toks}, x -> x IN ({pos}))) THEN '부정'
             ELSE '중립' END
    """


@register(
    "mock_enrich_documents",
    oracle=f"""
        SELECT doc_id,
               {_classify_case_sql()} AS category,
               {_sentiment_case_sql()} AS sentiment,
               CAST(least(5, len(list_distinct(
                   list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'), x -> x <> ''))))
                   AS INT) AS n_keywords,
               8 AS emb_dim
        FROM documents
    """,
    tags=("U2", "U3", "U4", "U6", "pandas_udf"),
    bench=True,
)
def mock_enrich_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2+U3+U4+U6 over Arrow batches, verified against closed-form SQL:
    category (first matching rule), sentiment (±lexicon over the first
    300 chars), keyword count (top-5 bound), embedding dim.  This is the
    engine form of the reference's per-record enrichment loop
    (collect/consumer.py:165-168) — four vectorized UDF columns, one
    narrow stage, executor-parallel."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        classify_category(F.col("text")).alias("category"),
        sentiment(F.col("text")).alias("sentiment"),
        F.size(extract_keywords(F.col("text"))).cast("int").alias("n_keywords"),
        F.size(generate_embedding(F.col("text"))).cast("int").alias("emb_dim"),
    )
