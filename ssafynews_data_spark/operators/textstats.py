"""Character-level document statistics and Unicode normalization —
row-local quality signals a training-data pipeline runs before any
shuffle (C4/Gopher-style gibberish detection; NFC canonicalization so
dedup fingerprints don't split on visually-identical byte sequences).

Both operators are Arrow-batched ``pandas_udf``s: character histograms
and Unicode normalization have no JVM built-in, and per-row Python over
Arrow batches is the prescribed fallback (pyspark_guide.md "UDFs are
the slow path").  Everything around the UDF — length, integer ratio
math, projection — stays JVM-side.  No shuffle anywhere: both queries
are embarrassingly parallel over document partitions at any scale.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

# DataType objects, not DDL strings: string returnTypes parse DDL at
# decoration time, which requires an active session at module import.
_CHAR_STATS_TYPE = T.StructType(
    [
        T.StructField("n_distinct_chars", T.IntegerType()),
        T.StructField("top_cnt", T.IntegerType()),
    ]
)


@F.pandas_udf(_CHAR_STATS_TYPE)
def _char_stats(texts: pd.Series) -> pd.DataFrame:
    """Per-document codepoint histogram stats via numpy: encode to
    UTF-32 and ``np.unique`` — vectorized per row, no Python dict churn.
    Codepoint granularity matches the oracle's per-codepoint regex split
    (RE2 empty-pattern split) including astral-plane characters."""
    n_distinct = np.zeros(len(texts), dtype=np.int32)
    top = np.zeros(len(texts), dtype=np.int32)
    for i, t in enumerate(texts):
        if not t:
            continue
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        counts = np.unique(cps, return_counts=True)[1]
        n_distinct[i] = len(counts)
        top[i] = counts.max()
    return pd.DataFrame({"n_distinct_chars": n_distinct, "top_cnt": top})


@register(
    "char_stats_quality",
    oracle="""
        WITH ch AS (
            SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
            FROM documents WHERE length(text) > 0
        ),
        cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
        agg AS (
            SELECT doc_id, CAST(count(*) AS INT) AS n_distinct_chars,
                   max(n) AS top
            FROM cnt GROUP BY 1
        )
        SELECT d.doc_id,
               coalesce(a.n_distinct_chars, 0) AS n_distinct_chars,
               CAST(coalesce(a.top * 10000 // length(d.text), 0) AS BIGINT)
                   AS top_char_q4
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    tags=("quality", "char-stats", "pandas_udf"),
)
def char_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gibberish/boilerplate signal: distinct-codepoint count and the
    modal character's share of the document (floor-quantized 4dp with
    pure integer arithmetic — exact on both engines).  A document whose
    top character covers most of it (``aaaa...``, ASCII-art, separator
    runs) fails quality gates that token ratios alone miss.

    The ratio math stays JVM-side on exact integers (``div``, never
    float division); only the histogram runs in Python, Arrow-batched.
    """
    docs = load_table(spark, sf_dir, "documents")
    st = docs.select("doc_id", F.length("text").alias("n"), _char_stats("text").alias("s"))
    return st.select(
        "doc_id",
        F.col("s.n_distinct_chars").alias("n_distinct_chars"),
        F.when(F.col("n") > 0, F.expr("s.top_cnt * 10000L div n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_char_q4"),
    )


@F.pandas_udf(T.StringType())
def nfc_normalize_udf(texts: pd.Series) -> pd.Series:
    """NFC canonical normalization (``unicodedata``), Arrow-batched.
    Cross-dialect parity with DuckDB's utf8proc ``nfc_normalize`` is
    property-tested in tests/test_properties.py over combining marks and
    Hangul jamo (capped at the shared Unicode-table range — see
    docs/SCALE.md on the Java-17/RE2 Unicode-version skew)."""
    return texts.map(lambda t: unicodedata.normalize("NFC", t) if t is not None else None)


@register(
    "nfc_normalize_docs",
    oracle="""
        SELECT doc_id,
               nfc_normalize(text) AS norm_text,
               nfc_normalize(text) <> text AS changed
        FROM documents
    """,
    tags=("normalize", "unicode", "pandas_udf"),
)
def nfc_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization — the step that runs BEFORE content
    fingerprinting so 'é' (precomposed) and 'e'+U+0301 (decomposed)
    dedup to the same document.  Full normalized text is hash-compared
    against DuckDB, so the check is byte-exact, not statistical."""
    docs = load_table(spark, sf_dir, "documents")
    norm = nfc_normalize_udf(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).alias("changed"),
    )
