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


# ---------------------------------------------------------------------------
# Corpus-growth diagnostics: n-gram novelty curve (Heaps'-law profile).
# ---------------------------------------------------------------------------

#: n-gram width for the novelty curve (trigrams repeat enough on the
#: fixture vocabulary for the curve to bend; real corpora use 3-8).
NOVELTY_W = 3
#: corpus prefix buckets (deciles of the doc_id ingest order).
NOVELTY_BUCKETS = 10

_DUCK_NOVELTY_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> x <> '')"
)


@register(
    "ngram_novelty_curve",
    oracle=f"""
        WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        d AS (
            SELECT doc_id * {NOVELTY_BUCKETS} // m AS bucket,
                   {_DUCK_NOVELTY_TOKS} AS toks
            FROM documents, mx
        ),
        g AS (
            SELECT bucket,
                   unnest(CASE WHEN len(toks) >= {NOVELTY_W}
                               THEN list_transform(
                                        range(1, len(toks) - {NOVELTY_W - 2}),
                                        i -> array_to_string(
                                                 toks[i:i + {NOVELTY_W - 1}], ' '))
                               ELSE [] END) AS gram
            FROM d
        ),
        occ AS (SELECT bucket, CAST(count(*) AS BIGINT) AS occurrences
                FROM g GROUP BY 1),
        fb AS (SELECT gram, min(bucket) AS bucket FROM g GROUP BY 1),
        nw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_grams
               FROM fb GROUP BY 1),
        nd AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs
               FROM d GROUP BY 1)
        SELECT CAST(nd.bucket AS BIGINT) AS bucket, nd.n_docs,
               coalesce(occ.occurrences, 0) AS occurrences,
               coalesce(nw.new_grams, 0) AS new_grams,
               CAST(sum(coalesce(nw.new_grams, 0))
                        OVER (ORDER BY nd.bucket) AS BIGINT) AS cum_distinct
        FROM nd LEFT JOIN occ USING (bucket) LEFT JOIN nw USING (bucket)
        ORDER BY bucket
    """,
    tags=("corpus-growth", "ngrams", "novelty", "heaps-law"),
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law novelty profile: split the corpus into
    ``NOVELTY_BUCKETS`` ingest-order prefixes (doc_id deciles) and
    report, per bucket, how many DISTINCT ``NOVELTY_W``-grams appear
    there for the FIRST time (plus total occurrences and the cumulative
    distinct count).  A flattening curve means additional shards add
    volume but not diversity — the standard diminishing-returns
    diagnostic for "is more of this source worth ingesting?" in
    training-data curation.

    Engine joins on ``xxhash64(token-slice)`` while the oracle joins on
    the shingle string — injective because tokens contain no spaces
    (same parity argument as contamination._DUCK_CONTAM_SHINGLES).

    100 TB shape: one explode + ONE gram-keyed aggregate (min over the
    bucket id, map-side combining) is the only big shuffle; everything
    downstream is buckets-sized.  The gram aggregate is the canonical
    heavy-hitter hash-agg — when even that is too big, swap min() for
    the HLL sketch variant (relational3.hll_intersection_contract's
    machinery) and accept ±2% on the curve."""
    from pyspark.sql import Window

    from ssafynews_data_spark.caching import pin
    from ssafynews_data_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg((F.max("doc_id") + 1).alias("m"))
    d = pin(
        docs.crossJoin(F.broadcast(mx)).select(
            F.expr(f"doc_id * {NOVELTY_BUCKETS} div m").cast("long").alias("bucket"),
            tokens_col(F.col("text")).alias("toks"),
        )
    )
    n = F.size(F.col("toks"))
    seq = F.sequence(F.lit(1), n - (NOVELTY_W - 1))
    hashes = F.transform(
        seq, lambda i: F.xxhash64(F.slice(F.col("toks"), i, NOVELTY_W))
    )
    guarded = F.when(n >= NOVELTY_W, hashes).otherwise(
        F.array().cast("array<bigint>")
    )
    g = d.select("bucket", F.explode(guarded).alias("h"))
    occ = g.groupBy("bucket").agg(F.count("*").cast("long").alias("occurrences"))
    fb = g.groupBy("h").agg(F.min("bucket").alias("bucket"))
    nw = fb.groupBy("bucket").agg(F.count("*").cast("long").alias("new_grams"))
    nd = d.groupBy("bucket").agg(F.count("*").cast("long").alias("n_docs"))
    cum_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        nd.join(occ, "bucket", "left")
        .join(nw, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            F.coalesce("occurrences", F.lit(0)).cast("long").alias("occurrences"),
            F.coalesce("new_grams", F.lit(0)).cast("long").alias("new_grams"),
        )
        .withColumn(
            "cum_distinct", F.sum("new_grams").over(cum_w).cast("long")
        )
        .orderBy("bucket")
    )
