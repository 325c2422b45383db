"""Dataset card — the release datasheet a curated corpus ships with.

``dataset_card_stats`` joins the standing per-source quality signals
(token accounting, declared-language mode, exact-dup share, Gopher rule
pass share, mean quality score) into ONE row per source — the
"Datasheets for Datasets" (Gebru et al. 2021) summary table, computed
engine-side so the published numbers are the audited ones.

The per-doc signal formulas are byte-shared with their canonical
operators (``quality_scores``, ``gopher_quality_filter``,
``exact_dedup_groups`` in text.py/dedup.py) — the card must report the
same numbers those gates enforce.  Reference scope: the reference
publishes no datasheet; its closest artifact is the per-category daily
PDF report (dags/scripts/spark_daily_report.py) this table supersedes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.operators.text import (
    _DUCK_STOP_LIST,
    _DUCK_TOKENS,
    GOPHER_MAX_MEAN_LEN_Q4,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_LEN_Q4,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    STOPWORDS,
    tokens_col,
)
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

#: the quality_scores stopword list as a DuckDB IN-list (quality uses a
#: non-distinct count, unlike Gopher's distinct intersect).
_QS_IN = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "dataset_card_stats",
    oracle=f"""
        WITH d AS (
            SELECT source,
                   coalesce(lang, 'und') AS lang,
                   n_chars,
                   md5(trim(regexp_replace(lower(text), '[\\s\\x0B]+', ' ', 'g'), ' '))
                       AS fp,
                   {_DUCK_TOKENS} AS toks,
                   CAST(length(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s\\x0B]', '', 'g'))
                        AS DOUBLE) AS n_punct
            FROM documents
        ),
        m AS (
            SELECT source, lang, fp,
                   CAST(len(toks) AS BIGINT) AS n_toks,
                   CAST(floor((0.4 * least(1.0, n_chars / 500.0)
                       + 0.4 * (CASE WHEN len(toks) > 0
                                     THEN CAST(len(list_filter(toks, x -> x IN ({_QS_IN})))
                                               AS DOUBLE) / len(toks)
                                     ELSE 0.0 END)
                       + 0.2 * (1.0 - (CASE WHEN n_chars > 0
                                            THEN n_punct / n_chars ELSE 0.0 END)))
                       * 10000) AS BIGINT) AS quality_q4,
                   (CAST(len(toks) AS BIGINT)
                        BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
                   AND ((CASE WHEN len(toks) = 0 THEN CAST(0 AS BIGINT)
                              ELSE CAST(floor(CAST(len(array_to_string(toks, ''))
                                                   AS DOUBLE)
                                              / len(toks) * 10000) AS BIGINT) END)
                        BETWEEN {GOPHER_MIN_MEAN_LEN_Q4} AND {GOPHER_MAX_MEAN_LEN_Q4})
                   AND (CAST(len(list_intersect(toks, {_DUCK_STOP_LIST})) AS BIGINT)
                        >= {GOPHER_MIN_STOPWORDS}) AS gopher_pass
            FROM d
        ),
        f AS (SELECT *, count(*) OVER (PARTITION BY fp) AS fp_cnt FROM m),
        s AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN fp_cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS exact_dup_docs,
                   CAST(sum(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT)
                       AS gopher_pass_docs,
                   CAST(sum(quality_q4) AS BIGINT) AS q_sum
            FROM f GROUP BY source
        ),
        ltop AS (
            SELECT source, lang AS top_lang, CAST(n AS BIGINT) AS top_lang_docs
            FROM (SELECT source, lang, count(*) AS n,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY count(*) DESC, lang) AS rk
                  FROM d GROUP BY source, lang)
            WHERE rk = 1
        ),
        tot AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total_tokens
                FROM s)
        SELECT s.source,
               s.n_docs,
               s.n_tokens,
               CAST(CASE WHEN t.total_tokens > 0
                         THEN s.n_tokens * 1000000 // t.total_tokens
                         ELSE 0 END AS BIGINT) AS token_share_ppm,
               CAST(s.n_tokens // s.n_docs AS BIGINT) AS mean_doc_tokens,
               l.top_lang,
               l.top_lang_docs,
               s.exact_dup_docs,
               CAST(s.exact_dup_docs * 1000000 // s.n_docs AS BIGINT) AS dup_doc_ppm,
               s.gopher_pass_docs,
               CAST(s.gopher_pass_docs * 1000000 // s.n_docs AS BIGINT)
                   AS gopher_pass_ppm,
               CAST(s.q_sum // s.n_docs AS BIGINT) AS mean_quality_q4
        FROM s
        JOIN ltop l USING (source)
        CROSS JOIN tot t
    """,
    tags=("reporting", "datasheet", "quality", "training-data", "north-star"),
)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One datasheet row per source: size (docs, tokens, corpus token
    share), declared-language mode with a deterministic tie-break
    (count desc, lang asc; NULL langs fold to 'und' so neither engine's
    NULL-ordering default can flip the mode), exact-duplicate share
    (docs whose normalized-content fingerprint appears more than once
    corpus-wide — the ``exact_dedup_groups`` identity), Gopher rule
    pass share, and mean quality score.  Shares and means are exact
    integer quotients (ppm / q4), never rounded doubles.

    Plan shape: ONE row-local pass computes every per-doc signal
    (tokenize once, fingerprint, quality, Gopher booleans); the dup
    flag rides ONE window exchange on fp (the same key exact dedup
    shuffles on); the per-source aggregate is map-side combined to
    |sources| rows.  The language mode and the corpus token total are
    |sources|-sized side frames (broadcast back), and the total-token
    window is the deliberate single-partition exception on the
    |sources|-row frame.  Nothing here is quadratic; at 100 TB the
    card costs one corpus pass plus the dedup-sized fp exchange."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[\\s\\x0B]+", " "))
    n_punct = F.length(
        F.regexp_replace(F.col("text"), "[\\p{L}\\p{N}\\s\\x0B]", "")
    ).cast("double")
    base = pin(
        docs.select(
            "source",
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            "n_chars",
            F.md5(norm.cast("binary")).alias("fp"),
            tokens_col(F.col("text")).alias("toks"),
            n_punct.alias("n_punct"),
        )
    )
    n = F.size("toks")
    n_stop_qs = F.size(F.filter(F.col("toks"), lambda x: x.isin(*STOPWORDS)))
    quality_q4 = F.floor(
        (
            F.lit(0.4) * F.least(F.lit(1.0), F.col("n_chars") / 500.0)
            + F.lit(0.4)
            * F.when(n > 0, n_stop_qs.cast("double") / n).otherwise(F.lit(0.0))
            + F.lit(0.2)
            * (
                F.lit(1.0)
                - F.when(F.col("n_chars") > 0, F.col("n_punct") / F.col("n_chars"))
                .otherwise(F.lit(0.0))
            )
        )
        * 10000
    ).cast("long")
    mean_len_q4 = F.when(n == 0, F.lit(0).cast("long")).otherwise(
        F.floor(F.length(F.concat_ws("", F.col("toks"))).cast("double") / n * 10000)
    )
    n_stop_distinct = F.size(
        F.array_intersect(F.col("toks"), F.array(*[F.lit(w) for w in STOPWORDS]))
    )
    gopher_pass = (
        n.cast("long").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_len_q4.between(GOPHER_MIN_MEAN_LEN_Q4, GOPHER_MAX_MEAN_LEN_Q4)
        & (n_stop_distinct.cast("long") >= GOPHER_MIN_STOPWORDS)
    )
    m = base.select(
        "source",
        "lang",
        "fp",
        n.cast("long").alias("n_toks"),
        quality_q4.alias("quality_q4"),
        gopher_pass.alias("gopher_pass"),
    )
    f = m.withColumn("fp_cnt", F.count("*").over(W.partitionBy("fp")))
    s = f.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("fp_cnt") > 1, 1).otherwise(0))
        .cast("long")
        .alias("exact_dup_docs"),
        F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0))
        .cast("long")
        .alias("gopher_pass_docs"),
        F.sum("quality_q4").cast("long").alias("q_sum"),
    )
    ltop = (
        base.groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.desc("n"), "lang")
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("n").cast("long").alias("top_lang_docs"),
        )
    )
    tot = s.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("total_tokens")
    )
    return (
        s.join(F.broadcast(ltop), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.when(
                F.col("total_tokens") > 0,
                F.expr("n_tokens * 1000000 div total_tokens"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("token_share_ppm"),
            F.expr("n_tokens div n_docs").cast("long").alias("mean_doc_tokens"),
            "top_lang",
            "top_lang_docs",
            "exact_dup_docs",
            F.expr("exact_dup_docs * 1000000 div n_docs")
            .cast("long")
            .alias("dup_doc_ppm"),
            "gopher_pass_docs",
            F.expr("gopher_pass_docs * 1000000 div n_docs")
            .cast("long")
            .alias("gopher_pass_ppm"),
            F.expr("q_sum div n_docs").cast("long").alias("mean_quality_q4"),
        )
    )
