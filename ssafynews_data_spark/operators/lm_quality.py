"""Statistical language-model quality scoring (CCNet-family).

The reference scores articles with an external LLM per row
(``collect/consumer.py:120-135`` category classification,
``ollama_consumer.py:190-210`` embeddings).  At 100 TB you cannot call a
model per row for *quality filtering* — the standard corpus-curation
answer (CCNet, Wenzek et al. 2020; Gopher, Rae et al. 2021) is a cheap
n-gram LM trained on the corpus itself: documents whose tokens are
improbable under the corpus distribution are boilerplate, spam, or
gibberish.  This module implements that family as pure DataFrame
aggregations — the "model" is a counts table, training IS a groupBy:

- ``bigram_lm_perplexity`` — add-one-smoothed bigram negative
  log-likelihood per document (the CCNet quality signal).
- ``unigram_kl_source_divergence`` — KL(source ‖ corpus) over unigram
  distributions: which sources are distributionally far from the
  corpus (domain-shift / contamination detector).
- ``zipf_fit_stats`` — per-source least-squares slope of
  ln(freq) ~ ln(rank): natural text tracks Zipf (slope ≈ -1);
  machine-generated or templated text flattens or steepens.
- ``k_anonymity_profile`` — privacy-side curation: equivalence-class
  sizes over a quasi-identifier tuple, % of rows re-identifiable at
  k<10 (Sweeney 2002), as plain aggregates.

Scale notes (100 TB):

- "Training" the LM is one explode + two hash aggregates with map-side
  partials; the bigram table is the only large intermediate and it
  joins back to the exploded pairs BY KEY (shuffle-partitioned both
  sides) — never broadcast, since a 100 TB corpus has billions of
  distinct bigrams.  The unigram table is vocab-sized; word-level
  vocabularies are tens of MB and broadcast (as here), but a
  byte/char-n-gram vocab at web scale can outgrow that — drop the
  hint and the same plan degrades gracefully to a keyed join.
- Per-doc scoring reuses the same exploded pairs frame — one scan of
  ``documents`` total (pinned), no per-row Python.
- The KL/Zipf aggregates are per-source rollups of the unigram counts
  frame: tiny shuffles keyed by (source, token) then source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.functions.strings import tokenize_words
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

#: mirror of text.py's _DUCK_TOKENS (shared parity tokenizer).
_DUCK_TOKENS = (
    "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> x <> '')"
)


@register(
    "bigram_lm_perplexity",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
        ), pairs AS (
            SELECT doc_id,
                   unnest(t[1:len(t) - 1]) AS w1,
                   unnest(t[2:len(t)])     AS w2
            FROM toks WHERE len(t) >= 2
        ), uni AS (
            SELECT w, CAST(count(*) AS DOUBLE) AS c1
            FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
        ), voc AS (
            SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vocab
            FROM (SELECT unnest(t) AS w FROM toks)
        ), bi AS (
            SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12
            FROM pairs GROUP BY w1, w2
        )
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(avg(-ln((c12 + 1) / (c1 + vocab))), 3) AS avg_nll
        FROM pairs
        JOIN bi  USING (w1, w2)
        JOIN uni ON pairs.w1 = uni.w, voc
        GROUP BY doc_id
    """,
    tags=("lm", "quality", "ccnet"),
    bench=True,
)
def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-LM quality score: train an add-one-smoothed
    bigram LM on the corpus (two groupBys), then score every document's
    average negative log-likelihood under it.  High ``avg_nll`` = the
    document's word transitions are rare in this corpus → gibberish or
    off-domain; low = templated/repetitive.  p(w2|w1) =
    (c(w1,w2)+1)/(c(w1)+V).  One scan of documents feeds tokens, pairs,
    both count tables, and the scoring join (pinned); the pairs⋈bigram
    join shuffles by (w1,w2) on both sides — the bigram "model" is
    never driver-materialized or broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = pin(
        docs.select("doc_id", tokenize_words(F.col("text")).alias("t"))
    )
    pairs = pin(
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            ).alias("bz"),
        )
        .select("doc_id", F.explode("bz").alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    unigrams = toks.select(F.explode("t").alias("w"))
    uni = unigrams.groupBy("w").agg(F.count("*").cast("double").alias("c1"))
    voc = unigrams.agg(F.countDistinct("w").cast("double").alias("vocab"))
    # c12 as a COUNT WINDOW over (w1, w2) instead of groupBy + self-join:
    # the join form shuffled the pairs table by (w1, w2) twice (once to
    # build the bigram counts, once to join them back); the window form
    # pays ONE exchange + an in-partition sort (guide §2.4 — two
    # operations keyed the same way share one exchange).  Counts are
    # integers either way, so avg_nll is bit-identical (verified by
    # exact frame equality at sf0.1).  Hot-bigram skew is unchanged:
    # the join form shuffled every pair row of a hot key to one reducer
    # too.
    wb = W.partitionBy("w1", "w2")
    scored = (
        pairs.withColumn("c12", F.count("*").over(wb).cast("double"))
        .join(F.broadcast(uni), pairs["w1"] == uni["w"])
        .crossJoin(F.broadcast(voc))
    )
    nll = -F.log((F.col("c12") + 1) / (F.col("c1") + F.col("vocab")))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(nll), 3).alias("avg_nll"),
    )


@register(
    "unigram_kl_source_divergence",
    oracle=f"""
        WITH t AS (
            SELECT source, unnest({_DUCK_TOKENS}) AS w FROM documents
        ), per_src AS (
            SELECT source, w, CAST(count(*) AS DOUBLE) AS c_sw
            FROM t GROUP BY source, w
        ), src_tot AS (
            SELECT source, sum(c_sw) AS n_s FROM per_src GROUP BY source
        ), corpus AS (
            SELECT w, sum(c_sw) AS c_w FROM per_src GROUP BY w
        ), tot AS (
            SELECT sum(c_w) AS n FROM corpus
        )
        SELECT source,
               CAST(n_s AS BIGINT) AS n_tokens,
               round(sum((c_sw / n_s) * ln((c_sw / n_s) / (c_w / n))), 4)
                   AS kl_vs_corpus
        FROM per_src
        JOIN src_tot USING (source)
        JOIN corpus  USING (w), tot
        GROUP BY source, n_s
        ORDER BY source
    """,
    tags=("lm", "quality", "domain-shift"),
)
def unigram_kl_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over unigram distributions — the standard
    domain-shift score for deciding which sources need re-weighting
    (cf. DSIR's log-ratio features, sampling.py).  The per-(source,
    token) counts frame is computed ONCE and reused for source totals,
    corpus totals, and the final join — the corpus marginal is derived
    by re-aggregating the per-source counts, not by re-scanning
    documents.  Only tokens with c_sw > 0 contribute (0·ln0 = 0), and
    the corpus marginal dominates every source, so the log is always
    finite."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = pin(
        docs.select("source", F.explode(tokenize_words(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("double").alias("c_sw"))
    )
    src_tot = per_src.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    corpus = per_src.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    tot = corpus.agg(F.sum("c_w").alias("n"))
    p = F.col("c_sw") / F.col("n_s")
    q = F.col("c_w") / F.col("n")
    return (
        per_src.join(F.broadcast(src_tot), "source")
        .join(corpus, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s")
        .agg(F.round(F.sum(p * F.log(p / q)), 4).alias("kl_vs_corpus"))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            "kl_vs_corpus",
        )
        .orderBy("source")
    )


@register(
    "zipf_fit_stats",
    oracle=f"""
        WITH t AS (
            SELECT source, unnest({_DUCK_TOKENS}) AS w FROM documents
        ), freq AS (
            SELECT source, w, count(*) AS f FROM t GROUP BY source, w
        ), ranked AS (
            SELECT source, f,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY f DESC, w) AS r
            FROM freq
        )
        SELECT source,
               count(*) AS n_types,
               round(regr_slope(ln(CAST(f AS DOUBLE)),
                                ln(CAST(r AS DOUBLE))), 4) AS zipf_slope,
               round(regr_r2(ln(CAST(f AS DOUBLE)),
                             ln(CAST(r AS DOUBLE))), 4) AS zipf_r2
        FROM ranked
        GROUP BY source
        ORDER BY source
    """,
    tags=("lm", "quality", "zipf"),
)
def zipf_fit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per source: least-squares slope (and R²) of
    ln(freq) against ln(rank).  Natural language sits near slope -1
    with high R²; templated or synthetic text deviates — a corpus-level
    generation-artifact detector that costs two aggregates and one
    window.  The rank window partitions by source (re-using the
    groupBy's clustering) with a token tie-break so both engines rank
    identically; the regression is Spark's built-in ``regr_slope`` /
    ``regr_r2`` — no driver math."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("source", F.explode(tokenize_words(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("f"))
    )
    ranked = freq.withColumn(
        "r",
        F.row_number().over(W.partitionBy("source").orderBy(F.desc("f"), "w")),
    )
    lf = F.log(F.col("f").cast("double"))
    lr = F.log(F.col("r").cast("double"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_types"),
            F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
            F.round(F.regr_r2(lf, lr), 4).alias("zipf_r2"),
        )
        .orderBy("source")
    )


@register(
    "k_anonymity_profile",
    oracle="""
        WITH classes AS (
            SELECT event_type,
                   strftime(ts, '%Y-%m-%d') AS d,
                   CAST(floor(value / 10) AS BIGINT) AS value_band,
                   count(*) AS class_size
            FROM events
            GROUP BY 1, 2, 3
        )
        SELECT event_type,
               count(*) AS n_classes,
               CAST(min(class_size) AS BIGINT) AS min_class_size,
               CAST(sum(class_size) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
                    AS BIGINT) AS rows_below_k10,
               floor(CAST(sum(CASE WHEN class_size < 10 THEN class_size
                                   ELSE 0 END) * 10000 AS DOUBLE)
                     / sum(class_size) + 0.5) / 100 AS pct_below_k10
        FROM classes
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("privacy", "k-anonymity"),
)
def k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (event_type, day,
    coarse value band): the size of each equivalence class, and what
    fraction of rows sit in classes smaller than k=10 — i.e. rows a
    release at this granularity would expose (Sweeney 2002).  Two
    cascaded hash aggregates; the class frame is bounded by the QI
    cardinality (types × days × bands), so the second shuffle is tiny
    at any corpus size.  Composes with redact_pii (text.py) as the
    structured-side privacy gate."""
    ev = load_table(spark, sf_dir, "events")
    classes = ev.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.floor(F.col("value") / 10).cast("long").alias("value_band"),
    ).agg(F.count("*").alias("class_size"))
    small = F.when(F.col("class_size") < 10, F.col("class_size")).otherwise(F.lit(0))
    return (
        classes.groupBy("event_type")
        .agg(
            F.count("*").alias("n_classes"),
            F.min("class_size").cast("long").alias("min_class_size"),
            F.sum("class_size").cast("long").alias("n_rows"),
            F.sum(small).cast("long").alias("rows_below_k10"),
            # avg_half_up construction, not round(): percentage of two
            # integer sums is an integer quotient — it lands on the
            # .xx5 lattice with real probability and round() tie-breaks
            # per engine (the fertility-stats class, virgin seed 577215)
            (
                F.floor(
                    (F.sum(small) * 10000).cast("double") / F.sum("class_size")
                    + F.lit(0.5)
                ).cast("long")
                / F.lit(100.0)
            ).alias("pct_below_k10"),
        )
        .orderBy("event_type")
    )
