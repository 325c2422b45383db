"""The full LLM training-data curation pipeline as ONE lazy chain —
every stage is a library operator, and the whole composition is checked
against a single DuckDB oracle:

    quality gates (Gopher rules ∧ repetition)   row-local, no shuffle
      → eval-set decontamination               broadcast semi-join
      → exact dedup keep-first                 one argmin aggregate
      → domain mixture sampling                row-local hash filter
      → train/test split                       row-local hash bucket
      → per-(lang, split) audit counts         final aggregate

Stage order is the scale order: all row-local predicates run before
anything that shuffles; the only wide operations are the broadcast
anti-join (against an MB-scale eval fingerprint set) and the single
dedup aggregate.  A 100 TB corpus flows through exactly one shuffle of
surviving fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.operators.contamination import (
    BENCH_MOD,
    CONTAM_W,
    _DUCK_CONTAM_SHINGLES,
    _shingle_hashes,
)
from ssafynews_data_spark.operators.sampling import MIX_SALT, _mix_case_duck, hash_bucket
from ssafynews_data_spark.operators.text import (
    _DUCK_BIGRAM_REP,
    _DUCK_STOP_LIST,
    _DUCK_TOKENS,
    GOPHER_MAX_MEAN_LEN_Q4,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_LEN_Q4,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    STOPWORDS,
    bigram_repetition_q4,
    tokens_col,
)
from ssafynews_data_spark.plans.curate import MAX_BIGRAM_REP_Q4
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


def _gopher_pass(toks) -> F.Column:
    n = F.size(toks)
    total_chars = F.length(F.concat_ws("", toks)).cast("double")
    mean_q4 = F.when(n == 0, F.lit(0).cast("long")).otherwise(
        F.floor(total_chars / n * 10000)
    )
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS])))
    return (
        n.cast("long").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_q4.between(GOPHER_MIN_MEAN_LEN_Q4, GOPHER_MAX_MEAN_LEN_Q4)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
    )


@register(
    "llm_corpus_pipeline",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, lang, text, {_DUCK_TOKENS} AS toks FROM documents
        ),
        gated AS (
            SELECT doc_id, lang, text, toks FROM base
            WHERE doc_id % {BENCH_MOD} <> 0
              AND len(toks) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
              AND (CASE WHEN len(toks) = 0 THEN 0
                        ELSE CAST(floor(CAST(len(array_to_string(toks, '')) AS DOUBLE)
                                        / len(toks) * 10000) AS BIGINT) END)
                  BETWEEN {GOPHER_MIN_MEAN_LEN_Q4} AND {GOPHER_MAX_MEAN_LEN_Q4}
              AND len(list_intersect(toks, {_DUCK_STOP_LIST}))
                  >= {GOPHER_MIN_STOPWORDS}
              AND ({_DUCK_BIGRAM_REP}) < {MAX_BIGRAM_REP_Q4}
        ),
        bench AS (
            SELECT DISTINCT unnest({_DUCK_CONTAM_SHINGLES}) AS sh
            FROM base WHERE doc_id % {BENCH_MOD} = 0
        ),
        contaminated AS (
            SELECT DISTINCT g.doc_id
            FROM (SELECT doc_id, unnest({_DUCK_CONTAM_SHINGLES}) AS sh
                  FROM gated) g
            JOIN bench USING (sh)
        ),
        clean AS (
            SELECT g.doc_id, g.lang,
                   md5(trim(regexp_replace(lower(g.text), '[\\s\\x0B]+', ' ', 'g'),
                            ' ')) AS fp
            FROM gated g LEFT JOIN contaminated c USING (doc_id)
            WHERE c.doc_id IS NULL
        ),
        deduped AS (
            SELECT min(doc_id) AS doc_id, min_by(lang, doc_id) AS lang
            FROM clean GROUP BY fp
        ),
        mixed AS (
            SELECT doc_id, lang FROM deduped
            WHERE CAST(('0x' || substr(md5('{MIX_SALT}' || CAST(doc_id AS VARCHAR)), 1, 4))
                       AS BIGINT) % 100 < {_mix_case_duck()}
        ),
        split AS (
            SELECT doc_id, lang,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                             AS BIGINT) % 100 < 20
                        THEN 'test' ELSE 'train' END AS split
            FROM mixed
        )
        SELECT lang, split, count(*) AS n, min(doc_id) AS min_id,
               max(doc_id) AS max_id
        FROM split GROUP BY lang, split
    """,
    tags=("composite", "pipeline", "north-star"),
    bench=True,
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: per-(lang, split) counts of the corpus after
    every gate.  Eval docs (doc_id % 17 == 0) are excluded from training
    AND act as the decontamination reference set."""
    docs = load_table(spark, sf_dir, "documents")
    return curate_full(docs, keep=("doc_id", "lang")).groupBy("lang", "split").agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def curate_full(docs: DataFrame, keep: tuple[str, ...] | None = None) -> DataFrame:
    """documents → fully-curated training rows (doc_id, lang, text,
    split).  The row-level form consumed by jobs/curate_job.py --full;
    the registered query aggregates it for the oracle.

    ``keep`` (optional, must lead with ``doc_id``) projects the row to
    those columns BEFORE the dedup exchange (guide §2.3): the
    registered aggregate needs only (doc_id, lang), so ``text`` no
    longer rides the shuffle inside the argmin struct.  Result-
    identical — ``doc_id`` is unique and leads the struct comparison,
    so the keep-first winner per fingerprint cannot change."""
    base = docs.select("doc_id", "lang", "text", tokens_col(F.col("text")).alias("toks"))

    gated = base.filter(
        (F.col("doc_id") % BENCH_MOD != 0)
        & _gopher_pass(F.col("toks"))
        & (bigram_repetition_q4(F.col("text")) < MAX_BIGRAM_REP_Q4)
    )

    bench_sh = (
        _shingle_hashes(docs.filter(F.col("doc_id") % BENCH_MOD == 0), CONTAM_W)
        .select("h")
        .distinct()
    )
    gated_sh = _shingle_hashes(gated, CONTAM_W)
    contaminated = (
        gated_sh.join(F.broadcast(bench_sh), "h").select("doc_id").distinct()
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[\\s\\x0B]+", " "))
    payload = ("doc_id", "lang", "text") if keep is None else keep
    clean = (
        gated.join(contaminated, "doc_id", "left_anti")
        .select(*payload, F.md5(norm.cast("binary")).alias("fp"))
    )
    # keep-first dedup as one argmin aggregate (struct compares doc_id
    # first) — same single-shuffle shape as plans/curate.py; the
    # payload columns ride the shuffle inside the struct, one row per
    # distinct fingerprint after map-side partial min (with ``keep``
    # the aggregate consumer drops text from the exchange entirely).
    deduped = (
        clean.groupBy("fp")
        .agg(F.min(F.struct(*payload)).alias("_k"))
        .select("_k.*")
    )
    from ssafynews_data_spark.operators.sampling import MIX_DEFAULT, MIX_WEIGHTS

    b = hash_bucket(F.concat(F.lit(MIX_SALT), F.col("doc_id").cast("string")))
    rate = F.lit(MIX_DEFAULT)
    for k, v in MIX_WEIGHTS.items():
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    mixed = deduped.filter(b < rate)

    split_b = hash_bucket(F.col("doc_id"))
    return mixed.withColumn(
        "split", F.when(split_b < 20, "test").otherwise("train")
    )
