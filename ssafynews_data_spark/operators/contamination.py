"""Corpus-hygiene operators: eval-set decontamination and incremental
(batch-vs-history) dedup.

Neither exists in the reference — its dedup stops at the exact link key
(collect/producer.py:7-15, collect/consumer.py:81) — but both are table
stakes for an LLM training-data pipeline at 100 TB:

- **decontamination**: documents that share long n-grams with an
  evaluation/benchmark set leak test answers into training data; the
  standard mitigation (GPT-3 appendix C / PaLM-style) drops or flags any
  training doc with a k-gram overlap against the eval suite.
- **incremental dedup**: a pipeline ingests batches continuously; each
  new batch must dedup against the *entire* historical corpus without
  re-shuffling history.

Both are expressed as joins against a side that is tiny relative to the
corpus (eval suites are MBs; a batch is ≪ history), so the 100 TB plan
is "stream the big side once, broadcast/bloom the small side".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.operators.text import tokens_col, _DUCK_TOKENS
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

#: k-gram width for contamination checks.  Real pipelines use 8-13 word
#: grams; 4 keeps hit rates testable on the synthetic corpus.
CONTAM_W = 4
#: documents with doc_id % BENCH_MOD == 0 stand in for the eval set.
BENCH_MOD = 17
#: documents with doc_id % BATCH_MOD == 0 stand in for the "new batch";
#: the rest are the historical corpus.
BATCH_MOD = 10


def _shingle_hashes(docs: DataFrame, w: int, keep: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *keep, h long): xxhash64 per distinct w-token shingle,
    hashed straight off the token-array slice (no intermediate shingle
    strings — same trick as dedup._doc_shingle_hashes).  The token array
    is pinned so CollapseProject can't re-inline the tokenizer regex
    into the per-shingle lambda (the O(len²) trap, dedup.py:49).
    ``keep`` carries extra narrow columns (e.g. ``source``) through the
    explode so callers never need a post-hoc join back to the corpus."""
    toks = pin(docs.select("doc_id", *keep, tokens_col(F.col("text")).alias("toks")))
    n = F.size(F.col("toks"))
    seq = F.sequence(F.lit(1), n - (w - 1))
    hashes = F.transform(seq, lambda i: F.xxhash64(F.slice(F.col("toks"), i, w)))
    guarded = F.when(n >= w, F.array_distinct(hashes)).otherwise(
        F.array().cast("array<bigint>")
    )
    return toks.select("doc_id", *keep, F.explode(guarded).alias("h"))


#: DuckDB mirror: distinct CONTAM_W-token string shingles.  The engine
#: joins on xxhash64(token-slice) while the oracle joins on the shingle
#: string — equivalent because tokens contain no spaces (the tokenizer
#: splits on non-alphanumerics), so concat-by-space is injective and a
#: 64-bit collision across a test corpus is ~1e-10.
_DUCK_CONTAM_SHINGLES = f"""
    list_distinct(
        CASE WHEN len(toks) >= {CONTAM_W}
             THEN list_transform(
                      range(1, len(toks) - {CONTAM_W - 2}),
                      i -> array_to_string(toks[i:i + {CONTAM_W - 1}], ' '))
             ELSE [] END)
"""


@register(
    "decontaminate_docs",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest({_DUCK_CONTAM_SHINGLES}) AS sh
            FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents)
        ),
        bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {BENCH_MOD} = 0),
        corpus AS (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
        sizes AS (SELECT doc_id, count(*) AS n FROM corpus GROUP BY 1),
        hits AS (
            SELECT c.doc_id, count(*) AS n_hit_ngrams
            FROM corpus c JOIN bench b USING (sh)
            GROUP BY 1
        )
        SELECT h.doc_id, h.n_hit_ngrams,
               CAST(floor(h.n_hit_ngrams / s.n * 10000) AS BIGINT)
                   AS contam_ratio_q4
        FROM hits h JOIN sizes s USING (doc_id)
    """,
    tags=("curation", "decontamination"),
    bench=True,
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing ≥1 distinct CONTAM_W-gram with the
    eval set (docs where doc_id % 17 == 0), with the overlap count and
    the contaminated fraction of each doc's distinct shingles.

    100 TB shape: the eval side reduces to a distinct-shingle-hash set
    (MB-scale even for large suites) and is **broadcast**, so the
    corpus is scanned exactly once with no shuffle until the per-doc
    count — which is a map-side-combining hash aggregate on doc_id.
    The quantized ratio uses floor() per the cross-engine rule
    (registry.py module docs)."""
    docs = load_table(spark, sf_dir, "documents")
    # pin: the shingle frame feeds three consumers (bench distinct,
    # per-doc sizes, hit counts) — one tokenize+shingle pass instead of
    # three (the token array inside _shingle_hashes is pinned for the
    # CollapseProject trap, but the explode itself re-ran per consumer).
    sh = pin(_shingle_hashes(docs, CONTAM_W))
    bench = (
        sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("h").distinct()
    )
    corpus = sh.filter(F.col("doc_id") % BENCH_MOD != 0)
    sizes = corpus.groupBy("doc_id").agg(F.count("*").alias("n"))
    hits = (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    ratio = F.col("n_hit_ngrams") / F.col("n")
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_hit_ngrams",
        F.floor(ratio * 10000).alias("contam_ratio_q4"),
    )


@register(
    "dedup_incremental_batch",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '[\\s\\x0B]+', ' ', 'g'),
                            ' ')) AS fp
            FROM documents
        ),
        hist AS (SELECT DISTINCT fp FROM fp WHERE doc_id % {BATCH_MOD} <> 0),
        batch AS (SELECT * FROM fp WHERE doc_id % {BATCH_MOD} = 0),
        fresh AS (
            SELECT b.* FROM batch b LEFT JOIN hist h USING (fp)
            WHERE h.fp IS NULL
        )
        SELECT fp, min(doc_id) AS keeper_id, count(*) AS batch_dups
        FROM fresh GROUP BY 1
    """,
    tags=("dedup", "incremental"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a new ingest batch (doc_id % 10 == 0) against the full
    historical corpus: drop batch docs whose content fingerprint already
    exists in history, then keep-first within the batch itself.

    100 TB shape: history contributes only its fingerprint column — a
    compact table maintained incrementally by the ingest job, never the
    full corpus — and the anti-join shuffles fingerprints, not text.
    When the batch ≪ history (the steady state), enable Spark's runtime
    bloom-filter join (spark.sql.optimizer.runtime.bloomFilter.enabled)
    or broadcast the batch fingerprints so the history scan prunes at
    the row-group level instead of shuffling history at all."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[\\s\\x0B]+", " "))
    fp = docs.select(F.md5(norm.cast("binary")).alias("fp"), "doc_id")
    hist = fp.filter(F.col("doc_id") % BATCH_MOD != 0).select("fp").distinct()
    batch = fp.filter(F.col("doc_id") % BATCH_MOD == 0)
    fresh = batch.join(hist, "fp", "left_anti")
    return fresh.groupBy("fp").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("batch_dups")
    )


#: span width for cross-document repeated-substring detection.
SPAN_W = 4


@register(
    "repeated_span_groups",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(toks) >= {SPAN_W}
                     THEN list_transform(
                              range(1, len(toks) - {SPAN_W - 2}),
                              i -> array_to_string(toks[i:i + {SPAN_W - 1}], ' '))
                     ELSE [] END)) AS sh
            FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents)
        ),
        shared AS (
            SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        hits AS (
            SELECT s.doc_id, count(*) AS n_shared_spans
            FROM sh s JOIN shared USING (sh)
            GROUP BY 1
        )
        SELECT h.doc_id, h.n_shared_spans,
               CAST(floor(h.n_shared_spans / z.n * 10000) AS BIGINT)
                   AS shared_frac_q4
        FROM hits h JOIN sizes z USING (doc_id)
    """,
    tags=("dedup", "substring", "curation"),
)
def repeated_span_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detection — the shuffle-friendly
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    SPAN_W-token span occurring in >=2 distinct documents marks
    boilerplate/templated text; each doc reports how many of its
    distinct spans are shared and the shared fraction.

    100 TB shape: two hash aggregates on span hashes (per-span doc
    count, then per-doc hit count) and a self-equi-join on the span
    hash — shuffle-linear in total spans, never all-pairs.  The true
    suffix-array form finds arbitrary-length repeats; fixed-width spans
    trade that for distributability (the standard production tradeoff).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = pin(_shingle_hashes(docs, SPAN_W))
    shared = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    hits = sh.join(shared, "h").groupBy("doc_id").agg(
        F.count("*").alias("n_shared_spans")
    )
    frac = F.col("n_shared_spans") / F.col("n")
    return hits.join(sizes, "doc_id").select(
        "doc_id", "n_shared_spans", F.floor(frac * 10000).alias("shared_frac_q4")
    )


#: cosine threshold for semantic (embedding-space) contamination — a
#: corpus vector this close to any benchmark vector is a paraphrase-level
#: leak that n-gram overlap misses.
SEM_CONTAM_COS = 0.35


@register(
    "semantic_decontaminate",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        bench AS (SELECT * FROM e WHERE vec_id % {BENCH_MOD} = 0),
        corpus AS (SELECT * FROM e WHERE vec_id % {BENCH_MOD} <> 0),
        sims AS (
            SELECT c.vec_id, max(list_cosine_similarity(c.emb, b.emb)) AS mx
            FROM corpus c CROSS JOIN bench b GROUP BY 1
        )
        SELECT vec_id, round(mx, 4) AS max_bench_sim,
               mx >= {SEM_CONTAM_COS} AS contaminated
        FROM sims
    """,
    tags=("curation", "decontamination", "semantic"),
)
def semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose max
    cosine against the benchmark set (vec_id % 17 == 0, same membership
    rule as ``decontaminate_docs``) reaches SEM_CONTAM_COS — the
    semantic complement of n-gram decontamination (catches paraphrased /
    translated eval leakage that exact k-gram overlap misses; cf. the
    contamination analyses around GPT-4-era benchmarks).

    100 TB shape: identical to ``decontaminate_docs`` — the bench side
    is tiny and **broadcast**, the corpus streams once, and the per-doc
    max is a map-side-combining aggregate on vec_id.  No shuffle of the
    corpus at all."""
    from ssafynews_data_spark.operators.similarity import as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    bench = emb.filter(F.col("vec_id") % BENCH_MOD == 0).select(
        F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb")
    )
    corpus = emb.filter(F.col("vec_id") % BENCH_MOD != 0)
    mx = (
        corpus.join(F.broadcast(bench))
        .groupBy("vec_id")
        .agg(F.max(cosine(F.col("emb"), F.col("b_emb"))).alias("mx"))
    )
    return mx.select(
        "vec_id",
        F.round("mx", 4).alias("max_bench_sim"),
        (F.col("mx") >= SEM_CONTAM_COS).alias("contaminated"),
    )


@register(
    "multisignal_curation",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, lang, source, n_chars, text,
                   length(regexp_replace(text, '[^가-힣]', '', 'g')) AS nh,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS nl,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd
            FROM documents
        ),
        latin AS (
            SELECT * FROM s
            WHERE NOT (nh >= nl AND nh >= nd AND nh > 0)
              AND nl >= nd AND nl > 0
        ),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        bench AS (SELECT * FROM e WHERE vec_id % {BENCH_MOD} = 0),
        contaminated AS (
            SELECT DISTINCT c.vec_id
            FROM e c JOIN bench b ON c.vec_id % {BENCH_MOD} <> 0
            WHERE list_cosine_similarity(c.emb, b.emb) >= 0.35
        ),
        clean AS (
            SELECT l.* FROM latin l
            ANTI JOIN contaminated t ON l.doc_id = t.vec_id
        ),
        keepers AS (
            SELECT min(doc_id) AS doc_id
            FROM clean
            GROUP BY md5(trim(regexp_replace(lower(text), '[\\s\\x0B]+', ' ', 'g'), ' '))
        )
        SELECT c.lang, c.source,
               count(*) AS n_kept,
               CAST(sum(c.n_chars) AS BIGINT) AS chars_kept
        FROM clean c JOIN keepers USING (doc_id)
        GROUP BY 1, 2
    """,
    tags=("curation", "composite", "multisignal"),
)
def multisignal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 signals composed into ONE curation chain under a
    whole-chain oracle: script routing (keep Latin-dominant documents —
    the ``script_mix_stats`` rule) → semantic decontamination
    (broadcast-anti-join the embedding-space bench leaks) → exact
    content dedup keep-first → per-(lang, source) audit.

    Physical shape: the script gate is row-local regexp arithmetic (no
    shuffle); the contamination side reduces to a broadcast id set; the
    dedup is one hash aggregate + semi join — the whole chain shuffles
    the surviving corpus exactly twice (dedup fp, final audit), never
    the raw corpus."""
    from ssafynews_data_spark.operators.similarity import as_double, cosine

    docs = load_table(spark, sf_dir, "documents")
    nh = F.length(F.regexp_replace(F.col("text"), "[^가-힣]", ""))
    nl = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    nd = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    latin = docs.filter(
        ~((nh >= nl) & (nh >= nd) & (nh > 0)) & (nl >= nd) & (nl > 0)
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    bench = emb.filter(F.col("vec_id") % BENCH_MOD == 0).select(
        F.col("emb").alias("b_emb")
    )
    contaminated = (
        emb.filter(F.col("vec_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench))
        .filter(cosine(F.col("emb"), F.col("b_emb")) >= 0.35)
        .select(F.col("vec_id").alias("doc_id"))
        .distinct()
    )
    clean = latin.join(F.broadcast(contaminated), "doc_id", "left_anti")

    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[\\s\\x0B]+", " "))
    keepers = (
        clean.select(F.md5(norm.cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = clean.join(keepers, "doc_id", "left_semi")
    return kept.groupBy("lang", "source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
    )


@register(
    "eval_overlap_matrix",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, source, unnest({_DUCK_CONTAM_SHINGLES}) AS sh
            FROM (SELECT doc_id, source, {_DUCK_TOKENS} AS toks
                  FROM documents)
        ),
        tr AS (SELECT DISTINCT source AS train_source, sh
               FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
        ev AS (SELECT DISTINCT source AS eval_source, sh
               FROM sh WHERE doc_id % {BENCH_MOD} = 0),
        evn AS (SELECT eval_source, CAST(count(*) AS BIGINT) AS n_eval_ngrams
                FROM ev GROUP BY 1),
        trs AS (SELECT DISTINCT source AS train_source FROM documents
                WHERE doc_id % {BENCH_MOD} <> 0),
        hit AS (
            SELECT train_source, eval_source,
                   CAST(count(*) AS BIGINT) AS n_shared_ngrams
            FROM tr JOIN ev USING (sh)
            GROUP BY 1, 2
        )
        SELECT t.train_source, e.eval_source,
               CAST(coalesce(h.n_shared_ngrams, 0) AS BIGINT)
                   AS n_shared_ngrams,
               e.n_eval_ngrams,
               CAST(coalesce(h.n_shared_ngrams, 0) * 10000 // e.n_eval_ngrams
                    AS BIGINT) AS containment_q4
        FROM trs t CROSS JOIN evn e
        LEFT JOIN hit h ON h.train_source = t.train_source
                       AND h.eval_source = e.eval_source
    """,
    tags=("curation", "decontamination", "report", "north-star"),
    bench2=True,
)
def eval_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GPT-3/Dolma contamination REPORT as a dense matrix rather
    than a filter: for every (train source × eval source) cell, how many
    of the eval side's distinct CONTAM_W-gram shingles also appear in
    that training source, and the quantized containment fraction.  This
    is the table a release note publishes ("eval suite X is N% covered
    by crawl source Y") — ``decontaminate_docs`` is the per-document
    filter twin; here the unit is the SOURCE pair, zero cells included
    (a verified zero is the point of the report).

    Eval docs are the standing ``doc_id % BENCH_MOD == 0`` stand-in;
    the engine matches on xxhash64(token-slice) shingles while the
    oracle matches string shingles — the injective-concat equivalence
    documented at _DUCK_CONTAM_SHINGLES.

    100 TB shape: the train side reduces ONCE to distinct (source,
    shingle-hash) — a map-side-combining aggregate consumed by exactly
    one downstream join (the matrix axis comes from a separate
    narrow-column pass over ``documents``, so the corpus-scale distinct
    is never recomputed) — and the eval side to a distinct set that is
    MB-scale by construction (eval suites are small), **pinned** for
    its two readers and **broadcast** into the hit join, so the corpus
    never shuffles on the join key; the matrix aggregate then moves
    |sources|² rows.  The zero cells come from a |sources|×|sources|
    crossJoin of two group-count-sized frames — driver-trivial at any
    corpus size.  A train source whose docs are all shorter than
    CONTAM_W tokens still gets its row of verified zeros (the axis is
    "has training docs", not "has shingles").  The EVAL axis is the
    asymmetric one BY CONSTRUCTION: it derives from the shingle set
    (``evn``), so an eval source whose docs are all shorter than
    CONTAM_W tokens contributes NO matrix column — deliberately, since
    its ``n_eval_ngrams`` would be 0 and every containment cell 0/0
    (both engines agree; a report column of undefined fractions is
    noise, the verified-zero guarantee is for the train axis only)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_hashes(docs, CONTAM_W, keep=("source",))
    tr = (
        sh.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select(F.col("source").alias("train_source"), "h")
        .distinct()
    )
    ev = pin(
        sh.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.col("source").alias("eval_source"), "h")
        .distinct()
    )
    evn = ev.groupBy("eval_source").agg(F.count("*").alias("n_eval_ngrams"))
    trs = (
        docs.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select(F.col("source").alias("train_source"))
        .distinct()
    )
    hit = (
        tr.join(F.broadcast(ev), "h")
        .groupBy("train_source", "eval_source")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )
    shared = F.coalesce(F.col("n_shared_ngrams"), F.lit(0).cast("long"))
    return (
        trs.crossJoin(F.broadcast(evn))
        # broadcast: hit is at most |sources|² rows but its post-agg
        # size estimate kept the planner on a sort-merge join (2 extra
        # sorts + an exchange in the before-plan) — hint it (guide §3.1)
        .join(F.broadcast(hit), ["train_source", "eval_source"], "left")
        .select(
            "train_source",
            "eval_source",
            shared.alias("n_shared_ngrams"),
            "n_eval_ngrams",
            F.expr(
                "coalesce(n_shared_ngrams, 0) * 10000 div n_eval_ngrams"
            ).alias("containment_q4"),
        )
    )
