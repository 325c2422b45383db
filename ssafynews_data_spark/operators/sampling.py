"""Sampling + time-rollup operators (training-data pipeline extensions).

A 100 TB corpus pipeline needs reproducible subsetting: deterministic
train/test splits (content-hash based, stable across runs and engines),
stratified samples (per-class fractions), and multi-granularity time
rollups (the hypertable continuous-aggregate analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.localframe import local_df
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


def hash_bucket(c, buckets: int = 100):
    """Deterministic [0, buckets) bucket from the md5 of a column's
    string form — engine-independent (unlike ``hash()``/``xxhash64``,
    md5 is standardized), so splits survive engine migrations."""
    return F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 4), 16, 10).cast(
        "long"
    ) % buckets


def train_test_split(df: DataFrame, id_col: str, test_pct: int = 20) -> DataFrame:
    """Adds a ``split`` column: 'test' for test_pct% of rows keyed on the
    content-stable hash bucket, 'train' otherwise.  Never ``rand()`` for
    splits — random splits aren't reproducible across retries/partitions
    and leak when datasets are re-joined later."""
    b = hash_bucket(F.col(id_col))
    return df.withColumn("split", F.when(b < test_pct, "test").otherwise("train"))


@register(
    "train_test_split_docs",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                       % 100 AS b
            FROM documents
        )
        SELECT CASE WHEN b < 20 THEN 'test' ELSE 'train' END AS split,
               count(*) AS n,
               min(doc_id) AS min_id,
               max(doc_id) AS max_id
        FROM t GROUP BY 1
    """,
    tags=("sampling", "split"),
)
def train_test_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 split keyed on md5(doc_id) — the oracle recomputes the same
    buckets in DuckDB, proving the split is engine-independent."""
    docs = load_table(spark, sf_dir, "documents")
    split = train_test_split(docs, "doc_id")
    return split.groupBy("split").agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register("stratified_sample_langs", tags=("sampling", "stratified"))
def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: 50% of 'en' docs, 10% of everything else
    (``sampleBy`` — per-stratum Bernoulli, seeded).  Rows-only check
    (Spark's sampler is engine-specific); determinism + fraction bounds
    asserted in tests."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 0.1, "fr": 0.1, "es": 0.1, "zh": 0.1}
    sample = docs.sampleBy("lang", fractions, seed=42)
    return sample.groupBy("lang").agg(F.count("*").alias("n"))


#: per-language keep rates (percent) for the domain-mixing sampler —
#: the DoReMi/data-mixture analog: up/down-weight domains toward a
#: target token budget.  CASE-expressible so the oracle can mirror it.
MIX_WEIGHTS: dict[str, int] = {"en": 80, "de": 40, "fr": 40, "es": 40, "zh": 20}
MIX_DEFAULT = 40
#: salt decorrelating the mixing decision from the train/test split
#: (both hash doc_id; identical buckets would couple the two samples).
MIX_SALT = "mix"


def _mix_case_duck() -> str:
    arms = " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_WEIGHTS.items())
    return f"CASE lang {arms} ELSE {MIX_DEFAULT} END"


@register(
    "domain_mix_sample",
    oracle=f"""
        WITH t AS (
            SELECT lang, doc_id, n_chars,
                   CAST(('0x' || substr(md5('{MIX_SALT}' || CAST(doc_id AS VARCHAR)), 1, 4))
                        AS BIGINT) % 100 AS b
            FROM documents
        )
        SELECT lang,
               count(*) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS chars_kept,
               min(doc_id) AS min_id,
               max(doc_id) AS max_id
        FROM t
        WHERE b < {_mix_case_duck()}
        GROUP BY 1
    """,
    tags=("sampling", "mixing"),
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: keep each doc iff its
    salted md5 bucket falls under the per-language target rate
    (en 80% / de,fr,es 40% / zh 20%) — the reweighting step of a data-
    mixture pipeline (DoReMi-style), engine-independent so a resumed or
    migrated job reproduces the exact same subset.

    100 TB shape: a row-local filter — no shuffle at all until the
    per-language audit aggregate; composes with any downstream op
    without a repartition."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.concat(F.lit(MIX_SALT), F.col("doc_id").cast("string")))
    rate = F.lit(MIX_DEFAULT)
    for k, v in MIX_WEIGHTS.items():
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    kept = docs.filter(b < rate)
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


#: salt for temperature resampling — distinct from MIX_SALT so the two
#: samplers draw independent buckets.
TEMP_SALT = "temp"


@register(
    "temperature_resample",
    oracle=f"""
        WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        w AS (SELECT source, n_docs,
                     CAST(floor(sqrt(n_docs) * 1000) AS BIGINT) AS w
              FROM c),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                     CAST(sum(w) AS BIGINT) AS wsum FROM w),
        th AS (SELECT source, n_docs,
                      least(10000,
                            ((total // 2) * 10000 // wsum) * w // n_docs)
                          AS threshold_bp
               FROM w, t),
        k AS (
            SELECT d.source, count(*) AS n_kept
            FROM documents d JOIN th USING (source)
            WHERE CAST(('0x' || substr(md5('{TEMP_SALT}' || CAST(doc_id AS VARCHAR)), 1, 4))
                       AS BIGINT) % 10000 < threshold_bp
            GROUP BY 1
        )
        SELECT th.source, th.n_docs, th.threshold_bp,
               coalesce(k.n_kept, 0) AS n_kept
        FROM th LEFT JOIN k USING (source)
    """,
    tags=("sampling", "mixing", "temperature"),
)
def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain rebalancing (α = 0.5): sample each
    source toward a quota ∝ sqrt(n_docs), total budget = half the
    corpus — the standard multiplicity-flattening used for multilingual
    / multi-domain training mixes (upweights rare domains, downweights
    oversampled ones).

    Every quantity is integer (weights floor(sqrt·1000), thresholds in
    basis points, one fixed division order) so Spark and DuckDB agree
    bit-for-bit — a floating Σ n^α would differ in summation order.
    The keep decision is a salted md5 bucket per doc: row-local,
    shuffle-free, reproducible across engines/retries/resumes.  At
    extreme corpus sizes the intermediate ``(total/2)*10000`` stays
    ≪ 2^63 up to ~10^14 docs; beyond that, widen to DECIMAL on both
    sides.

    100 TB shape: one tiny per-source aggregate (broadcast back), then
    a row-local filter — the corpus shuffles zero times."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("w", F.floor(F.sqrt("n_docs") * 1000).cast("long"))
    )
    totals = counts.agg(
        F.sum("n_docs").alias("total"), F.sum("w").alias("wsum")
    )
    # pin: th feeds the keep-filter broadcast AND the final report join
    # — one per-source aggregate pass instead of two (guide §2.4)
    th = pin(
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "threshold_bp",
            F.least(
                F.lit(10000),
                F.expr("((total div 2) * 10000 div wsum) * w div n_docs"),
            ),
        )
        .select("source", "n_docs", "threshold_bp")
    )
    b = hash_bucket(
        F.concat(F.lit(TEMP_SALT), F.col("doc_id").cast("string")), 10000
    )
    kept = (
        docs.join(F.broadcast(th), "source")
        .filter(b < F.col("threshold_bp"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    # broadcast: |sources| rows each side, but post-agg estimates put
    # the report join on sort-merge (guide §3.1)
    return th.join(F.broadcast(kept), "source", "left").select(
        "source",
        "n_docs",
        "threshold_bp",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )


@register(
    "time_rollup_events",
    oracle="""
        SELECT 'hour' AS grain, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
               count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'day', strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
               count(*), round(sum(value), 2)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'month', strftime(date_trunc('month', ts), '%Y-%m-%d %H:%M:%S'),
               count(*), round(sum(value), 2)
        FROM events GROUP BY 2
    """,
    tags=("rollup", "hypertable"),
)
def time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the hypertable continuous-aggregate
    analog): hour/day/month buckets in one pass shape.

    Spark-first detail: the three grains are built FROM the hourly
    aggregate (day from hour, month from day) — the raw table is
    scanned once and re-aggregation cost is proportional to the hourly
    cardinality, which is how a continuous-aggregate hierarchy works at
    scale."""
    ev = load_table(spark, sf_dir, "events")
    hourly = pin((
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    ))
    daily = pin((
        hourly.groupBy(F.date_trunc("day", "h").alias("h"))
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    ))
    monthly = (
        daily.groupBy(F.date_trunc("month", "h").alias("h"))
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )

    def fmt(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.col("n"),
            F.round("s", 2).alias("total"),
        )

    return fmt(hourly, "hour").unionByName(fmt(daily, "day")).unionByName(
        fmt(monthly, "month")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling") — hashed n-gram features
# reduced here to unigrams for oracle-exact cross-engine math.
# ---------------------------------------------------------------------------

#: the in-domain exemplar slice (the "target" distribution p) — at 100 TB
#: this is a curated seed corpus; the raw corpus is the proposal q.
DSIR_TARGET_SOURCE = "src0"


_DSIR_ORACLE = """
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(list_filter(string_split_regex(lower(text),
                          '[^\\p{L}\\p{N}]+'), x -> x <> '')) AS token
            FROM documents
        ),
        raw_counts AS (
            SELECT token, count(*) AS c_r FROM toks GROUP BY token
        ),
        tgt_counts AS (
            SELECT token, count(*) AS c_t FROM toks
            WHERE source = 'TGT' GROUP BY token
        ),
        consts AS (
            SELECT (SELECT count(*) FROM toks) AS total_r,
                   (SELECT count(*) FROM toks WHERE source = 'TGT') AS total_t,
                   (SELECT count(*) FROM raw_counts) AS v
        ),
        ratio AS (
            SELECT r.token,
                   ln((coalesce(t.c_t, 0) + 1.0) / (c.total_t + c.v))
                 - ln((r.c_r + 1.0) / (c.total_r + c.v)) AS lr
            FROM raw_counts r
            LEFT JOIN tgt_counts t USING (token)
            CROSS JOIN consts c
        )
        SELECT k.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(ratio.lr), 4) + 0.0 AS dsir_score
        FROM toks k JOIN ratio USING (token)
        GROUP BY k.doc_id
""".replace("'TGT'", "'src0'")


@register(
    "dsir_importance_weights",
    oracle=_DSIR_ORACLE,
    tags=("sampling", "dsir", "importance"),
    bench=True,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance score: mean over token occurrences of
    ``ln p_target(tok) - ln p_raw(tok)`` with Laplace smoothing, target =
    the ``src0`` exemplar slice.  Docs scoring high look like the target
    domain; resampling by these weights is the DSIR selection step.

    100 TB shape: both frequency tables are VOCABULARY-sized, not
    corpus-sized — they reduce map-side and broadcast back onto the
    exploded token stream, so the only corpus-scale shuffle is the final
    per-doc mean (whose partial aggregation collapses each doc to one
    row map-side, since a doc's exploded tokens stay in its partition).
    """
    from ssafynews_data_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = pin(
        docs.select("doc_id", "source", F.explode(tokens_col(F.col("text"))).alias("token"))
    )
    is_tgt = F.col("source") == DSIR_TARGET_SOURCE
    # one pass over the pinned token stream yields BOTH count tables
    # (c_t as a conditional count) plus, via a second tiny agg over the
    # vocab-sized result, all three scalars
    counts = pin(
        toks.groupBy("token").agg(
            F.count("*").alias("c_r"),
            F.count(F.when(is_tgt, 1)).alias("c_t"),
        )
    )
    total_r, total_t, v = counts.agg(
        F.sum("c_r"), F.sum("c_t"), F.count("*")
    ).first()
    if not total_r:  # empty corpus: sums come back NULL
        return local_df(spark, 
            [], "doc_id long, n_tokens long, dsir_score double"
        )
    total_t = total_t or 0  # corpus without the target domain
    ratio = counts.select(
        "token",
        (
            F.log((F.col("c_t") + 1.0) / F.lit(float(total_t + v)))
            - F.log((F.col("c_r") + 1.0) / F.lit(float(total_r + v)))
        ).alias("lr"),
    )
    return (
        toks.join(F.broadcast(ratio), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (F.round(F.avg("lr"), 4) + 0.0).alias("dsir_score"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle — reproducible training-data ordering.
# ---------------------------------------------------------------------------

EPOCH_SEED = "epoch0"
EPOCH_SHARDS = 8


@register(
    "epoch_shuffle_layout",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   md5('{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)) AS k
            FROM documents
        ),
        s AS (
            SELECT doc_id, k,
                   CAST(CAST(('0x' || substr(k, 1, 4)) AS BIGINT)
                        % {EPOCH_SHARDS} AS INT) AS shard
            FROM t
        )
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                    AS BIGINT) AS pos
        FROM s
    """,
    tags=("sampling", "shuffle", "training"),
)
def epoch_shuffle_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic epoch shuffle: every document gets a
    (shard, pos) coordinate from the md5 of seed:doc_id — the global
    read order a training job follows for this epoch.  Changing
    EPOCH_SEED reshuffles; the same seed reproduces the identical order
    on ANY engine (md5 is standardized; never ``rand()`` — a retried
    task would reorder its partition).  This is how a 1000-reader
    training fleet gets a reproducible shuffle without a global sort:
    shard = reader id, pos = intra-shard order, and the window sort is
    per-shard (parallel across shards), never a single global order."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    k = F.md5(
        F.concat(F.lit(EPOCH_SEED + ":"), F.col("doc_id").cast("string")).cast("binary")
    )
    t = docs.select("doc_id", k.alias("k"))
    shard = (
        F.conv(F.substring(F.col("k"), 1, 4), 16, 10).cast("long") % EPOCH_SHARDS
    ).cast("int")
    w = W.partitionBy("shard").orderBy("k", "doc_id")
    return (
        t.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


# ---------------------------------------------------------------------------
# Sequence-length bucketing — batch-efficiency layout for training.
# ---------------------------------------------------------------------------

LEN_BUCKETS = 10

from ssafynews_data_spark.operators.text import _DUCK_TOKENS  # noqa: E402


@register(
    "length_bucket_stats",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len({_DUCK_TOKENS}) AS n FROM documents
        ),
        b AS (
            SELECT doc_id, n,
                   ntile({LEN_BUCKETS}) OVER (ORDER BY n, doc_id) AS bucket
            FROM t
        )
        SELECT CAST(bucket AS INT) AS bucket,
               count(*) AS n_docs,
               CAST(min(n) AS BIGINT) AS min_tokens,
               CAST(max(n) AS BIGINT) AS max_tokens,
               CAST(sum(n) AS BIGINT) AS total_tokens
        FROM b GROUP BY 1
    """,
    tags=("sampling", "bucketing", "training"),
)
def length_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing audit: ntile(10) over token counts
    (ties broken by doc_id so both engines agree exactly) with
    per-bucket document counts and token ranges — the layout decision
    table for length-bucketed batching (padding waste ~ max-min within a
    bucket).  The global ntile is the SPEC form; at 100 TB compute the
    cutpoints once via approxQuantile / QuantileSummaries (map-side
    mergeable sketch) and bucket row-locally against the broadcast
    cutpoints — same buckets to within sketch error, no global sort."""
    from pyspark.sql import Window as W

    from ssafynews_data_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.size(tokens_col(F.col("text"))).alias("n"))
    b = t.withColumn(
        "bucket", F.ntile(LEN_BUCKETS).over(W.orderBy("n", "doc_id"))
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("n").cast("long").alias("min_tokens"),
        F.max("n").cast("long").alias("max_tokens"),
        F.sum("n").cast("long").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Fixed-size deterministic sample — the distributed reservoir replacement.
# ---------------------------------------------------------------------------

SAMPLE_N = 100
SAMPLE_SEED = "sample0"


@register(
    "uniform_sample_fixed_n",
    oracle=f"""
        SELECT doc_id, source, lang
        FROM documents
        ORDER BY md5('{SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {SAMPLE_N}
    """,
    tags=("sampling", "reservoir", "topk"),
)
def uniform_sample_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N uniform sample without a reservoir: rank every row by a
    seeded md5 and keep the N smallest.  ``orderBy(k).limit(N)``
    compiles to TakeOrderedAndProject — each partition keeps its local
    top-N and only N rows per partition reach the driver-side merge, so
    at 100 TB this is a single scan with no global sort and no stateful
    reservoir to synchronize.  Deterministic across engines, retries,
    and partitionings (the classic distributed-sampling pitfall
    ``rand()`` fails)."""
    docs = load_table(spark, sf_dir, "documents")
    k = F.md5(
        F.concat(F.lit(SAMPLE_SEED + ":"), F.col("doc_id").cast("string")).cast("binary")
    )
    return (
        docs.select("doc_id", "source", "lang", k.alias("_k"))
        .orderBy("_k", "doc_id")
        .limit(SAMPLE_N)
        .drop("_k")
    )


@register(
    "weighted_sample_docs",
    oracle="""
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                            AS BIGINT) + 1) / 65537.0) / n_chars AS priority
            FROM documents
            WHERE n_chars > 0
        )
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
        FROM keyed
        ORDER BY priority DESC, doc_id
        LIMIT 20
    """,
    tags=("sampling", "weighted", "a-res"),
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without replacement via A-Res
    priorities (Efraimidis & Spirakis 2006): each doc gets priority
    ln(u)/w with u a DETERMINISTIC md5-derived uniform and w = n_chars,
    and the top-N priorities are the sample — longer documents are
    proportionally likelier, yet the draw is reproducible across runs
    and engines (no rand()).  This is the quality-weighted corpus
    sampling primitive (sample by quality score instead of n_chars and
    nothing changes).  One scan + TakeOrderedAndProject; at 100 TB the
    top-N heap merges per partition exactly like any top-k — and the
    same keys support distributed reservoir MERGE across batches
    (priorities are comparable across any split of the data)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long")
        + 1
    ) / 65537.0
    priority = F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"),
                    priority.alias("priority"))
        .orderBy(F.desc("priority"), "doc_id")
        .limit(20)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "stratified_sample_contract",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS stratum_size,
               true AS fraction_ok
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("sampling", "stratified", "contract"),
)
def stratified_sample_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stratified sampler's guarantee as a driver-hashable row:
    each stratum's ACHIEVED fraction must sit within a 4-sigma binomial
    band of its target (en 50%, others 10%) — Bernoulli sampling can't
    promise the exact fraction, only concentration, so the contract is
    |achieved − target| ≤ 4·√(p(1−p)/n) + 1/n.  The oracle recomputes
    the stratum sizes and expects every band check true; the seeded
    draw is fixed per fixture, so a sampler regression (seed handling,
    per-stratum fraction routing) flips a driver-visible boolean."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 0.1, "fr": 0.1, "es": 0.1, "zh": 0.1}
    sample = docs.sampleBy("lang", fractions, seed=42)
    got = sample.groupBy("lang").agg(F.count("*").alias("k"))
    tot = docs.groupBy("lang").agg(F.count("*").alias("n"))
    target = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col("lang")]
    joined = tot.join(got, "lang", "left").select(
        "lang",
        F.col("n").cast("long").alias("stratum_size"),
        (F.coalesce(F.col("k"), F.lit(0)) / F.col("n")).alias("achieved"),
        target.alias("p"),
    )
    band = 4 * F.sqrt(F.col("p") * (1 - F.col("p")) / F.col("stratum_size")) + (
        1 / F.col("stratum_size")
    )
    return joined.select(
        "lang",
        "stratum_size",
        (F.abs(F.col("achieved") - F.col("p")) <= band).alias("fraction_ok"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# DoReMi-style domain mixture reweighting (Xie et al. 2023).
# ---------------------------------------------------------------------------

#: multiplicative-weights iterations (DoReMi runs ~thousands of proxy
#: steps; 5 keeps the fixture fast while exercising the averaging).
DOREMI_T = 5


@register(
    "doremi_mixture_weights",
    oracle=f"""
        WITH RECURSIVE d AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(array_to_string(toks, ''))) AS BIGINT)
                       AS chars,
                   CAST(sum(len(toks)) AS BIGINT) AS n_toks
            FROM (SELECT source, {_DUCK_TOKENS} AS toks FROM documents)
            GROUP BY 1
            HAVING sum(len(toks)) > 0
        ),
        base AS (
            SELECT CAST(sum(chars) * 1000 // sum(n_toks) AS BIGINT) AS b
            FROM d
        ),
        m AS (
            SELECT source, n_docs,
                   chars * 1000 // n_toks AS loss_mill,
                   greatest(0, least(1000, chars * 1000 // n_toks - b))
                       AS excess,
                   100 + greatest(0, least(1000,
                                           chars * 1000 // n_toks - b)) // 10
                       AS mult
            FROM d, base
        ),
        it AS (
            SELECT 1 AS t, source, CAST(mult AS BIGINT) AS w FROM m
            UNION ALL
            SELECT t + 1, it.source, w * mult
            FROM it JOIN m USING (source)
            WHERE t < {DOREMI_T}
        ),
        a AS (
            SELECT t, source,
                   w * 10000 // sum(w) OVER (PARTITION BY t) AS a_bp
            FROM it
        ),
        f AS (
            SELECT source, CAST(sum(a_bp) // {DOREMI_T} AS BIGINT)
                       AS weight_bp
            FROM a GROUP BY 1
        )
        SELECT m.source, m.n_docs,
               CAST(m.loss_mill AS BIGINT) AS loss_mill,
               CAST(m.excess AS BIGINT) AS excess,
               f.weight_bp
        FROM m JOIN f USING (source)
        ORDER BY source
    """,
    tags=("sampling", "mixing", "doremi"),
)
def doremi_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain mixture weights (Xie et al. 2023): per-domain
    multiplicative-weights updates on an excess-loss signal, final
    weights = the average of the per-step normalized distributions (the
    paper's key output — averaging across steps is what makes the
    result robust to the stopping point, and it is NOT a closed-form
    softmax, so the iteration is semantically load-bearing).

    The excess-loss proxy is chars-per-token vs the corpus mean (longer
    tokens ≈ harder text under a char-level reference model); a real
    run would plug per-domain proxy/reference model losses into the
    same arithmetic.  Everything is integer — loss in per-mille via one
    fixed division order, multiplier m = 100 + excess//10 ∈ [100, 200],
    step weights m^t (≤ 200^{DOREMI_T} ≪ 2^63), shares in basis points
    via integer division — so Spark and DuckDB agree bit-for-bit and no
    exp()/softmax ULP can flip the hash.

    100 TB shape: ONE map-side-combining aggregate over the corpus
    (per-domain char/token totals — the only pass that touches data),
    then every iteration runs on the domains-sized table (≤ thousands
    of rows): the unpartitioned window sums are driver-trivial by
    construction, and the corpus is never rescanned or reshuffled.
    Reference anchor: the reference resamples its feed mix by fixed
    category quotas (`collect/consumer.py` category fan-out); this is
    the principled version a training pipeline would use."""
    from pyspark.sql import Window

    from ssafynews_data_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.select("source", tokens_col(F.col("text")).alias("toks"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length(F.array_join("toks", ""))).cast("long").alias("chars"),
            F.sum(F.size("toks")).cast("long").alias("n_toks"),
        )
        # drop all-zero-token domains BEFORE any division: Spark's
        # non-ANSI div yields NULL on n_toks=0 while DuckDB errors —
        # both sides agree on the degenerate case by excluding it
        .filter(F.col("n_toks") > 0)
    )
    base = d.agg(
        F.expr("sum(chars) * 1000 div sum(n_toks)").cast("long").alias("b")
    )
    loss = F.expr("chars * 1000 div n_toks")
    excess = F.greatest(F.lit(0), F.least(F.lit(1000), loss - F.col("b")))
    # integer `div` everywhere (never float `/` + cast: a float quotient
    # can round UP across an integer boundary and diverge from DuckDB's
    # floor `//`)
    m = pin(
        d.crossJoin(F.broadcast(base))
        .select(
            "source",
            "n_docs",
            loss.cast("long").alias("loss_mill"),
            excess.cast("long").alias("excess"),
        )
        .withColumn("mult", F.expr("100 + excess div 10").cast("long"))
    )
    # all T step-weights as columns, all T share denominators over ONE
    # window spec — Catalyst computes every sum in a single
    # exchange+window pass on the domains-sized table (no self-joins)
    whole = Window.partitionBy()
    stepped, cur = m, F.col("mult")
    for t in range(1, DOREMI_T + 1):
        stepped = stepped.withColumn(f"w_{t}", cur)
        cur = cur * F.col("mult")
    for t in range(1, DOREMI_T + 1):
        stepped = stepped.withColumn(f"sw_{t}", F.sum(f"w_{t}").over(whole))
    step_sum = " + ".join(
        f"((w_{t} * 10000) div sw_{t})" for t in range(1, DOREMI_T + 1)
    )
    return stepped.select(
        "source",
        "n_docs",
        "loss_mill",
        "excess",
        F.expr(f"({step_sum}) div {DOREMI_T}").cast("long").alias("weight_bp"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Round 12: per-domain frequency capping + quality-curriculum ordering.
# ---------------------------------------------------------------------------

#: max docs kept per source — the web-curation "domain cap" (RefinedWeb
#: / Dolma keep at most N pages per registered domain so one crawl-happy
#: host can't dominate the mixture).  10 of the fixture's ~25 docs per
#: source exercises both branches at every SF.
DOMAIN_CAP = 10
#: salt decorrelating the cap's keep-order from the split / mix buckets
#: (all three hash doc_id).
CAP_SALT = "cap"
#: phase-1 shards for the scalable two-phase cap (see docstring).
CAP_SHARDS = 16


def _md5_key(salt: str, c) -> "F.Column":
    """Lowercase-hex md5 of salt||string(col) — identical text in Spark
    (Java) and DuckDB, so ORDER BY on it is an engine-independent
    deterministic shuffle of the rows."""
    return F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary"))


@register(
    "domain_cap_sample",
    oracle=f"""
        WITH t AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('{CAP_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN doc_id END)
                    AS BIGINT) AS kept_id_sum,
               CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN n_chars END)
                    AS BIGINT) AS kept_chars
        FROM t GROUP BY source
    """,
    tags=("sampling", "cap", "curate", "north-star"),
    bench2=True,
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency cap: keep at most ``DOMAIN_CAP`` docs per
    source, chosen by salted-md5 order (engine-independent, so a resumed
    or migrated job keeps the exact same subset) — the standard
    web-curation guard against a single domain flooding the mix.

    100 TB shape: the naive form is one window per source — a hot
    domain (half the crawl is one host) serializes into a single
    reducer.  The engine runs the EXACT two-phase form instead: phase 1
    ranks within (source, shard) for ``CAP_SHARDS`` deterministic
    shards and keeps each shard's top ``DOMAIN_CAP``; the global
    smallest-``DOMAIN_CAP`` md5 keys of a source are necessarily inside
    the union of its per-shard top-``DOMAIN_CAP`` (any row outside its
    shard's top-cap has >= cap smaller keys in ITS OWN shard alone), so
    phase 2's per-source window ranks at most ``CAP_SHARDS * CAP`` rows
    per source — bounded, skew-immune — and returns exactly the naive
    answer.  The totals aggregate is a plain map-side-combinable count.

    The DuckDB oracle states the NAIVE single-window spec; the driver
    hash-equality of the two is the exactness proof of the two-phase
    rewrite."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        _md5_key(CAP_SALT, F.col("doc_id")).alias("k"),
        (F.col("doc_id") % CAP_SHARDS).alias("shard"),
    )
    w1 = W.partitionBy("source", "shard").orderBy("k", "doc_id")
    surv = (
        keyed.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= DOMAIN_CAP)
        .drop("rn1", "shard")
    )
    w2 = W.partitionBy("source").orderBy("k", "doc_id")
    kept = (
        surv.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= DOMAIN_CAP)
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    kt = kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("kept_id_sum"),
        F.sum("n_chars").alias("kept_chars"),
    )
    # inner join: every source with rows keeps at least its rank-1 doc,
    # so the kept side can never miss a source — a left join + coalesce
    # would be dead defensive code implying a reachable empty branch
    return totals.join(kt, "source").select(
        "source",
        "n_docs",
        "n_kept",
        (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
        "kept_id_sum",
        "kept_chars",
    )


#: curriculum quality-bin cuts on the EXACT integer score
#: (2*n_stop + n_distinct) * 10000 // n_tokens — the weak-label linear
#: rule of quality_classifier (vectors.QUALITY_LABEL_CUT's 0.6 scaled
#: by 10000), computed as pure integer arithmetic so both engines agree
#: bit-for-bit (fixture distribution at sf0.01: min 3437 / median
#: ~5900 / max 13333, so both cuts are well-populated on every draw).
CURRICULUM_CUT_HIGH = 8000
CURRICULUM_CUT_MID = 5000
#: salt for the within-bin interleave (decorrelated from cap/mix/split).
CURRICULUM_SALT = "curr"
#: deterministic reader shards per bin — the parallelism axis of the
#: schedule (a trainer's N data-loader workers each read one shard in
#: pos_in_shard order; windows stay (bin, shard)-grained, never global).
CURRICULUM_SHARDS = 8


@register(
    "curriculum_schedule",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n,
                   CAST(len(list_filter({_DUCK_TOKENS},
                            x -> x IN ('the','a','of','and','is','in','to','it')))
                        AS BIGINT) AS n_stop,
                   CAST(len(list_distinct({_DUCK_TOKENS})) AS BIGINT) AS n_distinct
            FROM documents
        ),
        s AS (
            SELECT doc_id,
                   (2 * n_stop + n_distinct) * 10000 // n AS qscore_q4,
                   md5('{CURRICULUM_SALT}' || CAST(doc_id AS VARCHAR)) AS k
            FROM t WHERE n > 0
        ),
        b AS (
            SELECT doc_id, qscore_q4,
                   CAST(CASE WHEN qscore_q4 >= {CURRICULUM_CUT_HIGH} THEN 0
                             WHEN qscore_q4 >= {CURRICULUM_CUT_MID} THEN 1
                             ELSE 2 END AS BIGINT) AS bin,
                   doc_id % {CURRICULUM_SHARDS} AS shard, k
            FROM s
        )
        SELECT doc_id, qscore_q4, bin, shard,
               CAST(row_number() OVER (PARTITION BY bin, shard
                                       ORDER BY k, doc_id) AS BIGINT)
                   AS pos_in_shard
        FROM b
    """,
    tags=("sampling", "curriculum", "training-data", "north-star"),
    bench2=True,
)
def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum data ordering: bin every doc by the integer
    quality score behind ``quality_classifier``'s weak label
    ((2*n_stop + n_distinct)*10000 // n_tokens — highest-quality bin 0
    first, the anti-curriculum variants are a sort flip away), then give
    each doc a deterministic position inside one of
    ``CURRICULUM_SHARDS`` reader shards, md5-interleaved within its bin
    so consecutive positions are a quality-stratified shuffle rather
    than corpus order.

    All arithmetic is integer (the score is an exact integer quotient;
    the interleave key is md5 hex text), so the schedule is
    bit-reproducible across engines, retries, and resumes — the
    property a training run needs to be restartable mid-epoch.

    100 TB shape: the score is row-local (one narrow pass, no explode);
    the only exchange is the (bin, shard) window — ``3 * CURRICULUM_
    SHARDS`` balanced partitions whose count is the tunable parallelism
    knob, never a global sort, never a per-bin single reducer."""
    from pyspark.sql import Window as W

    from ssafynews_data_spark.operators.text import STOPWORDS, tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    t = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n"),
        F.size(F.filter(F.col("toks"), lambda x: x.isin(*STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    ).filter(F.col("n") > 0)
    s = t.select(
        "doc_id",
        F.expr("(2 * n_stop + n_distinct) * 10000 div n").alias("qscore_q4"),
        _md5_key(CURRICULUM_SALT, F.col("doc_id")).alias("k"),
    )
    b = s.select(
        "doc_id",
        "qscore_q4",
        F.when(F.col("qscore_q4") >= CURRICULUM_CUT_HIGH, 0)
        .when(F.col("qscore_q4") >= CURRICULUM_CUT_MID, 1)
        .otherwise(2)
        .cast("long")
        .alias("bin"),
        (F.col("doc_id") % CURRICULUM_SHARDS).alias("shard"),
        "k",
    )
    w = W.partitionBy("bin", "shard").orderBy("k", "doc_id")
    return b.select(
        "doc_id",
        "qscore_q4",
        "bin",
        "shard",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


#: decorrelated salt for the capped-mixture keep decision (distinct
#: from CAP_SALT's ordering and TEMP_SALT's standalone resample so the
#: three decisions are independent hash draws).
CAPMIX_SALT = "capmix"


@register(
    "capped_mixture_pipeline",
    oracle=f"""
        WITH t AS (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('{CAP_SALT}' || CAST(doc_id AS VARCHAR)),
                                doc_id
                   ) AS rn
            FROM documents
        ),
        capped AS (SELECT source, doc_id FROM t WHERE rn <= {DOMAIN_CAP}),
        c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_capped
              FROM capped GROUP BY 1),
        w AS (SELECT source, n_capped,
                     CAST(floor(sqrt(n_capped) * 1000) AS BIGINT) AS w
              FROM c),
        tot AS (SELECT CAST(sum(n_capped) AS BIGINT) AS total,
                       CAST(sum(w) AS BIGINT) AS wsum FROM w),
        th AS (SELECT source, n_capped,
                      least(10000,
                            ((total // 2) * 10000 // wsum) * w // n_capped)
                          AS threshold_bp
               FROM w, tot),
        fin AS (
            SELECT cp.source, CAST(count(*) AS BIGINT) AS n_final,
                   CAST(sum(cp.doc_id) AS BIGINT) AS final_id_sum
            FROM capped cp JOIN th USING (source)
            WHERE CAST(('0x' || substr(md5('{CAPMIX_SALT}'
                                           || CAST(cp.doc_id AS VARCHAR)), 1, 4))
                       AS BIGINT) % 10000 < threshold_bp
            GROUP BY 1
        ),
        nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY 1)
        SELECT nd.source, nd.n_docs, th.n_capped, th.threshold_bp,
               CAST(coalesce(fin.n_final, 0) AS BIGINT) AS n_final,
               CAST(coalesce(fin.final_id_sum, 0) AS BIGINT) AS final_id_sum
        FROM nd JOIN th USING (source) LEFT JOIN fin USING (source)
    """,
    tags=("sampling", "cap", "mixing", "pipeline", "north-star"),
)
def capped_mixture_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``domain_cap_sample`` ∘ ``temperature_resample`` as ONE fused
    curation stage with exact end-to-end accounting — the order every
    web pipeline actually runs them in: first cap each domain at
    ``DOMAIN_CAP`` docs (salted-md5 order), THEN compute the
    temperature (α = 0.5) thresholds **on the capped counts** — caps
    applied before quota draws, so a flooding domain can't inflate its
    own temperature quota — and keep capped docs whose independent
    ``CAPMIX_SALT`` hash bucket clears the threshold.

    All integer / fixed-division-order arithmetic (the standing
    temperature_resample scheme: weights floor(sqrt·1000), thresholds
    in basis points, one division order), so both engines agree
    bit-for-bit; ``final_id_sum`` is the exact checksum of the chosen
    doc set, making the hash match a proof the two engines selected the
    IDENTICAL subset, not just equal counts.

    100 TB shape: the cap phase is the proven two-phase (source,
    shard)→source window rewrite (skew-immune, see domain_cap_sample —
    the per-source frame it ranks is ≤ CAP_SHARDS·DOMAIN_CAP rows); the
    threshold table is a |sources|-row broadcast back onto the capped
    stream; the keep decision is row-local md5 — the corpus shuffles
    once (the cap exchange) and never again."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        _md5_key(CAP_SALT, F.col("doc_id")).alias("k"),
        (F.col("doc_id") % CAP_SHARDS).alias("shard"),
    )
    w1 = W.partitionBy("source", "shard").orderBy("k", "doc_id")
    surv = (
        keyed.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= DOMAIN_CAP)
        .drop("rn1", "shard")
    )
    w2 = W.partitionBy("source").orderBy("k", "doc_id")
    capped = pin(
        surv.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= DOMAIN_CAP)
        .select("source", "doc_id")
    )

    counts = pin(
        capped.groupBy("source")
        .agg(F.count("*").alias("n_capped"))
        .withColumn("w", F.floor(F.sqrt("n_capped") * 1000).cast("long"))
    )
    totals = counts.agg(
        F.sum("n_capped").alias("total"), F.sum("w").alias("wsum")
    )
    th = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "threshold_bp",
            F.least(
                F.lit(10000),
                F.expr("((total div 2) * 10000 div wsum) * w div n_capped"),
            ),
        )
        .select("source", "n_capped", "threshold_bp")
    )
    b = hash_bucket(
        F.concat(F.lit(CAPMIX_SALT), F.col("doc_id").cast("string")), 10000
    )
    fin = (
        capped.join(F.broadcast(th), "source")
        .filter(b < F.col("threshold_bp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_final"),
            F.sum("doc_id").alias("final_id_sum"),
        )
    )
    nd = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    # broadcast: every report-side frame is |sources| rows; post-agg
    # estimates otherwise planned the final joins sort-merge (guide §3.1)
    return (
        nd.join(F.broadcast(th), "source")
        .join(F.broadcast(fin), "source", "left")
        .select(
            "source",
            "n_docs",
            "n_capped",
            "threshold_bp",
            F.coalesce(F.col("n_final"), F.lit(0).cast("long")).alias("n_final"),
            F.coalesce(F.col("final_id_sum"), F.lit(0).cast("long")).alias(
                "final_id_sum"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round 14: data-constrained epoching + padding-minimizing batching.
# ---------------------------------------------------------------------------

#: global token budget the epoch plan fills (chosen to straddle the
#: interesting regimes on the shipped fixtures: at sf0.001/sf0.01 the
#: per-source quota exceeds supply, so sources REPEAT and the epoch cap
#: binds; at sf0.1 supply exceeds quota, so sources DOWNSAMPLE — the
#: plan must be exact in both directions).
EPOCH_PLAN_BUDGET = 100_000
#: repetition value decays fast (Muennighoff et al. 2023, "Scaling
#: Data-Constrained Language Models": ~4 epochs of repetition are
#: near-as-good as fresh data, beyond that value collapses) — the plan
#: never schedules more than this many full passes over a source.
EPOCH_MAX_REPEATS = 4

#: the Hamilton-allocation CTE chain (corpus -> per-source
#: quota_tokens), shared verbatim by source_epoch_plan and
#: mixture_epoch_interleave so the interleave executes EXACTLY the plan
#: the planner hash-checks.
_EPOCH_PLAN_CTES = f"""per_src AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len({_DUCK_TOKENS})) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        w AS (
            SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                          AS weight
            FROM per_src
        ),
        tot AS (
            SELECT *, CAST(sum(weight) OVER () AS BIGINT) AS total_weight
            FROM w
        ),
        quo AS (
            SELECT *,
                   CAST(CASE WHEN total_weight = 0 THEN 0
                             ELSE ({EPOCH_PLAN_BUDGET} * weight) // total_weight
                        END AS BIGINT) AS quota_base,
                   CAST(CASE WHEN total_weight = 0 THEN 0
                             ELSE {EPOCH_PLAN_BUDGET} * weight
                                  - (({EPOCH_PLAN_BUDGET} * weight) // total_weight)
                                    * total_weight
                        END AS BIGINT) AS remainder_units
            FROM tot
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY remainder_units DESC, source)
                       AS rem_rank,
                   CAST({EPOCH_PLAN_BUDGET} - sum(quota_base) OVER () AS BIGINT)
                       AS leftover
            FROM quo
        ),
        alloc AS (
            SELECT source, n_docs, n_tokens, weight,
                   CAST(quota_base
                        + CASE WHEN total_weight = 0 THEN 0
                               WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                        AS BIGINT) AS quota_tokens
            FROM ranked
        )"""


@register(
    "source_epoch_plan",
    # pure integers end-to-end: sqrt-temperature weights are
    # floor(sqrt(bigint)) over IEEE-identical doubles (the
    # daily_count_anomalies precedent: correctly-rounded sqrt + floor
    # agree bit-for-bit per engine), Hamilton quotas/remainders are the
    # token_budget_allocation machinery verbatim, and the epoch split
    # is div/mod on non-negative integers.
    oracle=f"""
        WITH {_EPOCH_PLAN_CTES}
        SELECT source, n_docs, n_tokens, weight, quota_tokens,
               CAST(CASE WHEN n_tokens = 0 THEN 0
                         ELSE least(quota_tokens // n_tokens,
                                    {EPOCH_MAX_REPEATS}) END
                    AS BIGINT) AS n_full_epochs,
               CAST(CASE WHEN n_tokens = 0 THEN 0
                         WHEN quota_tokens // n_tokens >= {EPOCH_MAX_REPEATS}
                         THEN 0
                         ELSE quota_tokens % n_tokens END
                    AS BIGINT) AS partial_tokens,
               CAST(CASE WHEN n_tokens = 0 THEN quota_tokens
                         WHEN quota_tokens // n_tokens >= {EPOCH_MAX_REPEATS}
                         THEN quota_tokens - {EPOCH_MAX_REPEATS} * n_tokens
                         ELSE 0 END
                    AS BIGINT) AS unfilled_tokens,
               CASE WHEN n_tokens = 0 THEN false
                    ELSE quota_tokens // n_tokens >= 1 END AS repeated
        FROM alloc
    """,
    tags=("sampling", "mixture", "epoching", "training-data", "north-star"),
)
def source_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch plan (Muennighoff et al. 2023): apportion
    a global token budget across sources by a sqrt-temperature target
    mixture (small high-quality sources get a super-proportional share
    — the τ = 0.5 convention of ``temperature_resample``, in exact
    integers), then convert each source's quota into the schedule a
    data loader executes: ``n_full_epochs`` complete passes (capped at
    EPOCH_MAX_REPEATS — repetition value collapses past ~4 epochs) plus
    ``partial_tokens`` of a final partial pass.  Supply-capped sources
    REPEAT (quota > supply); oversupplied sources DOWNSAMPLE
    (n_full_epochs = 0, the partial pass is the sample); budget the cap
    refuses to place is reported as ``unfilled_tokens`` — the number
    that tells the curator to go find more data rather than silently
    over-repeating.

    Integer contract: weights are floor(sqrt(n_tokens)) — sqrt on a
    BIGINT-valued double is correctly rounded on both engines, so
    floor agrees bit-for-bit (the daily_count_anomalies precedent);
    quotas are Hamilton largest-remainder exactly as
    ``token_budget_allocation`` (quota sum == budget, remainders
    compared as exact products, tie-break on source); the epoch split
    is div/mod on non-negative integers.

    Scale shape: ONE map-side-combining aggregate reduces the corpus
    to |sources| rows; every window after that (total weight, leftover,
    remainder rank) runs on the |sources|-row frame — the deliberate
    single-partition exception (token_budget_allocation's note).  The
    plan itself never touches the corpus again: executing it is the
    reader's job (epoch_shuffle_layout orders within a pass)."""
    from pyspark.sql import Window as W

    from ssafynews_data_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col(F.col("text"))).cast("long")).alias("n_tokens"),
    )
    B = EPOCH_PLAN_BUDGET
    w_all = W.partitionBy()
    weighted = per_src.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    ).withColumn("total_weight", F.sum("weight").over(w_all).cast("long"))
    quo = weighted.select(
        "*",
        F.when(F.col("total_weight") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr(f"({B} * weight) div total_weight"))
        .alias("quota_base"),
        F.when(F.col("total_weight") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(f"{B} * weight - (({B} * weight) div total_weight) * total_weight")
        )
        .alias("remainder_units"),
    )
    ranked = quo.select(
        "*",
        F.row_number()
        .over(w_all.orderBy(F.desc("remainder_units"), "source"))
        .alias("rem_rank"),
        (F.lit(B) - F.sum("quota_base").over(w_all)).cast("long").alias("leftover"),
    )
    alloc = ranked.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        (
            F.col("quota_base")
            + F.when(F.col("total_weight") == 0, F.lit(0))
            .when(F.col("rem_rank") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("quota_tokens"),
    )
    R = EPOCH_MAX_REPEATS
    full = F.expr("quota_tokens div n_tokens")
    return alloc.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        "quota_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(F.least(full, F.lit(R)))
        .cast("long")
        .alias("n_full_epochs"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .when(full >= R, F.lit(0))
        .otherwise(F.expr("quota_tokens % n_tokens"))
        .cast("long")
        .alias("partial_tokens"),
        F.when(F.col("n_tokens") == 0, F.col("quota_tokens"))
        .when(full >= R, F.col("quota_tokens") - R * F.col("n_tokens"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("unfilled_tokens"),
        F.when(F.col("n_tokens") == 0, F.lit(False))
        .otherwise(full >= 1)
        .alias("repeated"),
    )


#: length-band width in tokens (fixed cuts, not quantiles — quantile
#: edges are draw-dependent; fixed integer cuts are the cross-engine-
#: exact form, the curriculum_schedule precedent).
LB_BAND_WIDTH = 16
#: per-batch token budget: a batch holds ``budget div band_ub`` docs,
#: every doc padded to its band's upper bound.
LB_TOKEN_BUDGET = 256
#: reader shards — batches are (band, shard)-local so batch assembly
#: never needs a global sort (the curriculum_schedule shape).
LB_SHARDS = 8
LB_SALT = "lbb"


@register(
    "length_bucket_batches",
    # pure integers: bands are fixed-width div cuts, ranks are md5-
    # ordered row_numbers within (band, shard), capacity/batch/slot are
    # div/mod on non-negative integers — nothing rounded, nothing
    # draw-sensitive.
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tokens,
                   CAST(doc_id % {LB_SHARDS} AS BIGINT) AS shard
            FROM documents
        ),
        b AS (
            SELECT *,
                   (greatest(n_tokens, 1) - 1) // {LB_BAND_WIDTH} AS band,
                   ((greatest(n_tokens, 1) - 1) // {LB_BAND_WIDTH} + 1)
                       * {LB_BAND_WIDTH} AS padded_len
            FROM t
        ),
        r AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY band, shard
                       ORDER BY md5('{LB_SALT}' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rn,
                   greatest(1, {LB_TOKEN_BUDGET} // padded_len) AS cap_docs
            FROM b
        )
        SELECT doc_id, CAST(band AS BIGINT) AS band, shard,
               CAST((rn - 1) // cap_docs AS BIGINT) AS batch_id,
               CAST((rn - 1) % cap_docs AS BIGINT) AS slot,
               CAST(padded_len AS BIGINT) AS padded_len,
               CAST(padded_len - n_tokens AS BIGINT) AS pad_waste
        FROM r
    """,
    tags=("sampling", "batching", "training-data", "north-star"),
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-minimizing dynamic batching (the bucketed-batching every
    seq2seq/SFT trainer runs — fairseq's ``--max-tokens``, tensor2tensor
    bucketing): band every doc by fixed LB_BAND_WIDTH-token cuts, order
    each (band, shard) by a salted md5 (deterministic, engine-neutral),
    and pack docs into batches of ``LB_TOKEN_BUDGET div band_ub`` slots,
    every doc padded to its band's upper bound.  Emits the (batch_id,
    slot) coordinate a data loader dereferences plus the per-doc
    ``pad_waste`` the banding is minimizing — against one global
    max-length pad, banded waste is bounded by LB_BAND_WIDTH−1 per doc
    instead of (max_len − n_tokens).

    Docs longer than the token budget get singleton batches
    (``greatest(1, ...)`` — capacity never reaches 0, so div/mod stay
    defined and both engines agree).

    Scale shape: band + padded_len are row-local projections; the ONLY
    exchange is the (band, shard) window — LB_SHARDS independent
    partitions per band, so a dominant band parallelizes and nothing
    ever global-sorts (the curriculum_schedule/domain_cap two-phase
    principle; batch ids are (band, shard)-local coordinates exactly so
    this stays true at 100 TB).  Batch assembly downstream is a
    partition-local gather by (band, shard, batch_id)."""
    from pyspark.sql import Window as W

    from ssafynews_data_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        (F.col("doc_id") % LB_SHARDS).cast("long").alias("shard"),
    )
    # band edges are EXCLUSIVE on the upper bound ((max(n,1)−1) div W)
    # so an exact-multiple doc (n = 16) lands in the band it fills,
    # not one above it — padding waste stays < LB_BAND_WIDTH for every
    # non-empty doc (a 0-token doc pads to the smallest band).
    band_expr = f"(greatest(n_tokens, 1) - 1) div {LB_BAND_WIDTH}"
    b = t.select(
        "*",
        F.expr(band_expr).alias("band"),
        ((F.expr(band_expr) + 1) * LB_BAND_WIDTH).cast("long").alias("padded_len"),
    )
    w = W.partitionBy("band", "shard").orderBy(
        _md5_key(LB_SALT, F.col("doc_id")), "doc_id"
    )
    r = b.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.greatest(F.lit(1), F.expr(f"{LB_TOKEN_BUDGET} div padded_len"))
        .cast("long")
        .alias("cap_docs"),
    )
    return r.select(
        "doc_id",
        F.col("band").cast("long").alias("band"),
        "shard",
        F.expr("(rn - 1) div cap_docs").cast("long").alias("batch_id"),
        ((F.col("rn") - 1) % F.col("cap_docs")).cast("long").alias("slot"),
        "padded_len",
        (F.col("padded_len") - F.col("n_tokens")).cast("long").alias("pad_waste"),
    )


# ---------------------------------------------------------------------------
# Mixture epoch interleave — the executable form of source_epoch_plan.
# ---------------------------------------------------------------------------

#: interleave shuffle seed — decorrelated from EPOCH_SEED's standalone
#: single-epoch layout; the per-epoch key is seeded "{MIX_SEED}:{epoch}"
#: so every pass reshuffles.
MIX_SEED = "mix0"


def _mix_key(epoch, doc_id) -> "F.Column":
    return F.md5(
        F.concat(
            F.lit(MIX_SEED + ":"),
            epoch.cast("string"),
            F.lit(":"),
            doc_id.cast("string"),
        ).cast("binary")
    )


def _mix_shard(k) -> "F.Column":
    return (F.conv(F.substring(k, 1, 4), 16, 10).cast("long") % EPOCH_SHARDS).cast(
        "long"
    )


@register(
    "mixture_epoch_interleave",
    oracle=f"""
        WITH {_EPOCH_PLAN_CTES},
        plan AS (
            SELECT source, n_tokens,
                   CAST(CASE WHEN n_tokens = 0 THEN 0
                             ELSE least(quota_tokens // n_tokens,
                                        {EPOCH_MAX_REPEATS}) END
                        AS BIGINT) AS n_full_epochs,
                   CAST(CASE WHEN n_tokens = 0 THEN 0
                             WHEN quota_tokens // n_tokens >= {EPOCH_MAX_REPEATS}
                             THEN 0
                             ELSE quota_tokens % n_tokens END
                        AS BIGINT) AS partial_tokens
            FROM alloc
        ),
        dt AS (
            SELECT doc_id, source, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS nt
            FROM documents
        ),
        j AS (
            SELECT d.doc_id, d.source, d.nt, p.n_full_epochs, p.partial_tokens
            FROM dt d JOIN plan p USING (source)
        ),
        fulls AS (
            SELECT doc_id, source, CAST(t.e AS BIGINT) AS epoch,
                   nt AS tokens_taken
            FROM j, unnest(generate_series(0, n_full_epochs - 1)) AS t(e)
            WHERE n_full_epochs > 0
        ),
        par0 AS (
            SELECT doc_id, source, nt, n_full_epochs AS epoch, partial_tokens,
                   md5('{MIX_SEED}:' || CAST(n_full_epochs AS VARCHAR)
                       || ':' || CAST(doc_id AS VARCHAR)) AS k
            FROM j
            WHERE partial_tokens > 0
        ),
        par1 AS (
            SELECT *, CAST(CAST(('0x' || substr(k, 1, 4)) AS BIGINT)
                           % {EPOCH_SHARDS} AS BIGINT) AS shard
            FROM par0
        ),
        par2 AS (
            SELECT *, partial_tokens // {EPOCH_SHARDS}
                      + CASE WHEN shard < partial_tokens % {EPOCH_SHARDS}
                             THEN 1 ELSE 0 END AS quota
            FROM par1
        ),
        par3 AS (
            SELECT *, coalesce(sum(nt) OVER (PARTITION BY source, shard
                                             ORDER BY k, doc_id
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND 1 PRECEDING), 0)
                          AS cum_before
            FROM par2
        ),
        par AS (
            SELECT doc_id, source, epoch,
                   least(nt, quota - cum_before) AS tokens_taken
            FROM par3 WHERE cum_before < quota
        ),
        occ0 AS (
            SELECT doc_id, source, epoch, tokens_taken FROM fulls
            UNION ALL
            SELECT doc_id, source, epoch, tokens_taken FROM par
        ),
        occ1 AS (
            SELECT *, md5('{MIX_SEED}:' || CAST(epoch AS VARCHAR)
                          || ':' || CAST(doc_id AS VARCHAR)) AS k
            FROM occ0
        ),
        occ2 AS (
            SELECT *, CAST(CAST(('0x' || substr(k, 1, 4)) AS BIGINT)
                           % {EPOCH_SHARDS} AS BIGINT) AS shard
            FROM occ1
        )
        SELECT doc_id, source, epoch, shard,
               CAST(row_number() OVER (PARTITION BY epoch, shard
                                       ORDER BY k, doc_id) AS BIGINT) AS pos,
               CAST(tokens_taken AS BIGINT) AS tokens_taken
        FROM occ2
    """,
    tags=("sampling", "mixture", "epoching", "shuffle", "training-data", "north-star"),
)
def mixture_epoch_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global deterministic reader order that EXECUTES
    ``source_epoch_plan``: every document appears once per scheduled
    full epoch of its source, plus (for the final partial pass) a
    salted-hash-selected prefix that fills the plan's
    ``partial_tokens`` — so supply-capped sources repeat, oversupplied
    sources downsample, and the emitted (epoch, shard, pos)
    coordinates are the exact read schedule of a
    ``EPOCH_SHARDS``-reader training fleet, repeats included.

    Construction (all exact integers, byte-shared Hamilton CTEs with
    the plan's oracle):

    - full passes: epoch e in [0, n_full_epochs) per source, the whole
      source each pass;
    - partial pass (epoch = n_full_epochs): the source's
      ``partial_tokens`` is Hamilton-split across shards (div/mod);
      within (source, shard) docs are taken in salted-md5 order while
      the running token sum stays under the shard quota, the last doc
      truncated to ``tokens_taken`` — Σ tokens_taken reconciles with
      the plan per source (minus only quota stranded in supply-empty
      shards, which pytest bounds);
    - coordinates: the interleave key md5("{MIX_SEED}:{epoch}:{doc_id}")
      reshuffles every pass, derives the shard, and orders docs within
      (epoch, shard) — sources MIX within an epoch (the point of
      interleaving: no source-contiguous runs) yet the whole schedule
      is bit-reproducible on any engine, retry, or resume.

    100 TB shape: the plan join is a |sources|-row broadcast; full
    passes are a row-multiplying projection (output-linear, the floor
    for a schedule that lists every read); the partial-pass cumsum and
    the position windows are (source, shard)- / (epoch, shard)-grained
    — numerous balanced partitions, never a global sort
    (``epoch_shuffle_layout``'s fleet-shuffle argument, extended to
    multiple epochs)."""
    from ssafynews_data_spark.operators.text import tokens_col

    plan = source_epoch_plan(spark, sf_dir).select(
        "source", "n_full_epochs", "partial_tokens"
    )
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        "source",
        F.size(tokens_col(F.col("text"))).cast("long").alias("nt"),
    )
    j = dt.join(F.broadcast(plan), "source")
    E = F.col("n_full_epochs")
    fulls = j.filter(E > 0).select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0).cast("long"), (E - 1).cast("long"))).alias(
            "epoch"
        ),
        F.col("nt").alias("tokens_taken"),
    )
    par0 = j.filter(F.col("partial_tokens") > 0).select(
        "doc_id",
        "source",
        "nt",
        E.alias("epoch"),
        "partial_tokens",
        _mix_key(E, F.col("doc_id")).alias("k"),
    )
    par1 = par0.withColumn("shard", _mix_shard(F.col("k")))
    par2 = par1.withColumn(
        "quota",
        (
            F.expr(f"partial_tokens div {EPOCH_SHARDS}")
            + F.when(
                F.col("shard") < F.col("partial_tokens") % EPOCH_SHARDS, 1
            ).otherwise(0)
        ).cast("long"),
    )
    wcum = (
        W.partitionBy("source", "shard")
        .orderBy("k", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    par3 = par2.withColumn(
        "cum_before", F.coalesce(F.sum("nt").over(wcum), F.lit(0)).cast("long")
    )
    par = par3.filter(F.col("cum_before") < F.col("quota")).select(
        "doc_id",
        "source",
        "epoch",
        F.least(F.col("nt"), F.col("quota") - F.col("cum_before")).alias(
            "tokens_taken"
        ),
    )
    occ = fulls.unionByName(par)
    occ2 = occ.withColumn("k", _mix_key(F.col("epoch"), F.col("doc_id"))).withColumn(
        "shard", _mix_shard(F.col("k"))
    )
    wpos = W.partitionBy("epoch", "shard").orderBy("k", "doc_id")
    return occ2.select(
        "doc_id",
        "source",
        "epoch",
        "shard",
        F.row_number().over(wpos).cast("long").alias("pos"),
        F.col("tokens_taken").cast("long").alias("tokens_taken"),
    )
