"""Block-level curation extensions: boilerplate removal, training-window
chunking, count-min heavy hitters, and an Arrow-native stats pass.

None of these exist in the reference (its cleaning stops at per-article
regex passes, collect/consumer.py:100-116) — they are the corpus-level
ops an LLM training-data pipeline runs after per-document cleaning:

- **boilerplate block removal** is the RefinedWeb / CCNet "drop
  duplicated lines" pass re-expressed over fixed-width token blocks
  (the synthetic corpus has no newlines, so the dedup *unit* is a
  token block; the Spark shape — explode units, count distinct docs
  per unit, anti-join the frequent set, reassemble in order — is
  identical to line-level dedup on real web text).
- **token chunk windows** is the max-seq-len packing precursor: split
  every document into overlapping L-token windows (stride S) so long
  documents become multiple training rows without losing boundary
  context.
- **count-min heavy hitters** mirrors hll_daily_user_sketches
  (relational3.py): per-day mergeable sketches whose union equals the
  whole-range sketch — the incremental-rollup architecture for "top
  users overall" without re-scanning history.
- **arrow byte stats** exercises ``mapInArrow`` — the zero-copy Arrow
  RecordBatch API underneath the pandas paths; for byte-level stats
  pyarrow.compute on the raw batch skips the pandas conversion both
  directions.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.operators.text import tokens_col, _DUCK_TOKENS
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

#: token-block width for boilerplate removal (the "line" stand-in).
BLOCK_W = 4
#: a block string occurring in >= this many distinct docs is boilerplate.
BOILER_MIN_DOCS = 3

#: training-window length / stride (tokens).  Overlap = L - S.
CHUNK_L = 32
CHUNK_S = 24

#: count-min sketch depth (hash rows) and width (buckets per row).
CMS_D = 4
CMS_W = 512


def _doc_blocks(docs: DataFrame, w: int) -> DataFrame:
    """(doc_id, bi, btoks, h): non-overlapping w-token blocks in order,
    with the block's xxhash64.  The token array is pinned so
    CollapseProject can't re-inline the tokenizer regex into the
    per-block lambda (the O(len²) trap, dedup.py:49); the trailing
    partial block is kept as a (shorter) unit so every token belongs to
    exactly one block."""
    toks = pin(docs.select("doc_id", tokens_col(F.col("text")).alias("toks")))
    n = F.size(F.col("toks"))
    nb = F.ceil(n / F.lit(float(w))).cast("int")  # n < 2^31 ≪ 2^53: exact
    blocks = F.transform(
        F.sequence(F.lit(1), nb),
        lambda i: F.struct(
            i.alias("bi"), F.slice(F.col("toks"), (i - 1) * w + 1, w).alias("btoks")
        ),
    )
    guarded = F.when(n > 0, blocks).otherwise(
        F.array().cast("array<struct<bi:int,btoks:array<string>>>")
    )
    return toks.select(
        "doc_id", F.explode(guarded).alias("b")
    ).select(
        "doc_id",
        F.col("b.bi").alias("bi"),
        F.col("b.btoks").alias("btoks"),
        F.xxhash64("b.btoks").alias("h"),
    )


@register(
    "boilerplate_block_removal",
    oracle=f"""
        WITH tok AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
        bl AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, CAST(ceil(len(toks) / {BLOCK_W}.0) AS BIGINT) + 1),
                       i -> {{'bi': i,
                             'btext': array_to_string(
                                 toks[(i-1)*{BLOCK_W}+1 : i*{BLOCK_W}], ' ')}}
                   )) AS b
            FROM tok
        ),
        blocks AS (SELECT doc_id, b.bi AS bi, b.btext AS btext FROM bl),
        boiler AS (
            SELECT btext FROM blocks GROUP BY btext
            HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
        ),
        kept AS (
            SELECT b.doc_id,
                   count(*) AS n_kept,
                   array_to_string(list(b.btext ORDER BY b.bi), ' ') AS kept_text
            FROM blocks b ANTI JOIN boiler USING (btext)
            GROUP BY 1
        ),
        sizes AS (SELECT doc_id, count(*) AS n_blocks FROM blocks GROUP BY 1)
        SELECT s.doc_id, s.n_blocks,
               coalesce(k.n_kept, 0) AS n_kept_blocks,
               coalesce(k.kept_text, '') AS kept_text
        FROM sizes s LEFT JOIN kept k USING (doc_id)
    """,
    tags=("curation", "dedup", "boilerplate"),
    bench=True,
)
def boilerplate_block_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove text blocks that repeat across >= BOILER_MIN_DOCS distinct
    documents (headers, navboxes, templated footers) and reassemble each
    document from its surviving blocks in original order — RefinedWeb's
    line-wise filter with a fixed-width token block as the line unit.

    100 TB shape: one explode + two hash aggregates on the 64-bit block
    hash (distinct-doc count, then per-doc reassembly) and one anti
    equi-join — shuffle-linear in total blocks, never all-pairs, no
    driver-side state.  The boilerplate set is the frequency tail above
    the threshold (small by Zipf), so at scale the anti-join qualifies
    for Spark's broadcast / runtime-bloom pruning automatically.  The
    engine joins on xxhash64(block tokens) while the oracle joins on the
    block string — equivalent because tokens contain no spaces (see
    contamination.py's injectivity note; property-tested in
    tests/test_properties.py)."""
    docs = load_table(spark, sf_dir, "documents")
    blocks = pin(_doc_blocks(docs, BLOCK_W))
    boiler = (
        blocks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("h", F.lit(True).alias("is_boiler"))
    )
    # mark-then-aggregate: ONE shuffle on doc_id (vs anti-join + separate
    # sizes aggregate = two doc_id exchanges + an extra join).  Kept
    # blocks are the ones the broadcast left join didn't mark.
    marked = blocks.join(F.broadcast(boiler), "h", "left")
    kept_structs = F.filter(
        F.array_sort(F.collect_list(F.struct("bi", "is_boiler", "btoks"))),
        lambda s: s["is_boiler"].isNull(),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.col("is_boiler").isNull().cast("long")).alias("n_kept_blocks"),
        F.array_join(
            F.flatten(F.transform(kept_structs, lambda s: s["btoks"])), " "
        ).alias("kept_text"),
    )


@register(
    "token_chunk_windows",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, {_DUCK_TOKENS} AS toks,
                   len({_DUCK_TOKENS}) AS n
            FROM documents
        ),
        nc AS (
            SELECT doc_id, toks,
                   CASE WHEN n <= 0 THEN 0
                        WHEN n <= {CHUNK_L} THEN 1
                        ELSE 1 + (n - {CHUNK_L} + {CHUNK_S - 1}) // {CHUNK_S}
                   END AS n_chunks
            FROM tok
        ),
        ch AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, n_chunks + 1),
                       i -> {{'cid': i,
                             'ctoks': toks[(i-1)*{CHUNK_S}+1
                                           : (i-1)*{CHUNK_S}+{CHUNK_L}]}})) AS c
            FROM nc
        )
        SELECT doc_id, c.cid AS chunk_id,
               CAST(len(c.ctoks) AS BIGINT) AS n_chunk_tokens,
               array_to_string(c.ctoks, ' ') AS chunk_text
        FROM ch
    """,
    tags=("curation", "chunking", "training-prep"),
)
def token_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping CHUNK_L-token windows with
    stride CHUNK_S (overlap L-S), the standard max-seq-len preparation
    for training rows: every token is covered, long documents become
    multiple rows, and window boundaries overlap so no context is cut
    mid-sequence.  The final window may be shorter (never padded here —
    padding is the tokenizer's job downstream).

    100 TB shape: a narrow per-row transform (sequence → slice →
    posexplode), zero shuffle, fully codegen'd; output row count is
    ~n_tokens/S so the op is scan-bound.  Chunk counts use integer
    arithmetic (``(n-L+S-1) div S``) — never float floor/ceil — per the
    cross-engine rule (readers.py:68)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = pin(docs.select("doc_id", tokens_col(F.col("text")).alias("toks")))
    t = toks.withColumn("n", F.size("toks")).withColumn(
        "n_chunks",
        F.when(F.col("n") <= 0, F.lit(0))
        .when(F.col("n") <= CHUNK_L, F.lit(1))
        .otherwise(F.expr(f"1 + (n - {CHUNK_L} + {CHUNK_S - 1}) div {CHUNK_S}"))
        .cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.col("n_chunks")),
        lambda i: F.struct(
            i.alias("cid"),
            F.slice(F.col("toks"), (i - 1) * CHUNK_S + 1, CHUNK_L).alias("ctoks"),
        ),
    )
    guarded = F.when(F.col("n_chunks") > 0, chunks).otherwise(
        F.array().cast("array<struct<cid:int,ctoks:array<string>>>")
    )
    return t.select("doc_id", F.explode(guarded).alias("c")).select(
        "doc_id",
        F.col("c.cid").alias("chunk_id"),
        F.size("c.ctoks").cast("long").alias("n_chunk_tokens"),
        F.array_join("c.ctoks", " ").alias("chunk_text"),
    )


def _cms_bucket_rows(ev: DataFrame) -> DataFrame:
    """(day, user_id, r, b): each event lands in CMS_D (row, bucket)
    cells; bucket = xxhash64(user_id, seed=r) mod CMS_W, all JVM-side."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(F.xxhash64(F.col("user_id"), F.lit(r)), F.lit(CMS_W))
                .cast("int")
                .alias("b"),
            )
            for r in range(CMS_D)
        ]
    )
    return ev.select(
        F.to_date("ts").alias("day"), "user_id", F.explode(cells).alias("c")
    ).select("day", "user_id", F.col("c.r").alias("r"), F.col("c.b").alias("b"))


def cms_daily_sketches(ev: DataFrame) -> DataFrame:
    """(day, r, b, cnt): one count-min sketch per day — D*W counters,
    mergeable by summing cell-wise (tested in
    tests/test_curation_blocks.py: union-of-days == whole-range)."""
    return (
        _cms_bucket_rows(ev)
        .groupBy("day", "r", "b")
        .agg(F.count("*").alias("cnt"))
    )


@register("cms_heavy_hitters", tags=("sketch", "count-min", "approx"))
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by count-min-estimated event count, with the exact
    count alongside.  The 100 TB architecture mirror of
    hll_daily_user_sketches: per-day D×W-counter sketches are built in
    one pass and merged cell-wise (sum), so "top users over any date
    range" needs only the tiny sketch table — never a re-scan or
    re-shuffle of raw events.  Estimates are min-over-rows of the
    merged counters: always >= the true count (one-sided error), within
    εN with probability 1-δ for W=e/ε, D=ln(1/δ).

    Rows-only check (bucket hashing is engine-specific); the sketch
    guarantees — est >= exact everywhere, day-union == whole-range —
    are asserted in tests/test_curation_blocks.py."""
    ev = load_table(spark, sf_dir, "events")
    merged = (
        cms_daily_sketches(ev)
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    keys = ev.select("user_id").distinct()
    key_cells = _cms_bucket_rows(
        ev.select("ts", "user_id")
    ).select("user_id", "r", "b").distinct()
    est = (
        key_cells.join(merged, ["r", "b"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_count"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    return (
        est.join(exact, "user_id")
        .orderBy(F.col("est_count").desc(), F.col("user_id"))
        .limit(10)
    )


@register(
    "arrow_byte_stats",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(strlen(text) - length(text) AS BIGINT) AS n_multibyte_extra
        FROM documents
    """,
    tags=("arrow", "mapInArrow", "U-api"),
)
def arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 byte/char stats via ``mapInArrow`` — the zero-copy Arrow
    RecordBatch API underneath the pandas UDF paths.  pyarrow.compute
    kernels (binary_length = bytes, utf8_length = codepoints) run
    directly on the Arrow buffers with no pandas materialization in
    either direction — the right call when the per-batch work is itself
    columnar.  Byte-vs-char deltas locate multibyte (CJK etc.) content
    for storage budgeting.

    100 TB shape: narrow map, zero shuffle; Arrow batch size is
    spark.sql.execution.arrow.maxRecordsPerBatch.  Oracle: DuckDB
    strlen() is bytes, length() is codepoints — same split as
    pyarrow's binary_length/utf8_length."""
    import pyarrow as pa

    def batch_stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            n_bytes = pc.cast(pc.binary_length(text), pa.int64())
            n_chars = pc.cast(pc.utf8_length(text), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    n_bytes,
                    n_chars,
                    pc.subtract(n_bytes, n_chars),
                ],
                ["doc_id", "n_bytes", "n_chars", "n_multibyte_extra"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        batch_stats,
        "doc_id long, n_bytes long, n_chars long, n_multibyte_extra long",
    )


@register(
    "token_rarity_scores",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents
        ),
        vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
        ppm AS (
            SELECT token, (cnt * 1000000) // total AS freq_ppm
            FROM vocab, tot
        )
        SELECT t.doc_id,
               count(*) AS n_tokens,
               CAST(sum(p.freq_ppm) AS BIGINT) // count(*) AS avg_freq_ppm,
               min(p.freq_ppm) AS min_freq_ppm
        FROM tok t JOIN ppm p USING (token)
        GROUP BY 1
    """,
    tags=("curation", "quality", "unigram-lm"),
)
def token_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM scoring in exact integer form — the CCNet/perplexity
    filter's distributable core: each token's corpus frequency in parts
    per million (an integer-exact rational, never float log — floating
    Σ log p would be summation-order- and libm-dependent across
    engines), aggregated per document as mean and min.  Low avg ppm ≈
    rare-token-heavy (OCR garbage or jargon); min ppm flags docs
    carrying hapax tokens.  Thresholding these buckets into
    head/middle/tail per source is exactly CCNet's split.

    100 TB shape: vocab build = one explode + hash agg (map-side
    combine, rows-per-distinct-token); per-doc score = equi-join of the
    exploded corpus with the vocab on token — Zipf makes the vocab far
    smaller than the corpus, and integer sums commute so partial
    aggregation is exact no matter the shuffle order."""
    docs = load_table(spark, sf_dir, "documents")
    tok = pin(
        docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))
    )
    vocab = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    total = tok.agg(F.count("*").alias("total"))
    ppm = vocab.crossJoin(F.broadcast(total)).select(
        "token", F.expr("(cnt * 1000000) div total").alias("freq_ppm")
    )
    return (
        tok.join(ppm, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.expr("sum(freq_ppm) div count(*)").alias("avg_freq_ppm"),
            F.min("freq_ppm").alias("min_freq_ppm"),
        )
    )


@register(
    "dq_constraint_checks",
    oracle="""
        SELECT 'customer_key_unique' AS constraint_name,
               (SELECT count(*) - count(DISTINCT c_custkey) FROM customer) AS n_violations,
               (SELECT count(*) FROM customer) AS n_checked
        UNION ALL
        SELECT 'orders_custkey_fk',
               (SELECT count(*) FROM orders o ANTI JOIN customer c
                ON o.o_custkey = c.c_custkey),
               (SELECT count(*) FROM orders)
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
               (SELECT count(*) FROM lineitem l ANTI JOIN orders o
                ON l.l_orderkey = o.o_orderkey),
               (SELECT count(*) FROM lineitem)
        UNION ALL
        SELECT 'orders_totalprice_positive',
               (SELECT count(*) FROM orders WHERE o_totalprice <= 0),
               (SELECT count(*) FROM orders)
        UNION ALL
        SELECT 'documents_text_nonempty',
               (SELECT count(*) FROM documents
                WHERE text IS NULL OR length(text) = 0),
               (SELECT count(*) FROM documents)
        UNION ALL
        SELECT 'events_ts_in_range',
               (SELECT count(*) FROM events
                WHERE ts < TIMESTAMP '2020-01-01' OR ts > TIMESTAMP '2030-01-01'),
               (SELECT count(*) FROM events)
    """,
    tags=("data-quality", "constraints", "deequ"),
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deequ-style data-quality gate: declarative constraints
    (uniqueness, referential integrity, ranges, non-emptiness) evaluated
    in one pass each, emitting a violation ledger the pipeline can
    assert on before publishing a snapshot — the missing guardrail in
    the reference's ingest (its consumer upserts whatever arrives,
    collect/consumer2.py).

    100 TB shape: uniqueness is a count-distinct aggregate; FK checks
    are LEFT ANTI equi-joins (dimension side broadcast when small);
    range/null checks are row-local counts.  Each constraint is
    independent, so the checks parallelize as separate stages over one
    scan per table."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    def check(name: str, viol, checked) -> DataFrame:
        return viol.crossJoin(checked).select(
            F.lit(name).alias("constraint_name"),
            F.col("v").alias("n_violations"),
            F.col("c").alias("n_checked"),
        )

    uniq = cust.agg(
        (F.count("*") - F.countDistinct("c_custkey")).alias("v")
    )
    fk_orders = orders.join(
        F.broadcast(cust.select("c_custkey")),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count("*").alias("v"))
    fk_li = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count("*").alias("v"))
    price = orders.agg(
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("v")
    )
    empty_docs = docs.agg(
        F.sum(
            (F.col("text").isNull() | (F.length("text") == 0)).cast("long")
        ).alias("v")
    )
    ts_range = ev.agg(
        F.sum(
            (
                (F.col("ts") < F.lit("2020-01-01").cast("timestamp"))
                | (F.col("ts") > F.lit("2030-01-01").cast("timestamp"))
            ).cast("long")
        ).alias("v")
    )
    n_cust = cust.agg(F.count("*").alias("c"))
    n_orders = orders.agg(F.count("*").alias("c"))
    n_li = li.agg(F.count("*").alias("c"))
    n_docs = docs.agg(F.count("*").alias("c"))
    n_ev = ev.agg(F.count("*").alias("c"))
    out = check("customer_key_unique", uniq, n_cust)
    for name, v, c in [
        ("orders_custkey_fk", fk_orders, n_orders),
        ("lineitem_orderkey_fk", fk_li, n_li),
        ("orders_totalprice_positive", price, n_orders),
        ("documents_text_nonempty", empty_docs, n_docs),
        ("events_ts_in_range", ts_range, n_ev),
    ]:
        out = out.unionByName(check(name, v, c))
    return out


#: fixed BM25 demo query + parameters (Robertson/Sparck-Jones defaults).
BM25_TERMS = ("spark", "window", "join")
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "bm25_topk",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {_DUCK_TOKENS} AS toks,
                   len({_DUCK_TOKENS}) AS dl
            FROM documents
        ),
        s AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS total FROM d),
        df AS (
            SELECT
              sum(CASE WHEN list_contains(toks, 'spark')  THEN 1 ELSE 0 END) AS df0,
              sum(CASE WHEN list_contains(toks, 'window') THEN 1 ELSE 0 END) AS df1,
              sum(CASE WHEN list_contains(toks, 'join')   THEN 1 ELSE 0 END) AS df2
            FROM d
        ),
        sc AS (
            SELECT doc_id,
              ln((n - df0 + 0.5)/(df0 + 0.5) + 1.0)
                * (len(list_filter(toks, x -> x = 'spark')) * ({BM25_K1} + 1.0))
                / (len(list_filter(toks, x -> x = 'spark'))
                   + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / (total / n)))
            + ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0)
                * (len(list_filter(toks, x -> x = 'window')) * ({BM25_K1} + 1.0))
                / (len(list_filter(toks, x -> x = 'window'))
                   + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / (total / n)))
            + ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0)
                * (len(list_filter(toks, x -> x = 'join')) * ({BM25_K1} + 1.0))
                / (len(list_filter(toks, x -> x = 'join'))
                   + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / (total / n)))
              AS score
            FROM d, s, df
        )
        SELECT doc_id, round(score, 4) + 0.0 AS bm25
        FROM sc
        ORDER BY bm25 DESC, doc_id
        LIMIT 20
    """,
    tags=("retrieval", "bm25", "ranking"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking for a fixed keyword query — the lexical-retrieval
    leg of a data-curation stack (mining topic subsets, hard negatives
    for embedding training).  Everything is JVM expressions: tf =
    size(filter(toks, =term)), document frequency and avgdl come from
    ONE tiny stats aggregate broadcast back to the scan, and the
    three-term sum is written in fixed order so Spark and DuckDB
    produce bit-identical doubles (per-row arithmetic only — no
    float reduction across rows anywhere).

    100 TB shape: corpus scanned once, zero shuffle until the global
    top-k (TakeOrderedAndProject); the stats row is a broadcast.  For
    ad-hoc many-term queries, the production variant is an inverted
    postings table (token → doc ids) — built here already by
    ``token_rarity_scores``'s vocab aggregate shape."""
    docs = load_table(spark, sf_dir, "documents")
    d = pin(
        docs.select("doc_id", tokens_col(F.col("text")).alias("toks")).withColumn(
            "dl", F.size("toks")
        )
    )
    stats = d.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("total"),
        *[
            F.sum(F.array_contains("toks", t).cast("long")).alias(f"df{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    sc = d.crossJoin(F.broadcast(stats))
    score = None
    for i, t in enumerate(BM25_TERMS):
        tf = F.size(F.filter(F.col("toks"), lambda x: x == F.lit(t)))
        idf = F.log(
            (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1.0
        )
        norm = tf + BM25_K1 * (
            1.0 - BM25_B + BM25_B * F.col("dl") / (F.col("total") / F.col("n"))
        )
        term = idf * (tf * (BM25_K1 + 1.0)) / norm
        score = term if score is None else score + term
    return (
        sc.select("doc_id", (F.round(score, 4) + 0.0).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


#: minimum document frequency for a term to enter the postings index.
POSTINGS_MIN_DF = 5


@register(
    "inverted_postings_index",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest({_DUCK_TOKENS}) AS token
            FROM documents
        )
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
        FROM tok GROUP BY token HAVING count(*) >= {POSTINGS_MIN_DF}
    """,
    tags=("retrieval", "index", "postings"),
)
def inverted_postings_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build — token → sorted posting list of doc ids —
    the batch side of the BM25/lexical-retrieval stack (`bm25_topk`
    scores a fixed query inline; ad-hoc queries hit this index
    instead).  Postings are emitted as a comma-joined string for the
    cross-engine hash (arrays round-trip differently through pandas).

    100 TB shape: explode + distinct + ONE hash aggregate on token —
    Zipf caps distinct (doc, token) pairs far below raw token count,
    and the per-token collect is bounded by document frequency.  At
    web scale the head terms ('the') get posting lists of ~every doc:
    production splits those into blocked/skip-list postings — here the
    HAVING df >= {POSTINGS_MIN_DF} threshold is the frequency floor,
    and a ceiling would shard by hash(doc_id) div block_size into
    (token, block) rows with the same aggregate shape."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("token")
        )
        .distinct()
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings"
            ),
        )
        .filter(F.col("df") >= POSTINGS_MIN_DF)
    )


@register(
    "cms_heavy_hitters_contract",
    oracle="""
        WITH exact AS (
            SELECT user_id, count(*) AS exact_count
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(exact_count AS BIGINT) AS exact_count,
               true AS est_ge_exact,
               true AS est_within_eps
        FROM exact
        ORDER BY exact_count DESC, user_id
        LIMIT 10
    """,
    tags=("sketch", "count-min", "contract"),
)
def cms_heavy_hitters_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min guarantees as a driver-hashable row: for the top-10
    users BY EXACT COUNT (exact ranking so both engines pick the same
    rows; the sketch's own ranking is engine-specific), assert the
    one-sided error (est ≥ exact, a structural CMS property) and the
    εN bound with ε = e/W (Cormode-Muthukrishnan; W=512 counters/row,
    D=4 rows makes the failure probability e^-4 ≈ 1.8% per key — the
    fixture draw passes deterministically).  The oracle recomputes the
    exact side and expects both booleans true."""
    import math

    ev = load_table(spark, sf_dir, "events")
    merged = cms_daily_sketches(ev).groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))
    key_cells = (
        _cms_bucket_rows(ev.select("ts", "user_id"))
        .select("user_id", "r", "b")
        .distinct()
    )
    est = (
        key_cells.join(merged, ["r", "b"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_count"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    n_total = ev.count()
    eps = math.e / CMS_W
    return (
        exact.join(est, "user_id")
        .orderBy(F.desc("exact_count"), "user_id")
        .limit(10)
        .select(
            "user_id",
            F.col("exact_count").cast("long").alias("exact_count"),
            (F.col("est_count") >= F.col("exact_count")).alias("est_ge_exact"),
            (F.col("est_count") <= F.col("exact_count") + eps * n_total).alias(
                "est_within_eps"
            ),
        )
    )
