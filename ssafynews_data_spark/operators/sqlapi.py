"""SQL-API surface (SURVEY.md §1.5 / guide 'SQL API'): the same Catalyst
plans via ``spark.sql`` over registered views — grouping sets and a
Python UDTF, the two shapes the DataFrame modules don't cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


@register(
    "grouping_sets_orders",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("grouping-sets", "sql-api"),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API — same Expand-based
    physical plan as rollup/cube, arbitrary set list."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "lateral_top_nations",
    oracle="""
        SELECT r.r_name AS region, t.n_name AS nation, t.n_cust AS n_cust
        FROM region r,
             LATERAL (
                 SELECT n.n_name, count(c.c_custkey) AS n_cust
                 FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
                 WHERE n.n_regionkey = r.r_regionkey
                 GROUP BY n.n_name
                 ORDER BY n_cust DESC, n.n_name
                 LIMIT 2
             ) t
    """,
    tags=("sql-api", "lateral"),
)
def lateral_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL API: for each region,
    the top-2 nations by customer count.  Catalyst rewrites the lateral
    into a join + per-group limit (DomainJoin → window-style plan) — the
    declarative form of "top-N per group" that arrives with ANSI lateral
    syntax rather than an explicit Window."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_lat")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT r.r_name AS region, t.n_name AS nation, t.n_cust AS n_cust
        FROM region_lat r,
             LATERAL (
                 SELECT n.n_name, count(c.c_custkey) AS n_cust
                 FROM nation_lat n LEFT JOIN customer_lat c
                      ON c.c_nationkey = n.n_nationkey
                 WHERE n.n_regionkey = r.r_regionkey
                 GROUP BY n.n_name
                 ORDER BY n_cust DESC, n.n_name
                 LIMIT 2
             ) t
        """
    )


@register(
    "exists_above_avg_orders",
    oracle="""
        SELECT c.c_mktsegment AS segment, count(*) AS n_cust
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        )
        GROUP BY 1
    """,
    tags=("sql-api", "subquery"),
)
def exists_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + uncorrelated scalar subquery through the SQL API: per
    market segment, customers holding at least one order priced above
    the global average.  Catalyst plans the scalar subquery as a
    one-row broadcast and the EXISTS as a left-semi hash join — no
    per-row re-execution (the classic decorrelation rewrite)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment, count(*) AS n_cust
        FROM customer_sq c
        WHERE EXISTS (
            SELECT 1 FROM orders_sq o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders_sq)
        )
        GROUP BY 1
        """
    )


@register(
    "udtf_token_bigrams",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
                               x -> x <> '') AS t
            FROM documents WHERE doc_id < 50
        ),
        b AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                                         i -> {'pos': i - 1, 'w1': t[i], 'w2': t[i + 1]})) AS bg
            FROM toks
        )
        SELECT doc_id, CAST(bg.pos AS INT) AS pos, bg.w1 AS w1, bg.w2 AS w2 FROM b
    """,
    tags=("udtf", "U7"),
)
def udtf_token_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface (SURVEY.md §2.11 — the reference's closest analog is
    ``explode(keywords)``): a Python UDTF emitting one row per token
    bigram.  Python UDTFs are per-row Python — fine for this demo row
    count, but the hot-path form of the same op is posexplode over an
    array column, which is what every other operator here uses."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, w1 string, w2 string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            import re

            # [\W_]+ mirrors the engine tokenizer's [^\p{L}\p{N}]+
            toks = [t for t in re.split(r"[\W_]+", (text or "").lower()) if t]
            for i in range(len(toks) - 1):
                yield doc_id, i, toks[i], toks[i + 1]

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("docs_udtf")
    spark.udtf.register("token_bigrams", Bigrams)
    return spark.sql(
        "SELECT b.* FROM docs_udtf, LATERAL token_bigrams(doc_id, text) AS b"
    )


#: ONE string, two engines: this text is BOTH the Spark query and the
#: DuckDB oracle, byte for byte — the portability proof for the SQL
#: surface (no dialect translation layer, just ANSI).
#: The money-product sum and the averages use the integer-exact forms
#: (operators/money.py rationale): CAST/round/floor are themselves
#: ANSI, and a literal round(sum(<double product>), 2) would make the
#: byte-shared text nondeterministic across the two engines' summation
#: orders whenever a group total lands on a .xx5 cent boundary.
#: Accumulation is DECIMAL(38, 0) — the overflow-proof headroom form
#: (money.sum_units rationale: int64 sums wrap silently in Spark
#: non-ANSI mode beyond ~8e7 money rows per group) — itself portable
#: ANSI: per-row arithmetic stays BIGINT-exact, only the SUM widens.
_ANSI_SHARED_Q1 = """
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           CAST(floor((sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))
                           AS DECIMAL(38, 0)))
                       + 50) / CAST(100 AS DOUBLE)) AS BIGINT)
               / CAST(100 AS DOUBLE) AS sum_disc_price,
           CAST(floor(sum(CAST(l_quantity AS DECIMAL(38, 0)))
                      * CAST(10000 AS DOUBLE)
                      / count(*) + 0.5) AS BIGINT)
               / CAST(10000 AS DOUBLE) AS avg_qty,
           CAST(floor(sum(CAST(round(l_discount * 100) AS DECIMAL(38, 0)))
                      * CAST(100 AS DOUBLE)
                      / count(*) + 0.5) AS BIGINT)
               / CAST(10000 AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@register(
    "ansi_q1_shared_text",
    oracle=_ANSI_SHARED_Q1,
    tags=("sql-api", "ansi", "portability"),
)
def ansi_q1_shared_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 from the literal SAME SQL text the oracle runs: the
    engine registers the parquet tables as views and hands the string to
    ``spark.sql`` unchanged.  Everything else in the registry pairs a
    DataFrame program with a dialect-tuned oracle; this query pins down
    that the SQL-text surface itself is portable ANSI — a user's
    existing warehouse SQL runs as-is.  Catalyst plans it identically
    to the DataFrame Q1 (same scan pushdown, same partial aggregate)."""
    from ssafynews_data_spark.sources.readers import register_views

    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_ANSI_SHARED_Q1)


@register(
    "pipe_syntax_revenue",
    oracle="""
        SELECT o_orderpriority,
               CAST(year(o_orderdate) AS INT) AS o_year,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_orderstatus <> 'P'
        GROUP BY 1, 2
        ORDER BY o_orderpriority, o_year
    """,
    tags=("sql-api", "pipe-syntax"),
)
def pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`|>`): the same Catalyst plan as the
    classic SELECT, written as a linear dataflow — the SQL dialect
    analytics users increasingly write (and the closest SQL analog of
    the DataFrame chain).  Oracle is the classic-form equivalent;
    identical results prove the dialect is sugar, not semantics."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe")
    return spark.sql(
        """
        FROM orders_pipe
        |> WHERE o_orderstatus <> 'P'
        |> EXTEND CAST(year(o_orderdate) AS INT) AS o_year
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority, o_year
        |> ORDER BY o_orderpriority, o_year
        """
    )


@register(
    "parameterized_sql_band",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               round(avg(value), 2) AS avg_value
        FROM events
        WHERE value BETWEEN 50.0 AND 150.0
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("sql-api", "parameterized"),
)
def parameterized_sql_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized ``spark.sql`` with named arguments — the
    injection-safe form of templated SQL (the reference formats queries
    with f-strings, consumer.py:137-150; named parameters bind as
    literals in the plan instead of being spliced into the text)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_param")
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n,
               round(avg(value), 2) AS avg_value
        FROM events_param
        WHERE value BETWEEN :lo AND :hi
        GROUP BY event_type
        ORDER BY event_type
        """,
        args={"lo": 50.0, "hi": 150.0},
    )


@register(
    "udtf_dynamic_topk_tokens",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
                       x -> x <> '')) AS w
            FROM documents WHERE doc_id < 50
        ),
        counts AS (
            SELECT doc_id, w, count(*) AS n FROM toks GROUP BY doc_id, w
        ),
        ranked AS (
            SELECT doc_id, w,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY n DESC, w) AS r
            FROM counts
        )
        SELECT doc_id,
               max(CASE WHEN r = 1 THEN w END) AS tok_1,
               max(CASE WHEN r = 2 THEN w END) AS tok_2,
               max(CASE WHEN r = 3 THEN w END) AS tok_3
        FROM ranked GROUP BY doc_id
    """,
    tags=("udtf", "polymorphic", "U7"),
)
def udtf_dynamic_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema — one column per requested top token — is computed at plan
    time from the literal ``k`` argument, so ``top_tokens(doc_id, text,
    3)`` and ``(…, 5)`` are different relations from one function.  The
    reference hardcodes its per-category keyword top-3
    (spark_daily_report.py:72-75); this is that report as a reusable
    table function.  Deterministic tie-break (count desc, token asc)
    matches the window-function oracle exactly."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class TopTokens:
        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument, k: AnalyzeArgument):
            from pyspark.sql.types import LongType, StringType, StructType

            schema = StructType().add("doc_id", LongType())
            for i in range(int(k.value)):
                schema = schema.add(f"tok_{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id: int, text: str, k: int):
            import re
            from collections import Counter

            toks = [t for t in re.split(r"[\W_]+", (text or "").lower()) if t]
            top = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            words = [w for w, _ in top] + [None] * (k - len(top))
            yield (doc_id, *words)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("docs_udtf_topk")
    spark.udtf.register("top_tokens", udtf(TopTokens))
    return spark.sql(
        "SELECT t.* FROM docs_udtf_topk, LATERAL top_tokens(doc_id, text, 3) AS t"
    )


@register(
    "collated_lang_counts",
    oracle="""
        WITH mixed AS (
            SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
                       AS lang_mixed
            FROM documents
        )
        SELECT lower(lang_mixed) AS lang_norm,
               count(*) AS n
        FROM mixed
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("sql-api", "collation"),
)
def collated_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION-aware grouping: half the lang codes are
    uppercased (deterministically, by doc_id parity), then grouped
    under ``UTF8_LCASE`` — case variants merge at the COMPARISON level
    instead of by rewriting values with lower() in every predicate
    (the Flink DDL's whole enrichment pipeline lowercases by hand,
    consumer2.py:40-57).  The output key is normalized for the oracle,
    which computes the same merge with lower()."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang_mixed")
    )
    return (
        mixed.groupBy(
            F.expr("collate(lang_mixed, 'UTF8_LCASE')").alias("lang_c")
        )
        .agg(F.count("*").alias("n"))
        .select(
            # collated strings keep their first-seen case — normalize for
            # the cross-engine hash (and cast away the collation so the
            # driver's Arrow transport sees a plain string)
            F.lower(F.col("lang_c").cast("string")).alias("lang_norm"),
            "n",
        )
        .orderBy("lang_norm")
    )


@register(
    "xml_roundtrip_events",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total_floor
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("sql-api", "xml"),
)
def xml_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-query XML codec (Spark 4 ``to_xml``/``from_xml``): each event
    is serialized to an XML fragment and parsed back with a declared
    schema, and the aggregate over the PARSED columns must equal the
    aggregate over the originals — the same round-trip identity
    contract as the ORC/JSONL format hops, for the XML feeds that news
    ingestion (RSS is XML, sources/feeds.py) actually ships."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    xml = ev.select(
        F.to_xml(
            F.struct(
                F.col("event_type").alias("t"),
                F.floor("value").cast("long").alias("v"),
            )
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml("x", "t STRING, v BIGINT").alias("s")
    ).select(F.col("s.t").alias("event_type"), F.col("s.v").alias("v"))
    return (
        parsed.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("v").cast("long").alias("total_floor"))
        .orderBy("event_type")
    )


@register(
    "identifier_clause_counts",
    oracle="""
        SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS n FROM events
        UNION ALL
        SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'documents', CAST(count(*) AS BIGINT) FROM documents
        ORDER BY tbl
    """,
    tags=("sql-api", "identifier"),
)
def identifier_clause_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``IDENTIFIER(:param)`` — dynamic object names bound as
    PARAMETERS instead of f-string splicing (the reference templates
    its SQL with f-strings, consumer.py:137-150; an identifier
    parameter can only ever resolve to a name, never inject syntax).
    One templated count statement runs against three different tables;
    the oracle recomputes each count directly."""
    from functools import reduce

    frames = []
    for tbl in ["documents", "events", "orders"]:
        load_table(spark, sf_dir, tbl).createOrReplaceTempView(f"idc_{tbl}")
        frames.append(
            spark.sql(
                "SELECT :name AS tbl, count(*) AS n FROM IDENTIFIER(:tbl)",
                args={"name": tbl, "tbl": f"idc_{tbl}"},
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames).orderBy("tbl")
