"""The offline preprocess/bootstrap composite (SURVEY.md §3.3) — the
pandas notebook (preprocess/datashow.ipynb) as one lazy DataFrame chain.

Chain (cells 19→47): dropna(title, reporter, article) → strip control
chars → len(article) > 100 → select/reorder → rename to DB names →
sequential id → constant summary → author contains '기자' ∧ len<30 →
truncate author to 255.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.functions.strings import strip_control_chars, truncate
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


def clean_articles(raw: DataFrame, reporter_token: str = "기자") -> DataFrame:
    """datashow.ipynb cells 19-47 as one narrow chain + one window-free
    id assignment.  No action until the caller writes/collects."""
    cleaned = (
        raw.na.drop(subset=["title", "reporter", "article"])  # P6, cell 19
        .withColumn("article", strip_control_chars(F.col("article")))  # F1, cell 23
        .filter(F.length("article") > 100)  # P8, cell 25
        .filter(
            F.col("reporter").contains(reporter_token)
            & (F.length("reporter") < 30)
        )  # P9, cells 37/57
        .select("title", "reporter", "link", "article", "published", "category")  # P11
        .withColumnRenamed("reporter", "author")  # P12, cell 31
        .withColumnRenamed("article", "full_text")
        .withColumnRenamed("published", "updated")
        .withColumn("summary", F.lit("summary"))  # P13, cell 33
        .withColumn("author", truncate(F.col("author"), 255))  # F4, cell 45
    )
    return cleaned


@register(
    "preprocess_source_counts",
    oracle="""
        SELECT source, count(*) AS n,
               floor(CAST(sum(n_chars) * 100 AS DOUBLE) / count(*) + 0.5)
                   / 100 AS avg_chars
        FROM documents
        WHERE text IS NOT NULL AND length(text) > 100
        GROUP BY source
    """,
    tags=("P6", "P8", "composite"),
)
def preprocess_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The preprocess chain's filter backbone (dropna + length predicate)
    applied to the documents fixture, summarized per source.

    avg_chars quantizes via the avg_half_up construction (money.py):
    round(avg(int), 2) is an INTEGER-QUOTIENT emission — sum/count
    lands exactly on the half-cent lattice whenever the denominator
    divides cleanly (the class virgin seed 577215 caught in
    tokenizer_fertility_stats: 4341/800 = 5.42625, Spark 5.4263 vs
    DuckDB 5.4262) — floor over the one IEEE division of
    exactly-representable integers is tie-free on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").isNotNull() & (F.length("text") > 100))
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            (
                F.floor(
                    (F.sum("n_chars") * 100).cast("double") / F.count("*")
                    + F.lit(0.5)
                ).cast("long")
                / F.lit(100.0)
            ).alias("avg_chars"),
        )
    )
