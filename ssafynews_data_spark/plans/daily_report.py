"""The daily-report composite (SURVEY.md §3.2) — the reference's
flagship analytics job (dags/scripts/spark_daily_report.py) re-expressed
as one cached day-slice feeding distributed aggregates.

Reference inefficiencies fixed here (SURVEY.md §4):

- the day slice is ``.cache()``d once; the reference re-scanned the JSON
  for each of its 6+ actions (:66,69,74,78,83,91);
- top-10 keywords is ``orderBy().limit(10)`` (TakeOrderedAndProject),
  not sort-everything-then-pandas-head (:69,153);
- sentiment/summary run as Arrow UDF columns, not a driver loop
  (:173-180);
- only final small aggregates ever reach the driver; the report's
  matplotlib/PDF stage (:128-271) stays outside the engine, consuming
  the returned DataFrames.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.caching import pin
from ssafynews_data_spark.functions.strings import first_sentence, truncate
from ssafynews_data_spark.functions.udfs import sentiment
from ssafynews_data_spark.operators.vectors import pca_kmeans
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table


@dataclass
class DailyReport:
    """The DataFrames behind the PDF (spark_daily_report.py:128-271)."""

    day_slice: DataFrame
    category_counts: DataFrame
    keyword_counts: DataFrame
    top10_keywords: DataFrame
    articles: DataFrame
    clusters: DataFrame | None


def build_daily_report(
    articles: DataFrame,
    report_date: str,
    date_col: str = "published_at",
    category_col: str = "category",
    keywords_col: str = "keywords",
    content_col: str = "content",
    embedding_col: str = "embedding",
    sentence_terminator: str = "다.",
) -> DailyReport:
    """P2+P3 day filter → A1 category counts → A2/T2 keyword top-10 →
    U6 sentiment + F5 summary → M1-M4 PCA/KMeans."""
    day = pin(articles.filter(
        F.to_date(F.col(date_col)) == F.to_date(F.lit(report_date))
    ))

    category_counts = (
        day.groupBy(category_col).agg(F.count("*").alias("n")).orderBy(F.desc("n"))
    )
    keyword_counts = (
        day.select(F.explode(F.col(keywords_col)).alias("keyword"))
        .groupBy("keyword")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "keyword")
    )
    top10 = keyword_counts.limit(10)

    enriched = day.withColumn(
        "sentiment", sentiment(truncate(F.col(content_col), 300))
    ).withColumn("summary_line", first_sentence(F.col(content_col), sentence_terminator))

    clusters = None
    if embedding_col in articles.columns:
        clusters = pca_kmeans(
            day.filter(F.col(embedding_col).isNotNull()), embedding_col
        )
    return DailyReport(day, category_counts, keyword_counts, top10, enriched, clusters)


@register(
    "daily_category_report",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS d, event_type AS category, count(*) AS n
        FROM events
        WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
        GROUP BY 1, 2
    """,
    tags=("A1", "P3", "composite"),
)
def daily_category_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's category-count report for one day
    (spark_daily_report.py:62-70) on the events fixture: date-equality
    filter (pushed to the scan) then group-count.  On the engine's
    partitioned archive layout this filter is partition pruning."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
        .filter(F.col("d") == "2024-01-15")
        .groupBy("d", F.col("event_type").alias("category"))
        .agg(F.count("*").alias("n"))
    )
