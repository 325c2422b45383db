"""Head-to-head: engine daily-report vs a reference-shaped baseline.

The reference's only analytics job is ``dags/scripts/spark_daily_report.py``.
This harness re-creates its *execution shape* (not its code) and runs the
engine's form of the same computation on identical synthetic news data:

reference shape (SURVEY.md §3.2/§4)          engine shape
---------------------------------------      ------------------------------
multiline JSON scan, schema inference        partitioned parquet, declared schema
no cache: every action re-scans              day slice cached once
row-at-a-time Python UDF (array→vector)      built-in array_to_vector
full day's articles toPandas, driver-side    Arrow pandas_udf sentiment column
  per-row sentiment loop
sort-all → pandas head(10)                   orderBy().limit(10)

Usage: python tools/bench_vs_reference.py [n_articles]
Prints one JSON line {"reference_shape_sec": .., "engine_sec": .., "speedup": ..}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def make_articles(spark, n: int):
    """Deterministic news-shaped rows: ~70% on the report date."""
    from pyspark.sql import functions as F

    cats = ["IT_과학", "경제", "정치", "사회일반", "스포츠"]
    kw = ["경제", "정책", "기술", "시장", "혁신", "데이터", "환경", "교육"]
    df = (
        spark.range(n)
        .withColumn("title", F.concat(F.lit("기사 "), F.col("id")))
        .withColumn(
            "published_at",
            F.when(F.col("id") % 10 < 7, F.lit("2025-05-24 09:00:00")).otherwise(
                F.lit("2025-05-23 09:00:00")
            ).cast("timestamp"),
        )
        .withColumn("category", F.element_at(F.array(*[F.lit(c) for c in cats]), (F.col("id") % 5 + 1).cast("int")))
        .withColumn(
            "keywords",
            F.array(
                F.element_at(F.array(*[F.lit(k) for k in kw]), (F.col("id") % 8 + 1).cast("int")),
                F.element_at(F.array(*[F.lit(k) for k in kw]), (F.col("id") % 7 + 1).cast("int")),
                F.lit("공통키워드"),
            ),
        )
        .withColumn(
            "content",
            F.concat(F.lit("본문이다. 빠르게 성장한다. fast slow 내용 "), F.col("id")),
        )
        .withColumn(
            "embedding",
            F.when(
                F.col("id") % 10 != 0,
                F.array(*[(F.hash(F.col("id"), F.lit(i)) % 1000 / 1000.0) for i in range(8)]),
            ),
        )
    )
    return df.select(
        "id", "title", "published_at", "category", "keywords", "content", "embedding"
    )


def run_reference_shape(spark, json_dir: str, date: str):
    """The reference's exact action sequence (spark_daily_report.py:55-98,
    121-125,153,173-180): inferred multiline JSON, no caching, row UDF,
    driver-side loops."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import PCA
    from pyspark.ml.linalg import Vectors, VectorUDT
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df = spark.read.option("multiline", "true").json(json_dir)  # :55 inference
    daily = df.withColumn("published_date", F.to_date("published_at")).filter(
        F.col("published_date") == date
    )
    assert daily.count() > 0  # :66 — action 1, full re-scan
    category_counts = (
        daily.groupBy("category").count().orderBy(F.desc("count")).toPandas()  # :68-70
    )
    keyword_counts = (
        daily.withColumn("keyword", F.explode("keywords"))
        .groupBy("keyword").count().orderBy(F.desc("count")).toPandas()  # :72-75
    )
    top10 = keyword_counts.head(10)  # :153 — sort-all then pandas head
    articles = daily.select("id", "title", "content", "keywords", "category").toPandas()  # :77-79
    emb = daily.dropna(subset=["embedding"])
    assert emb.count() > 1  # :83 — another full re-scan
    to_vec = F.udf(lambda a: Vectors.dense(a), VectorUDT())  # :38-41 row UDF
    vec_df = emb.withColumn("v", to_vec("embedding"))
    pca = PCA(k=2, inputCol="v", outputCol="p").fit(vec_df)  # :87-89
    red = pca.transform(vec_df)
    km = KMeans(k=5, seed=42, featuresCol="v", predictionCol="c").fit(red)  # :91-94
    clusters = km.transform(red).select("title", "p", "c").toPandas()  # :96
    # :173-180 driver-side per-article loop (sentiment stand-in + summary)
    sentiments = []
    for _, row in articles.iterrows():
        text = (row["content"] or "")[:300]
        toks = text.lower().split()
        pos = sum(w in ("fast", "big") for w in toks)
        neg = sum(w in ("slow", "error") for w in toks)
        label = "긍정" if pos > neg else ("부정" if neg > pos else "중립")
        summary = text.split("다.")[0] + "다." if "다." in text else text[:40]
        sentiments.append((label, summary))
    return time.perf_counter() - t0, (len(category_counts), len(top10), len(clusters), len(sentiments))


def run_engine(spark, parquet_dir: str, date: str):
    """The engine composite on the same data (plans/daily_report.py)."""
    from ssafynews_data_spark.plans.daily_report import build_daily_report

    t0 = time.perf_counter()
    articles = spark.read.parquet(parquet_dir)
    rpt = build_daily_report(articles, date)
    assert rpt.day_slice.count() > 0
    category_counts = rpt.category_counts.collect()
    top10 = rpt.top10_keywords.collect()
    enriched = rpt.articles.select("id", "sentiment", "summary_line").collect()
    clusters = rpt.clusters.collect()
    return time.perf_counter() - t0, (len(category_counts), len(top10), len(clusters), len(enriched))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ssafynews_data_spark import get_session

    spark = get_session(app_name="bench_vs_reference")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="bench_ref_")
    try:
        df = make_articles(spark, n)
        parquet_dir = os.path.join(work, "parquet")
        json_dir = os.path.join(work, "json")
        df.write.parquet(parquet_dir)
        # the reference's archive files are JSON *arrays* (one array per
        # file, data/news_archive/sample.json) read with multiline=true —
        # unsplittable: one task per file, full-document parse
        os.makedirs(json_dir)
        rows = df.toJSON().collect()
        n_files = 8
        per = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            chunk = rows[i * per : (i + 1) * per]
            if not chunk:
                continue
            with open(os.path.join(json_dir, f"part{i}.json"), "w") as f:
                f.write("[\n" + ",\n".join(chunk) + "\n]")

        ref_s, ref_shape = run_reference_shape(spark, json_dir, "2025-05-24")
        eng_s, eng_shape = run_engine(spark, parquet_dir, "2025-05-24")
        out = {
            "n_articles": n,
            "reference_shape_sec": round(ref_s, 2),
            "engine_sec": round(eng_s, 2),
            "speedup": round(ref_s / eng_s, 2),
            "ref_outputs": ref_shape,
            "engine_outputs": eng_shape,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
