"""End-to-end test of the spark-submit daily-report job (reference
parity: dags/scripts/spark_daily_report.py invocation shape)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

import daily_report_job  # noqa: E402

from tests.test_plans import _articles  # noqa: E402


def test_job_end_to_end(spark, tmp_path):
    src = str(tmp_path / "articles")
    out = str(tmp_path / "report")
    _articles(spark).write.parquet(src)
    rc = daily_report_job.main(
        ["--date", "2025-05-24", "--input", src, "--output", out]
    )
    assert rc == 0
    cats = spark.read.parquet(os.path.join(out, "category_counts"))
    assert cats.count() == 3
    top = spark.read.parquet(os.path.join(out, "top10_keywords"))
    assert top.count() <= 10
    arts = spark.read.parquet(os.path.join(out, "articles_enriched"))
    assert "sentiment" in arts.columns and "summary_line" in arts.columns
    summary = spark.read.parquet(os.path.join(out, "summary")).collect()[0]
    assert summary.n == 30
    clusters = spark.read.parquet(os.path.join(out, "clusters"))
    assert clusters.count() == arts.filter(F.col("summary_line").isNotNull()).count() - 6  # 24 with embeddings


def test_job_empty_day(spark, tmp_path):
    src = str(tmp_path / "articles")
    out = str(tmp_path / "report")
    _articles(spark).write.parquet(src)
    rc = daily_report_job.main(["--date", "1999-01-01", "--input", src, "--output", out])
    assert rc == 0
    summary = spark.read.parquet(os.path.join(out, "summary")).collect()[0]
    assert summary.n == 0
    assert not os.path.exists(os.path.join(out, "category_counts"))
