"""Composite-pipeline tests on news-shaped fixtures (daily report §3.2,
preprocess §3.3)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ssafynews_data_spark.plans.daily_report import build_daily_report
from ssafynews_data_spark.plans.preprocess import clean_articles


def _articles(spark, n=40, report_date="2025-05-24"):
    rng = np.random.default_rng(42)
    cats = ["IT_과학", "경제", "정치"]
    rows = []
    for i in range(n):
        day = report_date if i % 4 != 0 else "2025-05-23"
        emb = [float(x) for x in rng.standard_normal(8)] if i % 5 else None
        rows.append(
            (
                i,
                f"제목 {i}",
                f"기자 {i % 3} 기자",
                f"https://n.example/{i}",
                "요약입니다.",
                f"본문 {i} 이다. 다음 문장이다. fast slow",
                f"{day} 09:{i % 60:02d}:00",
                cats[i % 3],
                ["키워드A", f"키워드{i % 5}"],
                emb,
            )
        )
    schema = (
        "id long, title string, author string, link string, summary string, "
        "content string, published_at string, category string, "
        "keywords array<string>, embedding array<float>"
    )
    return spark.createDataFrame(rows, schema).withColumn(
        "published_at", F.to_timestamp("published_at")
    )


def test_daily_report_bundle(spark):
    rpt = build_daily_report(_articles(spark), "2025-05-24")
    n_day = rpt.day_slice.count()
    assert n_day == 30
    assert rpt.category_counts.count() == 3
    top = rpt.top10_keywords.collect()
    assert len(top) <= 10
    assert top[0].keyword == "키워드A"  # appears in every row
    arts = rpt.articles.collect()
    assert all(r.summary_line.endswith("다.") for r in arts)
    assert {r.sentiment for r in arts} <= {"긍정", "부정", "중립", "-"}
    assert rpt.clusters is not None
    assert rpt.clusters.count() == rpt.day_slice.filter(F.col("embedding").isNotNull()).count()


def test_daily_report_empty_day(spark):
    rpt = build_daily_report(_articles(spark), "1999-01-01")
    assert rpt.day_slice.count() == 0  # reference empty-day path (:107-112)
    assert rpt.category_counts.count() == 0


def test_clean_articles_chain(spark):
    rows = [
        ("t1", "김기자 기자", "l1", "본\n문" + "가" * 120, "2024-01-01", "경제", "junk"),
        ("t2", None, "l2", "가" * 150, "2024-01-01", None, None),  # dropped: null reporter
        ("t3", "박 기자", "l3", "짧다", "2024-01-02", None, None),  # dropped: len <= 100
        ("t4", "no-token-author", "l4", "가" * 150, "2024-01-03", None, None),  # dropped: no 기자
    ]
    schema = (
        "title string, reporter string, link string, article string, "
        "published string, category string, category_str string"
    )
    out = clean_articles(spark.createDataFrame(rows, schema))
    got = out.collect()
    assert len(got) == 1
    r = got[0]
    assert r.author == "김기자 기자"
    assert "\n" not in r.full_text
    assert r.summary == "summary"
    assert set(out.columns) == {
        "title", "author", "link", "full_text", "updated", "category", "summary"
    }


def test_llm_pipeline_plan_shape(spark, sf_dir):
    """The full-pipeline composite keeps its scale shape: the
    decontamination reference set arrives via broadcast, the dedup
    keep-first is a partial_min aggregate (no self-join), and nothing
    degenerates into a nested-loop or cartesian join."""
    from ssafynews_data_spark.plans.pipeline import llm_corpus_pipeline

    plan = (
        llm_corpus_pipeline(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
