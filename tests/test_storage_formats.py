"""ORC surface: pushdown/pruning evidence; Avro availability gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssafynews_data_spark.operators import storage_formats
from ssafynews_data_spark.sources.readers import load_table


def test_orc_roundtrip_loses_nothing(spark, sf_dir):
    path = storage_formats.write_orc(spark, sf_dir)
    back = spark.read.orc(path)
    src = load_table(spark, sf_dir, "documents")
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)


def test_orc_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = (
        storage_formats.orc_roundtrip_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "lang" in plan
    # the aggregate needs source/lang/n_chars/text — doc_id must be pruned
    import re

    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "doc_id" not in m.group(1), m.group(0) if m else plan[:1500]


def test_avro_roundtrip_if_available(spark, sf_dir, tmp_path):
    """spark-avro is an external package; prove the hop when present,
    skip honestly when not (same gating pattern as Kafka/Delta)."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    path = str(tmp_path / "docs_avro")
    try:
        docs.write.mode("overwrite").format("avro").save(path)
    except Exception as e:  # noqa: BLE001 — absence manifests as AnalysisException
        if "avro" in str(e).lower() or "FAILED_FIND_DATA_SOURCE" in str(e):
            pytest.skip("spark-avro package not on the classpath")
        raise
    back = spark.read.format("avro").load(path)
    assert back.count() == 50
    assert (
        back.agg(F.sum("n_chars")).collect()[0][0]
        == docs.agg(F.sum("n_chars")).collect()[0][0]
    )
