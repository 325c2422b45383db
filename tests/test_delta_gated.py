"""Delta-backed transactional MERGE INTO (VERDICT r1 #5), gated on the
delta-spark package + session extension actually being present.  The CI
image has neither (no network to resolve the jar), so these skip with
the precise missing precondition; `merge_upsert` / `scd2_apply` remain
the always-available emulations and are oracle-checked."""

from __future__ import annotations

import pytest

delta = pytest.importorskip("delta", reason="delta-spark not installed")

from ssafynews_data_spark.operators.merge import merge_into_delta  # noqa: E402


def _delta_session_ready(spark) -> bool:
    try:
        ext = spark.conf.get("spark.sql.extensions", "")
    except Exception:
        ext = ""
    return "DeltaSparkSessionExtension" in (ext or "")


def test_merge_into_delta_upserts(spark, tmp_path):
    if not _delta_session_ready(spark):
        pytest.skip("session built without Delta SQL extension/catalog")

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    base.write.format("delta").save(path)

    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    merge_into_delta(spark, path, updates, key="k")

    got = sorted(
        (r.k, r.v) for r in spark.read.format("delta").load(path).collect()
    )
    assert got == [(1, "a"), (2, "B"), (3, "c")]
