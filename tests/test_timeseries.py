"""Time-series completion invariants beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssafynews_data_spark.operators import timeseries
from ssafynews_data_spark.sources.readers import load_table


def test_recursive_and_generator_spines_agree(spark, sf_dir):
    a = {
        (r.user_id, r.day): (r.n, r.day_value)
        for r in timeseries.timeseries_gapfill(spark, sf_dir).collect()
    }
    b = {
        (r.user_id, r.day): (r.n, r.day_value)
        for r in timeseries.timeseries_gapfill_recursive(spark, sf_dir).collect()
    }
    assert a == b


def test_gapfill_grid_is_dense(spark, sf_dir):
    df = timeseries.timeseries_gapfill(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.filter(F.col("user_id") < timeseries.N_USERS).select(
        "user_id"
    ).distinct().count()
    n_days = (
        ev.agg(
            F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias("dd")
        ).collect()[0].dd
        + 1
    )
    assert df.count() == n_users * n_days
    # and the fill actually fills: zero-days must exist (sparse series)
    assert df.filter(F.col("n") == 0).count() > 0


def test_locf_carries_forward_not_backward(spark, sf_dir):
    rows = timeseries.timeseries_locf(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r.filled_value)
    for vals in by_type.values():
        seen = False
        for v in vals:
            if v is not None:
                seen = True
            # once a value appears, it never goes back to null
            assert not (seen and v is None)
