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


def test_anomaly_zscore_matches_stddev_samp_form(spark, sf_dir):
    """The integer-moment z-score (engine form since the seed-551
    reseed catch) must equal (n - mu)/sd from avg/stddev_samp within
    fp tolerance — the rewrite changed the ARITHMETIC PATH to one both
    engines compute bit-identically, not the statistic."""
    from pyspark.sql import Window as W

    from ssafynews_data_spark.operators.timeseries import daily_count_anomalies
    from ssafynews_data_spark.sources.readers import load_table

    got = {
        (r.event_type, r.day): (r.zscore, r.is_anomaly)
        for r in daily_count_anomalies(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    ref = (
        daily.withColumn("mu", F.avg("n").over(w))
        .withColumn("sd", F.stddev_samp("n").over(w))
        .filter(F.col("sd").isNotNull() & (F.col("sd") > 0))
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            ((F.col("n") - F.col("mu")) / F.col("sd")).alias("z"),
        )
    )
    refs = {(r.event_type, r.day): r.z for r in ref.collect()}
    assert set(got) == set(refs)
    for k, z in refs.items():
        assert abs(got[k][0] - z) <= 0.005 + 1e-9, (k, got[k], z)
        assert got[k][1] == (abs(z) > 3.0) or abs(abs(z) - 3.0) < 1e-9, (k, got[k], z)
