"""Grouped-map pandas surface (SURVEY.md §2.11 extension) under the
oracle gate: per-group z-score normalization via ``applyInPandas``.

The grouped-map path ships whole groups through Arrow into pandas —
the escape hatch for per-group logic Spark expressions can't state.
Z-score CAN be stated as a window expression (and that's the DuckDB
oracle), which is exactly what makes this verifiable: the pandas batch
path must reproduce the closed-form result bit-for-bit (floor-scaled).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

_OUT_SCHEMA = "event_id long, event_type string, z_q4 long"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import math

    # match SQL avg/stddev_samp exactly: plain sequential formulas, not
    # pandas' pairwise-summation .mean()/.std()
    v = pdf["value"].to_numpy()
    n = len(v)
    mean = math.fsum(v) / n if n else 0.0
    if n > 1:
        var = math.fsum((x - mean) ** 2 for x in v) / (n - 1)
        std = math.sqrt(var)
    else:
        std = 0.0
    z = [(x - mean) / std if std > 0 else 0.0 for x in v]
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "z_q4": [math.floor(x * 10000) for x in z],
        }
    )


@register(
    "zscore_grouped_pandas",
    oracle="""
        WITH s AS (
            SELECT event_id, event_type, value,
                   avg(value) OVER w AS m,
                   stddev_samp(value) OVER w AS sd,
                   count(*) OVER w AS n
            FROM events
            WINDOW w AS (PARTITION BY event_type)
        )
        SELECT event_id, event_type,
               CAST(floor(CASE WHEN n > 1 AND sd > 0
                               THEN (value - m) / sd ELSE 0.0 END * 10000)
                    AS BIGINT) AS z_q4
        FROM s
    """,
    tags=("applyInPandas", "grouped-map", "U-surface"),
    bench=True,
)
def zscore_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score through applyInPandas, hash-matched against
    the window-function formulation — proves the Arrow grouped-map path
    computes exactly what the declarative plan would.

    Scale note: grouped-map materializes each group in one worker's
    memory; for unbounded groups prefer the window form (which this
    oracle uses).  The pandas body deliberately uses fsum + the
    two-pass variance so it matches SQL avg/stddev_samp semantics
    instead of pandas' pairwise summation.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(_zscore_group, _OUT_SCHEMA)
