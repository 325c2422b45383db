"""Driver-local DataFrames without the defaultParallelism fan-out.

``spark.createDataFrame(rows)`` slices the local list into
``sc.defaultParallelism`` partitions — 32 tasks (each a Python-worker
round-trip) to materialize a contract row, a centroid list, or a
KB-sized quantizer meta frame.  Measured on local[32] at sf0.1: a
136-row quantizer-meta frame cost 3.1 s to ``count()`` and 5-7 s to
write through the 32-slice path, vs 0.4 s through one slice — pure
scheduling + Python-worker overhead, zero compute.  On a real cluster
the fan-out is worse (one task per core across the fleet for a
driver-resident list).

``local_df`` is the drop-in replacement: same rows, same schema, same
verification semantics (PySpark applies schema verification inside the
prepare step either way) — only the slice count changes, sized at one
partition per 50k rows.  Every caller in this package passes
driver-bounded data (contract rows, centroid lists, collected
aggregate results), so this is 1-2 partitions in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: rows per partition for driver-local data — far above every bounded
#: driver list in the package (contract rows, centroids, meta frames).
_ROWS_PER_SLICE = 50_000


def local_df(spark: SparkSession, data, schema=None, slices: int | None = None) -> DataFrame:
    """``spark.createDataFrame(data, schema)`` with a sane slice count
    for driver-local lists.  Non-list inputs (pandas frames, RDDs) and
    empty lists pass straight through to ``createDataFrame``."""
    if not isinstance(data, (list, tuple)) or len(data) == 0:
        return (
            spark.createDataFrame(data, schema)
            if schema is not None
            else spark.createDataFrame(data)
        )
    n = slices if slices is not None else (len(data) - 1) // _ROWS_PER_SLICE + 1
    rdd = spark.sparkContext.parallelize(list(data), n)
    return (
        spark.createDataFrame(rdd, schema)
        if schema is not None
        else spark.createDataFrame(rdd)
    )
