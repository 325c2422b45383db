"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries (``bench=True`` in the registry) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute + collect-to-count) after
one untimed warmup of the session (JVM/codegen warmup is not what we're
measuring; per-query JIT still counts).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ssafynews_data_spark import get_session, registry

    spark = get_session(app_name="ssafynews-bench")
    qs = registry.load_all()
    bench = {n: q.fn for n, q in sorted(qs.items()) if q.bench}

    # Session warmup: tiny jobs so executor threads, codegen, MLlib class
    # loading, and the Arrow/pandas path exist before the first timed
    # query (JVM cold-start is a constant, not a property of any query).
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tiny = spark.range(16).select(
        F.col("id"), array_to_vector(F.array(F.rand(1), F.rand(2))).alias("vec")
    )
    lsh_model = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="h", bucketLength=1.0, seed=1
    ).fit(tiny)
    lsh_model.approxSimilarityJoin(tiny, tiny, 10.0, distCol="d").count()
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import PCA

    KMeans(k=2, seed=1, featuresCol="vec").fit(tiny)
    PCA(k=1, inputCol="vec", outputCol="p").fit(tiny)
    spark.range(16).toPandas()
    # spin up the executor-side Python worker pool (mapInPandas /
    # grouped-map queries otherwise pay interpreter+Arrow startup in
    # their first timed run — an environment constant, not query cost)
    spark.range(64).repartition(4).mapInPandas(lambda it: it, "id long").count()

    from ssafynews_data_spark.caching import release_pins

    def run_set(d: str) -> dict[str, float]:
        t: dict[str, float] = {}
        for name, fn in bench.items():
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            t[name] = round(time.perf_counter() - t0, 3)
            release_pins()  # keep storage memory flat between queries
            print(f"# {name} @{d}: {t[name]:.3f}s ({n} rows)", file=sys.stderr)
        return t

    timings = run_set(sf_dir)

    # Secondary small-SF pass: separates fixed fit/JIT cost from
    # data-proportional shuffle cost round-over-round (VERDICT r1 §6).
    secondary = os.environ.get("SPARK_GRAFT_BENCH_SECONDARY", "/root/testdata/sf0.01")
    timings_small = run_set(secondary) if os.path.isdir(secondary) else {}

    out = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_secondary_sf": timings_small,
        "sf": sf,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
