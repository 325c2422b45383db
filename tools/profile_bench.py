"""Per-query isolation profiler (optimization guide §1).

For each selected query: set a job description, time the computation
against the NOOP sink (guide §1.4 — computes every column, no sink
cost, no count()-style column pruning), repeat N times, and write the
``.explain("formatted")`` output to ``plans/<tag>/<name>_<suffix>.txt``.

Usage:
    python tools/profile_bench.py [--sf=DIR] [--reps=N] [--tag=r13]
        [--suffix=before] [--bench2] [--plans-only] [--plain] [name ...]

``--plain`` (VERDICT r13 item 6) times against a DRIVER-SHAPED session
instead of the engine's: bare ``local[8]`` builder, no engine configs —
so the run proves the wins survive the grading driver's environment
(the engine-session conf, e.g. dataFrameDebugging=off, must not be the
only thing carrying a number).

Prints one line per query to stdout: ``name  median  min  runs``.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssafynews_data_spark import get_session, registry
from ssafynews_data_spark.caching import release_pins


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    tag = "r13"
    suffix = "before"
    use_bench2 = False
    plans_only = False
    plain = False
    names: list[str] = []
    for a in args:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        elif a == "--bench2":
            use_bench2 = True
        elif a == "--plans-only":
            plans_only = True
        elif a == "--plain":
            plain = True
        else:
            names.append(a)

    qs = registry.load_all()
    if names:
        sel = {n: qs[n] for n in names}
    else:
        sel = {
            n: q
            for n, q in sorted(qs.items())
            if (q.bench2 if use_bench2 else q.bench)
        }

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(plans_dir, exist_ok=True)

    if plain:
        # the grading driver's shape: bare builder, local[8], no engine
        # configs (check_oracles --plain uses the same philosophy)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName(f"profile-{tag}-plain")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_session(app_name=f"profile-{tag}")
    # same warmup as bench.py: JVM/codegen/Arrow paths exist before timing
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(4).mapInPandas(lambda it: it, "id long").count()

    for name, q in sel.items():
        # formatted plan (captured via the internal API so it lands in a file)
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        release_pins()
        if plans_only:
            print(f"{name}  plan written")
            continue
        runs = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            release_pins()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}  median={statistics.median(runs):.3f}  "
            f"min={min(runs):.3f}  runs={[round(r, 3) for r in runs]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
