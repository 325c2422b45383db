"""Probe: does Spark eliminate the repeated tokenizer subexpression in
the curation gate (interpreted/fallback path, higher-order functions)?

The llm_corpus_pipeline/curate_corpus gate filter inlines
``filter(split(lower(text)))`` ~15x per row (plans/r13/
llm_corpus_pipeline_after.txt node 2).  Whole-stage codegen cannot fuse
higher-order functions, so the filter runs on the fallback path; if
subexpression elimination does not apply there, the corpus-pass cost of
the gate is ~15 tokenizations per document instead of one.

Method: time ``select(sum-of-k-copies of size(tokens_col(text)))``
through the noop sink for k = 1 and k = 8.  CSE active => flat; absent
=> ~linear in k.  A second, filter-shaped probe (the gate is a Filter
node, which takes a different evaluation path than Project) ANDs k
distinct ``size(tokens) >= i`` predicates.

Measured (sf0.1, 3 reps, this round): projection 0.52 -> 0.42 s
(ratio 0.80), filter 0.28 -> 0.24 s (ratio 0.88) — flat in k both
ways, CSE active on the non-codegen path, no change needed.

Usage: python tools/probe_cse.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ssafynews_data_spark import get_session
from ssafynews_data_spark.operators.text import tokens_col
from ssafynews_data_spark.sources.readers import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session(app_name="probe-cse")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    docs = load_table(spark, sf_dir, "documents").select("text")

    def timed(k: int) -> float:
        col = reduce(
            lambda a, b: a + b,
            [F.size(tokens_col(F.col("text"))) for _ in range(k)],
        )
        df = docs.select(col.alias("s"))
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return statistics.median(runs)

    def timed_filter(k: int) -> float:
        pred = reduce(
            lambda a, b: a & b,
            [F.size(tokens_col(F.col("text"))) >= (i + 1) for i in range(k)],
        )
        df = docs.filter(pred).select(F.length("text").alias("n"))
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return statistics.median(runs)

    t1 = timed(1)
    t8 = timed(8)
    print(f"project k=1: {t1:.3f}s   k=8: {t8:.3f}s   ratio: {t8 / t1:.2f}")
    f1 = timed_filter(1)
    f8 = timed_filter(8)
    print(f"filter  k=1: {f1:.3f}s   k=8: {f8:.3f}s   ratio: {f8 / f1:.2f}")
    flat = t8 < 2.5 * t1 and f8 < 2.5 * f1
    print("CSE ACTIVE (flat)" if flat else "NO CSE (linear in k)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
