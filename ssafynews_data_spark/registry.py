"""Query registry — the single source for ``__spark_entry__.py``.

Every operator from SURVEY.md §2 (plus the north-star dedup /
similarity / text-analysis extensions) registers itself here as a named
query ``(spark, sf_dir) -> DataFrame`` with, when SQL-expressible, a
DuckDB oracle string.  The driver compares Spark vs DuckDB results by
row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- dates/timestamps are emitted as formatted strings;
- floating aggregates are rounded (``round(x, 2)`` for money sums,
  more digits for similarities) so FP summation order can't flip bits.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module so registrations run, return registry."""
    import ssafynews_data_spark.operators  # noqa: F401  (side-effect imports)
    import ssafynews_data_spark.plans  # noqa: F401

    return QUERIES


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items() if q.bench}
