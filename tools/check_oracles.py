"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and, when an oracle exists, the
DuckDB SQL on the same parquet tables; compares row-count + column-name
set + order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

# runnable as `python tools/check_oracles.py` from anywhere — no
# PYTHONPATH needed (the repo root is this file's parent's parent)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssafynews_data_spark import get_session, registry
from ssafynews_data_spark.sources.readers import TESTDATA_TABLES


def dtype_kinds(df: pd.DataFrame) -> dict[str, str]:
    """Map each column to a canonical dtype KIND (int/float/bool/
    datetime/object).  The driver's value-hash is type-sensitive
    (161810 != 161810.0) while Python ``==`` is not, so the mirror
    must compare kinds explicitly — round 10's four driver FAILs were
    DuckDB HUGEINT (-> pandas float64) vs Spark LONG (int64), invisible
    to ``canon()`` value comparison alone."""
    kinds = {}
    for c in df.columns:
        k = df[c].dtype.kind
        kinds[c] = {"u": "i"}.get(k, k)  # unsigned counts as int
    return kinds


def kind_mismatches(sdf: pd.DataFrame, odf: pd.DataFrame) -> dict[str, tuple[str, str]]:
    """Columns whose dtype KINDS diverge between engine and oracle.
    An all-NULL column degrades to object/float arbitrarily on either
    side, so those are excluded — everything else is a divergence the
    driver's type-sensitive hash would fail."""
    sk, ok = dtype_kinds(sdf), dtype_kinds(odf)
    return {
        c: (sk[c], ok[c])
        for c in sk
        if c in ok
        and sk[c] != ok[c]
        and not (sdf[c].isna().all() or odf[c].isna().all())
    }


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif hasattr(v, "item"):
                vals.append(v.item())
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def run_checks(
    sf_dir: str,
    only: set[str] | frozenset[str] = frozenset(),
    plain: bool = False,
    spark=None,
    oracled_only: bool = False,
) -> list[str]:
    """The mirror as an importable function (the pytest reseed gate
    calls it — tests/test_reseed_gate.py); returns the failure list.
    ``spark=None`` builds the engine session (or a bare driver-faithful
    one with ``plain``); pass an existing session to reuse it."""
    qs = registry.load_all()
    unknown = set(only) - set(qs)
    if unknown:
        # a typo'd name must not read as "0 failures", and must not read
        # as a REAL oracle failure either (the reseed gate would report
        # "oracles overfit" for a misspelling) — it is a usage error
        raise ValueError(f"unknown query name(s): {sorted(unknown)}")
    if spark is None and plain:
        # driver-faithful: a bare session with NONE of the engine configs
        # (the grading driver builds its own) — every query must self-heal
        # via _ensure_session_conf
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("check_oracles_plain")
            .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
            .config("spark.ui.enabled", "false")
            # keep result lines readable: progress bars \r over stdout
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    elif spark is None:
        spark = get_session(app_name="check_oracles")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        if oracled_only and q.oracle is None:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if q.oracle is None:
            print(f"ok    {name}: rows-only ({len(sdf)} rows, {dt:.1f}s)")
            continue
        try:
            odf = con.execute(q.oracle).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(sdf)} vs {len(odf)}")
            continue
        kind_bad = kind_mismatches(sdf, odf)
        if kind_bad:
            failures.append(name)
            print(f"FAIL  {name}: TYPE-MISMATCH (spark_kind, oracle_kind): {kind_bad}")
            continue
        a, b = canon(sdf), canon(odf)
        if a != b:
            failures.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diff}")
            continue
        print(f"PASS  {name} ({len(sdf)} rows, {dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return failures


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--plain"]
    plain = "--plain" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    try:
        failures = run_checks(sf_dir, only=set(args[1:]), plain=plain)
    except ValueError as e:
        print(f"ERROR: {e}")
        return 2  # usage error, distinct from exit 1 = oracle failures
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
