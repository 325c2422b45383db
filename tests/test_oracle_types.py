"""Static oracle TYPE gate — no Spark needed (~5s).

Round 10's only driver failures (4/50) were a TYPE divergence, not a
value divergence: an oracle emitting a bare ``sum(BIGINT)`` is typed
HUGEINT by DuckDB (int128 -> pandas float64) while the Spark side emits
LONG, and the driver's order-insensitive value-hash is type-sensitive
(``161810.0`` != ``161810``).  Python ``==`` — used by the local mirror
pre-r11 — is blind to that class, which is why six virgin seeds, three
scale factors, and a --plain session all ran clean while the driver
failed.

This gate DESCRIBEs every registered oracle in DuckDB against the
sf0.001 views and fails on any column type outside an explicit
allowlist of (DuckDB type -> Spark toPandas kind) pairs known to
hash-match:

    BIGINT / INTEGER  <->  int64 / int32   (kind i)
    DOUBLE            <->  float64         (kind f)
    BOOLEAN           <->  bool            (kind b)
    VARCHAR           <->  object          (kind O)

Everything else fails loudly: HUGEINT/UHUGEINT/UBIGINT land as float64
or uint (the round-10 class), DECIMAL widens scale under sum() and
lands as object/float64, FLOAT truncates, DATE/TIMESTAMP/LIST/STRUCT
have engine-specific pandas mappings nobody has certified here — add a
pair to the allowlist only WITH a driver-green row proving it.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssafynews_data_spark import registry
from ssafynews_data_spark.sources.readers import TESTDATA_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TYPEGATE_SF", "/root/testdata/sf0.001")

#: The ONLY DuckDB result-column types a registered oracle may emit.
ALLOWED_DUCKDB_TYPES = frozenset({"BIGINT", "INTEGER", "DOUBLE", "BOOLEAN", "VARCHAR"})


def _connect() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _offending_columns(con, sql: str) -> list[tuple[str, str]]:
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(col, typ) for col, typ, *_ in rows if typ not in ALLOWED_DUCKDB_TYPES]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_no_oracle_emits_disallowed_duckdb_type():
    qs = registry.load_all()
    con = _connect()
    bad: dict[str, list[tuple[str, str]]] = {}
    for name, q in sorted(qs.items()):
        if q.oracle is None:
            continue
        off = _offending_columns(con, q.oracle)
        if off:
            bad[name] = off
    assert not bad, (
        "oracle columns outside the certified type allowlist "
        f"{sorted(ALLOWED_DUCKDB_TYPES)} — wrap integer sums as "
        f"CAST(sum(...) AS BIGINT) etc.: {bad}"
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_gate_catches_bare_bigint_sum():
    """The gate must FIRE on the exact round-10 defect shape."""
    con = _connect()
    off = _offending_columns(
        con,
        "SELECT sum(CAST(round(o_totalprice) AS BIGINT)) AS s FROM orders",
    )
    assert off == [("s", "HUGEINT")]
    # and pass once wrapped per the repo convention
    assert (
        _offending_columns(
            con,
            "SELECT CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS s FROM orders",
        )
        == []
    )


def test_mirror_kind_mismatch_detector_fires():
    """tools/check_oracles.kind_mismatches must distinguish int64 vs
    float64 (Python == is True on equal values — the r10 blind spot)."""
    import pandas as pd

    from tools.check_oracles import kind_mismatches

    sdf = pd.DataFrame({"x": pd.Series([161810], dtype="int64")})
    odf = pd.DataFrame({"x": pd.Series([161810.0], dtype="float64")})
    assert kind_mismatches(sdf, odf) == {"x": ("i", "f")}
    # equal kinds -> clean
    assert kind_mismatches(sdf, sdf.copy()) == {}
    # int32 vs int64 is the SAME kind (driver hash sees Python ints)
    odf32 = pd.DataFrame({"x": pd.Series([161810], dtype="int32")})
    assert kind_mismatches(sdf, odf32) == {}
    # all-NULL columns are excluded (dtype degrades arbitrarily)
    sn = pd.DataFrame({"x": pd.Series([None], dtype="object")})
    on = pd.DataFrame({"x": pd.Series([float("nan")], dtype="float64")})
    assert kind_mismatches(sn, on) == {}
