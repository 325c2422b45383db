"""Driver-contract smoke tests (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"d", "event_type", "n", "total_value"}


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every oracle-checked query should dominate; rows-only is the exception
    assert len(oracles) >= 25


def test_window_tuples_are_disjoint_and_full():
    """PRIORITY_FIRST is the driver's 50-slot correctness window: every
    name must be registered, none may also sit in DEMOTE_LAST (the
    `n not in first` guard in _ordered would mask it until a refactor
    didn't), and the window must fill all 50 slots by itself."""
    from ssafynews_data_spark.registry import DEMOTE_LAST, PRIORITY_FIRST, load_all

    qs = load_all()
    assert len(PRIORITY_FIRST) == 50
    assert len(set(PRIORITY_FIRST)) == 50
    missing = [n for n in PRIORITY_FIRST if n not in qs]
    assert not missing, missing
    overlap = set(PRIORITY_FIRST) & set(DEMOTE_LAST)
    assert not overlap, overlap
    assert list(qs)[:50] == list(PRIORITY_FIRST)


def test_all_queries_return_dataframes(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.schema is not None, name
        assert df.columns, name
