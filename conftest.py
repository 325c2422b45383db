"""Repo-root conftest so tests import the package from the source tree.

Also registers the ``reseed`` marker: the oracle-robustness gate
(tests/test_reseed_gate.py) regenerates a reseeded fixture and runs the
full oracle mirror over it — slow, so it is SELECTED only explicitly
(``pytest -m reseed``) and auto-skipped from plain ``pytest tests/``
runs.
"""

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "reseed: regenerate a reseeded fixture and run the full oracle"
        " mirror over it (slow; run with `pytest -m reseed`)",
    )


def pytest_collection_modifyitems(config, items):
    markexpr = config.getoption("-m", default="") or ""
    if "reseed" in markexpr:
        return  # explicitly requested — run it
    skip = pytest.mark.skip(reason="oracle-robustness gate: run with -m reseed")
    for item in items:
        if "reseed" in item.keywords:
            item.add_marker(skip)
