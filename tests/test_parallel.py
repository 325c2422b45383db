"""Focused tests for the §2.6 job-overlap helper (optimization round 13).

``run_parallel`` wraps independent driver actions (serve
materializations, artifact writes, the stale/fresh fit legs) in a small
thread pool.  The operators rely on exactly three properties: results
come back in submission order, an exception in any thunk propagates,
and the single-thunk path degenerates to a plain call.  No Spark needed
— the helper is pure concurrency plumbing.
"""

from __future__ import annotations

import threading
import time

import pytest

from ssafynews_data_spark.parallel import MAX_PARALLEL_JOBS, run_parallel


def test_results_in_submission_order():
    # make the first thunk the SLOWEST so completion order differs from
    # submission order — results must still come back positionally
    def slow():
        time.sleep(0.2)
        return "slow"

    out = run_parallel(slow, lambda: "fast1", lambda: "fast2")
    assert list(out) == ["slow", "fast1", "fast2"]


def test_single_thunk_runs_in_caller_thread():
    caller = threading.get_ident()
    out = run_parallel(lambda: threading.get_ident())
    assert list(out) == [caller]


def test_exception_propagates():
    def boom():
        raise ValueError("thunk failed")

    with pytest.raises(ValueError, match="thunk failed"):
        run_parallel(lambda: 1, boom)


def test_more_thunks_than_workers_all_run():
    n = MAX_PARALLEL_JOBS * 3 + 1
    out = run_parallel(*[lambda i=i: i * i for i in range(n)])
    assert list(out) == [i * i for i in range(n)]


def test_empty_thunks_returns_empty():
    assert list(run_parallel()) == []


def test_thunks_overlap_in_time():
    """Two sleeping thunks must run concurrently: wall well under the
    1.0 s sequential sum, with generous margin for a loaded box."""
    t0 = time.perf_counter()
    run_parallel(lambda: time.sleep(0.5), lambda: time.sleep(0.5))
    assert time.perf_counter() - t0 < 0.9
