"""Overlap independent Spark jobs from driver threads (guide §2.6).

Several contract operators are chains of independent driver actions —
two serve pipelines materialized back-to-back, a stale and a fresh
KMeans fit, three artifact writes off one pinned frame.  Spark's
scheduler happily runs several jobs at once inside one application;
the actions are only sequential because the driver calls them
sequentially.  ``run_parallel`` submits each thunk from a small thread
pool so the next job's tasks back-fill executors freed by the current
job's tail (and, locally, so per-job scheduling latency overlaps).

Semantics are unchanged: every thunk is deterministic on its own, the
caller consumes results positionally, and an exception in any thunk
propagates (after the others finish or fail) exactly as the sequential
code would raise it.  Job descriptions are thread-local in Spark, so
concurrent jobs stay correctly labelled in the UI.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from typing import Any

#: cap on in-flight jobs per call site — guide §2.6: "2-3 jobs in
#: flight is plenty: enough to fill the tail, not so many that they
#: fight for executors".
MAX_PARALLEL_JOBS = 3


def run_parallel(*thunks: Callable[[], Any]) -> Sequence[Any]:
    """Run the thunks as concurrent Spark jobs; return results in order.

    With a single thunk this degenerates to a plain call (no thread);
    with none, to an empty result.
    """
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(len(thunks), MAX_PARALLEL_JOBS)) as pool:
        futures = [pool.submit(t) for t in thunks]
        # collect in submission order; result() re-raises the thunk's
        # exception, matching sequential behaviour
        return [f.result() for f in futures]
