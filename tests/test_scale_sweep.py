"""Wall-time scaling guard for the headline queries (VERDICT r5 item 7).

Shuffle-budget pins freeze the PLAN; this guard watches the DATA-driven
terms — LSH bucket skew, candidate-pair explosion, per-cluster GEMM
growth — by timing each headliner at two row scales built by the same
perturbed-replication scheme as tools/scale_sweep.py (byte-identical
copies would make pair output quadratic in the replication factor by
construction; the perturbation keeps within-copy structure and makes
cross-copy pairs non-duplicates, so output and cost scale ~linearly).

The bound is deliberately loose — min-of-2 runs, 15x allowed on 10x
docs (4x embeddings) — because the machine is co-tenant: the guard is
for catching quadratic blow-up (which reads ~100x on docs queries),
not for benchmarking.  The real exponent table lives in docs/SCALE.md
(tools/scale_sweep.py, three scales, measured solo).
"""

from __future__ import annotations

import importlib.util
import os
import time

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "scale_sweep",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "scale_sweep.py"),
)
scale_sweep = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(scale_sweep)


@pytest.fixture(scope="module")
def sweep_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sweep")
    small = str(root / "small")
    big = str(root / "big")
    scale_sweep.build_scale(spark, small, "/root/testdata/sf0.01", 1)
    scale_sweep.build_scale(spark, big, "/root/testdata/sf0.1", 1)
    return small, big


@pytest.mark.parametrize("qname", scale_sweep.HEADLINERS)
def test_headliner_scales_subquadratically(spark, sweep_dirs, qname):
    from ssafynews_data_spark import registry
    from ssafynews_data_spark.caching import release_pins

    small, big = sweep_dirs
    fn = scale_sweep.query_fn(registry.load_all(), qname)

    def best_of_two(d: str) -> float:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            # force_full, not count(): see scale_sweep.force_full — a
            # bare count lets Catalyst eliminate unique-key left joins
            scale_sweep.force_full(fn(spark, d))
            runs.append(time.perf_counter() - t0)
            release_pins()
        return min(runs)

    t_small = best_of_two(small)
    t_big = best_of_two(big)
    # 10x docs / 4x embeddings; linear-with-overhead stays well under
    # 15x, quadratic candidate blow-up reads ~100x on the docs queries.
    assert t_big <= max(10.0, 15.0 * t_small), (
        f"{qname}: {t_small:.2f}s -> {t_big:.2f}s on 10x docs/4x emb "
        "(super-linear blow-up)"
    )


def test_only_filter_rejects_unknown_names():
    """A typo'd --only must exit non-zero BEFORE measuring anything — an
    empty sweep that prints 'super-linear: none' and exits 0 would read
    as a green certification artifact while certifying nothing."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "tools/scale_sweep.py", "--only=no_such_query"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 2
    assert "not in HEADLINERS" in proc.stderr
