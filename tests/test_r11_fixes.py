"""Round-11 fixes pinned by fast unit tests:

- DIAGNOSTIC_QUERIES makes "quadratic reference forms never enter a timing
  set" a registry invariant consumed by bench.py, not a listing choice
  (VERDICT r10 item 5).
- power_iteration_top_component raises a diagnostic ValueError on an
  all-NULL embedding dimension instead of arr_lit's bare TypeError /
  the historical silent-NULL propagation (ADVICE r10).
- _scan_footprints refuses truncated FileScan column lists, and
  build_spark pins spark.sql.debug.maxToStringFields so truncation cannot
  occur in the first place (ADVICE r10).
- The registered semantic cap is the documented static posture; the
  choose_semantic_cap sizing rule stays the production path (VERDICT r10
  item 6) — its all-overflow behavior (the committed sf0.1 readout) is
  pinned here.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_benched_set_excludes_diagnostic_queries():
    import bench
    from k8s_vectordb_sync_spark.queries import DIAGNOSTIC_QUERIES, QUERIES

    assert DIAGNOSTIC_QUERIES, "tag set must not silently empty out"
    assert DIAGNOSTIC_QUERIES <= set(QUERIES), (
        "every diagnostic tag must name a registered query"
    )
    assert not set(bench.BENCH_QUERIES) & DIAGNOSTIC_QUERIES


def test_bench_refuses_diagnostic_subset():
    """Even the env-var subset path cannot smuggle a diagnostic query into
    a timing run — bench.py exits before building a session."""
    env = dict(
        os.environ, SPARK_GRAFT_BENCH_QUERIES="dedup_semantic_indexed_diagnostic"
    )
    proc = subprocess.run(
        [sys.executable, "-c", "import bench"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "diagnostic" in (proc.stdout + proc.stderr)


def test_power_iteration_null_dim_raises(spark):
    from k8s_vectordb_sync_spark.operators.similarity import (
        power_iteration_top_component,
    )

    df = spark.createDataFrame(
        [([1.0, None],), ([2.0, None],)], "embedding: array<double>"
    )
    with pytest.raises(ValueError, match="NULL in every row"):
        power_iteration_top_component(df, iterations=1, dim=2)


def test_scan_footprint_rejects_truncated_column_list():
    from tests.test_plan_lint import _scan_footprints

    plan = (
        "(1) Scan parquet \n"
        "FileScan parquet [a#1,b#2,... 3 more fields] Batched: true, "
        "Location: InMemoryFileIndex(1 paths)[file:/tmp/t.parquet], "
        "ReadSchema: struct<a:int>\n"
    )
    with pytest.raises(AssertionError, match="truncated FileScan"):
        _scan_footprints(plan)


def test_max_to_string_fields_pinned(spark):
    assert spark.conf.get("spark.sql.debug.maxToStringFields") == "1000"


def test_choose_semantic_cap_all_overflow_picks_largest():
    """The committed sf0.1 bench-corpus readout: every natural cluster
    exceeds every swept cap, zero candidate pairs anywhere — the rule keeps
    the largest (highest-recall) cap, 140, while the registry pins 70 as
    the demonstration value that BINDS at the small SFs (documented at
    _SEMANTIC_MAX_CLUSTER)."""
    from k8s_vectordb_sync_spark.operators.similarity import choose_semantic_cap
    from k8s_vectordb_sync_spark.queries import _SEMANTIC_MAX_CLUSTER

    sf01_readout = [
        {"cap": c, "clusters_kept": 0, "rows_kept": 0,
         "candidate_pairs": 0, "overflow_rows": 2000}
        for c in (10, 35, 70, 140)
    ]
    assert choose_semantic_cap(sf01_readout) == 140
    assert _SEMANTIC_MAX_CLUSTER == 70
