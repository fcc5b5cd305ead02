"""Round-9 scale fixes (VERDICT r8 items 3/5/7 + ADVICE r8 medium):

- dup_clusters adaptive stats-reset cadence: small label frames skip the
  parquet round-trip insurance (the sf0.1 regression r8 introduced) while
  results stay bit-identical on every path.
- semantic_dedup_pairs_delta finds duplicates AMONG the arrivals even when
  the delta has not been merged into the corpus yet (the ADVICE r8 trap).
- choose_semantic_cap: the documented sizing rule that turns the
  dedup_semantic_cap_sweep readout into a max_cluster_size default,
  exercised on the Zipf-skewed fixture (the corpus shape the cap exists
  for).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from degenerate_data import write_skewed  # noqa: E402


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skewed-sf-r9"))
    write_skewed(d)
    return d


def test_dup_clusters_adaptive_reset_bit_identical_all_paths(spark, tmp_path):
    """The adaptive cadence (small frame -> backstop period, big frame ->
    the sf10-proven period) must not change RESULTS: a 40-link chain that
    forces many propagation rounds yields identical labels with the
    small-frame path (default floor: 41 nodes << 2M), the forced big-frame
    path (floor 0), per-round resets, and resets disabled."""
    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    small_frame = sorted(map(tuple, dup_clusters(pairs).collect()))
    big_frame = sorted(
        map(tuple, dup_clusters(pairs, stats_reset_min_nodes=0).collect())
    )
    every_round = sorted(
        map(tuple, dup_clusters(pairs, stats_reset_every=1).collect())
    )
    disabled = sorted(
        map(tuple, dup_clusters(pairs, stats_reset_every=0).collect())
    )
    assert small_frame == big_frame == every_round == disabled
    assert len(small_frame) == 41 and all(c == 0 for _, c in small_frame)


def test_dup_clusters_small_frame_skips_parquet_roundtrip(spark, tmp_path):
    """Below the node floor the reset period widens to the backstop (12),
    so a typical small-corpus run writes ZERO scratch parquet — the r8
    +70%/+40% sf0.1 regression on dedup_cluster_pareto/_family_agreement
    recovered. The 40-link chain converges in ~8 rounds (pointer jumping),
    under the backstop; with the floor forced to 0 the same run pays a
    round-trip at round 6. The scratch dir is caller-provided so the test
    can observe exactly what was written."""
    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    small_scratch = str(tmp_path / "small")
    os.makedirs(small_scratch)
    dup_clusters(pairs, scratch_dir=small_scratch).collect()
    assert os.listdir(small_scratch) == [], "small frame paid a stats reset"

    big_scratch = str(tmp_path / "big")
    os.makedirs(big_scratch)
    dup_clusters(pairs, scratch_dir=big_scratch, stats_reset_min_nodes=0).collect()
    assert any(
        d.startswith("labels-") for d in os.listdir(big_scratch)
    ), "big-frame path no longer takes the sf10-proven round-trip"


def test_semantic_delta_finds_pairs_among_unmerged_arrivals(spark):
    """ADVICE r8 (medium): a caller who dedups today's arrivals against the
    PRE-MERGE corpus must still find duplicates among the arrivals
    themselves. Corpus: spread vectors, none near any other. Delta: two
    near-identical new vectors absent from the corpus — the only true pair
    is delta-delta and must be emitted exactly once."""
    from k8s_vectordb_sync_spark.operators.similarity import (
        semantic_dedup_pairs_delta,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 0.0, 1.0]),
            (5, [-1.0, 0.0, 0.0, 0.0]),
            (6, [0.0, -1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    delta = spark.createDataFrame(
        [(900, [0.7, 0.7, 0.0, 0.0]), (901, [0.69, 0.71, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = semantic_dedup_pairs_delta(
        corpus, delta, threshold=0.95, n_clusters=2, iterations=2
    ).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    assert (900, 901) in pairs, "delta-delta duplicate among arrivals missed"
    assert len(got) == len(pairs), "pair emitted more than once"
    # and with delta ⊆ corpus the extra branch changes nothing (subset case
    # = the registered query's posture; oracle parity rests on this)
    merged = corpus.unionByName(delta)
    sub = semantic_dedup_pairs_delta(
        merged, delta, threshold=0.95, n_clusters=2, iterations=2
    ).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in sub} == pairs


def test_choose_semantic_cap_on_skewed_fixture(spark, skewed_dir):
    """The sizing rule on the corpus shape the cap exists for: the Zipf
    fixture's embeddings collapse ~30% of rows into one mega-cluster.
    choose_semantic_cap must return a SWEPT cap whose exact-cosine pair
    volume respects the linear budget, and every larger swept cap must
    violate it (i.e. the helper picks the recall-maximal safe cap, not just
    any safe cap)."""
    from k8s_vectordb_sync_spark.operators.similarity import choose_semantic_cap
    from k8s_vectordb_sync_spark.queries import QUERIES

    sweep = QUERIES["dedup_semantic_cap_sweep"](spark, skewed_dir)
    rows = {r["cap"]: r for r in sweep.collect()}
    assert rows, "sweep produced no rows on the skewed fixture"
    budget = 8.0
    cap = choose_semantic_cap(sweep, pairs_per_row_budget=budget)
    assert cap in rows
    total = rows[cap]["rows_kept"] + rows[cap]["overflow_rows"]
    fitting = [
        c for c, r in rows.items() if r["candidate_pairs"] <= budget * total
    ]
    assert cap == (max(fitting) if fitting else min(rows)), (
        "helper disagrees with the documented rule"
    )


def test_choose_semantic_cap_degenerate_budget_returns_smallest(spark):
    """If even the smallest swept cap blows the budget (fully collapsed
    corpus), return the smallest — the routed overflow branch owns mass
    duplication in O(n)."""
    from k8s_vectordb_sync_spark.operators.similarity import choose_semantic_cap

    sweep = spark.createDataFrame(
        [
            (10, 0, 0, 10_000, 100),
            (35, 1, 100, 50_000, 0),
        ],
        "cap long, clusters_kept long, rows_kept long, "
        "candidate_pairs long, overflow_rows long",
    )
    assert choose_semantic_cap(sweep, pairs_per_row_budget=1.0) == 10

    empty = sweep.filter(F.col("cap") < 0)
    with pytest.raises(ValueError, match="empty cap sweep"):
        choose_semantic_cap(empty)
