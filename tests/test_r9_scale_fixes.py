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
    recovered. The 200-link chain converges in 8 loop rounds (the r13 init
    fold absorbs round 1, pointer jumping shortcuts the rest), under the
    backstop; with the floor forced to 0 the same run pays a round-trip at
    round 6. (Round 14: was a 40-link chain, which the init fold brought
    down to 6 rounds — converging ON the reset boundary, so the round-trip
    stopped firing; the r13 tail commits landed after that round's full
    pytest, so the miss surfaced here.) The scratch dir is caller-provided
    so the test can observe exactly what was written."""
    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
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


def test_semantic_delta_capped_keeps_empty_corpus_clusters(spark):
    """ADVICE r9 (medium): with max_cluster_size set, a delta pair assigned
    to a cluster with ZERO corpus members (occupancy 0 <= cap) must still be
    emitted. Explicit centroids pin the assignment: the corpus lives wholly
    in dims 3/4 (cluster 0), the two near-identical arrivals in dims 1/2
    (cluster 1, empty on the corpus side). An inner join against kept
    corpus clusters would drop them; the anti-join against OVERSIZED
    clusters keeps them."""
    from k8s_vectordb_sync_spark.operators.similarity import (
        semantic_dedup_pairs_delta,
    )

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0, 1.0, 0.0]), (2, [0.0, 0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    delta = spark.createDataFrame(
        [(900, [0.7, 0.7, 0.0, 0.0]), (901, [0.69, 0.71, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    centroids = [[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 0.0, 0.0]]
    got = semantic_dedup_pairs_delta(
        corpus, delta, threshold=0.95, centroids=centroids, max_cluster_size=10
    ).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    assert (900, 901) in pairs, "capped path dropped the empty-cluster arrivals"
    # and the cap still bites: cap=1 makes the corpus cluster (size 2)
    # oversized -- its members leave the cosine branch -- while the
    # empty-on-the-corpus-side delta cluster is untouched.
    capped = semantic_dedup_pairs_delta(
        corpus, delta, threshold=0.95, centroids=centroids, max_cluster_size=1
    ).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in capped} == {(900, 901)}


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


# ---------------------------------------------------------------------------
# VERDICT r8 item 4: self-sizing index rebuilds keep per-probe work flat
# ---------------------------------------------------------------------------


def _mk_vectors(spark, n: int, dim: int = 8):
    rows = [
        (i, [float((i * 7 + d * 13) % 17) / 17.0 for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_sized_n_clusters_rule():
    from k8s_vectordb_sync_spark.operators.ann_index import (
        MAX_DERIVED_CLUSTERS,
        _sized_n_clusters,
    )

    assert _sized_n_clusters(20_000, 2_500, floor=8) == 8
    assert _sized_n_clusters(200_000, 2_500, floor=8) == 80
    assert _sized_n_clusters(100, 2_500, floor=8) == 8  # floor wins
    assert _sized_n_clusters(10**12, 2_500, floor=8) == MAX_DERIVED_CLUSTERS
    assert _sized_n_clusters(0, 2_500) == 1


def test_rebuild_resizes_and_occupancy_stays_flat(spark, tmp_path):
    """The decade test in miniature: build an autosized index over n rows,
    rebuild over 10n — cluster count must grow ~10x so MEAN ROWS PER CLUSTER
    (what a probe scans per probed partition) stays flat instead of growing
    10x; rebuilding back over the small corpus must SHRINK the count again
    (the floor is persisted, not the previous derived count)."""
    import json as _json

    from k8s_vectordb_sync_spark.operators import ann_index as ai

    path = str(tmp_path / "sized-ivfpq")
    small, big = _mk_vectors(spark, 200), _mk_vectors(spark, 2_000)
    meta0 = ai.build_ivf_pq_index(
        small, path, n_clusters=2, m=2, n_codes=2,
        target_rows_per_cluster=50,
    )
    assert meta0["n_clusters"] == 4 and meta0["n_clusters_floor"] == 2

    meta1 = ai.ivf_pq_index_rebuild(big, path)
    assert meta1["n_clusters"] == 40, "rebuild did not re-derive from corpus"
    occ0 = 200 / meta0["n_clusters"]
    occ1 = 2_000 / meta1["n_clusters"]
    assert occ1 == occ0, "per-cluster occupancy (per-probe work) grew"

    # the probe scans the resized generation: n_probe partitions of ~occ rows
    qdf = small.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ai.ivf_pq_probe(spark, path, qdf, k=3, n_probe=1)
    assert got.count() > 0

    meta2 = ai.ivf_pq_index_rebuild(small, path)
    assert meta2["n_clusters"] == 4, "count ratcheted: floor not persisted"

    # meta on disk carries the rule for the NEXT rebuild too
    with open(os.path.join(ai._active_dir(path), "meta.json")) as fh:
        disk = _json.load(fh)
    assert disk["target_rows_per_cluster"] == 50 and disk["n_clusters_floor"] == 2


def test_kmeans_rebuild_resizes(spark, tmp_path):
    from k8s_vectordb_sync_spark.operators import ann_index as ai

    path = str(tmp_path / "sized-kmeans")
    meta0 = ai.build_kmeans_index(
        _mk_vectors(spark, 100), path, n_clusters=2, target_rows_per_cluster=25
    )
    assert meta0["n_clusters"] == 4
    meta1 = ai.kmeans_index_rebuild(_mk_vectors(spark, 1_000), path)
    assert meta1["n_clusters"] == 40
    assert len(ai.load_kmeans_centroids(path)) == 40


def test_autosized_probe_matches_dynamic_k_oracle(spark, sf_dir, tmp_path):
    """Oracle parity where the derived count EXCEEDS the floor (the
    registered query only reaches that regime at sf>=10, which no parity
    sweep runs): target 50 over the 500-vector sf0.001 corpus derives k=10,
    and the sized_target SQL must agree row-for-row with the Spark probe
    against the autosized index."""
    import duckdb

    from k8s_vectordb_sync_spark.operators import ann_index as ai
    from k8s_vectordb_sync_spark.queries import (
        ANN_K,
        _TRAIN_SAMPLE_HEX,
        _queries_df,
        _sql_ivf_pq,
    )
    from k8s_vectordb_sync_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "sized-parity")
    meta = ai.build_ivf_pq_index(
        emb, path, n_clusters=8, sample_hex=_TRAIN_SAMPLE_HEX,
        target_rows_per_cluster=50,
    )
    assert meta["n_clusters"] == 10, "expected ceil(500/50)=10 > floor 8"
    got = ai.ivf_pq_probe(
        spark, path, _queries_df(spark, sf_dir), k=ANN_K, n_probe=2
    ).collect()
    spark_rows = sorted(
        (r["query_id"], r["neighbor_id"], round(float(r["score"]), 4), r["rank"])
        for r in got
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    drows = con.execute(_sql_ivf_pq(sized_target=50)).fetchall()
    duck_rows = sorted((q, n, round(float(s), 4), r) for q, n, s, r in drows)
    assert spark_rows == duck_rows
