"""Persistent ANN index lifecycle (operators/ann_index.py): build once,
probe from artifacts, results identical to the inline retrain-per-query
path, and the probe-side scan actually prunes cluster partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.operators import ann_index as ai
from k8s_vectordb_sync_spark.operators import similarity as sim
from k8s_vectordb_sync_spark.sources.tables import load_table

SAMPLE_HEX = "0123"


def _queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@pytest.fixture(scope="module")
def built_index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    emb = load_table(spark, sf_dir, "embeddings")
    meta = ai.build_ivf_pq_index(
        emb, path, n_clusters=8, sample_hex=SAMPLE_HEX
    )
    return path, meta


def test_build_writes_complete_artifact_set(built_index):
    path, meta = built_index
    for part in ("centroids", "codebooks", "codes", "meta.json", ai.MARKER):
        assert os.path.exists(os.path.join(path, part)), part
    assert meta["n_clusters"] == 8 and meta["m"] == sim.PQ_M
    assert ai.index_is_built(path)
    # codes/ is partitioned by cluster: one directory per non-empty cluster
    parts = [d for d in os.listdir(os.path.join(path, "codes")) if d.startswith("cluster=")]
    assert len(parts) >= 2


def test_probe_matches_inline_ivf_pq(spark, sf_dir, built_index):
    path, _ = built_index
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb)
    probed = {
        tuple(r)
        for r in ai.ivf_pq_probe(spark, path, q, k=5, n_probe=2).collect()
    }
    inline = {
        tuple(r)
        for r in sim.ivf_pq_topk(
            emb, q, k=5, n_clusters=8, n_probe=2, sample_hex=SAMPLE_HEX
        ).collect()
    }
    assert probed == inline
    assert len(probed) > 0


def test_probe_scan_is_partition_pruned(spark, sf_dir, built_index):
    """The codes scan must carry the probed-cluster filter as a PARTITION
    filter (directory pruning), not a post-scan row filter — that is the
    entire point of the centroid-partitioned layout at 100 TB."""
    path, _ = built_index
    emb = load_table(spark, sf_dir, "embeddings")
    out = ai.ivf_pq_probe(spark, path, _queries(emb), k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cluster" in pf.group(1)


def test_probe_without_index_raises(spark, tmp_path):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    with pytest.raises(FileNotFoundError, match="_INDEX_OK"):
        ai.ivf_pq_probe(spark, str(tmp_path / "nope"), emb)


def test_build_on_empty_corpus_yields_valid_empty_index(spark, tmp_path):
    """An empty corpus builds a VALID empty index (round-7 degenerate-input
    gate): probes answer no-neighbors with the right schema, removes are
    zero-audits, and adds — which would need trained state that doesn't
    exist — demand a rebuild. A serving stack over a not-yet-populated
    corpus must not crash."""
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    for build, probe, add, remove in (
        (ai.build_ivf_pq_index, ai.ivf_pq_probe, ai.ivf_pq_index_add,
         ai.ivf_pq_index_remove),
        (ai.build_sign_index, ai.sign_index_probe, ai.sign_index_add,
         ai.sign_index_remove),
    ):
        path = str(tmp_path / build.__name__)
        meta = build(emb, path)
        assert meta["empty"] is True and ai.index_is_built(path)
        out = probe(spark, path, q)
        assert out.count() == 0 and "query_id" in out.columns
        # adding NOTHING to an empty index is a no-op; adding real data
        # demands a rebuild (there is no trained state to encode against)
        assert add(emb, path) == {"added": 0, "skipped_existing": 0}
        with_data = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 1.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="rebuild"):
            add(with_data, path)
        ids = spark.createDataFrame([(1,)], "vec_id long")
        audit = remove(spark, path, ids)
        assert audit["requested"] == 1 and audit["removed"] == 0
        # rebuilding over data replaces the empty index in place
        real = spark.createDataFrame(
            [(i, [float(i), 1.0, 0.5, float(i % 3)]) for i in range(8)],
            "vec_id long, embedding array<double>",
        )
        build(real, path)
        q4 = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 1.0])], "query_id long, query_vec array<double>"
        )
        assert probe(spark, path, q4).count() > 0


def test_registered_indexed_query_matches_retrain_query(spark, sf_dir):
    from k8s_vectordb_sync_spark.queries import QUERIES

    a = {tuple(r) for r in QUERIES["ann_ivf_pq_topk_indexed"](spark, sf_dir).collect()}
    b = {tuple(r) for r in QUERIES["ann_ivf_pq_topk"](spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_incremental_add_matches_full_build_encoding(spark, sf_dir, tmp_path):
    """build(half) + add(other half) must produce the same codes table as
    build over the full corpus WITH training restricted to the first half —
    add() assigns/encodes against the stored artifacts, it never retrains."""
    emb = load_table(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)

    p1 = str(tmp_path / "incr")
    ai.build_ivf_pq_index(even, p1, n_clusters=4, sample_hex=None)
    n_before = spark.read.parquet(os.path.join(p1, "codes")).count()
    ai.ivf_pq_index_add(odd, p1)
    codes_incr = {
        tuple(r) for r in spark.read.parquet(os.path.join(p1, "codes")).collect()
    }
    assert len(codes_incr) == emb.count() and n_before == even.count()

    # reference: encode the odd half directly with the stored artifacts
    meta, centroids, books = ai.load_ivf_pq_index(spark, p1)
    sub = meta["dim"] // meta["m"]
    expected_odd = sim.assign_clusters(odd, centroids).select(
        F.col("vec_id"),
        *[
            sim.nearest_centroid_expr(
                F.slice(F.col("embedding"), s * sub + 1, sub), books[s]
            ).cast("int").alias(f"code{s}")
            for s in range(meta["m"])
        ],
        F.col("cluster").cast("int"),
    )
    # codes parquet column order: vec_id, code0..m-1, cluster(partition col)
    expected = {tuple(r) for r in expected_odd.collect()}
    odd_rows = {t for t in codes_incr if t[0] % 2 == 1}
    assert odd_rows == expected


def test_incremental_probe_includes_added_rows(spark, sf_dir, tmp_path):
    """An added vector must be findable: probing with an added row's own
    vector returns it (self-hit) even though it was never in the build."""
    emb = load_table(spark, sf_dir, "embeddings")
    p = str(tmp_path / "probe-incr")
    ai.build_ivf_pq_index(
        emb.filter(F.col("vec_id") % 2 == 0), p, n_clusters=4, sample_hex=None
    )
    ai.ivf_pq_index_add(emb.filter(F.col("vec_id") % 2 == 1), p)
    q = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = ai.ivf_pq_probe(spark, p, q, k=10, n_probe=4).collect()
    assert any(r["neighbor_id"] == 7 for r in hits)


def test_sign_index_probe_matches_inline_and_never_reads_floats(
    spark, sf_dir, tmp_path
):
    """build_sign_index + sign_index_probe returns exactly hamming_topk's
    rows, and the probe plan scans ONLY the codes parquet — the float
    embedding table must not appear in the plan."""
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.operators import ann_index as ai
    from k8s_vectordb_sync_spark.operators.similarity import hamming_topk
    from k8s_vectordb_sync_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = str(tmp_path / "signidx")
    meta = ai.build_sign_index(emb, path)
    assert meta["dim"] == 64 and ai.index_is_built(path)

    probe = ai.sign_index_probe(spark, path, q, k=5)
    inline = hamming_topk(emb, q, k=5)
    assert sorted(map(tuple, probe.collect())) == sorted(map(tuple, inline.collect()))

    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the corpus-side scan reads the code words table
    assert "w0:bigint" in plan
    # the ONLY float-vector scan is the 4-row query side (its vec_id filter
    # is pushed down); the corpus float column is never read. The AQE plan
    # string prints initial+final sections, so assert per scan line.
    float_scans = [ln for ln in plan.splitlines() if "array<float>" in ln]
    assert float_scans and all("LessThan(vec_id,4)" in ln for ln in float_scans)


# --- k-means centroid index (clustering-consumer lifecycle, round 6) ---


@pytest.fixture(scope="module")
def built_kmeans_index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kmeans") / "idx")
    emb = load_table(spark, sf_dir, "embeddings")
    meta = ai.build_kmeans_index(
        emb, path, n_clusters=8, iterations=5, sample_hex=SAMPLE_HEX
    )
    return path, meta


def test_kmeans_index_build_and_load(spark, sf_dir, built_kmeans_index):
    path, meta = built_kmeans_index
    for part in ("centroids", "meta.json", ai.MARKER):
        assert os.path.exists(os.path.join(path, part)), part
    assert meta["n_clusters"] == 8 and meta["iterations"] == 5
    loaded = ai.load_kmeans_centroids(path)
    trained = sim.kmeans_centroids(
        load_table(spark, sf_dir, "embeddings"), 8, 5, sample_hex=SAMPLE_HEX
    )
    assert loaded == [c for _, c in trained]  # bit-identical: 6 dp discipline


def test_kmeans_index_load_requires_marker(tmp_path):
    with pytest.raises(FileNotFoundError):
        ai.load_kmeans_centroids(str(tmp_path / "nowhere"))


def test_semantic_pairs_from_stored_centroids_match_inline(
    spark, sf_dir, built_kmeans_index
):
    path, _ = built_kmeans_index
    emb = load_table(spark, sf_dir, "embeddings")
    stored = {
        tuple(r)
        for r in sim.semantic_dedup_pairs(
            emb, threshold=0.4, centroids=ai.load_kmeans_centroids(path)
        ).collect()
    }
    inline = {
        tuple(r)
        for r in sim.semantic_dedup_pairs(
            emb, threshold=0.4, n_clusters=8, iterations=5, sample_hex=SAMPLE_HEX
        ).collect()
    }
    assert stored == inline and len(stored) > 0


# ---------------------------------------------------------------------------
# Zero-downtime rebuild lifecycle (VERDICT r7 item 4) — the versioned-pointer
# mechanics shared by every tier; the live serve-during-rebuild e2e is in
# test_serving_stream.py::test_zero_downtime_rebuild_probes_never_mixed.
# ---------------------------------------------------------------------------


def test_rebuild_equals_fresh_build_and_resets_ledger(spark, sf_dir, tmp_path):
    """Rebuild over the full corpus is bit-identical to a fresh build over
    the same corpus (training determinism survives the versioned layout),
    the staleness counter resets, and generation retention is exactly two:
    current + immediately-previous (flat root artifacts count as the
    previous generation right after the first rebuild, then get pruned)."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    ai.build_ivf_pq_index(half, path, n_clusters=8, sample_hex=SAMPLE_HEX)
    ai.ivf_pq_index_add(emb.filter(F.col("vec_id") % 2 == 1), path)
    assert ai.ann_needs_rebuild(path)

    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    meta = ai.ivf_pq_index_rebuild(emb, path)
    assert meta["vecs_added_since_build"] == 0 and meta["n_vecs"] == emb.count()
    assert not ai.ann_needs_rebuild(path)
    rebuilt = sorted(tuple(r) for r in ai.ivf_pq_probe(spark, path, q, k=5).collect())

    fresh_path = str(tmp_path / "fresh")
    ai.build_ivf_pq_index(emb, fresh_path, n_clusters=8, sample_hex=SAMPLE_HEX)
    fresh = sorted(tuple(r) for r in ai.ivf_pq_probe(spark, fresh_path, q, k=5).collect())
    assert rebuilt == fresh and len(rebuilt) > 0

    # generation retention: first rebuild keeps flat root + v000001 ...
    names = set(os.listdir(path))
    assert {"_CURRENT", "v000001", "codes"} <= names
    # ... second prunes the flat root, third prunes v000001
    ai.ivf_pq_index_rebuild(emb, path)
    names = set(os.listdir(path))
    assert "codes" not in names and {"v000001", "v000002"} <= names
    ai.ivf_pq_index_rebuild(emb, path)
    names = set(os.listdir(path))
    assert "v000001" not in names and {"v000002", "v000003"} <= names


def test_direct_build_on_versioned_root_is_rejected(spark, sf_dir, tmp_path):
    """A flat build over a versioned root would write shadowed artifacts —
    rejected with a pointer to the rebuild op."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    ai.build_ivf_pq_index(emb, path, n_clusters=8, sample_hex=SAMPLE_HEX)
    ai.ivf_pq_index_rebuild(emb, path)
    with pytest.raises(ValueError, match="VERSIONED"):
        ai.build_ivf_pq_index(emb, path, n_clusters=8, sample_hex=SAMPLE_HEX)
    with pytest.raises(FileNotFoundError):
        ai.ivf_pq_index_rebuild(emb, str(tmp_path / "nope"))


def test_mutations_resolve_through_version_pointer(spark, sf_dir, tmp_path):
    """add/remove/status on a rebuilt index target the ACTIVE generation:
    an add is probe-visible, a remove stops serving the row, the ledger
    counts both against the current generation's meta."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    most = emb.filter(F.col("vec_id") >= 4)
    ai.build_ivf_pq_index(most, path, n_clusters=8, sample_hex=SAMPLE_HEX)
    ai.ivf_pq_index_rebuild(most, path)  # now versioned

    added = ai.ivf_pq_index_add(emb.filter(F.col("vec_id") < 4), path)
    assert added["added"] == 4
    assert ai.ann_index_status(path)["vecs_added_since_build"] == 4
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    served = {r["neighbor_id"] for r in ai.ivf_pq_probe(spark, path, q, k=3, n_probe=8).collect()}
    assert 0 in served  # the added row is its own nearest neighbor
    ids = spark.createDataFrame([(0,)], "vec_id long")
    removed = ai.ivf_pq_index_remove(spark, path, ids)
    assert removed["removed"] == 1
    served = {r["neighbor_id"] for r in ai.ivf_pq_probe(spark, path, q, k=3, n_probe=8).collect()}
    assert 0 not in served


def test_sign_and_kmeans_and_bm25_rebuild(spark, sf_dir, tmp_path):
    """The sign (compaction), kmeans (SemDeDup blocking), and BM25
    (statistics re-true) tiers share the same versioned swap: rebuild equals
    a fresh build bit-for-bit and the ledger resets."""
    from k8s_vectordb_sync_spark.operators import lexical_index as lx

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    spath = str(tmp_path / "sign")
    ai.build_sign_index(emb.filter(F.col("vec_id") % 2 == 0), spath)
    ai.sign_index_add(emb.filter(F.col("vec_id") % 2 == 1), spath)
    ai.sign_index_rebuild(emb, spath)
    assert ai.ann_index_status(spath)["vecs_added_since_build"] == 0
    fresh = str(tmp_path / "sign_fresh")
    ai.build_sign_index(emb, fresh)
    assert sorted(map(tuple, ai.sign_index_probe(spark, spath, q, k=4).collect())) == \
        sorted(map(tuple, ai.sign_index_probe(spark, fresh, q, k=4).collect()))

    kpath = str(tmp_path / "kmeans")
    ai.build_kmeans_index(emb, kpath, n_clusters=8, sample_hex=SAMPLE_HEX)
    before = ai.load_kmeans_centroids(kpath)
    ai.kmeans_index_rebuild(emb, kpath)
    assert ai.load_kmeans_centroids(kpath) == before  # same corpus, same params

    bpath = str(tmp_path / "bm25")
    lx.build_bm25_index(docs.filter(F.col("doc_id") % 2 == 0), bpath)
    lx.bm25_index_add(docs.filter(F.col("doc_id") % 2 == 1), bpath)
    assert lx.needs_rebuild(bpath)
    meta = lx.bm25_index_rebuild(docs, bpath)
    assert meta["docs_added_since_build"] == 0 and not lx.needs_rebuild(bpath)
    qterms = lx.derive_query_terms_from_index(spark, bpath, 3, 5)
    bfresh = str(tmp_path / "bm25_fresh")
    lx.build_bm25_index(docs, bfresh)
    assert sorted(map(tuple, lx.bm25_index_probe(spark, bpath, qterms, k=5).collect())) == \
        sorted(map(tuple, lx.bm25_index_probe(spark, bfresh, qterms, k=5).collect()))
