"""Persisted BM25 impact index (operators/lexical_index.py): build/probe
bit-parity with the inline scorer, md5-bucket partition pruning in the probe
plan, and index-side query derivation equals the inline derivation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.operators import lexical_index as lx
from k8s_vectordb_sync_spark.operators import retrieval as ret
from k8s_vectordb_sync_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bm25_index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm25") / "idx")
    docs = load_table(spark, sf_dir, "documents")
    meta = lx.build_bm25_index(docs, path)
    return path, meta


def test_build_writes_artifacts_and_meta(bm25_index):
    path, meta = bm25_index
    for part in ("postings", "meta.json", lx.MARKER):
        assert os.path.exists(os.path.join(path, part)), part
    assert meta["n_buckets"] == lx.N_BUCKETS and meta["n_docs"] > 0
    parts = [
        d for d in os.listdir(os.path.join(path, "postings")) if d.startswith("bucket=")
    ]
    assert len(parts) > 1  # really bucketed


def test_probe_matches_inline_bm25(spark, sf_dir, bm25_index):
    path, _ = bm25_index
    docs = load_table(spark, sf_dir, "documents")
    postings = ret.build_postings(docs, storage_level=None)
    qterms = ret.derive_query_terms(postings, 4, 5)
    inline = {tuple(r) for r in ret.bm25_topk(postings, qterms, k=10).collect()}
    probed = {tuple(r) for r in lx.bm25_index_probe(spark, path, qterms, k=10).collect()}
    assert probed == inline and len(probed) > 0


def test_probe_prunes_to_query_buckets(spark, bm25_index):
    path, meta = bm25_index
    qterms = spark.createDataFrame([(0, "the")], "query_id long, term string")
    probe = lx.bm25_index_probe(spark, path, qterms, k=3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    want = lx._bucket_py("the", meta["n_buckets"])
    # partition filter reaches the scan and names only the query's bucket
    assert "PartitionFilters" in plan
    assert f"bucket#" in plan or f"bucket IN ({want})" in plan or str(want) in plan


def test_index_side_query_derivation_matches_inline(spark, sf_dir, bm25_index):
    path, _ = bm25_index
    docs = load_table(spark, sf_dir, "documents")
    postings = ret.build_postings(docs, storage_level=None)
    inline = {
        tuple(r) for r in ret.derive_query_terms(postings, 4, 5).collect()
    }
    from_index = {
        tuple(r)
        for r in lx.derive_query_terms_from_index(spark, path, 4, 5).collect()
    }
    assert from_index == inline and len(inline) == 20


def test_probe_requires_marker(spark, tmp_path):
    qterms = spark.createDataFrame([(0, "x")], "query_id long, term string")
    with pytest.raises(FileNotFoundError):
        lx.bm25_index_probe(spark, str(tmp_path / "missing"), qterms)


def test_bm25_index_add_serves_new_docs_and_preserves_old(spark, sf_dir, tmp_path):
    """Build on half the corpus, add the other half: probes see the added
    docs; impacts of originally-indexed docs are byte-identical (add never
    rewrites existing rows); a full rebuild re-trues the statistics."""
    path = str(tmp_path / "idx")
    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    lx.build_bm25_index(half_a, path)
    before = {
        (r["term"], r["doc_id"]): r["impact"]
        for r in spark.read.parquet(path + "/postings").collect()
    }
    audit = lx.bm25_index_add(half_b, path)
    assert audit["added_docs"] == half_b.count()
    after_rows = spark.read.parquet(path + "/postings").collect()
    after = {(r["term"], r["doc_id"]): r["impact"] for r in after_rows}
    # old rows untouched, new rows present
    for k, v in before.items():
        assert after[k] == v
    added_ids = {r["doc_id"] for r in after_rows} - {
        k[1] for k in before
    }
    assert added_ids == {r["doc_id"] for r in half_b.select("doc_id").collect()}
    # a probe whose best match is an added doc finds it
    qterms = lx.derive_query_terms_from_index(spark, path, 4, 5)
    probed = lx.bm25_index_probe(spark, path, qterms, k=10)
    assert probed.filter(F.col("neighbor_id") % 2 == 1).count() > 0


def test_sign_index_add_is_exact(spark, sf_dir, tmp_path):
    """Sign encoding has no trained state, so build(A)+add(B) probes
    bit-identically to build(A ∪ B)."""
    from k8s_vectordb_sync_spark.operators import ann_index as ai

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    p_full = str(tmp_path / "full")
    ai.build_sign_index(emb, p_full)
    p_incr = str(tmp_path / "incr")
    ai.build_sign_index(emb.filter(F.col("vec_id") % 2 == 0), p_incr)
    ai.sign_index_add(emb.filter(F.col("vec_id") % 2 == 1), p_incr)
    full = {tuple(r) for r in ai.sign_index_probe(spark, p_full, q, k=5).collect()}
    incr = {tuple(r) for r in ai.sign_index_probe(spark, p_incr, q, k=5).collect()}
    assert incr == full and len(full) > 0
    with pytest.raises(FileNotFoundError):
        ai.sign_index_add(emb, str(tmp_path / "missing"))


def test_index_removes_propagate_deletes(spark, sf_dir, tmp_path):
    """Delete propagation across all three index families: removed ids stop
    being served immediately; untouched partitions are not rewritten
    (pruned rewrite for ivfpq clusters and bm25 term buckets)."""
    import glob
    import os as _os

    from k8s_vectordb_sync_spark.operators import ann_index as ai

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    gone = spark.createDataFrame([(i,) for i in range(20, 40)], "vec_id long")

    # --- IVF-PQ: cluster-pruned rewrite
    p1 = str(tmp_path / "ivfpq")
    ai.build_ivf_pq_index(emb, p1, n_clusters=8, sample_hex="0123")
    touched = {
        r["cluster"]
        for r in spark.read.parquet(p1 + "/codes")
        .join(F.broadcast(gone), "vec_id", "left_semi")
        .select("cluster")
        .distinct()
        .collect()
    }
    def mtimes(base, prefix):
        return {
            _os.path.basename(d): max(
                _os.path.getmtime(f) for f in glob.glob(_os.path.join(d, "*.parquet"))
            )
            for d in glob.glob(_os.path.join(base, prefix + "=*"))
        }
    before = mtimes(p1 + "/codes", "cluster")
    audit = ai.ivf_pq_index_remove(spark, p1, gone)
    assert audit["removed"] == 20 and audit["clusters_touched"] == len(touched)
    after = mtimes(p1 + "/codes", "cluster")
    for part, mt in before.items():
        if int(part.split("=")[1]) not in touched:
            assert after[part] == mt, f"untouched {part} rewritten"
    served = {
        r["neighbor_id"]
        for r in ai.ivf_pq_probe(spark, p1, q, k=50, n_probe=8).collect()
    }
    assert served.isdisjoint(set(range(20, 40)))

    # --- sign: whole-table rewrite, removed ids gone
    p2 = str(tmp_path / "sign")
    ai.build_sign_index(emb, p2)
    a2 = ai.sign_index_remove(spark, p2, gone)
    assert a2["removed"] == 20
    served = {
        r["neighbor_id"] for r in ai.sign_index_probe(spark, p2, q, k=50).collect()
    }
    assert served.isdisjoint(set(range(20, 40)))

    # --- bm25: bucket-pruned rewrite, removed docs unserved
    p3 = str(tmp_path / "bm25")
    lx.build_bm25_index(docs, p3)
    gone_docs = spark.createDataFrame([(i,) for i in range(20, 40)], "doc_id long")
    a3 = lx.bm25_index_remove(spark, p3, gone_docs)
    assert a3["rows_removed"] > 0
    left = spark.read.parquet(p3 + "/postings").join(
        F.broadcast(gone_docs), "doc_id", "left_semi"
    )
    assert left.count() == 0


def test_index_adds_are_idempotent_and_track_staleness(spark, sf_dir, tmp_path):
    """Duplicate-add guard + staleness ledger (ADVICE/VERDICT r6): re-adding
    ids already in an index is a no-op (no duplicate postings/codes, df
    counts and top-k slots unchanged), every add bumps the meta counter,
    and needs_rebuild trips once adds exceed the drift threshold — for the
    tiers whose adds are approximate (bm25's frozen idf/avgdl); the sign
    tier's adds are exact so it never *needs* a rebuild."""
    from k8s_vectordb_sync_spark.operators import ann_index as ai

    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    # --- BM25
    path = str(tmp_path / "bm25")
    lx.build_bm25_index(half_a, path)
    assert lx.index_status(path)["docs_added_since_build"] == 0
    assert not lx.needs_rebuild(path)
    n_b = half_b.count()
    audit = lx.bm25_index_add(half_b, path)
    assert audit == {"added_docs": n_b, "skipped_existing": 0}
    rows_after_add = spark.read.parquet(path + "/postings").count()
    qterms = lx.derive_query_terms_from_index(spark, path, 4, 5)
    served = sorted(
        tuple(r) for r in lx.bm25_index_probe(spark, path, qterms, k=10).collect()
    )
    # replay the same add: everything skipped, postings byte-count stable,
    # probe results identical
    audit2 = lx.bm25_index_add(half_b, path)
    assert audit2 == {"added_docs": 0, "skipped_existing": n_b}
    assert spark.read.parquet(path + "/postings").count() == rows_after_add
    served2 = sorted(
        tuple(r) for r in lx.bm25_index_probe(spark, path, qterms, k=10).collect()
    )
    assert served2 == served
    status = lx.index_status(path)
    assert status["docs_added_since_build"] == n_b  # replay didn't count
    assert status["needs_rebuild"] is True  # ~half the corpus added > 10%
    # a full rebuild resets the ledger
    lx.build_bm25_index(docs, path)
    assert lx.index_status(path)["docs_added_since_build"] == 0
    assert not lx.needs_rebuild(path)

    # --- sign tier: idempotent too, but exact -> never needs_rebuild
    emb = load_table(spark, sf_dir, "embeddings")
    ev_a = emb.filter(F.col("vec_id") % 2 == 0)
    ev_b = emb.filter(F.col("vec_id") % 2 == 1)
    sp = str(tmp_path / "sign")
    ai.build_sign_index(ev_a, sp)
    n_vb = ev_b.count()
    a1 = ai.sign_index_add(ev_b, sp)
    assert a1 == {"added": n_vb, "skipped_existing": 0}
    a2 = ai.sign_index_add(ev_b, sp)
    assert a2 == {"added": 0, "skipped_existing": n_vb}
    st = ai.ann_index_status(sp)
    assert st["vecs_added_since_build"] == n_vb and st["exact_adds"] is True
    assert st["needs_rebuild"] is False
    assert not ai.ann_needs_rebuild(sp)

    # --- IVF-PQ: approximate adds -> rebuild trips past the threshold
    ip = str(tmp_path / "ivfpq")
    ai.build_ivf_pq_index(ev_a, ip, n_clusters=4, sample_hex="0123")
    b1 = ai.ivf_pq_index_add(ev_b, ip)
    assert b1 == {"added": n_vb, "skipped_existing": 0}
    b2 = ai.ivf_pq_index_add(ev_b, ip)
    assert b2 == {"added": 0, "skipped_existing": n_vb}
    ist = ai.ann_index_status(ip)
    assert ist["vecs_added_since_build"] == n_vb and ist["exact_adds"] is False
    assert ist["needs_rebuild"] is True  # half the corpus on frozen codebooks
    # no duplicate codes: every vec_id appears exactly once
    dup = (
        spark.read.parquet(ip + "/codes")
        .groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_index_removes_are_crash_safe(spark, sf_dir, tmp_path, monkeypatch):
    """Crash safety for delete propagation (round 7, sources/staging.py):
    a failure injected between the staged anti-join write and the rename
    swap leaves every index family serving its PRE-remove content; the
    retried remove then completes."""
    import k8s_vectordb_sync_spark.sources.staging as staging
    from k8s_vectordb_sync_spark.operators import ann_index as ai

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    gone = spark.createDataFrame([(i,) for i in range(20, 40)], "vec_id long")

    ivf = str(tmp_path / "ivfpq")
    ai.build_ivf_pq_index(emb, ivf, n_clusters=4, sample_hex="0123")
    bm = str(tmp_path / "bm25")
    lx.build_bm25_index(docs, bm)
    doc_gone = spark.createDataFrame([(i,) for i in range(20, 40)], "doc_id long")

    def boom(*a, **k):
        raise RuntimeError("injected crash before swap")

    monkeypatch.setattr(staging, "_swap_partitions", boom)
    n_codes = spark.read.parquet(ivf + "/codes").count()
    with pytest.raises(RuntimeError, match="injected crash"):
        ai.ivf_pq_index_remove(spark, ivf, gone)
    assert spark.read.parquet(ivf + "/codes").count() == n_codes  # intact
    n_post = spark.read.parquet(bm + "/postings").count()
    with pytest.raises(RuntimeError, match="injected crash"):
        lx.bm25_index_remove(spark, bm, doc_gone)
    assert spark.read.parquet(bm + "/postings").count() == n_post  # intact
    monkeypatch.undo()

    a1 = ai.ivf_pq_index_remove(spark, ivf, gone)
    assert a1["removed"] == 20
    assert (
        spark.read.parquet(ivf + "/codes")
        .filter(F.col("vec_id").between(20, 39)).count() == 0
    )
    a2 = lx.bm25_index_remove(spark, bm, doc_gone)
    assert a2["rows_removed"] > 0
    assert (
        spark.read.parquet(bm + "/postings")
        .filter(F.col("doc_id").between(20, 39)).count() == 0
    )

    # sign tier: whole-table swap variant
    sp = str(tmp_path / "sign")
    ai.build_sign_index(emb, sp)
    n_sign = spark.read.parquet(sp + "/codes").count()
    monkeypatch.setattr(staging, "staged_table_rewrite", boom)
    monkeypatch.setattr(ai, "staged_table_rewrite", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ai.sign_index_remove(spark, sp, gone)
    assert spark.read.parquet(sp + "/codes").count() == n_sign  # intact
    monkeypatch.undo()
    a3 = ai.sign_index_remove(spark, sp, gone)
    assert a3["removed"] == 20
