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
