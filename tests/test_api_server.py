"""Ops HTTP server contract tests — mirror of the reference's handler
semantics (internal/api/server.go:79-97): 200 {status: ok, resources,
message} on success, 500 {status: error} on failure, method-qualified
routing. No Spark needed; the resync callable is injected.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from k8s_vectordb_sync_spark.api_server import RESYNC_PATH, OpsServer


@pytest.fixture()
def server_factory():
    servers = []

    def make(resync):
        srv = OpsServer(resync=resync, bind_address="127.0.0.1:0")
        host, port = srv.start()
        servers.append(srv)
        return f"http://{host}:{port}"

    yield make
    for srv in servers:
        srv.stop()


def _post(url: str):
    req = urllib.request.Request(url, data=b"", method="POST")
    with urllib.request.urlopen(req, timeout=5) as resp:
        return resp.status, json.loads(resp.read())


def test_resync_success(server_factory):
    base = server_factory(lambda: 42)
    status, body = _post(base + RESYNC_PATH)
    assert status == 200
    # server.go:92-96 response contract
    assert body == {"status": "ok", "resources": 42, "message": "resynced 42 resources"}


def test_resync_failure_is_500(server_factory):
    def boom():
        raise RuntimeError("snapshot unavailable")

    base = server_factory(boom)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + RESYNC_PATH)
    assert ei.value.code == 500
    body = json.loads(ei.value.read())
    # server.go:82-89
    assert body["status"] == "error"
    assert "resync failed" in body["message"]
    assert body["resources"] == 0


def test_unknown_path_404(server_factory):
    base = server_factory(lambda: 0)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/api/v1/unknown")
    assert ei.value.code == 404


def test_get_on_resync_405(server_factory):
    base = server_factory(lambda: 0)
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + RESYNC_PATH, timeout=5)
    assert ei.value.code == 405
    assert ei.value.headers["Allow"] == "POST"


def test_serial_requests_reuse_server(server_factory):
    calls = []

    def resync():
        calls.append(1)
        return len(calls)

    base = server_factory(resync)
    for expect in (1, 2, 3):
        status, body = _post(base + RESYNC_PATH)
        assert status == 200
        assert body["resources"] == expect


def test_search_endpoint_serves_persisted_indexes(spark, sf_dir, tmp_path):
    """POST /api/v1/search probes the persisted indexes through the same
    batch probe functions every other surface uses; bad tier -> 400;
    unconfigured search on the plain server -> 404."""
    import json
    import urllib.request

    from k8s_vectordb_sync_spark.api import make_search_handler
    from k8s_vectordb_sync_spark.api_server import OpsServer
    from k8s_vectordb_sync_spark.operators import ann_index as ai
    from k8s_vectordb_sync_spark.operators import lexical_index as lx
    from k8s_vectordb_sync_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    sign_path = str(tmp_path / "sign")
    bm25_path = str(tmp_path / "bm25")
    ai.build_sign_index(emb, sign_path)
    lx.build_bm25_index(docs, bm25_path)

    server = OpsServer(
        resync=lambda: 0,
        search=make_search_handler(spark, sign_path=sign_path, bm25_path=bm25_path),
    )
    host, port = server.start()
    base = f"http://{host}:{port}/api/v1/search"

    def post(body, expect=200):
        req = urllib.request.Request(
            base, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        status, body = post({"tier": "sign", "query_vec": qvec, "k": 5})
        assert status == 200 and body["status"] == "ok"
        got = {(r["neighbor_id"], r["rank"]) for r in body["results"]}
        qdf = spark.createDataFrame(
            [(0, qvec)], "query_id long, query_vec array<double>"
        )
        want = {
            (r["neighbor_id"], r["rank"])
            for r in ai.sign_index_probe(spark, sign_path, qdf, k=5).collect()
        }
        assert got == want and len(got) == 5

        status, body = post({"tier": "bm25", "terms": ["the", "and"], "k": 5})
        assert status == 200 and len(body["results"]) == 5

        status, body = post({"tier": "nope"})
        assert status == 400
        status, body = post({"tier": "ivfpq", "query_vec": qvec})
        assert status == 400  # ivfpq index not configured here
    finally:
        server.stop()

    plain = OpsServer(resync=lambda: 0)
    host, port = plain.start()
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/api/v1/search", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        plain.stop()
