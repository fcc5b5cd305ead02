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
