"""Sink contract tests — translations of internal/client/rest_test.go
(SURVEY §5 tier 1) and the payload-separation invariants."""

from __future__ import annotations

import datetime

import pytest

from k8s_vectordb_sync_spark.streaming.sink import (
    CollectingSink,
    RetryPolicy,
    SinkClientError,
    SinkServerError,
    send_with_retry,
)

T0 = datetime.datetime(2024, 1, 1)


def _policy(delays: list) -> RetryPolicy:
    return RetryPolicy(sleep=delays.append, rng=lambda: 0.0)


def test_retries_on_server_error():
    # rest_test.go:73 RetriesOnServerError: 2 failures then success
    calls = []

    def post(p):
        calls.append(p)
        if len(calls) < 3:
            raise SinkServerError("503")

    delays: list = []
    attempts = send_with_retry(post, {"x": 1}, _policy(delays))
    assert attempts == 3
    assert len(calls) == 3


def test_does_not_retry_on_4xx():
    # rest_test.go:166 DoesNotRetryOn4xx
    calls = []

    def post(p):
        calls.append(p)
        raise SinkClientError("400")

    with pytest.raises(SinkClientError):
        send_with_retry(post, {}, _policy([]))
    assert len(calls) == 1


def test_retry_exhaustion_raises():
    def post(p):
        raise SinkServerError("500")

    delays: list = []
    with pytest.raises(SinkServerError):
        send_with_retry(post, {}, _policy(delays))
    assert len(delays) == 3  # max_retries sleeps


def test_backoff_exponential_with_cap_and_jitter():
    # rest.go:150-158: 1s * 2^(n-1), cap 30s, jitter in [0.75, 1.0)
    p = RetryPolicy(sleep=lambda s: None, rng=lambda: 0.0)  # jitter floor
    assert p.delay(1) == pytest.approx(1.0 * 0.75)
    assert p.delay(2) == pytest.approx(2.0 * 0.75)
    assert p.delay(3) == pytest.approx(4.0 * 0.75)
    assert p.delay(10) == pytest.approx(30.0 * 0.75)  # capped
    p_hi = RetryPolicy(sleep=lambda s: None, rng=lambda: 0.999999)
    assert p_hi.delay(1) < 1.0  # jitter strictly below 1.0x


def test_collecting_sink_splits_and_chunks(spark):
    # debounce_test.go:267 SeparateUpsertAndDeletePayloads + 50-row chunking,
    # deletes sent first (delete priority, debounce.go:105-121)
    rows = [("upsert", T0, f"k{i:03d}", i) for i in range(120)] + [
        ("delete", T0, "kdel1", 900),
        ("delete", T0, "kdel2", 901),
    ]
    df = spark.createDataFrame(
        rows, "op string, event_ts timestamp, id string, event_id long"
    )
    sink = CollectingSink(batch_max_size=50)
    sink.write_batch(df, batch_id=7)
    assert len(sink.payloads) == 4  # 1 delete payload + 3 upsert chunks
    first = sink.payloads[0]
    assert sorted(first["deletes"]) == ["kdel1", "kdel2"]
    assert "upserts" not in first
    sizes = [len(p["upserts"]) for p in sink.payloads[1:]]
    assert sizes == [50, 50, 20]
    for p in sink.payloads[1:]:
        assert "deletes" not in p  # upserts XOR deletes per emission


def test_collecting_sink_skips_empty(spark):
    # rest_test.go:215 SkipsEmptyPayload
    df = spark.createDataFrame([], "op string, event_ts timestamp, id string")
    sink = CollectingSink()
    sink.write_batch(df, batch_id=0)
    assert sink.payloads == []


class _HttpDouble:
    """Local http.server double of the reference mock collector
    (rest_test.go:73/166/215): scripted status codes, records request bodies."""

    def __init__(self, statuses: list[int]):
        import http.server
        import json as _json
        import threading

        double = self
        double.bodies: list[dict] = []
        double.statuses = list(statuses)

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                double.bodies.append(_json.loads(body))
                status = double.statuses.pop(0) if double.statuses else 200
                self.send_response(status)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):
                pass

        self.server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}/"
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_http_poster_success_and_body():
    from k8s_vectordb_sync_spark.streaming.sink import http_poster

    srv = _HttpDouble([200])
    try:
        http_poster(srv.url)({"upserts": [{"id": "k1"}], "batch_id": 3})
        assert srv.bodies == [{"upserts": [{"id": "k1"}], "batch_id": 3}]
    finally:
        srv.close()


def test_http_poster_classifies_4xx_terminal():
    # rest_test.go:166 DoesNotRetryOn4xx — through the real retry loop
    from k8s_vectordb_sync_spark.streaming.sink import http_poster

    srv = _HttpDouble([400, 200])
    try:
        with pytest.raises(SinkClientError):
            send_with_retry(http_poster(srv.url), {"x": 1}, _policy([]))
        assert len(srv.bodies) == 1  # no retry after 4xx
    finally:
        srv.close()


def test_http_poster_retries_5xx_then_succeeds():
    # rest_test.go:73 RetriesOnServerError: 2x 503 then 200
    from k8s_vectordb_sync_spark.streaming.sink import http_poster

    srv = _HttpDouble([503, 503, 200])
    try:
        attempts = send_with_retry(http_poster(srv.url), {"x": 1}, _policy([]))
        assert attempts == 3
        assert len(srv.bodies) == 3
    finally:
        srv.close()


def test_http_poster_network_error_is_retryable():
    from k8s_vectordb_sync_spark.streaming.sink import http_poster

    # nothing listens here: connection refused -> SinkServerError (retryable)
    post = http_poster("http://127.0.0.1:1/")
    with pytest.raises(SinkServerError):
        send_with_retry(post, {"x": 1}, _policy([]))


def test_collecting_sink_retry_integration(spark):
    # integration tier: transient 5xx absorbed, payload still recorded
    df = spark.createDataFrame(
        [("upsert", T0, "k1", 1)], "op string, event_ts timestamp, id string, event_id long"
    )
    failures = {"n": 0}

    def flaky(p):
        if failures["n"] < 1:
            failures["n"] += 1
            raise SinkServerError("flaky")

    sink = CollectingSink(post=flaky, policy=RetryPolicy(sleep=lambda s: None), record=True)
    sink.write_batch(df, batch_id=0)
    assert len(sink.payloads) == 1
