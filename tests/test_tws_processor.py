"""Unit tests for the transformWithStateInPandas DebounceProcessor against a
fake handle/state — this container lacks google.protobuf, so the streaming
runner can't execute the processor end-to-end (test_stateful_debounce skips
the TWS parametrization); these tests pin the state-machine semantics
(debounce.go:32-149) at the processor level instead, driving the SAME
scenarios as the integration tests.
"""

from __future__ import annotations

import pandas as pd
import pytest

from k8s_vectordb_sync_spark.streaming.stateful import _make_debounce_processor_class


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.state = FakeValueState()
        self.timers: set[int] = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def registerTimer(self, ts):
        self.timers.add(ts)

    def deleteTimer(self, ts):
        self.timers.discard(ts)


class FakeExpiredTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


@pytest.fixture()
def proc():
    cls = _make_debounce_processor_class()
    p = cls(gap_ms=10_000, ts_col="event_ts", event_type_col="op_type")
    handle = FakeHandle()
    p.init(handle)
    return p, handle


def _rows(*recs):
    # (event_id, ts_ms, op_type, value)
    return iter(
        [
            pd.DataFrame(
                [
                    {
                        "event_id": e,
                        "event_ts": pd.Timestamp(t, unit="ms"),
                        "op_type": op,
                        "value": v,
                    }
                    for e, t, op, v in recs
                ]
            )
        ]
    )


def _feed(p, key, recs):
    return [r for pdf in p.handleInputRows((key,), _rows(*recs), None) for r in pdf.to_dict("records")]


def _expire(p, key, ts):
    return [
        r
        for pdf in p.handleExpiredTimer((key,), None, FakeExpiredTimerInfo(ts))
        for r in pdf.to_dict("records")
    ]


def test_upsert_buffers_and_registers_timer(proc):
    p, h = proc
    assert _feed(p, "k1", [(1, 1000, "UPDATE", 1.0)]) == []
    assert h.timers == {11_000}
    assert h.state.get() == (1, 1.0, 1000, False, 11_000)


def test_rapid_updates_reset_timer_last_state_wins(proc):
    p, h = proc
    _feed(p, "k1", [(i, i * 100, "UPDATE", float(i)) for i in range(1, 6)])
    assert h.timers == {10_500}  # only the LAST event's timer survives
    out = _expire(p, "k1", 10_500)
    assert out == [{"id": "k1", "event_id": 5, "value": 5.0, "ts_ms": 500, "op": "upsert"}]
    assert not h.state.exists()


def test_delete_emits_immediately_and_tombstones(proc):
    p, h = proc
    out = _feed(p, "k1", [(1, 0, "UPDATE", 1.0), (2, 50, "DELETE", 0.0)])
    assert out == [{"id": "k1", "event_id": 2, "value": 0.0, "ts_ms": 50, "op": "delete"}]
    # tombstone stored, expires silently
    assert h.state.get()[3] is True
    assert _expire(p, "k1", 10_050) == []
    assert not h.state.exists()


def test_delete_then_readd_keeps_readd(proc):
    p, h = proc
    out = _feed(
        p,
        "k1",
        [(1, 0, "UPDATE", 1.0), (2, 50, "DELETE", 0.0), (3, 100, "ADD", 7.0)],
    )
    assert [r["op"] for r in out] == ["delete"]
    assert _expire(p, "k1", 10_100) == [
        {"id": "k1", "event_id": 3, "value": 7.0, "ts_ms": 100, "op": "upsert"}
    ]


def test_cross_batch_straggler_loses(proc):
    p, h = proc
    _feed(p, "k1", [(10, 100_000, "UPDATE", 9.0)])
    # later batch, older timestamp: must not overwrite, must not reset timer
    assert _feed(p, "k1", [(11, 95_000, "UPDATE", 1.0)]) == []
    assert h.timers == {110_000}
    assert _expire(p, "k1", 110_000) == [
        {"id": "k1", "event_id": 10, "value": 9.0, "ts_ms": 100_000, "op": "upsert"}
    ]


def test_old_delete_straggler_neither_emits_nor_cancels(proc):
    p, h = proc
    _feed(p, "k1", [(10, 100_000, "UPDATE", 9.0)])
    assert _feed(p, "k1", [(11, 95_000, "DELETE", 0.0)]) == []
    assert h.state.get()[0] == 10  # upsert still buffered
    assert _expire(p, "k1", 110_000)[0]["op"] == "upsert"


def test_stale_timer_is_ignored(proc):
    p, h = proc
    _feed(p, "k1", [(1, 0, "UPDATE", 1.0)])
    _feed(p, "k1", [(2, 5_000, "UPDATE", 2.0)])  # timer moved 10_000 -> 15_000
    # a stale timer firing anyway (e.g. restored from a checkpoint) is a no-op
    assert _expire(p, "k1", 10_000) == []
    assert h.state.exists()
    assert _expire(p, "k1", 15_000)[0]["event_id"] == 2
