"""Periodic resync scheduler (scheduler.py) — the watcher.go:125 ticker
analog. Driven with a fake timer (no sleeping): each FakeTimer.start is
recorded and the test fires ticks explicitly, so the schedule-fire-reschedule
loop is exercised deterministically."""

from __future__ import annotations

import pytest

from k8s_vectordb_sync_spark.scheduler import PeriodicResync


class FakeTimer:
    """Manual-fire stand-in for threading.Timer: records itself on start,
    runs its callback only when the test calls fire()."""

    def __init__(self, interval, fn, log):
        self.interval = interval
        self.fn = fn
        self.log = log
        self.cancelled = False

    def start(self):
        self.log.append(self)

    def cancel(self):
        self.cancelled = True

    def fire(self):
        self.fn()


@pytest.fixture()
def fake_clock():
    timers: list[FakeTimer] = []
    factory = lambda interval, fn: FakeTimer(interval, fn, timers)
    return timers, factory


def test_two_scheduled_resyncs_heal_injected_drift(fake_clock):
    """The reference's periodic resync exists to heal drift between the
    source of truth and the synced target (watcher.go:349-383 resync,
    :125 ticker). Model: truth is the live snapshot, target is the synced
    copy; each tick copies truth -> target (the trigger_resync merge core is
    separately oracle-verified as cdc_resync_merge). Drift is injected before
    each tick; after each tick the target matches truth again."""
    timers, factory = fake_clock
    truth = {"a": 1, "b": 2}
    target: dict = {}

    def resync():
        target.clear()
        target.update(truth)
        return len(target)

    sched = PeriodicResync(resync, interval_s=24 * 3600, timer_factory=factory).start()
    assert len(timers) == 1 and timers[0].interval == 24 * 3600

    # drift #1: target missing everything (fresh deployment)
    timers[-1].fire()
    assert target == truth and sched.runs == 1
    assert len(timers) == 2  # rearmed

    # drift #2: truth moved on AND the target grew a stale entry
    truth["c"] = 3
    del truth["a"]
    target["stale"] = 99
    timers[-1].fire()
    assert target == {"b": 2, "c": 3} and sched.runs == 2
    assert len(timers) == 3

    sched.stop()
    assert timers[-1].cancelled
    timers[-1].fire()  # a late fire after stop is a no-op
    assert sched.runs == 2 and len(timers) == 3


def test_failed_resync_keeps_ticking(fake_clock):
    timers, factory = fake_clock
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("target briefly unreadable")
        return 0

    sched = PeriodicResync(flaky, interval_s=60, timer_factory=factory).start()
    timers[-1].fire()  # fails
    assert sched.runs == 0 and isinstance(sched.last_error, RuntimeError)
    assert len(timers) == 2  # still rearmed — one bad run must not end healing
    timers[-1].fire()  # succeeds
    assert sched.runs == 1
    sched.stop()


def test_nonpositive_interval_rejected():
    with pytest.raises(ValueError, match="positive"):
        PeriodicResync(lambda: 0, interval_s=0)
