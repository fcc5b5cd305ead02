"""Periodic full-snapshot resync scheduler — the analog of the reference's
resync ticker (internal/controller/watcher.go:125 fires a full resync every
RESYNC_INTERVAL_MIN, default 24 h per config.go:51). The reference runs it
inside the controller goroutine; here it is a rearming ``threading.Timer``
around the shared ``_run_resync`` batch (the same core the CLI and the ops
server's POST /api/v1/resync call), started by ``cmd_serve``.

A failed run records the error and KEEPS TICKING: the scheduler exists to
heal drift, so one bad run (target briefly unreadable, transient executor
loss) must not silently end all future healing — matching the reference,
whose ticker loop survives resync errors.

``timer_factory`` is injectable so tests drive the schedule with a fake
clock instead of sleeping (tests/test_api_server.py).
"""

from __future__ import annotations

import threading
from typing import Callable


class PeriodicResync:
    """Rearming timer: run ``resync`` every ``interval_s`` seconds until
    stop(). Each firing re-schedules the next — drift (a slow resync delays
    the next tick by its runtime) is acceptable for a drift-healing job and
    avoids overlapping resyncs by construction."""

    def __init__(
        self,
        resync: Callable[[], object],
        interval_s: float,
        timer_factory: Callable[[float, Callable[[], None]], object] | None = None,
    ) -> None:
        if interval_s <= 0:
            raise ValueError(f"interval_s must be positive, got {interval_s}")
        self._resync = resync
        self._interval_s = interval_s
        self._timer_factory = timer_factory or (
            lambda i, fn: threading.Timer(i, fn)
        )
        self._timer: object | None = None
        self._stopped = threading.Event()
        self.runs = 0
        self.last_error: BaseException | None = None

    def start(self) -> "PeriodicResync":
        self._schedule()
        return self

    def _schedule(self) -> None:
        if self._stopped.is_set():
            return
        timer = self._timer_factory(self._interval_s, self._fire)
        if hasattr(timer, "daemon"):
            timer.daemon = True  # never block interpreter shutdown
        self._timer = timer
        timer.start()

    def _fire(self) -> None:
        if self._stopped.is_set():
            return
        try:
            self._resync()
            self.runs += 1
        except Exception as exc:  # noqa: BLE001 — keep ticking (see module doc)
            self.last_error = exc
        self._schedule()

    def stop(self) -> None:
        self._stopped.set()
        timer = self._timer
        if timer is not None and hasattr(timer, "cancel"):
            timer.cancel()
