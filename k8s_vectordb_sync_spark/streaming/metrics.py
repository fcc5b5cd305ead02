"""Streaming observability: a StreamingQueryListener that turns Spark's
per-micro-batch progress events into structured metrics rows.

The reference exposes its pipeline health through controller logs (queue
depth, flush counts); a standing Spark deployment watches the progress
stream instead — input rate, processing rate, batch duration, and state
operator rows are the four numbers that predict falling behind BEFORE lag
is user-visible (processedRowsPerSecond < inputRowsPerSecond sustained =
the debounce state will grow without bound).

`MetricsCollector` buffers the flattened progress records in memory (ops
tests, dashboards polling `snapshot()`); `to_jsonl()` serializes for a
metrics shipper. Listener callbacks run on Spark's listener bus thread, so
the buffer is lock-guarded and callbacks NEVER raise (a throwing listener
kills the bus, not the query — swallow and count errors instead).
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class MetricsCollector(StreamingQueryListener):
    """Collects per-micro-batch progress metrics for all queries on the
    session (filter by `query_name` to scope). Attach with
    ``spark.streams.addListener(collector)``; detach with
    ``removeListener`` when done (listeners outlive queries)."""

    def __init__(self, query_name: str | None = None) -> None:
        self._lock = threading.Lock()
        self._rows: list[dict] = []
        self._errors = 0
        self._query_name = query_name

    # -- listener callbacks (never raise) --------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        try:
            p = event.progress
            if self._query_name and p.name != self._query_name:
                return
            row = {
                "query_name": p.name,
                "batch_id": p.batchId,
                "timestamp": p.timestamp,
                "num_input_rows": p.numInputRows,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "state_rows_total": sum(
                    (s.numRowsTotal or 0) for s in (p.stateOperators or [])
                ),
                "state_memory_bytes": sum(
                    (s.memoryUsedBytes or 0) for s in (p.stateOperators or [])
                ),
            }
            with self._lock:
                self._rows.append(row)
        except Exception:
            with self._lock:
                self._errors += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- consumer surface -------------------------------------------------
    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self._rows)

    @property
    def errors(self) -> int:
        with self._lock:
            return self._errors

    def falling_behind(self, sustained_batches: int = 3) -> bool:
        """True when the last ``sustained_batches`` micro-batches all
        processed slower than input arrived — the leading indicator of
        unbounded state/lag growth."""
        rows = [
            r
            for r in self.snapshot()
            if r["input_rows_per_sec"] and r["processed_rows_per_sec"]
        ][-sustained_batches:]
        return len(rows) == sustained_batches and all(
            r["processed_rows_per_sec"] < r["input_rows_per_sec"] for r in rows
        )

    def to_jsonl(self) -> str:
        return "\n".join(json.dumps(r) for r in self.snapshot())
