"""Exact per-key timer debounce — arbitrary stateful streaming.

The default pipeline (streaming.pipeline) approximates the reference's
debounce with watermarked dedup + per-trigger resolution: correct outputs,
but flush timing is quantized to the trigger interval. This module implements
the reference's EXACT timer semantics (debounce.go:32-149) with
applyInPandasWithState + event-time timeouts:

  - every upsert for a key stores the latest state and RESETS the key's timer
    to event_ts + gap (last-state-wins: debounce.go:127-149)
  - the key flushes only when the watermark passes its timer (quiet period
    elapsed: debounce.go:104-149)
  - a DELETE bypasses the buffer entirely: emitted immediately, pending upsert
    cancelled (debounce.go:105-121)
  - delete-then-readd keeps the re-add (the generation-counter semantics of
    crd_debounce.go:125-148, which Spark's single-threaded per-key state
    model gives for free)

Event-time consistency across micro-batches: every state transition is
guarded by the event's (ts, delete-rank, event_id) rank against the stored
state, and deletes leave a timered tombstone — so an out-of-order event
arriving in a LATER micro-batch (but with an OLDER timestamp) loses, exactly
as it would in the batch resolution / the DuckDB oracle. Without the guard,
the flushed "last state" would depend on where the batch boundary fell.

Scale: state lives in the executor state store (RocksDB/HDFS-backed),
partitioned by key hash — the distributed upgrade of the reference's single
mutex-guarded `pending` map. Arrow batches bound the Python-side memory;
tombstones expire on the same quiet-period timer (state TTL).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "id string, event_id bigint, value double, ts_ms bigint, op string"
)
# deleted=True rows are tombstones: they suppress older stragglers until the
# timer expires them; only deleted=False states flush as upserts.
STATE_SCHEMA = "event_id bigint, value double, ts_ms bigint, deleted boolean"


def stateful_debounce(
    change_stream: DataFrame,
    gap_ms: int = 10_000,
    key_col: str = "id",
    ts_col: str = "event_ts",
    event_type_col: str = "op_type",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming DataFrame -> debounced change rows with exact timer semantics.

    Input must carry (key, ts, event_type, event_id, value); output rows are
    (id, event_id, value, ts_ms, op) where op is 'upsert' (flushed after the
    quiet period) or 'delete' (immediate).
    """

    def debounce_fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_id,) = key
        if state.hasTimedOut:
            event_id, value, ts_ms, deleted = state.get
            state.remove()
            if not deleted:  # tombstones expire silently
                yield pd.DataFrame(
                    [
                        {
                            "id": key_id,
                            "event_id": event_id,
                            "value": value,
                            "ts_ms": ts_ms,
                            "op": "upsert",
                        }
                    ]
                )
            return

        rows: list[dict[str, Any]] = []
        for pdf in pdf_iter:
            rows.extend(pdf.to_dict("records"))
        rows.sort(key=lambda r: (r[ts_col], r["event_id"]))

        out: list[dict[str, Any]] = []
        cur: tuple | None = state.get if state.exists else None

        def rank(ts_ms: int, is_delete: bool, event_id: int) -> tuple:
            return (ts_ms, 1 if is_delete else 0, event_id)

        for r in rows:
            ts_ms = int(pd.Timestamp(r[ts_col]).value // 1_000_000)
            is_delete = r[event_type_col] == "DELETE"
            event_id = int(r["event_id"])
            if cur is not None and rank(ts_ms, is_delete, event_id) <= rank(
                cur[2], cur[3], cur[0]
            ):
                continue  # out-of-order straggler: the stored state is newer
            if is_delete:
                # delete bypasses the buffer: emitted now, pending cancelled,
                # tombstone kept so older stragglers cannot resurrect the key
                out.append(
                    {
                        "id": key_id,
                        "event_id": event_id,
                        "value": r.get("value"),
                        "ts_ms": ts_ms,
                        "op": "delete",
                    }
                )
                cur = (event_id, r.get("value"), ts_ms, True)
            else:
                # last-state-wins; timer resets to this event's ts + gap
                cur = (event_id, r.get("value"), ts_ms, False)

        if cur is not None:
            state.update(cur)
            state.setTimeoutTimestamp(cur[2] + gap_ms)
        if out:
            yield pd.DataFrame(out)

    return (
        change_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            debounce_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas variant (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------
# Same timer semantics as stateful_debounce, on the forward-path API SURVEY
# §2.4 names: explicit ValueState + first-class timers instead of the single
# implicit state/timeout slot. Differences that matter here:
#   - registerTimer ADDS a timer (it does not replace), so the previous
#     expiry is stored in state and deleted before the reset — the reference
#     debouncer's timer.Reset (debounce.go:131-141).
#   - expired timers carry their expiry; a belt-and-braces equality check
#     against the stored expiry ignores any stale timer that escaped
#     deleteTimer (e.g. after a checkpoint restore).
# State layout appends timer_ms to the applyInPandasWithState schema.
_TWS_STATE_SCHEMA = (
    "event_id bigint, value double, ts_ms bigint, deleted boolean, timer_ms bigint"
)


def stateful_debounce_tws(
    change_stream: DataFrame,
    gap_ms: int = 10_000,
    key_col: str = "id",
    ts_col: str = "event_ts",
    event_type_col: str = "op_type",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """`stateful_debounce` on transformWithStateInPandas — identical inputs,
    outputs, and cross-batch event-time consistency guarantees.

    Runtime requirement: the transformWithState Python worker speaks protobuf
    to the JVM (pyspark.sql.streaming.proto), so ``google.protobuf`` must be
    importable on executors — environments without it should use
    ``stateful_debounce`` (the tests probe and skip accordingly).
    """
    processor_cls = _make_debounce_processor_class()
    return (
        change_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=processor_cls(gap_ms, ts_col, event_type_col),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def _make_debounce_processor_class():
    """Build the StatefulProcessor subclass lazily: the base class import is
    deferred so environments whose pyspark lacks the transformWithState API
    still import this module."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class DebounceProcessor(StatefulProcessor):
        """Per-key debounce as an explicit-timer stateful processor; logic is
        shared verbatim with stateful_debounce's GroupState closure."""

        def __init__(self, gap_ms: int, ts_col: str, event_type_col: str) -> None:
            self.gap_ms = gap_ms
            self.ts_col = ts_col
            self.event_type_col = event_type_col

        def init(self, handle) -> None:
            self.handle = handle
            self.buf = handle.getValueState("buf", _TWS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            (key_id,) = key
            recs: list[dict[str, Any]] = []
            for pdf in rows:
                recs.extend(pdf.to_dict("records"))
            recs.sort(key=lambda r: (r[self.ts_col], r["event_id"]))

            cur: tuple | None = tuple(self.buf.get()) if self.buf.exists() else None
            prev_timer = cur[4] if cur is not None else None

            def rank(ts_ms: int, is_delete: bool, event_id: int) -> tuple:
                return (ts_ms, 1 if is_delete else 0, event_id)

            out: list[dict[str, Any]] = []
            for r in recs:
                ts_ms = int(pd.Timestamp(r[self.ts_col]).value // 1_000_000)
                is_delete = r[self.event_type_col] == "DELETE"
                event_id = int(r["event_id"])
                if cur is not None and rank(ts_ms, is_delete, event_id) <= rank(
                    cur[2], cur[3], cur[0]
                ):
                    continue  # out-of-order straggler: the stored state is newer
                if is_delete:
                    out.append(
                        {
                            "id": key_id,
                            "event_id": event_id,
                            "value": r.get("value"),
                            "ts_ms": ts_ms,
                            "op": "delete",
                        }
                    )
                    cur = (event_id, r.get("value"), ts_ms, True, None)
                else:
                    cur = (event_id, r.get("value"), ts_ms, False, None)

            if cur is not None:
                new_timer = cur[2] + self.gap_ms
                if prev_timer is not None and prev_timer != new_timer:
                    self.handle.deleteTimer(prev_timer)  # timer.Reset analog
                if prev_timer != new_timer:
                    self.handle.registerTimer(new_timer)
                self.buf.update((cur[0], cur[1], cur[2], cur[3], new_timer))
            if out:
                yield pd.DataFrame(out)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            (key_id,) = key
            expiry = expired_timer_info.getExpiryTimeInMs()
            if self.buf.exists():
                event_id, value, ts_ms, deleted, timer_ms = tuple(self.buf.get())
                if timer_ms == expiry:
                    self.buf.clear()
                    if not deleted:  # tombstones expire silently
                        yield pd.DataFrame(
                            [
                                {
                                    "id": key_id,
                                    "event_id": event_id,
                                    "value": value,
                                    "ts_ms": ts_ms,
                                    "op": "upsert",
                                }
                            ]
                        )

        def close(self) -> None:
            pass

    return DebounceProcessor


def __getattr__(name: str):
    if name == "DebounceProcessor":
        cls = _make_debounce_processor_class()
        globals()["DebounceProcessor"] = cls
        return cls
    raise AttributeError(name)
