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
