"""The instance-sync pipeline, batch form (SURVEY §3.1).

Composition of the shared operators:

  change stream -> change suppression -> debounce (per-key last-state-wins
  within quiet-period sessions) -> delete-cancels-upsert resolution ->
  upsert/delete payload split -> batch assembly (<= batch_max_size rows per
  payload)

This is the same operator chain the reference wires at cmd/main.go:106-144,
expressed as one declarative plan. Catalyst sees the whole chain, so the
change-suppression filter and the projection push toward the scan, and the
windowed operators share a single hash exchange on `id`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import EngineConfig
from ..operators import debounce as dbn
from ..operators.filters import suppress_unchanged_updates


def resolve_changes(
    change_stream: DataFrame,
    config: EngineConfig | None = None,
    key_col: str = "id",
    ts_col: str = "event_ts",
    event_type_col: str = "op_type",
    state_cols: tuple[str, ...] = ("value",),
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """change stream -> one resolved row per (key, quiet-period session) with
    an `op` column ('upsert'|'delete')."""
    config = config or EngineConfig()
    suppressed = suppress_unchanged_updates(
        change_stream.withColumnRenamed(event_type_col, "event_type"),
        key_col=key_col,
        ts_col=ts_col,
        state_cols=list(state_cols),
        tiebreak_cols=list(tiebreak_cols),
    )
    sessioned = dbn.assign_sessions(
        suppressed,
        key_cols=(key_col,),
        ts_col=ts_col,
        gap_ms=config.debounce_window_ms,
        tiebreak_cols=list(tiebreak_cols),
    )
    resolved = dbn.delete_cancels_pending(
        sessioned,
        key_cols=(key_col, "session_id"),
        ts_col=ts_col,
        event_type_col="event_type",
        tiebreak_cols=list(tiebreak_cols),
    )
    return resolved


def build_payloads(resolved: DataFrame, config: EngineConfig | None = None) -> tuple[DataFrame, DataFrame]:
    """Split resolved changes into (upsert batches, delete ids) with
    batch_id chunking on the upsert side (deletes flush alone and immediately,
    debounce.go:105-121)."""
    config = config or EngineConfig()
    upserts, deletes = dbn.split_payloads(resolved)
    batched = dbn.assign_batches(
        upserts, batch_max_size=config.batch_max_size, order_cols=("event_ts", "id")
    )
    return batched, deletes
