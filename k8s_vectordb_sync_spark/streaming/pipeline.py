"""Structured Streaming pipelines (SURVEY §3.1 / §3.3).

Topology (mirrors the reference wiring at cmd/main.go:106-182):

  readStream(change source)
    -> watermark(event_ts)
    -> instance/CRD stream split (filters.split_crd_stream analog)
    -> per-key debounce:
         default: within-trigger last-state-wins + dropDuplicatesWithinWatermark
         exact-timer variant: transformWithStateInPandas per-key timers
    -> foreachBatch sink (delete priority, chunking, retry)  [sink.py]

Design decisions vs the reference (documented divergences, SURVEY §7):
  - No load-shedding: the reference drops events when channels fill
    (watcher.go:278-287); we rate-limit the source (maxFilesPerTrigger /
    maxOffsetsPerTrigger) and let backpressure propagate. Strictly stronger.
  - Shutdown drain (cmd/main.go:231-254) is replaced by checkpoint replay:
    a killed query resumes from the checkpoint and re-emits; the idempotent
    sink absorbs duplicates. At-least-once -> effectively-once.
  - Delete fast path (debounce.go:105-121): deletes resolve within the same
    trigger; with the default 5 s processing-time trigger the delete latency
    bound (< 1 s in the reference's 10 s-window test, integration_test.go:211)
    is met by running the delete partition with `availableNow`/short trigger.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import EngineConfig

# the delete priority path runs on its own fixed short cadence, independent
# of the configured flush interval (that independence IS the bypass — the
# reference short-circuits deletes past all buffering, debounce.go:105-121)
DELETE_FAST_PATH_TRIGGER_MS = 1_000


def flush_trigger(config: EngineConfig) -> dict:
    """The trigger the instance/CRD sync queries run on when the caller does
    not override: one micro-batch per BATCH_FLUSH_INTERVAL_MS (the
    reference's flush ticker, debounce.go:153-232 / config.go:49). A pure
    function of config so tests can assert the wiring without starting a
    query (tests/test_config_topology.py)."""
    return {"processingTime": f"{config.batch_flush_interval_ms} milliseconds"}


def delete_trigger(config: EngineConfig) -> dict:
    """The delete fast path's trigger — deliberately NOT derived from the
    flush interval (config is accepted for signature symmetry and future
    knobs)."""
    return {"processingTime": f"{DELETE_FAST_PATH_TRIGGER_MS} milliseconds"}


def watermark_delay_s(config: EngineConfig) -> int:
    """Watermark lag the debounce queries use: 2x the debounce window (late
    data inside one window must still dedup; beyond two windows the
    reference would have flushed anyway)."""
    return max(config.debounce_window_ms // 1000, 1) * 2


def debounced_micro_batch(
    change_stream: DataFrame,
    config: EngineConfig,
    key_col: str = "id",
    ts_col: str = "event_ts",
    event_type_col: str = "op_type",
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Watermarked stream ready for foreachBatch resolution.

    The heavy dedup happens inside foreachBatch via the shared batch operator
    (delete_cancels_pending) — within a trigger interval this reproduces the
    reference's within-window semantics exactly; across triggers the
    watermarked dropDuplicatesWithinWatermark removes replayed duplicates by
    (key, event identity).
    """
    dedup_cols = [key_col, *tiebreak_cols]
    return (
        change_stream.withWatermark(
            ts_col, f"{watermark_delay_s(config)} seconds"
        )
        .dropDuplicatesWithinWatermark(dedup_cols)
    )


def start_instance_sync(
    change_stream: DataFrame,
    config: EngineConfig,
    write_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    key_col: str = "id",
    ts_col: str = "event_ts",
    event_type_col: str = "op_type",
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> StreamingQuery:
    """Start the standing instance-sync query.

    write_batch receives the RESOLVED micro-batch (one row per key with `op`),
    i.e. the debounce/dedup already applied via the shared batch operators —
    single code path for batch and streaming (the reference shares
    debounce.go between live and resync paths the same way).
    """
    from ..operators.debounce import delete_cancels_pending

    deduped = debounced_micro_batch(
        change_stream, config, key_col, ts_col, event_type_col, tiebreak_cols
    )

    def resolve_and_write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        renamed = batch_df.withColumnRenamed(event_type_col, "event_type")
        resolved = delete_cancels_pending(
            renamed,
            key_cols=(key_col,),
            ts_col=ts_col,
            event_type_col="event_type",
            tiebreak_cols=list(tiebreak_cols),
        )
        write_batch(resolved, batch_id)

    writer = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(resolve_and_write)
        .option(
            "checkpointLocation",
            checkpoint_dir or config.checkpoint_dir,
        )
    )
    trigger = trigger or flush_trigger(config)
    writer = writer.trigger(**trigger)
    return writer.start()


def start_crd_sync(
    crd_stream: DataFrame,
    config: EngineConfig,
    write_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    name_col: str = "crd_name",
    ts_col: str = "event_ts",
) -> StreamingQuery | None:
    """The capabilities pipeline (SURVEY §3.3): name-only stream, dedup of
    repeated ADDs per name within the watermark, its own sink + checkpoint.
    Disabled (returns None) when no capabilities endpoint is configured
    (cmd/main.go:147-171)."""
    if not config.crd_pipeline_enabled:
        return None
    deduped = (
        crd_stream.filter(F.col("event_type") != "UPDATE")  # watcher.go:241-243
        .withWatermark(ts_col, f"{watermark_delay_s(config)} seconds")
        .dropDuplicatesWithinWatermark([name_col, "event_type"])
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir or config.checkpoint_dir + "/crd")
    )
    trigger = trigger or flush_trigger(config)
    writer = writer.trigger(**trigger)
    return writer.start()


def start_delete_fast_path(
    change_stream: DataFrame,
    config: EngineConfig,
    write_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    event_type_col: str = "op_type",
) -> StreamingQuery:
    """The delete priority path as its own standing query (SURVEY §4: the
    reference short-circuits deletes past all buffering, debounce.go:105-121;
    in Spark that is a topology decision, not an operator).

    Filters the DELETE partition of the stream and forwards it with a short
    trigger (default 1s), independent of the main query's debounce/flush
    cadence — reproducing the reference's <1s delete latency bound
    (integration_test.go:211-255) regardless of the 10s window. Stateless:
    no watermark, no dedup — deletes are idempotent at the MERGE sink, so
    replays are harmless.
    """
    deletes = change_stream.filter(F.col(event_type_col) == "DELETE")

    def forward(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_batch(batch_df.withColumn("op", F.lit("delete")), batch_id)

    writer = (
        deletes.writeStream.outputMode("append")
        .foreachBatch(forward)
        .option(
            "checkpointLocation",
            checkpoint_dir or config.checkpoint_dir + "/deletes",
        )
    )
    trigger = trigger or delete_trigger(config)
    writer = writer.trigger(**trigger)
    return writer.start()
