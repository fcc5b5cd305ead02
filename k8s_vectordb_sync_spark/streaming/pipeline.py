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
    gap_s = max(config.debounce_window_ms // 1000, 1)
    dedup_cols = [key_col, *tiebreak_cols]
    return (
        change_stream.withWatermark(ts_col, f"{gap_s * 2} seconds")
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
    trigger = trigger or {"processingTime": f"{config.batch_flush_interval_ms} milliseconds"}
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
    gap_s = max(config.debounce_window_ms // 1000, 1)
    deduped = (
        crd_stream.filter(F.col("event_type") != "UPDATE")  # watcher.go:241-243
        .withWatermark(ts_col, f"{gap_s * 2} seconds")
        .dropDuplicatesWithinWatermark([name_col, "event_type"])
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir or config.checkpoint_dir + "/crd")
    )
    trigger = trigger or {"processingTime": f"{config.batch_flush_interval_ms} milliseconds"}
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
    trigger = trigger or {"processingTime": "1 second"}
    writer = writer.trigger(**trigger)
    return writer.start()
