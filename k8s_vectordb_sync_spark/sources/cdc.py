"""CDC adapters: turn generic event tables into the engine's change-stream
shape (FIXTURES.md §1), batch and streaming.

The driver's `events` table (event_id, ts, user_id, event_type, value, props)
plays the role of the reference's resource-change stream (TESTDATA.md /
FIXTURES.md §6). The mapping is deterministic so every downstream operator is
oracle-checkable:

  entity key  id  = 'user/' || user_id      (the reference's composite key,
                                             extract.go:56-58 analog)
  op          ADD     <- event_type 'signup'
              DELETE  <- event_type 'error'  (a terminal event for the entity)
              UPDATE  <- anything else
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import table_path


def events_as_change_stream(events: DataFrame) -> DataFrame:
    """Project the raw events table into CDC rows: (event_type, event_ts, id,
    payload columns, tiebreaker event_id). Pure projection — stays in the scan."""
    return events.select(
        F.when(F.col("event_type") == "signup", F.lit("ADD"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
        .alias("op_type"),
        F.col("ts").alias("event_ts"),
        F.concat(F.lit("user/"), F.col("user_id").cast("string")).alias("id"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type").alias("raw_event_type"),
        F.col("value"),
        F.col("props"),
    )


def read_change_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming variant: the same parquet data as a file stream.

    maxFilesPerTrigger is the batch-side rate limit — Spark's real
    backpressure, replacing the reference's drop-on-full channels
    (watcher.go:278-287; SURVEY §2.4 'bounded-channel backpressure': we
    intentionally never drop).
    """
    reader = spark.readStream.schema(
        spark.read.parquet(table_path(sf_dir, "events")).schema
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(table_path(sf_dir, "events"))
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # TIMESTAMP(NANOS) parquet read as long (see sources.tables.load_table)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        # TIMESTAMP(MICROS) without UTC flag; session TZ is UTC (ditto)
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return events_as_change_stream(raw)
