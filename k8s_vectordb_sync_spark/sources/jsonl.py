"""JSONL watch-event source — the reference's actual wire format.

The reference consumes a stream of watch events, each a JSON envelope
``{type, object}`` where type is ADDED/MODIFIED/DELETED and object is the
resource document (watcher.go:110-145 event loop; watcher.go:254-257
tombstone unwrap is subsumed by the nullable ``object``). This module reads
that format — one JSON object per line — into the engine's change-stream
shape, batch and streaming.

Scale discipline: the schema is EXPLICIT (no inference — a schema-inference
pass over 100 TB of JSONL is a full extra scan, and a poison line would
silently widen columns to string), unparseable lines land in
``_corrupt_record`` (PERMISSIVE mode) instead of killing the job, and
spec/status stay out of the schema entirely so the JSON parser never
materializes them (the projection discipline of extract.go:31-52: column
pruning happens at parse time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.extract import (
    build_id,
    extract_api_group,
    filter_annotations,
    normalize_created_at,
    normalize_empty_map,
    normalize_namespace,
)

# metadata subset the engine projects — spec/status deliberately absent
_METADATA_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("namespace", StringType()),
        StructField("uid", StringType()),
        StructField("resourceVersion", StringType()),
        StructField("creationTimestamp", TimestampType()),
        StructField("labels", MapType(StringType(), StringType())),
        StructField("annotations", MapType(StringType(), StringType())),
    ]
)

WATCH_EVENT_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        StructField(
            "object",
            StructType(
                [
                    StructField("apiVersion", StringType()),
                    StructField("kind", StringType()),
                    StructField("metadata", _METADATA_SCHEMA),
                ]
            ),
        ),
        # event time of the observation (envelope-level, set by the emitter)
        StructField("eventTime", TimestampType()),
        StructField("_corrupt_record", StringType()),
    ]
)

_OP_MAP = {"ADDED": "ADD", "MODIFIED": "UPDATE", "DELETED": "DELETE"}


def read_watch_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of JSONL watch events with the explicit schema."""
    return spark.read.schema(WATCH_EVENT_SCHEMA).option("mode", "PERMISSIVE").json(path)


def read_watch_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of a JSONL watch-event directory (file source)."""
    reader = spark.readStream.schema(WATCH_EVENT_SCHEMA).option("mode", "PERMISSIVE")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def split_corrupt(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(parsed, corrupt) — corrupt lines carry the raw text for a dead-letter
    sink; parsed rows drop the carrier column.

    The input is cached first: Spark refuses queries whose only referenced
    column of a raw JSON scan is the internal corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both split halves read the same
    parse anyway. Caller owns the cache lifecycle (unpersist when done).
    """
    events = events.cache()
    corrupt = events.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    parsed = events.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return parsed, corrupt


def watch_events_as_change_stream(events: DataFrame) -> DataFrame:
    """Watch envelopes -> the engine's CDC shape: (op_type, event_ts, id,
    event_id, instance columns). The id is the reference's composite buildID
    (extract.go:56-58); the resourceVersion is the monotone per-key
    tiebreaker (the generation counter analog, debounce.go:57).

    Unknown envelope types and tombstones without an object are dropped
    (watcher.go:254-257: unwrap produced nothing usable) — the filter happens
    before any shuffle.
    """
    md = F.col("object.metadata")
    ns = normalize_namespace(md["namespace"])
    op = F.create_map(
        *[F.lit(x) for kv in _OP_MAP.items() for x in kv]
    )[F.col("type")]
    return (
        events.filter(F.col("object").isNotNull() & F.col("type").isin(*_OP_MAP))
        .select(
            op.alias("op_type"),
            F.col("eventTime").alias("event_ts"),
            build_id(ns, F.col("object.apiVersion"), F.col("object.kind"), md["name"]).alias("id"),
            md["resourceVersion"].cast("bigint").alias("event_id"),
            md["uid"].alias("uid"),
            ns.alias("namespace"),
            md["name"].alias("name"),
            F.col("object.kind").alias("kind"),
            F.col("object.apiVersion").alias("api_version"),
            extract_api_group(F.col("object.apiVersion")).alias("api_group"),
            normalize_empty_map(md["labels"]).alias("labels"),
            filter_annotations(md["annotations"]).alias("annotations"),
            normalize_created_at(md["creationTimestamp"]).alias("created_at"),
        )
    )
