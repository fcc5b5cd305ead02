"""Schemas for the CDC data model.

Mirrors the reference's four data abstractions (SURVEY §1.1):
  - ResourceEvent   (reference: internal/controller/watcher.go:35-38)
  - ResourceInstance(reference: internal/metadata/extract.go:12-27)
  - SyncPayload     (reference: internal/controller/debounce.go:16-19)
  - CrdEvent        (reference: internal/controller/watcher.go:41-44)

The instance schema is FIXED (the reference's payload contract,
prds/done/1-resource-sync-controller.md:108-131): we always declare it
explicitly and never rely on schema inference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Event types (reference: watcher.go:25-32)
EVENT_ADD = "ADD"
EVENT_UPDATE = "UPDATE"
EVENT_DELETE = "DELETE"
EVENT_TYPES = (EVENT_ADD, EVENT_UPDATE, EVENT_DELETE)

# Sentinel namespace for cluster-scoped resources (reference: extract.go:32-35)
CLUSTER_NAMESPACE = "_cluster"

# Annotation noise prefixes dropped by the projection
# (reference: internal/metadata/extract.go:72-79)
ANNOTATION_NOISE_PREFIXES = (
    "kubectl.kubernetes.io/",
    "meta.helm.sh/",
    "helm.sh/",
    "deployment.kubernetes.io/",
    "control-plane.alpha.kubernetes.io/",
    "kubernetes.io/",
)

# Default excluded resource types (reference: internal/filter/filter.go:11-17)
DEFAULT_EXCLUDED_RESOURCE_TYPES = (
    "events",
    "leases",
    "endpointslices",
    "componentstatuses",
    "customresourcedefinitions",
)

# ResourceInstance — the projected record (reference: extract.go:12-27).
RESOURCE_INSTANCE_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("namespace", StringType(), True),
        StructField("name", StringType(), True),
        StructField("kind", StringType(), True),
        StructField("api_version", StringType(), True),
        StructField("api_group", StringType(), True),
        StructField("labels", MapType(StringType(), StringType()), True),
        StructField("annotations", MapType(StringType(), StringType()), True),
        StructField("created_at", StringType(), True),
    ]
)

# ResourceEvent — one CDC record (reference: watcher.go:35-38); flattened form
# used by the engine (FIXTURES.md §1).
RESOURCE_EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("event_ts", TimestampType(), False),
        *RESOURCE_INSTANCE_SCHEMA.fields,
        StructField("resource_version", StringType(), True),
    ]
)

# Raw unstructured input for the snapshot/extraction path (FIXTURES.md §2).
RAW_RESOURCE_SCHEMA = StructType(
    [
        StructField("api_version", StringType(), True),
        StructField("kind", StringType(), True),
        StructField(
            "metadata",
            StructType(
                [
                    StructField("name", StringType(), True),
                    StructField("namespace", StringType(), True),
                    StructField("labels", MapType(StringType(), StringType()), True),
                    StructField("annotations", MapType(StringType(), StringType()), True),
                    StructField("creation_timestamp", TimestampType(), True),
                    StructField("resource_version", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

# CrdEvent (reference: watcher.go:41-44; FIXTURES.md §3)
CRD_EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("event_ts", TimestampType(), False),
        StructField("crd_name", StringType(), False),
    ]
)

# SyncPayload — one micro-batch emission (reference: debounce.go:16-19).
# Invariant: upserts XOR deletes per emission (debounce.go:115-121,200-206).
SYNC_PAYLOAD_SCHEMA = StructType(
    [
        StructField("upserts", ArrayType(RESOURCE_INSTANCE_SCHEMA), True),
        StructField("deletes", ArrayType(StringType()), True),
    ]
)

# CrdSyncPayload (reference: crd_debounce.go:16-19)
CRD_SYNC_PAYLOAD_SCHEMA = StructType(
    [
        StructField("upserts", ArrayType(StringType()), True),
        StructField("deletes", ArrayType(StringType()), True),
    ]
)

# Catalog entry for source discovery (reference: watcher.go:159-206,
# filter tests filter_test.go:17-120): (resource name, API verbs).
CATALOG_SCHEMA = StructType(
    [
        StructField("resource_name", StringType(), False),
        StructField("api_group", StringType(), True),
        StructField("verbs", ArrayType(StringType()), True),
    ]
)
