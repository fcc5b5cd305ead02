"""Metadata projection — the reference's scalar-function surface.

Re-expresses internal/metadata/extract.go (SURVEY §2.2) as pure Column
expressions. Everything here stays JVM-side (whole-stage codegen): no Python
UDFs. That means Catalyst can push the projection into the parquet scan
(column pruning) — the Spark upgrade of the reference's "only read metadata"
design (extract.go:30-52).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import ANNOTATION_NOISE_PREFIXES, CLUSTER_NAMESPACE


def normalize_namespace(namespace: Column) -> Column:
    """Empty/null namespace -> '_cluster' sentinel (extract.go:32-35)."""
    return F.when(
        namespace.isNull() | (namespace == F.lit("")), F.lit(CLUSTER_NAMESPACE)
    ).otherwise(namespace)


def build_id(namespace: Column, api_version: Column, kind: Column, name: Column) -> Column:
    """Composite primary key 'namespace/apiVersion/kind/name' (extract.go:56-58).

    e.g. 'default/apps/v1/Deployment/nginx' (README.md:139). The namespace must
    already be normalized (cluster-scoped -> '_cluster').
    """
    return F.concat_ws("/", namespace, api_version, kind, name)


def extract_api_group(api_version: Column) -> Column:
    """'apps/v1' -> 'apps'; core 'v1' -> '' (extract.go:62-68)."""
    return F.when(
        api_version.contains("/"), F.split(api_version, "/").getItem(0)
    ).otherwise(F.lit(""))


def normalize_created_at(ts: Column) -> Column:
    """Timestamp -> ISO-8601 UTC string 'yyyy-MM-ddTHH:mm:ssZ' (extract.go:50)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def filter_annotations(annotations: Column) -> Column:
    """Drop noise-prefixed annotation keys; empty result -> NULL.

    (extract.go:72-110 — 6 noise prefixes; empty map normalized to nil at
    extract.go:84-100.) Built-in higher-order functions only: map_filter +
    exists, no UDF.
    """
    prefixes = F.array(*[F.lit(p) for p in ANNOTATION_NOISE_PREFIXES])
    filtered = F.map_filter(
        annotations,
        lambda k, _v: ~F.exists(prefixes, lambda p: k.startswith(p)),
    )
    return F.when(F.size(filtered) > 0, filtered)


def normalize_empty_map(m: Column) -> Column:
    """Empty label/annotation map -> NULL (extract.go:84-100)."""
    return F.when(m.isNotNull() & (F.size(m) > 0), m)


def maps_equal(a: Column, b: Column) -> Column:
    """Null-safe map equality (watcher.go:333-343) via sorted entry comparison.

    Spark cannot compare MapType directly; compare sorted key arrays and the
    values looked up in key order. Null and empty compare equal, matching the
    reference's len()==0 semantics.
    """
    a_n = F.coalesce(a, F.create_map())
    b_n = F.coalesce(b, F.create_map())
    a_keys = F.array_sort(F.map_keys(a_n))
    b_keys = F.array_sort(F.map_keys(b_n))
    a_vals = F.transform(a_keys, lambda k: a_n.getItem(k))
    b_vals = F.transform(b_keys, lambda k: b_n.getItem(k))
    return (a_keys == b_keys) & (a_vals == b_vals)


def extract_instances(raw: DataFrame) -> DataFrame:
    """The full projection: raw unstructured resources -> ResourceInstance rows.

    Re-expresses Extract() (extract.go:31-52): project 8 metadata fields out of
    the nested document, never touching spec/status. In Spark this *is* column
    pruning — .explain() shows only metadata.* in ReadSchema.
    """
    ns = normalize_namespace(F.col("metadata.namespace"))
    return raw.select(
        build_id(ns, F.col("api_version"), F.col("kind"), F.col("metadata.name")).alias("id"),
        ns.alias("namespace"),
        F.col("metadata.name").alias("name"),
        F.col("kind").alias("kind"),
        F.col("api_version").alias("api_version"),
        extract_api_group(F.col("api_version")).alias("api_group"),
        normalize_empty_map(F.col("metadata.labels")).alias("labels"),
        filter_annotations(F.col("metadata.annotations")).alias("annotations"),
        normalize_created_at(F.col("metadata.creation_timestamp")).alias("created_at"),
    )
