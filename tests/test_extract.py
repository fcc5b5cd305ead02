"""Projection/extraction tests — translations of
internal/metadata/extract_test.go (SURVEY §5 tier 1)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.functions.extract import (
    build_id,
    extract_api_group,
    extract_instances,
    filter_annotations,
    maps_equal,
    normalize_created_at,
    normalize_empty_map,
    normalize_namespace,
)
from k8s_vectordb_sync_spark.schemas import RAW_RESOURCE_SCHEMA


def _raw_row(
    api_version="apps/v1",
    kind="Deployment",
    name="nginx",
    namespace="default",
    labels=None,
    annotations=None,
    ts=datetime.datetime(2024, 1, 15, 10, 30, 0),
    rv="12345",
):
    return (api_version, kind, (name, namespace, labels, annotations, ts, rv))


def test_extract_namespaced_resource(spark):
    # extract_test.go:23-65: full projection of a namespaced resource
    df = spark.createDataFrame(
        [_raw_row(labels={"app": "nginx"}, annotations={"description": "web server"})],
        RAW_RESOURCE_SCHEMA,
    )
    row = extract_instances(df).first()
    assert row["id"] == "default/apps/v1/Deployment/nginx"
    assert row["namespace"] == "default"
    assert row["name"] == "nginx"
    assert row["kind"] == "Deployment"
    assert row["api_version"] == "apps/v1"
    assert row["api_group"] == "apps"
    assert row["labels"] == {"app": "nginx"}
    assert row["annotations"] == {"description": "web server"}
    assert row["created_at"] == "2024-01-15T10:30:00Z"


def test_extract_cluster_scoped_resource(spark):
    # extract_test.go:66-87: empty namespace -> '_cluster'
    df = spark.createDataFrame(
        [_raw_row(api_version="v1", kind="Namespace", name="prod", namespace="")],
        RAW_RESOURCE_SCHEMA,
    )
    row = extract_instances(df).first()
    assert row["id"] == "_cluster/v1/Namespace/prod"
    assert row["namespace"] == "_cluster"
    assert row["api_group"] == ""  # core group: extract.go:62-68


def test_null_namespace_defaults_to_cluster(spark):
    df = spark.createDataFrame(
        [_raw_row(namespace=None)], RAW_RESOURCE_SCHEMA
    )
    assert extract_instances(df).first()["namespace"] == "_cluster"


def test_filter_annotations_drops_noise_prefixes(spark):
    # extract_test.go:110-147: kubectl/helm/etc. prefixes dropped, others kept
    df = spark.createDataFrame(
        [
            _raw_row(
                annotations={
                    "kubectl.kubernetes.io/last-applied-configuration": "{}",
                    "meta.helm.sh/release-name": "x",
                    "helm.sh/chart": "y",
                    "deployment.kubernetes.io/revision": "3",
                    "control-plane.alpha.kubernetes.io/leader": "z",
                    "kubernetes.io/managed-by": "w",
                    "description": "keep me",
                    "example.com/custom": "keep me too",
                }
            )
        ],
        RAW_RESOURCE_SCHEMA,
    )
    anns = extract_instances(df).first()["annotations"]
    assert anns == {"description": "keep me", "example.com/custom": "keep me too"}


def test_filter_annotations_all_noise_becomes_null(spark):
    # extract.go:84-100: empty result map -> nil
    df = spark.createDataFrame(
        [_raw_row(annotations={"kubectl.kubernetes.io/foo": "1"})],
        RAW_RESOURCE_SCHEMA,
    )
    assert extract_instances(df).first()["annotations"] is None


def test_empty_maps_normalize_to_null(spark):
    df = spark.createDataFrame(
        [_raw_row(labels={}, annotations={})], RAW_RESOURCE_SCHEMA
    )
    row = extract_instances(df).first()
    assert row["labels"] is None
    assert row["annotations"] is None


def test_api_group_extraction(spark):
    # extract.go:62-68 via direct column tests (extract_test.go:155-183)
    df = spark.createDataFrame(
        [("apps/v1",), ("v1",), ("apiextensions.k8s.io/v1",)], "api_version string"
    )
    out = [
        r[0]
        for r in df.select(extract_api_group(F.col("api_version"))).collect()
    ]
    assert out == ["apps", "", "apiextensions.k8s.io"]


def test_build_id_matches_reference_format(spark):
    # extract_test.go:184-202 / README.md:139
    df = spark.createDataFrame([("default", "apps/v1", "Deployment", "nginx")],
                               "ns string, av string, k string, n string")
    got = df.select(
        build_id(F.col("ns"), F.col("av"), F.col("k"), F.col("n"))
    ).first()[0]
    assert got == "default/apps/v1/Deployment/nginx"


def test_maps_equal_null_and_empty(spark):
    # watcher.go:333-343: nil == empty; order-insensitive
    df = spark.createDataFrame(
        [
            ({"a": "1", "b": "2"}, {"b": "2", "a": "1"}, True),
            ({"a": "1"}, {"a": "2"}, False),
            ({}, None, True),
            (None, None, True),
            ({"a": "1"}, {}, False),
        ],
        "a map<string,string>, b map<string,string>, expected boolean",
    )
    rows = df.select(maps_equal(F.col("a"), F.col("b")).alias("got"), "expected").collect()
    for r in rows:
        assert r["got"] == r["expected"]


def test_created_at_utc_format(spark):
    df = spark.createDataFrame(
        [_raw_row(ts=datetime.datetime(2023, 12, 31, 23, 59, 59))], RAW_RESOURCE_SCHEMA
    )
    assert extract_instances(df).first()["created_at"] == "2023-12-31T23:59:59Z"
