"""Filter/predicate tests — translations of internal/filter/filter_test.go and
watcher_test.go routing/suppression cases (SURVEY §5 tier 1)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.operators.filters import (
    discover_sources,
    is_crd,
    should_watch,
    split_crd_stream,
    suppress_unchanged_updates,
)
from k8s_vectordb_sync_spark.schemas import CATALOG_SCHEMA

CATALOG_ROWS = [
    ("pods", "", ["list", "watch", "get"]),
    ("events", "", ["list", "watch"]),          # default-blocked
    ("leases", "coordination.k8s.io", ["list", "watch"]),  # default-blocked
    ("deployments", "apps", ["list", "watch"]),
    ("pods/status", "", ["get", "patch"]),      # subresource -> skipped
    ("nodes", "", ["list"]),                    # no watch verb -> skipped
    ("secrets", "", ["list", "watch"]),
]


def _catalog(spark):
    return spark.createDataFrame(CATALOG_ROWS, CATALOG_SCHEMA)


def test_blocklist_default(spark):
    # filter_test.go: default blocklist drops events/leases/...
    got = {
        r["resource_name"]
        for r in discover_sources(_catalog(spark)).collect()
    }
    assert got == {"pods", "deployments", "secrets"}


def test_allowlist_takes_precedence(spark):
    # filter_test.go:112 AllowlistTakesPrecedenceOverBlocklist
    got = {
        r["resource_name"]
        for r in discover_sources(_catalog(spark), allowlist=["events", "pods"]).collect()
    }
    assert got == {"pods", "events"}


def test_filter_case_insensitive_and_trimmed(spark):
    # filter.go:75-84
    df = spark.createDataFrame([("PODS",), ("  pods  ",), ("Secrets",)], "resource_name string")
    got = df.filter(should_watch(F.col("resource_name"), allowlist=["pods"])).count()
    assert got == 2


def test_verbs_capability_predicate(spark):
    # filter.go:61-73: need both list and watch
    kept = discover_sources(_catalog(spark), allowlist=["nodes"]).count()
    assert kept == 0


def test_subresource_skip(spark):
    # watcher.go:177-180
    kept = discover_sources(_catalog(spark), allowlist=["pods/status"]).count()
    assert kept == 0


def test_crd_routing_predicate(spark):
    # watcher_test.go:404-484 EventRouting_CRD*
    df = spark.createDataFrame(
        [
            ("CustomResourceDefinition", "apiextensions.k8s.io/v1", True),
            ("CustomResourceDefinition", "example.com/v1", False),
            ("Deployment", "apps/v1", False),
        ],
        "kind string, api_version string, expected boolean",
    )
    for r in df.select(is_crd(F.col("kind"), F.col("api_version")).alias("got"), "expected").collect():
        assert r["got"] == r["expected"]


def test_split_crd_stream_drops_crd_updates(spark):
    # watcher.go:241-243: CRD UPDATE events dropped entirely
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("ADD", t0, "CustomResourceDefinition", "apiextensions.k8s.io/v1", "widgets.example.com"),
        ("UPDATE", t0, "CustomResourceDefinition", "apiextensions.k8s.io/v1", "widgets.example.com"),
        ("DELETE", t0, "CustomResourceDefinition", "apiextensions.k8s.io/v1", "widgets.example.com"),
        ("UPDATE", t0, "Deployment", "apps/v1", "nginx"),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_ts timestamp, kind string, api_version string, name string"
    )
    instances, crds = split_crd_stream(df)
    assert instances.count() == 1
    assert {r["event_type"] for r in crds.collect()} == {"ADD", "DELETE"}


def test_change_suppression(spark):
    # watcher_test.go:28-84 MetadataChanged_*: unchanged UPDATEs dropped,
    # ADD/DELETE always pass, changed UPDATEs pass.
    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        ("ADD", t(0), "k1", 1, "rv1"),
        ("UPDATE", t(1), "k1", 2, "rv1"),   # unchanged rv -> suppressed
        ("UPDATE", t(2), "k1", 3, "rv2"),   # changed -> kept
        ("UPDATE", t(3), "k1", 4, "rv2"),   # unchanged again -> suppressed
        ("DELETE", t(4), "k1", 5, "rv2"),   # DELETE always passes
        ("UPDATE", t(0), "k2", 6, "rvX"),   # first event for key (no ADD) -> kept
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_ts timestamp, id string, event_id long, resource_version string"
    )
    out = suppress_unchanged_updates(
        df, state_cols=["resource_version"], tiebreak_cols=["event_id"]
    )
    kept = sorted(r["event_id"] for r in out.collect())
    assert kept == [1, 3, 5, 6]


def test_change_suppression_null_state_matches_oracle_predicate(spark):
    # ADVICE r1: the Spark filter and the DuckDB oracle must agree when the
    # tracked state is NULL: NULL->NULL repeat suppressed, x->NULL change
    # kept, first event per key kept even with NULL state.
    import duckdb

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        ("UPDATE", t(0), "k1", 1, None),    # first event, NULL state -> kept
        ("UPDATE", t(1), "k1", 2, None),    # NULL -> NULL repeat -> suppressed
        ("UPDATE", t(2), "k1", 3, "rv1"),   # NULL -> rv1 -> kept
        ("UPDATE", t(3), "k1", 4, None),    # rv1 -> NULL -> kept
        ("UPDATE", t(4), "k1", 5, None),    # NULL -> NULL -> suppressed
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_ts timestamp, id string, event_id long, resource_version string"
    )
    out = suppress_unchanged_updates(
        df, state_cols=["resource_version"], tiebreak_cols=["event_id"]
    )
    kept = sorted(r["event_id"] for r in out.collect())
    assert kept == [1, 3, 4]

    # the registered oracles' predicate shape (rn = 1 OR prev IS DISTINCT FROM cur)
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (event_type VARCHAR, id VARCHAR, event_id BIGINT, rv VARCHAR)")
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, ?, ?)",
        [(r[0], r[2], r[3], r[4]) for r in rows],
    )
    oracle_kept = [
        r[0]
        for r in con.execute(
            """WITH lagged AS (
                 SELECT event_id, event_type,
                        row_number() OVER (PARTITION BY id ORDER BY event_id) AS rn,
                        lag(rv) OVER (PARTITION BY id ORDER BY event_id) AS prev_rv, rv
                 FROM ev)
               SELECT event_id FROM lagged
               WHERE event_type <> 'UPDATE' OR rn = 1 OR prev_rv IS DISTINCT FROM rv
               ORDER BY event_id"""
        ).fetchall()
    ]
    assert oracle_kept == kept
