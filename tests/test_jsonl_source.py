"""JSONL watch-event source: explicit-schema parse, corrupt-line dead-letter,
envelope -> CDC mapping, and streaming read — the reference's wire format
(watcher.go:110-145, tombstone unwrap :254-257).
"""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest

from k8s_vectordb_sync_spark.sources.jsonl import (
    read_watch_events,
    read_watch_events_stream,
    split_corrupt,
    watch_events_as_change_stream,
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="kvs-jsonl-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _evt(t, name, ns="default", kind="Widget", rv="1", api="example.com/v1", ts="2024-01-01T00:00:00Z"):
    return {
        "type": t,
        "object": {
            "apiVersion": api,
            "kind": kind,
            "metadata": {
                "name": name,
                "namespace": ns,
                "uid": f"uid-{name}",
                "resourceVersion": rv,
                "creationTimestamp": "2023-12-31T23:00:00Z",
                "labels": {"app": name},
                "annotations": {
                    "team": "data",
                    "kubectl.kubernetes.io/last-applied-configuration": "noise",
                },
            },
        },
        "eventTime": ts,
    }


def _write(path, events, corrupt_lines=()):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
        for line in corrupt_lines:
            f.write(line + "\n")


def test_parse_and_change_stream_mapping(spark, workdir):
    _write(
        f"{workdir}/events.jsonl",
        [
            _evt("ADDED", "w1", rv="1"),
            _evt("MODIFIED", "w1", rv="2"),
            _evt("DELETED", "w1", rv="3"),
            _evt("BOOKMARK", "w2"),  # unknown envelope type: dropped
            {"type": "DELETED", "object": None},  # empty tombstone: dropped
        ],
    )
    raw = read_watch_events(spark, f"{workdir}/events.jsonl")
    ch = watch_events_as_change_stream(raw)
    rows = sorted(
        ((r["op_type"], r["id"], r["event_id"]) for r in ch.collect()),
        key=lambda x: x[2],
    )
    assert rows == [
        ("ADD", "default/example.com/v1/Widget/w1", 1),
        ("UPDATE", "default/example.com/v1/Widget/w1", 2),
        ("DELETE", "default/example.com/v1/Widget/w1", 3),
    ]


def test_annotations_noise_filtered_and_labels_kept(spark, workdir):
    _write(f"{workdir}/e.jsonl", [_evt("ADDED", "w1")])
    row = watch_events_as_change_stream(
        read_watch_events(spark, f"{workdir}/e.jsonl")
    ).first()
    assert row["labels"] == {"app": "w1"}
    assert row["annotations"] == {"team": "data"}  # kubectl noise removed


def test_corrupt_lines_dead_letter(spark, workdir):
    _write(
        f"{workdir}/e.jsonl",
        [_evt("ADDED", "w1")],
        corrupt_lines=['{"type": "ADDED", "object": {', "not json at all"],
    )
    parsed, corrupt = split_corrupt(read_watch_events(spark, f"{workdir}/e.jsonl"))
    assert parsed.count() == 1
    bad = sorted(r["_corrupt_record"] for r in corrupt.collect())
    assert bad == ["not json at all", '{"type": "ADDED", "object": {']


def test_cluster_scoped_namespace_defaulting(spark, workdir):
    e = _evt("ADDED", "w1")
    del e["object"]["metadata"]["namespace"]
    _write(f"{workdir}/e.jsonl", [e])
    row = watch_events_as_change_stream(
        read_watch_events(spark, f"{workdir}/e.jsonl")
    ).first()
    assert row["id"].startswith("_cluster/")
    assert row["namespace"] == "_cluster"


def test_streaming_read_matches_batch(spark, workdir):
    _write(f"{workdir}/src.jsonl", [_evt("ADDED", f"w{i}", rv=str(i)) for i in range(5)])
    stream_dir = f"{workdir}/stream"
    import os

    os.makedirs(stream_dir)
    shutil.copy(f"{workdir}/src.jsonl", f"{stream_dir}/part-0.jsonl")
    collected = []
    q = (
        watch_events_as_change_stream(read_watch_events_stream(spark, stream_dir))
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: collected.extend(df.collect()))
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["event_id"] for r in collected) == [0, 1, 2, 3, 4]


def test_jsonl_stream_through_instance_sync_pipeline(spark, workdir):
    # the reference's actual topology: JSON watch events -> debounce ->
    # resolved upserts/deletes (cmd/main.go wiring), driven end-to-end from
    # the JSONL source through start_instance_sync
    import os

    from k8s_vectordb_sync_spark.config import EngineConfig
    from k8s_vectordb_sync_spark.streaming.pipeline import start_instance_sync

    events = [
        _evt("ADDED", "w1", rv="1", ts="2024-01-01T00:00:00Z"),
        _evt("MODIFIED", "w1", rv="2", ts="2024-01-01T00:00:01Z"),
        _evt("ADDED", "w2", rv="3", ts="2024-01-01T00:00:02Z"),
        _evt("DELETED", "w2", rv="4", ts="2024-01-01T00:00:03Z"),
    ]
    stream_dir = f"{workdir}/stream"
    os.makedirs(stream_dir)
    _write(f"{stream_dir}/part-0.jsonl", events)

    collected = []
    stream = watch_events_as_change_stream(read_watch_events_stream(spark, stream_dir))
    q = start_instance_sync(
        stream,
        EngineConfig(),
        lambda df, bid: collected.extend(df.collect()),
        checkpoint_dir=f"{workdir}/ckpt",
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    by_id = {r["id"]: r["op"] for r in collected}
    assert by_id == {
        "default/example.com/v1/Widget/w1": "upsert",
        "default/example.com/v1/Widget/w2": "delete",
    }
    # last-state-wins carried the newer resourceVersion for w1
    w1 = next(r for r in collected if r["id"].endswith("/w1"))
    assert w1["event_id"] == 2
