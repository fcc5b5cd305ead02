"""StreamingQueryListener metrics collector (streaming/metrics.py): real
progress events from a file-source query land as structured rows, the
falling-behind detector fires on crafted rate histories, and callbacks never
propagate exceptions."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.streaming.metrics import MetricsCollector


def test_collects_progress_from_live_query(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(500).select(F.col("id")).write.mode("overwrite").parquet(src)
    collector = MetricsCollector(query_name="metrics-test")
    spark.streams.addListener(collector)
    try:
        stream = spark.readStream.schema("id long").parquet(src)
        q = (
            stream.writeStream.outputMode("append")
            .format("noop")
            .queryName("metrics-test")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        # progress events are delivered asynchronously on the listener bus
        deadline = time.time() + 30
        while time.time() < deadline and not collector.snapshot():
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(collector)
    rows = collector.snapshot()
    assert rows, "no progress events collected"
    assert collector.errors == 0
    got = rows[0]
    assert got["query_name"] == "metrics-test"
    assert sum(r["num_input_rows"] for r in rows) == 500
    assert got["batch_duration_ms"] is not None
    for line in collector.to_jsonl().splitlines():
        json.loads(line)


def test_falling_behind_detector():
    c = MetricsCollector()
    base = {
        "query_name": "q", "batch_id": 0, "timestamp": "t",
        "num_input_rows": 10, "batch_duration_ms": 5,
        "state_rows_total": 0, "state_memory_bytes": 0,
    }
    healthy = dict(base, input_rows_per_sec=100.0, processed_rows_per_sec=200.0)
    lagging = dict(base, input_rows_per_sec=200.0, processed_rows_per_sec=100.0)
    c._rows = [healthy, lagging, lagging]
    assert not c.falling_behind(3)  # only 2 sustained
    c._rows = [healthy, lagging, lagging, lagging]
    assert c.falling_behind(3)
    c._rows = [lagging, lagging, healthy]
    assert not c.falling_behind(3)  # recovered


def test_listener_never_raises():
    c = MetricsCollector()

    class Broken:
        @property
        def progress(self):
            raise RuntimeError("boom")

    c.onQueryProgress(Broken())
    assert c.errors == 1 and c.snapshot() == []
