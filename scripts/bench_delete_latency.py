"""Delete end-to-end latency readout (VERDICT r12 item 4).

The reference asserts delete events reach the collector in under 1 second
DESPITE the 10 s debounce window (integration_test.go:234-254 against the
debounce.go:105-121 bypass). Our topology reproduces the bypass as a
dedicated short-trigger standing query (streaming/pipeline.py::
start_delete_fast_path, default 1 s processingTime) for instances, and the
CRD pipeline forwards deletes on its own flush trigger. This harness
measures the actual event->sink latency of both paths under live triggers:

  * a writer thread drops one DELETE event per wave into the file source
    (pyarrow direct write — milliseconds, so the emit timestamp is honest);
  * the sink callback stamps arrival at entry (the moment the payload
    becomes POSTable);
  * latency = arrival - emit, per key; p50/p95/max over all waves.

The committed readout (bench_logs/bench_delete_latency_r13.json) is the
micro-batch analog of the reference's bound: the fast path's latency is
governed by its 1 s trigger — NOT by the 10 s debounce window or the 5 s
flush interval it bypasses. tests/test_delete_latency.py runs the same
harness small and asserts latency < debounce window at the test trigger.

Usage: python scripts/bench_delete_latency.py [n_waves]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

EVENT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)
SPARK_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_wave(src_dir: str, wave: int, base_us: int) -> None:
    """One DELETE event (event_type='error' -> DELETE op) plus noise UPDATEs,
    written directly with pyarrow — file-drop cost is milliseconds, so the
    emit stamp taken just before this call bounds the true event time."""
    rows = {
        "event_id": [wave * 10 + j for j in range(3)],
        "ts": [base_us + wave * 1_000_000 + j for j in range(3)],
        "user_id": [wave * 10 + j for j in range(3)],
        "event_type": ["error", "view", "view"],
        "value": [0.0, 1.0, 2.0],
        "props": ["{}", "{}", "{}"],
    }
    table = pa.table(
        {
            **{k: rows[k] for k in ("event_id",)},
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": rows["user_id"],
            "event_type": rows["event_type"],
            "value": rows["value"],
            "props": rows["props"],
        },
        schema=EVENT_SCHEMA,
    )
    tmp = os.path.join(src_dir, f"._wave{wave}.parquet.tmp")
    pq.write_table(table, tmp)
    os.rename(tmp, os.path.join(src_dir, f"wave{wave}.parquet"))


def _percentile(sorted_vals: list[float], p: float) -> float:
    if not sorted_vals:
        return float("nan")
    idx = min(len(sorted_vals) - 1, int(round(p * (len(sorted_vals) - 1))))
    return sorted_vals[idx]


def measure_path(
    spark,
    workdir: str,
    path: str = "instances",
    n_waves: int = 12,
    spacing_s: float = 1.3,
    trigger_s: float = 1.0,
    timeout_s: float = 120.0,
) -> dict:
    """Run one pipeline path live and measure per-delete event->sink latency.

    path='instances': start_delete_fast_path on the change stream (the
    debounce bypass; deleted key = change-stream id).
    path='crd': start_crd_sync on a CRD-shaped stream of DELETE events
    (deleted key = crd_name; the CRD pipeline has no separate fast path —
    its latency is bounded by its own trigger, reported as such).
    """
    from k8s_vectordb_sync_spark.config import EngineConfig
    from k8s_vectordb_sync_spark.sources.cdc import events_as_change_stream
    from k8s_vectordb_sync_spark.streaming.pipeline import (
        start_crd_sync,
        start_delete_fast_path,
    )

    src = os.path.join(workdir, f"events-{path}")
    os.makedirs(src, exist_ok=True)
    base_us = 1_700_000_000_000_000  # fixed epoch base: determinism in data
    # seed one file so the stream has a schema'd, listable source at start
    _write_wave(src, 0, base_us)

    emits: dict[str, float] = {}
    arrivals: dict[str, float] = {}
    lock = threading.Lock()

    raw = spark.readStream.schema(SPARK_EVENT_SCHEMA).parquet(src)
    config = EngineConfig(
        capabilities_endpoint="http://collector",
        checkpoint_dir=os.path.join(workdir, f"ckpt-{path}"),
    )
    trigger = {"processingTime": f"{int(trigger_s * 1000)} milliseconds"}

    if path == "instances":
        stream = events_as_change_stream(raw)
        key_of = lambda r: r["id"]  # noqa: E731

        def sink(df, bid):
            t = time.monotonic()  # arrival at the sink boundary
            with lock:
                for r in df.select("id").collect():
                    arrivals.setdefault(r["id"], t)

        q = start_delete_fast_path(
            stream,
            config,
            sink,
            checkpoint_dir=config.checkpoint_dir,
            trigger=trigger,
        )
        key_name = lambda w: f"user/{w * 10}"  # noqa: E731
    elif path == "crd":
        crd_stream = raw.select(
            F.lit("DELETE").alias("event_type"),
            F.col("ts").alias("event_ts"),
            F.concat(F.lit("crd"), F.col("user_id")).alias("crd_name"),
        )

        def sink(df, bid):
            t = time.monotonic()
            with lock:
                for r in df.select("crd_name").collect():
                    arrivals.setdefault(r["crd_name"], t)

        q = start_crd_sync(
            crd_stream,
            config,
            sink,
            checkpoint_dir=config.checkpoint_dir,
            trigger=trigger,
        )
        key_name = lambda w: f"crd{w * 10}"  # noqa: E731
    else:
        raise ValueError(path)

    # Warm-up: wait for the stream to finish its FIRST micro-batch (query
    # planning + state init can take >10 s cold) before emitting any timed
    # wave — the reference's harness likewise measures against a standing
    # watcher, not one mid-startup. The seed wave's emit time is unknown
    # (pre-stream) and excluded from stats regardless.
    warm_deadline = time.monotonic() + timeout_s
    while time.monotonic() < warm_deadline:
        lp = q.lastProgress
        if lp is not None and (arrivals or lp.get("batchId", -1) >= 1):
            break
        time.sleep(0.2)

    def writer():
        for w in range(1, n_waves + 1):
            time.sleep(spacing_s)
            with lock:
                emits[key_name(w)] = time.monotonic()
            _write_wave(src, w, base_us)

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    th.join()
    deadline = time.monotonic() + timeout_s
    want = {key_name(w) for w in range(1, n_waves + 1)}
    while time.monotonic() < deadline:
        with lock:
            if want <= set(arrivals):
                break
        time.sleep(0.2)
    q.stop()

    lat = sorted(
        arrivals[k] - emits[k] for k in want if k in arrivals
    )
    return {
        "path": path,
        "n_waves": n_waves,
        "received": len(lat),
        "trigger_s": trigger_s,
        "debounce_window_ms": config.debounce_window_ms,
        "batch_flush_interval_ms": config.batch_flush_interval_ms,
        "p50_s": round(_percentile(lat, 0.50), 3) if lat else None,
        "p95_s": round(_percentile(lat, 0.95), 3) if lat else None,
        "max_s": round(max(lat), 3) if lat else None,
        "min_s": round(min(lat), 3) if lat else None,
    }


def run(spark, workdir: str, n_waves: int = 12) -> dict:
    out = {
        "instances": measure_path(spark, workdir, "instances", n_waves=n_waves),
        "crd": measure_path(spark, workdir, "crd", n_waves=n_waves),
    }
    return out


def main() -> None:
    from k8s_vectordb_sync_spark.session import build_spark

    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = build_spark(
        app_name="delete-latency", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="kvs-dellat-")
    try:
        report = run(spark, workdir, n_waves=n_waves)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(report, indent=2))
    out = os.path.join(REPO, "bench_logs", "bench_delete_latency_r13.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
