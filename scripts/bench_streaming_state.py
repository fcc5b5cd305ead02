"""Streaming-pipeline health evidence at scale (VERDICT r8 item 6): run the
full CDC sync pipeline (file-source events -> debounce -> batched sink) at a
given sf dir and record, per micro-batch, the STATE STORE's vital signs —
rows held, memory used, and the RocksDB provider's custom metrics (sst file
sizes, memtable bytes, pinned-block memory) — so "the 10M-event run
finished" is upgraded to "the debounce state stayed bounded and the store
stayed on disk, not in heap".

Usage: python scripts/bench_streaming_state.py [sf_dir] [out_json]
Defaults: bench_data/sf10 -> bench_logs/bench_streaming_state_sf10.json
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "bench_data", "sf10")
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "bench_logs", "bench_streaming_state_sf10.json")
    )
    from k8s_vectordb_sync_spark.config import EngineConfig
    from k8s_vectordb_sync_spark.session import build_spark
    from k8s_vectordb_sync_spark.sources.cdc import read_change_stream
    from k8s_vectordb_sync_spark.streaming.pipeline import start_instance_sync

    spark = build_spark(app_name="bench-streaming-state")
    spark.sparkContext.setLogLevel("ERROR")
    # Spark retains only numRecentProgressUpdates (default 100) progress
    # entries; a longer run would silently report peaks over the tail only
    # (ADVICE r9). Raise the retention far above any plausible batch count
    # and FAIL LOUDLY below if the run still brushes the cap.
    PROGRESS_RETENTION = 100_000
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(PROGRESS_RETENTION)
    )

    ckpt = tempfile.mkdtemp(prefix="kvs-state-ckpt-")
    staged = tempfile.mkdtemp(prefix="kvs-state-src-")
    os.makedirs(f"{staged}/events.parquet")
    src_tbl = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src_tbl):
        for i, f in enumerate(sorted(glob.glob(os.path.join(src_tbl, "*.parquet")))):
            shutil.copy(f, f"{staged}/events.parquet/part-{i:05d}.parquet")
    else:
        shutil.copy(src_tbl, f"{staged}/events.parquet/part-00000.parquet")

    counts: list[int] = []
    try:
        stream = read_change_stream(spark, staged)
        t0 = time.perf_counter()
        q = start_instance_sync(
            stream,
            EngineConfig(),
            lambda df, bid: counts.append(df.count()),
            checkpoint_dir=ckpt,
            trigger={"availableNow": True},
        )
        budget = int(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT_S", "3000"))
        finished = q.awaitTermination(budget)
        elapsed = round(time.perf_counter() - t0, 3)
        # recentProgress entries are StreamingQueryProgress objects in
        # PySpark 4 (dict-like json via .json) — normalize to plain dicts
        progress = [
            p if isinstance(p, dict) else json.loads(p.json)
            for p in (q.recentProgress or [])
        ]
        if not finished:
            q.stop()
            raise RuntimeError(f"pipeline did not finish within {budget}s")
        if len(progress) >= PROGRESS_RETENTION:
            raise RuntimeError(
                f"progress history hit the {PROGRESS_RETENTION}-entry retention "
                "cap — peak metrics would be computed over a truncated window; "
                "raise PROGRESS_RETENTION"
            )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)

    batches = []
    for p in progress:
        ops = p.get("stateOperators") or []
        batches.append(
            {
                "batch_id": p.get("batchId"),
                "num_input_rows": p.get("numInputRows"),
                "batch_duration_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
                "state_rows_total": sum(int(s.get("numRowsTotal") or 0) for s in ops),
                "state_rows_updated": sum(
                    int(s.get("numRowsUpdated") or 0) for s in ops
                ),
                "state_memory_bytes": sum(
                    int(s.get("memoryUsedBytes") or 0) for s in ops
                ),
                # RocksDB vitals: on-disk sst bytes vs in-heap pinned bytes is
                # the spill story — a healthy store keeps sst >> pinned
                "rocksdb": {
                    k: sum(int((s.get("customMetrics") or {}).get(k) or 0) for s in ops)
                    for k in (
                        "rocksdbSstFileSize",
                        "rocksdbTotalMemoryUsageBytes",
                        "rocksdbPinnedBlocksMemoryUsage",
                        "rocksdbBytesCopied",
                    )
                },
            }
        )
    peak_rows = max((b["state_rows_total"] for b in batches), default=0)
    out = {
        "sf_dir": sf_dir,
        "elapsed_sec": elapsed,
        "events_emitted": int(sum(counts)),
        "n_micro_batches": len(batches),
        "peak_state_rows": peak_rows,
        "peak_state_memory_bytes": max(
            (b["state_memory_bytes"] for b in batches), default=0
        ),
        "peak_rocksdb_sst_bytes": max(
            (b["rocksdb"]["rocksdbSstFileSize"] for b in batches), default=0
        ),
        "final_state_rows": batches[-1]["state_rows_total"] if batches else 0,
        "batches": batches,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "batches"}))
    spark.stop()


if __name__ == "__main__":
    main()
