"""Serving under concurrency (VERDICT r10 item 4): N standing probe
streams — ANN (IVF-PQ/ADC) and BM25 mixed — against ONE SparkSession and
one index generation, with a zero-downtime rebuild fired mid-run.

The single-stream test (tests/test_serving_stream.py::
test_zero_downtime_rebuild_probes_never_mixed) proves one probe stream
never mixes generations; a serving fleet runs many concurrent standing
queries against the same session, competing for scheduler slots while the
rebuild's training jobs run. This harness measures that topology:

- per-stream micro-batch latency (p50/p95 of Spark's triggerExecution
  duration over the run) — the number a capacity plan consumes;
- the old-or-new-never-mixed invariant on EVERY ANN stream simultaneously
  (each emitted batch must equal the pre-rebuild batch answer or the
  post-rebuild one, row-for-row);
- BM25 streams (index untouched by the rebuild) must serve the identical
  answer throughout — the rebuild of a sibling index is invisible to them.

Writes one JSON line; the committed readout lives at
bench_logs/bench_serving_concurrent_r11.json.

Usage: python scripts/bench_serving_concurrent.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SAMPLE_HEX = "0123"


def _percentile(sorted_vals: list[float], p: float) -> float | None:
    """Exact linear-interpolated percentile of an in-memory list (these are
    per-stream batch latencies — dozens of values, driver-side by nature).
    Returns None (JSON null) on an empty list — NaN is not valid JSON and a
    vacuous latency must read as absent, not as a number (ADVICE r11)."""
    if not sorted_vals:
        return None
    if len(sorted_vals) == 1:
        return sorted_vals[0]
    pos = p * (len(sorted_vals) - 1)
    lo = int(pos)
    hi = min(lo + 1, len(sorted_vals) - 1)
    return sorted_vals[lo] + (pos - lo) * (sorted_vals[hi] - sorted_vals[lo])


def _start_ingest(spark, sf_dir: str, work_dir: str, trigger_ms: int):
    """Start the streaming_sync ingest pipeline against a staged source dir
    and return (query, feeder_thread, stop_event, state).

    The events table is pre-split into ts-ordered chunks; the feeder drops
    one chunk per tick so event time advances monotonically and the
    debounce watermark keeps releasing rows. state collects (wall_time,
    resolved_rows) per sink batch; input-side progress comes from the
    query's recentProgress (numInputRows per micro-batch).
    """
    from pyspark.sql.window import Window

    from k8s_vectordb_sync_spark.config import EngineConfig
    from k8s_vectordb_sync_spark.sources.cdc import read_change_stream
    from k8s_vectordb_sync_spark.sources.tables import load_table
    from k8s_vectordb_sync_spark.streaming.pipeline import start_instance_sync

    n_chunks = 24
    chunk_dir = os.path.join(work_dir, "ingest-chunks")
    staged = os.path.join(work_dir, "ingest-src")
    os.makedirs(os.path.join(staged, "events.parquet"), exist_ok=True)
    ev = load_table(spark, sf_dir, "events")
    # ts-ordered chunking: one single-partition sort of a bench-scale table,
    # driver never holds rows; each chunk is a self-contained parquet dir
    (
        ev.withColumn(
            "__chunk",
            F.ntile(n_chunks).over(Window.orderBy("ts", "event_id")),
        )
        .repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(chunk_dir)
    )
    chunks = sorted(
        (d for d in os.listdir(chunk_dir) if d.startswith("__chunk=")),
        key=lambda d: int(d.split("=")[1]),
    )

    state = {"emits": []}  # (wall time, resolved rows)
    stop = threading.Event()

    def _drop(idx: int) -> None:
        src = os.path.join(chunk_dir, chunks[idx])
        for j, f in enumerate(sorted(os.listdir(src))):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(src, f),
                    os.path.join(
                        staged, "events.parquet", f"chunk{idx:03d}-{j}.parquet"
                    ),
                )

    _drop(0)  # schema + first batch exist before the stream starts
    stream = read_change_stream(spark, staged)
    emits = state["emits"]
    query = start_instance_sync(
        stream,
        EngineConfig(),
        lambda df, bid: emits.append((time.monotonic(), df.count())),
        checkpoint_dir=os.path.join(work_dir, "ingest-ckpt"),
        trigger={"processingTime": f"{trigger_ms} milliseconds"},
    )

    def feed():
        i = 1
        while not stop.is_set() and i < len(chunks):
            _drop(i)
            i += 1
            time.sleep(trigger_ms / 1000.0)

    feeder = threading.Thread(target=feed, daemon=True)
    return query, feeder, stop, state


def run(
    spark,
    sf_dir: str,
    work_dir: str,
    n_ann_streams: int = 3,
    n_bm25_streams: int = 2,
    queries_per_stream: int = 4,
    warm_s: float = 3.0,
    cool_s: float = 3.0,
    trigger_ms: int = 200,
    with_ingest: bool = True,
) -> dict:
    from k8s_vectordb_sync_spark.operators import ann_index as ai
    from k8s_vectordb_sync_spark.operators import lexical_index as lx
    from k8s_vectordb_sync_spark.sources.tables import load_table
    from k8s_vectordb_sync_spark.streaming.serving import start_ann_probe_stream

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    ivf_path = os.path.join(work_dir, "ivfpq")
    bm25_path = os.path.join(work_dir, "bm25")
    # build on half + add the rest: the staleness ledger marks the index
    # rebuild-worthy and the mid-run retrain demonstrably changes answers
    ai.build_ivf_pq_index(
        emb.filter(F.col("vec_id") % 2 == 0), ivf_path,
        n_clusters=8, sample_hex=SAMPLE_HEX,
    )
    ai.ivf_pq_index_add(emb.filter(F.col("vec_id") % 2 == 1), ivf_path)
    lx.build_bm25_index(docs, bm25_path)

    streams = []  # dicts with per-stream state
    stop_feeding = threading.Event()

    def _mk_stream(name, qdf, tier, index_path):
        qdir = os.path.join(work_dir, f"q-{name}")
        os.makedirs(qdir, exist_ok=True)
        qdf.coalesce(1).write.mode("append").parquet(qdir)
        st = {
            "name": name, "tier": tier, "qdf": qdf, "qdir": qdir,
            "emits": [],  # (wall time, sorted rows)
        }
        stream = (
            spark.readStream.schema(spark.read.parquet(qdir).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(qdir)
        )
        emits = st["emits"]
        st["query"] = start_ann_probe_stream(
            spark, index_path, stream,
            emit=lambda df, bid: emits.append(
                (time.monotonic(), sorted(tuple(r) for r in df.collect()))
            ),
            checkpoint_dir=os.path.join(work_dir, f"ckpt-{name}"),
            trigger={"processingTime": f"{trigger_ms} milliseconds"},
            tier=tier, k=5, n_probe=2,
            query_name=f"serving-conc-{name}",
        )

        def feed():
            while not stop_feeding.is_set():
                qdf.coalesce(1).write.mode("append").parquet(qdir)
                time.sleep(trigger_ms / 1000.0)

        st["feeder"] = threading.Thread(target=feed, daemon=True)
        return st

    for i in range(n_ann_streams):
        lo, hi = i * queries_per_stream, (i + 1) * queries_per_stream
        qdf = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        streams.append(_mk_stream(f"ann{i}", qdf, "ivfpq", ivf_path))
    for i in range(n_bm25_streams):
        qdf = lx.derive_query_terms_from_index(
            spark, bm25_path, n_queries=queries_per_stream, terms_per_query=3
        ).filter(F.col("query_id") % n_bm25_streams == i)
        streams.append(_mk_stream(f"bm25-{i}", qdf, "bm25", bm25_path))

    # batch-side reference answers on the CURRENT generation
    def _ref(st):
        if st["tier"] == "ivfpq":
            out = ai.ivf_pq_probe(spark, ivf_path, st["qdf"], k=5, n_probe=2)
        else:
            out = lx.bm25_index_probe(spark, bm25_path, st["qdf"], k=5)
        return sorted(tuple(r) for r in out.collect())

    # at a 200 ms trigger the default 100-entry progress retention evicts
    # the rebuild-window batches before we read them — retain the whole run
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2000")

    ingest = None
    if with_ingest:  # VERDICT r11 item 7: a real fleet also INGESTS during rebuild
        ingest = _start_ingest(spark, sf_dir, work_dir, trigger_ms)

    for st in streams:
        st["old"] = _ref(st)
        st["feeder"].start()
    if ingest:
        ingest[1].start()

    time.sleep(warm_s)  # old-generation batches under full concurrency
    # wall/monotonic anchor PAIR captured at the window edge itself, not at
    # readout time (ADVICE r12): over a multi-minute run a "now" anchor
    # taken after cool-down lets wall-clock drift/adjustment shift every
    # mapped batch time by the accumulated drift; anchoring at t0 bounds
    # the mapping error to drift WITHIN the window (~seconds, negligible).
    import datetime as _dt

    wall_t0 = _dt.datetime.now(_dt.timezone.utc).timestamp()
    t0 = time.monotonic()
    ai.ivf_pq_index_rebuild(emb, ivf_path)
    t1 = time.monotonic()
    time.sleep(cool_s)  # new-generation batches under full concurrency

    stop_feeding.set()
    report = {"streams": {}, "rebuild_s": round(t1 - t0, 2), "mixed": 0}
    overlapped = 0
    for st in streams:
        st["feeder"].join(timeout=10)
        q = st["query"]
        progress = list(q.recentProgress)
        q.stop()
        q.awaitTermination(60)
        st["new"] = _ref(st)
        served = [(t, r) for t, r in st["emits"] if r]
        allowed = (st["old"], st["new"])
        mixed = [r for _, r in served if r not in allowed]
        report["mixed"] += len(mixed)
        overlapped += sum(1 for t, r in served if r and t0 <= t <= t1)
        lat = sorted(
            p["durationMs"]["triggerExecution"] / 1000.0
            for p in progress
            if p and p.get("durationMs", {}).get("triggerExecution") is not None
            and p.get("numInputRows", 0) > 0
        )
        report["streams"][st["name"]] = {
            "tier": st["tier"],
            "n_batches_served": len(served),
            "latency_p50_s": round(_percentile(lat, 0.5), 3),
            "latency_p95_s": round(_percentile(lat, 0.95), 3),
            "answer_changed_by_rebuild": st["new"] != st["old"],
            "n_mixed": len(mixed),
        }
    report["batches_inside_rebuild_window"] = overlapped

    if ingest:
        iq, feeder, istop, istate = ingest
        istop.set()
        feeder.join(timeout=10)
        iprogress = list(iq.recentProgress)
        iq.stop()
        iq.awaitTermination(60)
        # input-side progress from Spark's own per-micro-batch telemetry;
        # batch wall time from the ISO timestamp (UTC). monotonic t0/t1 and
        # wall timestamps live on different clocks — map via the (wall_t0,
        # t0) anchor pair captured AT the window start (ADVICE r12), and
        # count a batch as in-window if any part of its
        # [start, start + triggerExecution] span overlaps [t0, t1] rather
        # than point-testing its start, so edge batches aren't dropped or
        # double-attributed by sub-second mapping error.
        import datetime as _dt

        in_rows_total = 0
        in_rows_rebuild = 0
        in_batches_rebuild = 0
        for p in iprogress:
            if not p or not p.get("numInputRows"):
                continue
            in_rows_total += p["numInputRows"]
            ts = p.get("timestamp")
            if ts:
                wall = _dt.datetime.fromisoformat(
                    ts.replace("Z", "+00:00")
                ).timestamp()
                mono = t0 + (wall - wall_t0)
                dur_s = (
                    p.get("durationMs", {}).get("triggerExecution") or 0
                ) / 1000.0
                if mono <= t1 and (mono + dur_s) >= t0:
                    in_rows_rebuild += p["numInputRows"]
                    in_batches_rebuild += 1
        resolved_rows = sum(n for _, n in istate["emits"])
        report["ingest"] = {
            "input_rows_total": in_rows_total,
            "resolved_rows_total": resolved_rows,
            "sink_batches_total": len(istate["emits"]),
            "input_rows_during_rebuild": in_rows_rebuild,
            "input_batches_during_rebuild": in_batches_rebuild,
            "ingest_rows_per_s_during_rebuild": round(
                in_rows_rebuild / max(t1 - t0, 1e-9), 1
            ),
        }

    # invariants the test asserts too — fail loudly here so a bad readout
    # never gets committed as evidence
    for name, s in report["streams"].items():
        if s["n_mixed"]:
            raise AssertionError(f"stream {name} mixed generations")
        if not s["n_batches_served"]:
            raise AssertionError(f"stream {name} never served a batch")
        if s["tier"] == "bm25" and s["answer_changed_by_rebuild"]:
            raise AssertionError(
                f"BM25 stream {name} observed the sibling ANN rebuild"
            )
    # the "served during the rebuild" claim must not pass vacuously: at
    # least one probe batch must land inside the rebuild window (ADVICE r11).
    # On a toy corpus the rebuild can finish inside one trigger interval —
    # there the window genuinely cannot contain a batch and the overlap
    # claim is out of scope; at any real scale (the committed sf0.1 readout:
    # 27 s window vs 0.2 s trigger) these assertions engage.
    window_measurable = (t1 - t0) >= 10 * trigger_ms / 1000.0
    if window_measurable and overlapped <= 0:
        raise AssertionError(
            "no probe batch landed inside the rebuild window — the "
            "served-during-rebuild claim would be vacuous"
        )
    if ingest:
        ing = report["ingest"]
        if ing["input_rows_total"] <= 0 or ing["sink_batches_total"] <= 0:
            raise AssertionError("ingest pipeline made no progress")
        if window_measurable and ing["input_batches_during_rebuild"] <= 0:
            raise AssertionError(
                "ingest starved during the rebuild window — no micro-batch "
                "committed while the rebuild's training jobs ran"
            )
    return report


def main() -> int:
    from k8s_vectordb_sync_spark.session import build_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    work = tempfile.mkdtemp(prefix="kvs-serving-conc-")
    spark = build_spark(app_name="serving-concurrent")
    try:
        report = run(spark, sf_dir, work)
        report["sf_dir"] = sf_dir
        print(json.dumps(report))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
