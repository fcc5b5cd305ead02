"""Structured Streaming pipeline tests — translations of the reference's
integration tier (internal/integration_test.go: event-in -> payload-out
assertions against a collector sink)."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.config import EngineConfig
from k8s_vectordb_sync_spark.sources.cdc import events_as_change_stream
from k8s_vectordb_sync_spark.streaming.pipeline import start_crd_sync, start_instance_sync
from k8s_vectordb_sync_spark.streaming.sink import CollectingSink

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _t(ms: int) -> datetime.datetime:
    return T0 + datetime.timedelta(milliseconds=ms)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="kvs-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_events(spark, path: str, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, workdir, rows, config=None):
    """Write events, run the full streaming pipeline with availableNow
    (one-shot over all available input), return the collected payloads."""
    src = f"{workdir}/events"
    _write_events(spark, src, rows)
    raw = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    stream = events_as_change_stream(raw)
    config = config or EngineConfig(checkpoint_dir=f"{workdir}/ckpt")
    sink = CollectingSink(batch_max_size=config.batch_max_size)
    q = start_instance_sync(
        stream,
        config,
        sink.write_batch,
        checkpoint_dir=f"{workdir}/ckpt",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    return sink


def test_full_pipeline_last_state_wins(spark, workdir):
    # integration_test.go:257 RapidUpdates_LastStateWinsEndToEnd: 5 rapid
    # updates to one entity -> exactly 1 upsert carrying the final value
    rows = [(i, _t(i * 10), 1, "purchase", float(i), "{}") for i in range(1, 6)]
    sink = _run_stream(spark, workdir, rows)
    upserts = [u for p in sink.payloads for u in p.get("upserts", [])]
    assert len(upserts) == 1
    assert upserts[0]["id"] == "user/1"
    assert upserts[0]["value"] == 5.0


def test_delete_cancels_pending_upsert_stream(spark, workdir):
    # integration_test.go:211 DeleteEventsArriveImmediately + debounce_test.go:161:
    # update then delete ('error' event) in one batch -> delete only
    rows = [
        (1, _t(0), 7, "purchase", 1.0, "{}"),
        (2, _t(100), 7, "error", 0.0, "{}"),  # maps to DELETE
    ]
    sink = _run_stream(spark, workdir, rows)
    deletes = [d for p in sink.payloads for d in p.get("deletes", [])]
    upserts = [u for p in sink.payloads for u in p.get("upserts", [])]
    assert deletes == ["user/7"]
    assert upserts == []


def test_multiple_entities_batched(spark, workdir):
    # debounce_test.go:228 BatchMultipleResources
    rows = [(i, _t(i), i, "view", 1.0, "{}") for i in range(10)]
    sink = _run_stream(spark, workdir, rows)
    upserts = [u for p in sink.payloads for u in p.get("upserts", [])]
    assert sorted(u["id"] for u in upserts) == sorted(f"user/{i}" for i in range(10))


def test_exactly_once_replay_is_idempotent(spark, workdir):
    # checkpoint replay: restarting over the same input produces no new
    # payloads (offsets committed) — the Spark upgrade of drain-on-shutdown
    rows = [(1, _t(0), 1, "purchase", 1.0, "{}")]
    sink = _run_stream(spark, workdir, rows)
    n1 = len(sink.payloads)
    assert n1 == 1
    # rerun with the SAME checkpoint dir and no new input
    src = f"{workdir}/events"
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream = events_as_change_stream(raw)
    sink2 = CollectingSink()
    q = start_instance_sync(
        stream,
        EngineConfig(),
        sink2.write_batch,
        checkpoint_dir=f"{workdir}/ckpt",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert sink2.payloads == []


def test_crd_pipeline_gated_by_endpoint(spark, workdir):
    # cmd/main.go:147-171: CRD pipeline disabled when endpoint empty
    src = f"{workdir}/events"
    _write_events(spark, src, [(1, _t(0), 1, "signup", 1.0, "{}")])
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    crd_stream = raw.select(
        F.lit("ADD").alias("event_type"),
        F.col("ts").alias("event_ts"),
        F.col("event_type").alias("crd_name"),
    )
    q = start_crd_sync(
        crd_stream, EngineConfig(capabilities_endpoint=""), lambda df, bid: None
    )
    assert q is None


def test_crd_dedup_stream(spark, workdir):
    # integration_test.go:609-645: 5 rapid adds of one CRD name -> 1 upsert
    src = f"{workdir}/events"
    _write_events(
        spark, src, [(i, _t(i * 10), 1, "widgets.example.com", 1.0, "{}") for i in range(5)]
    )
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    crd_stream = raw.select(
        F.lit("ADD").alias("event_type"),
        F.col("ts").alias("event_ts"),
        F.col("event_type").alias("crd_name"),
    )
    seen: list = []

    def collect(batch_df, batch_id):
        seen.extend(r["crd_name"] for r in batch_df.collect())

    q = start_crd_sync(
        crd_stream,
        EngineConfig(capabilities_endpoint="http://collector"),
        collect,
        checkpoint_dir=f"{workdir}/ckpt-crd",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert seen == ["widgets.example.com"]


def test_parquet_sink_merges_and_resync_heals(spark, workdir):
    # durable-sink tier: stream into a parquet MERGE target, then heal an
    # induced drift with the resync batch (SURVEY §3.2 end-to-end)
    from k8s_vectordb_sync_spark.api import trigger_resync
    from k8s_vectordb_sync_spark.operators.debounce import last_state_wins
    from k8s_vectordb_sync_spark.streaming.sink import parquet_upsert_sink

    target = f"{workdir}/target"
    rows = [
        (1, _t(0), 1, "purchase", 1.0, "{}"),
        (2, _t(10), 1, "purchase", 2.0, "{}"),   # last state for user/1
        (3, _t(0), 2, "signup", 5.0, "{}"),
        (4, _t(0), 3, "error", 0.0, "{}"),       # DELETE for user/3
    ]
    src = f"{workdir}/events"
    _write_events(spark, src, rows)
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream = events_as_change_stream(raw)
    q = start_instance_sync(
        stream,
        EngineConfig(),
        parquet_upsert_sink(target),
        checkpoint_dir=f"{workdir}/ckpt",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    state = {r["id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert state == {"user/1": 2.0, "user/2": 5.0}  # user/3 deleted

    # induce drift: stale row that live events never saw (target projected to
    # the snapshot schema — the sync-state key+payload columns)
    tgt_state = spark.read.parquet(target).select("id", "event_id", "value")
    drifted = tgt_state.unionByName(
        tgt_state.limit(1).withColumn("id", F.lit("user/ghost"))
    )
    drifted.write.mode("overwrite").parquet(f"{workdir}/drifted")

    snapshot = last_state_wins(
        events_as_change_stream(spark.read.parquet(src)).filter(
            F.col("op_type") != "DELETE"
        ),
        tiebreak_cols=["event_id"],
    ).select("id", "event_id", "value")
    merged, result = trigger_resync(snapshot, spark.read.parquet(f"{workdir}/drifted"))
    healed = {r["id"] for r in merged.select("id").collect()}
    assert "user/ghost" not in healed  # stale-delete healed the drift
    assert result.status == "completed"


def _bucket_files(target: str) -> dict:
    """{bucket_dir: sorted parquet file names} — rewritten partitions get fresh
    task-UUID part files, so identical listings mean the dir was untouched."""
    import os

    out = {}
    for d in sorted(os.listdir(target)):
        if d.startswith("_bucket="):
            out[d] = sorted(
                f for f in os.listdir(f"{target}/{d}") if f.endswith(".parquet")
            )
    return out


def test_parquet_sink_rewrites_only_touched_buckets(spark, workdir):
    # VERDICT r1 wrong#1: the MERGE must be O(touched buckets), not O(target).
    # A micro-batch touching 1 key must rewrite exactly 1 bucket directory.
    from k8s_vectordb_sync_spark.streaming.sink import parquet_upsert_sink

    target = f"{workdir}/target"
    write_batch = parquet_upsert_sink(target, num_buckets=8)
    batch1 = spark.createDataFrame(
        [("upsert", _t(0), f"user/{i}", float(i)) for i in range(40)],
        "op string, event_ts timestamp, id string, value double",
    )
    write_batch(batch1, 0)
    before = _bucket_files(target)
    assert len(before) > 1  # keys spread over several buckets

    batch2 = spark.createDataFrame(
        [("upsert", _t(10), "user/7", 99.0)],
        "op string, event_ts timestamp, id string, value double",
    )
    write_batch(batch2, 1)
    after = _bucket_files(target)
    changed = [d for d in before if before[d] != after[d]]
    assert len(changed) == 1  # exactly the bucket user/7 hashes into
    state = {r["id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert state["user/7"] == 99.0
    assert len(state) == 40  # merge, not replace


def test_parquet_sink_delete_empties_bucket(spark, workdir):
    # a touched bucket whose keys were ALL deleted must come back empty
    # (dynamic overwrite alone would silently keep the stale partition)
    from k8s_vectordb_sync_spark.streaming.sink import parquet_upsert_sink

    target = f"{workdir}/target"
    write_batch = parquet_upsert_sink(target, num_buckets=4)
    write_batch(
        spark.createDataFrame(
            [("upsert", _t(0), "only", 1.0)],
            "op string, event_ts timestamp, id string, value double",
        ),
        0,
    )
    assert spark.read.parquet(target).count() == 1
    write_batch(
        spark.createDataFrame(
            [("delete", _t(10), "only", 0.0)],
            "op string, event_ts timestamp, id string, value double",
        ),
        1,
    )
    assert spark.read.parquet(target).count() == 0


def test_delete_fast_path_forwards_only_deletes(spark, workdir):
    # SURVEY §4 delete priority path: a dedicated short-trigger query on the
    # DELETE partition; upserts never appear on it
    from k8s_vectordb_sync_spark.streaming.pipeline import start_delete_fast_path

    src = f"{workdir}/events"
    _write_events(
        spark,
        src,
        [
            (1, _t(0), 1, "purchase", 1.0, "{}"),
            (2, _t(10), 2, "error", 0.0, "{}"),
            (3, _t(20), 3, "error", 0.0, "{}"),
        ],
    )
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream = events_as_change_stream(raw)
    seen: list = []
    q = start_delete_fast_path(
        stream,
        EngineConfig(),
        lambda df, bid: seen.extend(r["id"] for r in df.collect()),
        checkpoint_dir=f"{workdir}/ckpt-del",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert sorted(seen) == ["user/2", "user/3"]


def test_rate_limited_source_multiple_microbatches(spark, workdir):
    # backpressure upgrade of the reference's drop-on-full channels
    # (watcher.go:278-287): maxFilesPerTrigger=1 forces one micro-batch per
    # input file; every event survives (nothing is ever dropped)
    from k8s_vectordb_sync_spark.sources.cdc import read_change_stream

    src = f"{workdir}/events.parquet"
    for i in range(3):
        _write_events(spark, src, [(i, _t(i * 1000), i, "view", 1.0, "{}")])
    stream = read_change_stream(spark, workdir, max_files_per_trigger=1)
    batches: list = []
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: batches.append(sorted(r["id"] for r in df.collect())))
        .option("checkpointLocation", f"{workdir}/ckpt-rate")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(batches) == 3  # one micro-batch per file
    assert sorted(x for b in batches for x in b) == ["user/0", "user/1", "user/2"]


def test_burst_backpressure_zero_loss_exactly_once(spark, workdir):
    """VERDICT r7 item 6: SURVEY §2.4 claims the engine upgrades the
    reference's drop-on-full load shedding (watcher.go:278-287) to real
    backpressure — prove it under a burst. 10 000 events (10 000 distinct
    keys) land as ONE pre-staged burst of 10 files; maxFilesPerTrigger=1
    rate-limits the source so availableNow drains it as 10 bounded
    micro-batches. Zero loss + exactly-once: every key surfaces as exactly
    one upsert across all payloads; bounded flow: no resolved micro-batch
    exceeds one file's rows and no POST payload exceeds batch_max_size."""
    from k8s_vectordb_sync_spark.sources.cdc import events_as_change_stream

    n_events, n_files = 10_000, 10
    per_file = n_events // n_files
    src = f"{workdir}/events"
    for f in range(n_files):
        _write_events(
            spark,
            src,
            [
                (i, _t(i), i, "purchase", float(i), "{}")
                for i in range(f * per_file, (f + 1) * per_file)
            ],
        )
    raw = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = events_as_change_stream(raw)
    config = EngineConfig(checkpoint_dir=f"{workdir}/ckpt")
    sink = CollectingSink(batch_max_size=config.batch_max_size)
    batch_sizes: list[int] = []

    def write_batch(df, bid):
        batch_sizes.append(df.count())
        sink.write_batch(df, bid)

    q = start_instance_sync(
        stream,
        config,
        write_batch,
        checkpoint_dir=f"{workdir}/ckpt",
        trigger={"availableNow": True},
    )
    assert q.awaitTermination(600), "burst drain did not finish"

    ids = [u["id"] for p in sink.payloads for u in p.get("upserts", [])]
    assert len(ids) == n_events  # zero loss ...
    assert len(set(ids)) == n_events  # ... and exactly once
    assert set(ids) == {f"user/{i}" for i in range(n_events)}
    # rate limit engaged: the burst drained as >= n_files bounded batches,
    # never one mega-batch
    assert len(batch_sizes) >= n_files
    assert max(batch_sizes) <= per_file
    # sink-side flow bound: payload chunking held under the burst
    assert max(len(p.get("upserts", [])) for p in sink.payloads) <= config.batch_max_size
    assert all(not p.get("deletes") for p in sink.payloads)


def test_parquet_sink_adopts_legacy_flat_target(spark, workdir):
    # a target written by the old flat (un-bucketed) layout must be migrated
    # in place on the first micro-batch, not crash on the missing _bucket
    # column; afterwards the layout is _bucket-partitioned and merged state
    # reflects both the legacy rows and the new batch
    from k8s_vectordb_sync_spark.streaming.sink import parquet_upsert_sink

    target = f"{workdir}/legacy_target"
    spark.createDataFrame(
        [("user/1", 10, 1.0), ("user/2", 11, 2.0)],
        "id string, event_id long, value double",
    ).write.parquet(target)

    batch = spark.createDataFrame(
        [("user/2", 20, 9.0, "upsert"), ("user/3", 21, 3.0, "upsert"),
         ("user/1", 22, 0.0, "delete")],
        "id string, event_id long, value double, op string",
    )
    parquet_upsert_sink(target)(batch, batch_id=0)

    back = spark.read.parquet(target)
    assert "_bucket" in back.columns  # migrated layout
    state = {r["id"]: r["value"] for r in back.collect()}
    assert state == {"user/2": 9.0, "user/3": 3.0}  # merged + delete applied


def test_streaming_sliding_window_agg_matches_batch(spark, workdir):
    """The hopping-window aggregation (events_sliding_windows' expression)
    under readStream + watermark produces exactly the batch result once all
    input is processed — each event contributes to size/hop windows."""
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, _t(0), 1, "view", 10.0, None),
        (2, _t(10 * 60_000), 1, "view", 20.0, None),   # +10min
        (3, _t(70 * 60_000), 2, "click", 5.0, None),   # +70min
        (4, _t(200 * 60_000), 2, "view", 1.0, None),   # +200min
    ]
    src = f"{workdir}/events"
    _write_events(spark, src, rows)

    def windowed(df):
        return (
            df.groupBy(
                F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)")).alias("sv"),
            )
            .select(
                F.unix_millis(F.col("win.start")).alias("win_start_ms"),
                "event_type",
                "n",
                F.col("sv").cast("double").alias("sum_value"),
            )
        )

    batch = {
        (r["win_start_ms"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed(spark.read.parquet(src)).collect()
    }
    # every event lands in exactly 4 hopping windows
    assert sum(n for n, _ in batch.values()) == 4 * len(rows)

    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        windowed(raw.withWatermark("ts", "10 minutes"))
        .writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .option("checkpointLocation", f"{workdir}/ckpt-slide")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start_ms"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM slide_test").collect()
    }
    assert got == batch


def test_streaming_incremental_dedup_matches_batch(spark, workdir):
    """The streaming analogue dedup_incremental's docstring promises: NEW
    documents arrive as a stream and are checked against the static
    historical fingerprint table with a stream-static left join — per
    micro-batch, only the increment is scanned; history is the build side.
    The union of micro-batch outputs must equal the batch formulation."""
    from k8s_vectordb_sync_spark.functions.text import fingerprint

    hist_rows = [
        (1, "the quick brown fox", "s"),
        (2, "lorem ipsum dolor", "s"),
        (3, "THE   quick brown fox", "s"),  # same fingerprint as 1
    ]
    new_rows = [
        (100, "the quick brown fox", "s"),   # dup of history (matched_doc 1)
        (101, "entirely new content", "s"),  # novel
        (102, "lorem ipsum dolor", "s"),     # dup of history (matched_doc 2)
    ]
    hist = (
        spark.createDataFrame(hist_rows, "doc_id long, text string, source string")
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").cast("bigint").alias("matched_doc"))
    )
    src = f"{workdir}/newdocs"
    spark.createDataFrame(
        new_rows, "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    def incr(df):
        fp = df.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        return fp.join(hist, "fp", "left").select(
            "doc_id",
            F.col("matched_doc").isNotNull().alias("is_dup"),
            "matched_doc",
        )

    batch = {tuple(r) for r in incr(spark.read.parquet(src)).collect()}

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    collected: list = []
    q = (
        incr(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: collected.extend(tuple(r) for r in df.collect()))
        .option("checkpointLocation", f"{workdir}/ckpt-incr-dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(collected) == batch
    assert {(r[0], r[1]) for r in batch} == {(100, True), (101, False), (102, True)}


def test_streaming_lsh_vector_search_matches_batch(spark, workdir):
    """Vector search as a STREAMING serving path: query vectors arrive on a
    stream, the static corpus is pre-bucketed by hyperplane bucket, and the
    LSH candidate step is a stream-static equi-join on bucket (supported in
    append mode; at scale the static side is the partitioned index of
    test_ivf/lsh_index_partitioned_probe_prunes, so each micro-batch reads
    only probed partitions). Per-batch top-k runs inside foreachBatch — the
    union over micro-batches must equal batch lsh_topk exactly."""
    from k8s_vectordb_sync_spark.functions.vectors import dot, norm
    from k8s_vectordb_sync_spark.operators.similarity import (
        hyperplane_bucket,
        lsh_planes,
        lsh_topk,
    )
    from k8s_vectordb_sync_spark.sources.tables import load_table
    from pyspark.sql.window import Window

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    expected = {tuple(r) for r in lsh_topk(emb, queries, k=3).collect()}

    dim = len(emb.first()["embedding"])
    planes = lsh_planes(dim)
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vec"),
        norm(F.col("embedding")).alias("nv"),
        hyperplane_bucket("embedding", planes).alias("bucket"),
    )

    src = f"{workdir}/qstream"
    queries.coalesce(1).write.mode("overwrite").parquet(src)
    qstream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = qstream.select(
        "query_id",
        "query_vec",
        norm(F.col("query_vec")).alias("nq"),
        hyperplane_bucket("query_vec", planes).alias("bucket"),
    )
    denom = F.col("nq") * F.col("nv")
    scored = q.join(corpus, "bucket").select(
        "query_id",
        "neighbor_id",
        F.when(denom > 0, dot(F.col("query_vec"), F.col("vec")) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )

    collected: list = []

    def topk_batch(df, _id):
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id").asc()
        )
        collected.extend(
            tuple(r)
            for r in df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("query_id", "neighbor_id", F.round("score", 4).alias("score"), "rank")
            .collect()
        )

    q_handle = (
        scored.writeStream.outputMode("append")
        .foreachBatch(topk_batch)
        .option("checkpointLocation", f"{workdir}/ckpt-lsh-serve")
        .trigger(availableNow=True)
        .start()
    )
    q_handle.awaitTermination(120)
    assert set(collected) == expected and len(expected) > 0


def test_streaming_session_window_matches_batch(spark, workdir):
    """Spark's native session_window under readStream + watermark: session
    state merges across micro-batches and the final emitted sessions equal
    the batch computation — the streaming form of the reference's
    quiet-period grouping (sessions close when the watermark passes
    last_event + gap)."""
    rows = [
        (1, _t(0), 1, "view", 1.0, None),
        (2, _t(5 * 60_000), 1, "view", 1.0, None),     # same session (gap 30m)
        (3, _t(60 * 60_000), 1, "click", 1.0, None),   # new session
        (4, _t(10 * 60_000), 2, "view", 1.0, None),
        (5, _t(300 * 60_000), 9, "view", 1.0, None),   # watermark pusher
    ]
    src = f"{workdir}/events"
    _write_events(spark, src, rows)

    def sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(
                "user_id",
                F.unix_millis(F.col("w.start")).alias("start_ms"),
                F.unix_millis(F.col("w.end")).alias("end_ms"),
                "n",
            )
        )

    batch = {tuple(r) for r in sessions(spark.read.parquet(src)).collect()}
    assert len(batch) == 4  # user1 x2, user2 x1, user9 x1

    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        sessions(raw.withWatermark("ts", "10 minutes"))
        .writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .option("checkpointLocation", f"{workdir}/ckpt-sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.sql("SELECT * FROM session_test").collect()}
    assert streamed == batch


def test_sink_records_layout_and_rejects_cross_layout_merge(spark, workdir):
    """The MERGE sink persists its (key_col, num_buckets) layout beside the
    data on first write; a sink configured differently refuses to merge
    (a cross-layout merge would scatter one key over two buckets), and
    forget_keys picks the layout up with zero arguments (ADVICE r6)."""
    from k8s_vectordb_sync_spark.plans.forget import forget_keys, read_layout_meta
    from k8s_vectordb_sync_spark.streaming.sink import parquet_upsert_sink

    target = f"{workdir}/target"
    write_batch = parquet_upsert_sink(target, num_buckets=8)
    batch = spark.createDataFrame(
        [("upsert", _t(0), f"user/{i}", float(i)) for i in range(10)],
        "op string, event_ts timestamp, id string, value double",
    )
    write_batch(batch, 0)
    assert read_layout_meta(target) == {"key_col": "id", "num_buckets": 8}

    mismatched = parquet_upsert_sink(target, num_buckets=16)
    with pytest.raises(ValueError, match="cross-layout"):
        mismatched(batch, 1)

    audit = forget_keys(
        spark, target, spark.createDataFrame([("user/3",)], "id string")
    )
    assert audit["matched_keys"] == 1 and audit["buckets_total"] == 8
    assert audit["layout_verified"] is True
    remaining = {r["id"] for r in spark.read.parquet(target).select("id").collect()}
    assert remaining == {f"user/{i}" for i in range(10)} - {"user/3"}
