"""EngineConfig end-to-end (VERDICT r12 item 5): build the full streaming
topology purely from environment variables with the reference's names
(config.go:44-57) and assert the WIRED values — trigger intervals, watermark
delays, payload caps, endpoint gating — match what the env said, guarding
against config drift now that the topology surface has grown (serving, fast
path, CRD gating).
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.config import EngineConfig
from k8s_vectordb_sync_spark.sources.cdc import events_as_change_stream
from k8s_vectordb_sync_spark.streaming.pipeline import (
    DELETE_FAST_PATH_TRIGGER_MS,
    debounced_micro_batch,
    delete_trigger,
    flush_trigger,
    start_crd_sync,
    start_delete_fast_path,
    start_instance_sync,
    watermark_delay_s,
)
from k8s_vectordb_sync_spark.streaming.sink import CollectingSink

T0 = datetime.datetime(2024, 1, 1)

# Reference env-var names exactly (config.go:44-57); values chosen distinct
# from every default so a fallback-to-default bug cannot pass.
REF_ENV = {
    "INSTANCES_ENDPOINT": "http://collector:8080/api/v1/instances",
    "CAPABILITIES_ENDPOINT": "http://collector:8080/api/v1/capabilities",
    "DEBOUNCE_WINDOW_MS": "4000",
    "BATCH_FLUSH_INTERVAL_MS": "2000",
    "BATCH_MAX_SIZE": "3",
    "RESYNC_INTERVAL_MIN": "30",
    "WATCH_RESOURCE_TYPES": "pods,deployments",
    "API_BIND_ADDRESS": ":9999",
    "LOG_LEVEL": "debug",
}


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="kvs-cfgtopo-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_env_parses_to_reference_values():
    config = EngineConfig.from_env(REF_ENV)
    assert config.instances_endpoint == REF_ENV["INSTANCES_ENDPOINT"]
    assert config.capabilities_endpoint == REF_ENV["CAPABILITIES_ENDPOINT"]
    assert config.debounce_window_ms == 4000
    assert config.batch_flush_interval_ms == 2000
    assert config.batch_max_size == 3
    assert config.resync_interval_min == 30
    assert config.watch_resource_types == ("pods", "deployments")
    assert config.api_bind_address == ":9999"
    assert config.crd_pipeline_enabled  # endpoint set -> pipeline on


def test_trigger_and_watermark_derivation():
    config = EngineConfig.from_env(REF_ENV)
    # flush cadence: micro-batch per BATCH_FLUSH_INTERVAL_MS
    assert flush_trigger(config) == {"processingTime": "2000 milliseconds"}
    # delete bypass: fixed short cadence, NOT coupled to the flush interval
    assert delete_trigger(config) == {
        "processingTime": f"{DELETE_FAST_PATH_TRIGGER_MS} milliseconds"
    }
    assert DELETE_FAST_PATH_TRIGGER_MS < config.debounce_window_ms
    # watermark: 2x the debounce window
    assert watermark_delay_s(config) == 8
    # defaults (no env): the reference's 10 s window / 5 s flush / 50 cap
    dflt = EngineConfig.from_env({})
    assert flush_trigger(dflt) == {"processingTime": "5000 milliseconds"}
    assert watermark_delay_s(dflt) == 20
    assert dflt.batch_max_size == 50


def test_watermark_reaches_the_stream_plan(spark, workdir):
    """The env-derived watermark must be IN the wired stream, not just the
    helper: the analyzed plan of the debounced stream carries the
    EventTimeWatermark with the env's 2x4000 ms delay."""
    config = EngineConfig.from_env(REF_ENV)
    src = f"{workdir}/events"
    spark.createDataFrame(
        [(1, T0, 1, "signup", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(src)
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream = events_as_change_stream(raw)
    deduped = debounced_micro_batch(stream, config)
    plan = deduped._jdf.queryExecution().analyzed().toString()
    assert "8 seconds" in plan, plan


def test_full_topology_from_env_only(spark, workdir):
    """Start all three standing queries (instance sync, CRD sync, delete
    fast path) from an env-built config and verify the env reached the
    behavior: CRD query exists because CAPABILITIES_ENDPOINT is set; the
    sink chunks payloads at BATCH_MAX_SIZE=3; deletes surface on the fast
    path."""
    env = dict(REF_ENV, SPARK_CHECKPOINT_DIR=f"{workdir}/ckpt")
    config = EngineConfig.from_env(env)
    assert config.checkpoint_dir == f"{workdir}/ckpt"

    src = f"{workdir}/events"
    rows = [
        (i, T0 + datetime.timedelta(milliseconds=i * 10), i, "signup", 1.0, "{}")
        for i in range(8)
    ] + [(100, T0 + datetime.timedelta(seconds=1), 100, "error", 0.0, "{}")]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(src)
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream = events_as_change_stream(raw)

    sink = CollectingSink(batch_max_size=config.batch_max_size)
    q1 = start_instance_sync(
        stream,
        config,
        sink.write_batch,
        checkpoint_dir=f"{config.checkpoint_dir}/inst",
        trigger={"availableNow": True},
    )

    crd_stream = raw.select(
        F.lit("ADD").alias("event_type"),
        F.col("ts").alias("event_ts"),
        F.concat(F.lit("crd"), F.col("user_id")).alias("crd_name"),
    )
    crd_seen: list = []
    q2 = start_crd_sync(
        crd_stream,
        config,
        lambda df, bid: crd_seen.extend(r["crd_name"] for r in df.collect()),
        checkpoint_dir=f"{config.checkpoint_dir}/crd",
        trigger={"availableNow": True},
    )
    assert q2 is not None  # endpoint set -> CRD pipeline enabled

    fast_seen: list = []
    q3 = start_delete_fast_path(
        stream,
        config,
        lambda df, bid: fast_seen.extend(r["id"] for r in df.collect()),
        checkpoint_dir=f"{config.checkpoint_dir}/del",
        trigger={"availableNow": True},
    )
    for q in (q1, q2, q3):
        assert q.awaitTermination(120)

    # BATCH_MAX_SIZE=3 reached the sink: 8 upserts -> ceil(8/3) = 3 chunks,
    # none larger than 3
    upsert_chunks = [len(p["upserts"]) for p in sink.payloads if "upserts" in p]
    assert sum(upsert_chunks) == 8
    assert max(upsert_chunks) == 3
    assert len(upsert_chunks) == 3
    # the delete bypass carried the delete
    assert fast_seen == ["user/100"]
    # CRD dedup saw each distinct name once
    assert sorted(crd_seen) == sorted({f"crd{r[2]}" for r in rows})

    # endpoint gating parity: clearing the endpoint disables the pipeline
    off = EngineConfig.from_env({**env, "CAPABILITIES_ENDPOINT": ""})
    assert (
        start_crd_sync(crd_stream, off, lambda df, bid: None) is None
    )
