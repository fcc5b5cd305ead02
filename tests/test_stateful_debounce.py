"""Exact-timer debounce tests — the reference's timer semantics across
micro-batches (debounce_test.go:33-469 integration behaviors that
trigger-interval resolution cannot express). Every test runs against BOTH
arbitrary-state implementations: applyInPandasWithState (GroupState +
event-time timeout) and transformWithStateInPandas (ValueState + explicit
timers, the Spark 4 forward path)."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest

from k8s_vectordb_sync_spark.sources.cdc import events_as_change_stream
from k8s_vectordb_sync_spark.streaming.stateful import (
    stateful_debounce,
    stateful_debounce_tws,
)


def _tws_runtime_available() -> bool:
    # transformWithStateInPandas drives its Python worker over a protobuf
    # channel (pyspark.sql.streaming.proto); without google.protobuf the
    # streaming runner crashes at init. Probe instead of failing mid-query.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture(
    params=[
        "apply_in_pandas_with_state",
        pytest.param(
            "transform_with_state",
            marks=pytest.mark.skipif(
                not _tws_runtime_available(),
                reason="transformWithStateInPandas needs google.protobuf at runtime",
            ),
        ),
    ]
)
def debounce_impl(request):
    return {
        "apply_in_pandas_with_state": stateful_debounce,
        "transform_with_state": stateful_debounce_tws,
    }[request.param]

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _t(ms: int) -> datetime.datetime:
    return T0 + datetime.timedelta(milliseconds=ms)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="kvs-stateful-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("append").parquet(path)


def _run(spark, workdir, collected, impl):
    src = f"{workdir}/events"
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream = events_as_change_stream(raw)
    debounced = impl(stream, gap_ms=10_000, watermark_delay="5 seconds")

    def collect(batch_df, batch_id):
        collected.extend(
            (r["id"], r["op"], r["event_id"], r["value"]) for r in batch_df.collect()
        )

    q = (
        debounced.writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _run_with_progress(spark, workdir, collected, impl):
    """Like _run, but returns the terminated query's progress list so tests
    can read state-store metrics (numRowsTotal/numRowsRemoved)."""
    src = f"{workdir}/events"
    raw = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream = events_as_change_stream(raw)
    debounced = impl(stream, gap_ms=10_000, watermark_delay="5 seconds")

    def collect(batch_df, batch_id):
        collected.extend(
            (r["id"], r["op"], r["event_id"], r["value"]) for r in batch_df.collect()
        )

    q = (
        debounced.writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return [p for p in q.recentProgress if p.get("stateOperators")]


def test_rocksdb_state_store_configured(spark):
    # build_spark probes for the RocksDB provider and prefers it: debounce
    # state is one row per live key (plus tombstones) — executor-heap-resident
    # state does not survive reference scale. This container's Spark ships
    # the provider, so the conf must be set.
    assert "RocksDB" in spark.conf.get("spark.sql.streaming.stateStore.providerClass")


def test_tombstone_expires_after_gap(spark, workdir, debounce_impl):
    """Delete tombstones are state with a TTL: retained while stragglers may
    still arrive (they suppress resurrect-by-straggler), expired by the same
    quiet-period timer once the watermark passes ts+gap — asserted via the
    state operator's own row metrics, so this is evidence the state store
    actually shrinks (no unbounded tombstone accumulation at scale)."""
    collected: list = []
    # batch 1: a lone DELETE -> emitted immediately, tombstone retained
    _write(spark, f"{workdir}/events", [(1, _t(100), 2, "error", 0.0, "{}")])
    p1 = _run_with_progress(spark, workdir, collected, debounce_impl)
    assert collected == [("user/2", "delete", 1, 0.0)]
    assert any(p["stateOperators"][0]["numRowsTotal"] == 1 for p in p1)

    # batch 2: an unrelated event far in the future advances the watermark
    # past the tombstone's ts+gap timer -> tombstone expires SILENTLY and is
    # removed; only the new key's pending upsert remains in the store
    _write(spark, f"{workdir}/events", [(9, _t(3_600_000), 9, "view", 2.0, "{}")])
    p2 = _run_with_progress(spark, workdir, collected, debounce_impl)
    assert [c for c in collected if c[0] == "user/2"] == [("user/2", "delete", 1, 0.0)]
    final_total = p2[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_total == 1  # user/9's buffered upsert only; tombstone gone
    assert sum(p["stateOperators"][0]["numRowsRemoved"] for p in p2) >= 1


def test_delete_skips_debounce_and_upsert_waits(spark, workdir, debounce_impl):
    # DeleteSkipsDebounce (debounce_test.go:33) + UpsertIsDebounced (:66):
    # in the first batch the delete is emitted immediately while the upsert
    # stays buffered (its 10s quiet period has not elapsed).
    collected: list = []
    _write(
        spark,
        f"{workdir}/events",
        [
            (1, _t(0), 1, "purchase", 1.0, "{}"),   # upsert, buffered
            (2, _t(100), 2, "error", 0.0, "{}"),    # DELETE: immediate
        ],
    )
    _run(spark, workdir, collected, debounce_impl)
    assert ("user/2", "delete", 2, 0.0) in collected
    assert not any(c[0] == "user/1" for c in collected)

    # batch 2: a much later event advances the watermark past user/1's timer
    _write(spark, f"{workdir}/events", [(3, _t(3_600_000), 9, "view", 2.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    assert ("user/1", "upsert", 1, 1.0) in collected


def test_last_state_wins_across_rapid_updates(spark, workdir, debounce_impl):
    # LastStateWins (debounce_test.go:109): 5 rapid updates -> one flush
    # carrying the final value once the quiet period elapses.
    collected: list = []
    _write(
        spark,
        f"{workdir}/events",
        [(i, _t(i * 100), 1, "purchase", float(i), "{}") for i in range(1, 6)],
    )
    _run(spark, workdir, collected, debounce_impl)
    assert collected == []  # still within the quiet period
    _write(spark, f"{workdir}/events", [(99, _t(7_200_000), 9, "view", 0.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    flushed = [c for c in collected if c[0] == "user/1"]
    assert flushed == [("user/1", "upsert", 5, 5.0)]


def test_delete_cancels_pending_then_readd_survives(spark, workdir, debounce_impl):
    # DeleteCancelsPendingUpsert (debounce_test.go:161) +
    # DeleteThenReaddUsesNewGeneration (crd_debounce_test.go:267)
    collected: list = []
    _write(
        spark,
        f"{workdir}/events",
        [
            (1, _t(0), 1, "purchase", 1.0, "{}"),
            (2, _t(50), 1, "error", 0.0, "{}"),      # cancels the pending upsert
            (3, _t(100), 1, "signup", 7.0, "{}"),    # re-add after delete
        ],
    )
    _run(spark, workdir, collected, debounce_impl)
    assert [c for c in collected if c[1] == "delete"] == [("user/1", "delete", 2, 0.0)]
    _write(spark, f"{workdir}/events", [(99, _t(7_200_000), 9, "view", 0.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    upserts = [c for c in collected if c[1] == "upsert" and c[0] == "user/1"]
    assert upserts == [("user/1", "upsert", 3, 7.0)]  # the re-add survived


def test_out_of_order_straggler_across_batches_loses(spark, workdir, debounce_impl):
    # An out-of-order event in a LATER micro-batch with an OLDER timestamp
    # must not overwrite the buffered state (event-time consistency: result
    # must match the batch resolution regardless of batch boundaries).
    collected: list = []
    _write(spark, f"{workdir}/events", [(10, _t(100_000), 1, "purchase", 9.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    # batch 2: straggler at ts=95s (above the watermark of ~90s, so not
    # dropped as late) — older than the stored ts=100s state
    _write(spark, f"{workdir}/events", [(11, _t(95_000), 1, "purchase", 1.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    # batch 3: advance watermark far past the timer -> flush
    _write(spark, f"{workdir}/events", [(99, _t(7_200_000), 8, "view", 0.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    flushed = [c for c in collected if c[0] == "user/1"]
    assert flushed == [("user/1", "upsert", 10, 9.0)]  # ts=100s state won


def test_old_delete_after_newer_upsert_is_ignored(spark, workdir, debounce_impl):
    # a DELETE straggler older than the buffered upsert must neither emit nor
    # cancel (the batch resolution keeps the newer upsert)
    collected: list = []
    _write(spark, f"{workdir}/events", [(10, _t(100_000), 1, "purchase", 9.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    _write(spark, f"{workdir}/events", [(11, _t(95_000), 1, "error", 0.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    assert [c for c in collected if c[1] == "delete"] == []
    _write(spark, f"{workdir}/events", [(99, _t(7_200_000), 8, "view", 0.0, "{}")])
    _run(spark, workdir, collected, debounce_impl)
    assert [c for c in collected if c[0] == "user/1"] == [("user/1", "upsert", 10, 9.0)]
