"""Stream-stream interval join (streaming/joins.py): the streamed
attribution equals the batch run of the SAME expression on the same data
(single code path — batch is the oracle), watermark state cleanup is wired,
and the interval bound actually binds."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.streaming.joins import (
    attribution_interval_join,
    start_attribution_join,
)

T0 = datetime.datetime(2024, 5, 1, 12, 0, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.fixture(scope="module")
def staged_events(spark, tmp_path_factory):
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1: two clicks inside the window, one far outside
        (1, T0 - 90 * m, 1, "click", 0.0, "{}"),
        (2, T0 - 20 * m, 1, "click", 0.0, "{}"),
        (3, T0 - 5 * m, 1, "click", 0.0, "{}"),
        (4, T0, 1, "purchase", 100.0, "{}"),
        # user 2: click AFTER the purchase — must not attribute
        (5, T0 + 5 * m, 2, "click", 0.0, "{}"),
        (6, T0, 2, "purchase", 50.0, "{}"),
        # user 3: boundary cases — exactly at purchase_ts (included) and
        # exactly window_minutes before (excluded: strict >)
        (7, T0, 3, "click", 0.0, "{}"),
        (8, T0 - 30 * m, 3, "click", 0.0, "{}"),
        (9, T0, 3, "purchase", 75.0, "{}"),
        # user 4: purchase only, no clicks
        (10, T0, 4, "purchase", 25.0, "{}"),
    ]
    d = str(tmp_path_factory.mktemp("attr"))
    _mk_events(spark, rows).write.mode("overwrite").parquet(os.path.join(d, "ev"))
    return os.path.join(d, "ev")


def _sides(df):
    return (
        df.filter(F.col("event_type") == "click"),
        df.filter(F.col("event_type") == "purchase"),
    )


def test_batch_interval_join_semantics(spark, staged_events):
    clicks, purchases = _sides(spark.read.parquet(staged_events))
    got = {
        (r["purchase_id"], r["click_id"])
        for r in attribution_interval_join(clicks, purchases).collect()
    }
    # user1: clicks 2,3 in-window (not 1); user2: none; user3: click 7 at
    # ts==purchase_ts included, click 8 at exactly -30min excluded
    assert got == {(4, 2), (4, 3), (9, 7)}


def test_streamed_join_equals_batch(spark, staged_events, tmp_path):
    df = spark.read.parquet(staged_events)
    schema = df.schema
    sc, sp = _sides(spark.readStream.schema(schema).parquet(staged_events))
    collected: list = []
    q = start_attribution_join(
        sc, sp,
        emit=lambda out, bid: collected.extend(tuple(r) for r in out.collect()),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300), "attribution join did not finish"
    bc, bp = _sides(df)
    batch = {tuple(r) for r in attribution_interval_join(bc, bp).collect()}
    assert set(collected) == batch and len(batch) == 3


def test_streaming_join_plan_has_watermarks(spark, staged_events):
    schema = spark.read.parquet(staged_events).schema
    sc, sp = _sides(spark.readStream.schema(schema).parquet(staged_events))
    joined = attribution_interval_join(sc, sp)
    plan = joined._jdf.queryExecution().analyzed().toString()
    # both sides must carry EventTimeWatermark nodes or the click buffer
    # never expires (state-growth correctness, not an optimization)
    assert plan.count("EventTimeWatermark") == 2, plan[:1500]


def test_windowed_agg_append_mode_late_data_contract(spark, tmp_path):
    """Watermark late-data contract, proven end-to-end in APPEND mode over
    four real micro-batches. Spark's actual guarantee (and therefore this
    engine's): a finalized window is emitted EXACTLY ONCE, and an event
    arriving after that window's state was evicted is dropped — it neither
    re-emits the window nor spawns a duplicate. (Late data arriving while
    the window's state is still live MAY still be merged; 'too late' is
    best-effort until eviction, which is why every exactly-once claim in
    this repo hangs on emission uniqueness, not on row-level drops.)"""
    import os
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)
    m = datetime.timedelta(minutes=1)

    def write_file(rows):
        _mk_events(spark, rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes keep file->batch order stable

    # b1: two events in [12:00,12:05) plus a 12:20 watermark pusher
    write_file(
        [
            (1, T0 + 1 * m, 1, "click", 0.0, "{}"),
            (2, T0 + 2 * m, 1, "click", 0.0, "{}"),
            (3, T0 + 20 * m, 1, "click", 0.0, "{}"),
        ]
    )
    # b2: fresh event; the batch boundary lets the 12:10 watermark land,
    # emitting + evicting window [12:00,12:05) with n=2
    write_file([(4, T0 + 25 * m, 1, "click", 0.0, "{}")])
    # b3: event for the long-evicted [12:00,12:05) window -> dropped
    write_file([(5, T0 + 3 * m, 1, "click", 0.0, "{}")])
    # b4: final watermark pusher so later windows flush too
    write_file([(6, T0 + 60 * m, 1, "click", 0.0, "{}")])

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    got: list = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: got.extend((r["start"], r["n"]) for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    w0_emissions = [n for s, n in got if s == T0]
    # exactly one emission, with n=2: the evicted-window straggler (event 5)
    # neither re-opened the window nor changed its count
    assert w0_emissions == [2], got
    # and the straggler did not leak into any other window's count either
    assert sum(n for _, n in got) <= 5  # events 1,2,3,4,6 at most; 5 dropped


def test_streaming_join_restart_preserves_buffered_click_state(
    spark, tmp_path
):
    """Kill-and-restart across the join buffer: phase 1 streams ONLY clicks
    (plus a purchase with no in-window click), stops; phase 2 adds the
    purchases and restarts from the same checkpoint. Every attribution pair
    spans the restart (click buffered in phase-1 state, purchase arriving
    in phase 2), so the test proves the join's click buffer survives in the
    state store and emits exactly once — no missed pairs, no duplicates."""
    m = datetime.timedelta(minutes=1)
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    phase1 = [
        (1, T0 - 90 * m, 1, "click", 0.0, "{}"),
        (2, T0 - 20 * m, 1, "click", 0.0, "{}"),
        (3, T0 - 5 * m, 1, "click", 0.0, "{}"),
        (7, T0, 3, "click", 0.0, "{}"),
        (8, T0 - 30 * m, 3, "click", 0.0, "{}"),
        (6, T0, 2, "purchase", 50.0, "{}"),  # user 2: no in-window click
    ]
    phase2 = [
        (4, T0, 1, "purchase", 100.0, "{}"),
        (9, T0, 3, "purchase", 75.0, "{}"),
        (10, T0, 4, "purchase", 25.0, "{}"),
        (5, T0 + 5 * m, 2, "click", 0.0, "{}"),  # click after purchase
    ]
    _mk_events(spark, phase1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_phase(collected):
        sc, sp = _sides(spark.readStream.schema(schema).parquet(src))
        q = start_attribution_join(
            sc, sp,
            emit=lambda out, bid: collected.extend(
                (r["purchase_id"], r["click_id"]) for r in out.collect()
            ),
            checkpoint_dir=ckpt,
        )
        assert q.awaitTermination(300), "phase did not finish"

    got1: list = []
    run_phase(got1)
    assert got1 == []  # no purchase had an in-window click yet
    _mk_events(spark, phase2).write.mode("append").parquet(src)
    got2: list = []
    run_phase(got2)
    # all three pairs span the restart; exactly once each
    assert sorted(got2) == [(4, 2), (4, 3), (9, 7)]
