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
