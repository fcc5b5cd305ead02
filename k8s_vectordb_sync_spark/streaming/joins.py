"""Stream-stream interval join: the streaming analog of the batch range/as-of
attribution queries (queries.py::events_range_join / events_asof_attribution).

A purchase stream joins the click stream of the same user within a trailing
attribution window — the standing form of "which engagement preceded this
conversion" that a live pipeline runs instead of nightly batch attribution.

Spark semantics this leans on (Structured Streaming stream-stream joins):
- BOTH sides carry event-time watermarks, and the join condition bounds the
  event-time distance; together these let the state store expire buffered
  rows (clicks older than purchase-watermark - window are provably
  unmatchable and are dropped). Without the time bound the click buffer
  grows forever — the condition is a correctness-of-state requirement, not
  an optimization.
- The join keys on user_id, so state shuffles once per side on the same key
  and each task joins co-partitioned buffers — per-user fan-out is bounded
  by in-window activity, never corpus x corpus.
- Inner join in append mode: a (purchase, click) pair emits as soon as both
  sides have arrived; late clicks beyond the watermark are dropped, the same
  late-data contract every windowed aggregate in this engine uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def attribution_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 30,
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Join each purchase to every click by the same user in the trailing
    ``window_minutes`` (click_ts in (purchase_ts - window, purchase_ts]).

    Works identically on batch and streaming frames — the single code path
    the serving tests exploit: the batch run of the same expression IS the
    oracle for the streamed run.

    Returns (user_id, purchase_id, purchase_ts, purchase_value, click_id,
    click_ts, lag_us) — the lag column is in MICROSECONDS (unix_micros
    difference), not seconds.
    """
    c = clicks.select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = purchases.select(
        F.col(user_col).alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (c["user_id"] == p["p_user_id"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (
            c["click_ts"]
            > p["purchase_ts"] - F.expr(f"INTERVAL {int(window_minutes)} MINUTES")
        )
    )
    return c.join(p, cond, "inner").select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


def start_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    emit,
    window_minutes: int = 30,
    watermark: str = "30 minutes",
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Standing attribution query: emit receives each micro-batch of joined
    (purchase, click) attributions."""
    joined = attribution_interval_join(
        clicks, purchases, window_minutes=window_minutes, watermark=watermark
    )
    writer = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: emit(df, bid))
        .queryName("attribution-join")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
