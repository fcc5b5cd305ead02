"""Stateful dedup / debounce operators — the heart of the reference (SURVEY §2.4).

The reference's DebounceBuffer (internal/controller/debounce.go:32-232) keeps a
per-key map of pending changes: a quiet-period timer resets on every upsert,
only the latest state survives (last-state-wins), DELETEs bypass the buffer and
cancel pending upserts, flushes are batched.

A debounce *is* a session window (the gap timeout resets on each event), so the
Spark-first expression is:

  batch:     session assignment via lag()+cumsum (deterministic, oracle-able)
             or groupBy(session_window(ts, gap), key) + max_by
  streaming: session_window + watermark, or transformWithStateInPandas for
             exact per-key timers (see streaming.pipeline)

Everything here is built-in DataFrame ops — one hash exchange by key, no UDFs,
no driver-side state. At 100 TB the per-key map becomes a keyed shuffle, which
is exactly what Spark's stateful operators scale out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import EVENT_DELETE


def last_state_wins(
    events: DataFrame,
    key_cols: Sequence[str] = ("id",),
    ts_col: str = "event_ts",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key latest state: N events per key -> 1 row (the newest).

    Reference semantics: pending[id] <- last state, newer overwrites older
    (debounce.go:127-149; integration_test.go:257-312 asserts 5 rapid updates
    collapse to exactly 1 upsert carrying the last payload).

    Implemented as max_by over groupBy(key) — a single hash aggregation with
    map-side partial aggregation (each task keeps only its local max per key),
    so the shuffle carries one row per key per map task, not the raw stream.
    This beats the window/row_number formulation, which must shuffle and sort
    ALL rows. Ties broken by tiebreak_cols (e.g. a monotonic event id) so the
    result is deterministic.
    """
    ordering = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
    payload = F.struct(*[F.col(c) for c in events.columns])
    keys = [F.col(k) for k in key_cols]
    latest = events.groupBy(*keys).agg(F.max_by(payload, ordering).alias("__latest"))
    return latest.select("__latest.*")


def assign_sessions(
    events: DataFrame,
    key_cols: Sequence[str] = ("id",),
    ts_col: str = "event_ts",
    gap_ms: int = 10_000,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign a per-key session id: a new session starts when the gap since the
    previous event for the same key exceeds ``gap_ms`` — the batch-analytic
    form of the debounce timer (debounce.go:127-149: timer resets on every
    event; a key flushes only after gap_ms of quiet).

    lag() + running sum over Window.partitionBy(key).orderBy(ts): deterministic
    and expressible identically in ANSI SQL (the DuckDB oracle), unlike
    session_window whose emitted window bounds are Spark-specific structs.
    Adds a ``session_id`` column (0-based per key).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # Integer millisecond arithmetic (not float seconds): bit-for-bit
    # reproducible in any ANSI engine (epoch_ms differences in the oracle).
    gap_expr = F.unix_millis(F.col(ts_col)) - F.unix_millis(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_expr > F.lit(gap_ms)), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_id", F.sum(new_session).over(running).cast("bigint") - F.lit(1)
    )


def debounce(
    events: DataFrame,
    key_cols: Sequence[str] = ("id",),
    ts_col: str = "event_ts",
    gap_ms: int = 10_000,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Full batch debounce: per key per session, emit ONE row — the latest
    state in the session (last-state-wins within the quiet-period window).

    5 rapid updates inside one gap -> exactly 1 output row carrying the final
    payload (integration_test.go:257-312).
    """
    sessioned = assign_sessions(events, key_cols, ts_col, gap_ms, tiebreak_cols)
    return last_state_wins(
        sessioned,
        key_cols=[*key_cols, "session_id"],
        ts_col=ts_col,
        tiebreak_cols=tiebreak_cols,
    )


def delete_cancels_pending(
    events: DataFrame,
    key_cols: Sequence[str] = ("id",),
    ts_col: str = "event_ts",
    event_type_col: str = "event_type",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Upsert/delete resolution per key: the latest event decides the op.

    - latest event is DELETE  -> emit a delete (any pending upsert cancelled:
      debounce.go:107-113, debounce_test.go:161)
    - latest event is ADD/UPDATE -> emit an upsert with the latest state
    - DELETE wins ties at equal timestamp (the reference processes the delete
      by removing the pending entry, debounce.go:107-121)

    Output = input columns + ``op`` ('upsert' | 'delete'). One hash aggregation.
    """
    delete_rank = F.when(F.col(event_type_col) == EVENT_DELETE, F.lit(1)).otherwise(F.lit(0))
    ordering = F.struct(
        F.col(ts_col), delete_rank.alias("__del"), *[F.col(c) for c in tiebreak_cols]
    )
    payload = F.struct(*[F.col(c) for c in events.columns])
    latest = events.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.max_by(payload, ordering).alias("__latest")
    )
    flat = latest.select("__latest.*")
    return flat.withColumn(
        "op",
        F.when(F.col(event_type_col) == EVENT_DELETE, F.lit("delete")).otherwise(
            F.lit("upsert")
        ),
    )


def dedup_names(
    events: DataFrame,
    name_col: str = "crd_name",
    ts_col: str = "event_ts",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """CRD-pipeline dedup: N rapid ADDs of one name -> exactly 1 upsert,
    keeping the FIRST occurrence (crd_debounce.go:125-148,
    integration_test.go:609-645).

    min_by aggregation == dropDuplicates but deterministic about which row
    survives (dropDuplicates keeps an arbitrary row; tests need stability).
    """
    ordering = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
    payload = F.struct(*[F.col(c) for c in events.columns])
    first = events.groupBy(name_col).agg(F.min_by(payload, ordering).alias("__first"))
    return first.select("__first.*")


def assign_batches(
    rows: DataFrame,
    batch_max_size: int = 50,
    order_cols: Sequence[str] = ("event_ts",),
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch assembly (debounce.go:153-207): cap payload size at
    ``batch_max_size`` rows by assigning a ``batch_id`` over a deterministic
    global (or per-partition-group) ordering.

    NOTE scale: a global row_number forces a single-partition sort — fine for
    sink-payload chunking of a flushed micro-batch (bounded by flush interval),
    wrong for a 100 TB table. For the scale path pass partition_cols so
    numbering is per group (one window per shuffle partition group).
    """
    order = [F.col(c).asc() for c in order_cols]
    if partition_cols:
        w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(*order)
    else:
        w = Window.orderBy(*order)
    rn = F.row_number().over(w) - F.lit(1)
    return rows.withColumn("batch_id", (rn / F.lit(batch_max_size)).cast("bigint"))


def split_payloads(resolved: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Upsert/delete payload separation (debounce.go:115-121,200-206): a single
    emission contains upserts XOR deletes. Returns (upserts_df, delete_ids_df).
    """
    upserts = resolved.filter(F.col("op") == "upsert").drop("op")
    deletes = resolved.filter(F.col("op") == "delete").select(F.col("id"))
    return upserts, deletes


def salted_last_state_wins(
    events: DataFrame,
    key_cols: Sequence[str] = ("id",),
    ts_col: str = "event_ts",
    tiebreak_cols: Sequence[str] = (),
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant last-state-wins: two-phase max_by.

    A single hot key (one resource updated millions of times — the realistic
    skew at 100 TB) funnels every row to one reducer under plain groupBy.
    Phase 1 aggregates per (key, random-salt) bucket, spreading the hot key
    across salt_buckets reducers; phase 2 reduces the <= salt_buckets
    survivors per key. max_by over a total order is associative, so the
    result is IDENTICAL to last_state_wins — only the shuffle shape changes.
    (AQE's skew-join handling covers joins; aggregation skew needs salting.)
    """
    ordering = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
    payload = F.struct(*[F.col(c) for c in events.columns])
    keys = [F.col(k) for k in key_cols]
    salted = events.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, F.col("__salt")).agg(
        F.max_by(F.struct(payload.alias("p"), ordering.alias("o")), ordering).alias("__po")
    )
    phase2 = phase1.groupBy(*keys).agg(
        F.max_by(F.col("__po.p"), F.col("__po.o")).alias("__latest")
    )
    return phase2.select("__latest.*")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tolerance_ms: int | None = None,
) -> DataFrame:
    """As-of join: for every left row, the latest right row with
    right_ts <= left_ts for the same key (backward-looking, ties included).

    Spark has no native ASOF JOIN; the scalable expression is the union-merge:
    tag both sides, union, sort per key by (ts, side), and carry the last seen
    right payload forward with last(..., ignorenulls) over the ordered window.
    One shuffle on the key, no range join explosion — the same plan a
    merge-based asof implementation would hand-write, expressed declaratively.
    tolerance_ms drops matches older than left_ts - tolerance.
    """
    lcols = left.columns
    side_right = right.select(
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts before left at equal ts
        F.struct(*[F.col(c) for c in right_payload]).alias("__payload"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in key_cols],
    )
    side_left = left.select(
        *[F.col(k) for k in key_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(side_right.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in lcols if c not in key_cols],
    )
    unioned = side_right.unionByName(side_left)
    # __payload as the final sort key makes right-side ties at equal ts
    # deterministic (the largest payload struct wins); left rows carry null
    # payloads so their relative order cannot affect the carried value.
    w = (
        Window.partitionBy(*[F.col(k) for k in key_cols])
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__payload").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last(F.col("__payload"), ignorenulls=True).over(w)
    ).withColumn(
        "__match_ts",
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_ms is not None:
        in_tol = (
            F.unix_millis(F.col("__ts")) - F.unix_millis(F.col("__match_ts"))
        ) <= F.lit(tolerance_ms)
        out = out.withColumn(
            "__match", F.when(in_tol, F.col("__match"))
        ).withColumn("__match_ts", F.when(in_tol, F.col("__match_ts")))
    return out.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c) for c in lcols if c not in key_cols],
        F.col("__match").alias("asof_match"),
        F.col("__match_ts").alias("asof_ts"),
    )


def scd2_history(
    events: DataFrame,
    key_cols: Sequence[str] = ("id",),
    ts_col: str = "event_ts",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 assembly from the change stream: each
    event opens a version valid [its ts, next event's ts); the last version
    per key is current. The CDC-history materialization of the sync target —
    one window over the same id partitioning the rest of the pipeline uses.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    nxt = F.lead(F.unix_millis(F.col(ts_col))).over(w)
    return (
        events.withColumn("valid_from_ms", F.unix_millis(F.col(ts_col)))
        .withColumn("valid_to_ms", nxt)
        .withColumn("is_current", nxt.isNull())
    )
