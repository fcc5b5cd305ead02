"""Debounce/dedup operator tests — translations of
internal/controller/debounce_test.go and crd_debounce_test.go (SURVEY §5)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.operators.debounce import (
    assign_batches,
    assign_sessions,
    debounce,
    dedup_names,
    delete_cancels_pending,
    last_state_wins,
    split_payloads,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _t(ms: int) -> datetime.datetime:
    return T0 + datetime.timedelta(milliseconds=ms)


EVENT_SCHEMA = "event_type string, event_ts timestamp, id string, event_id long, value string"


def test_last_state_wins(spark):
    # debounce_test.go:109 LastStateWins / integration_test.go:257-312:
    # 5 rapid updates -> exactly 1 row carrying the final state (v5)
    rows = [("UPDATE", _t(i * 10), "k1", i, f"v{i}") for i in range(1, 6)]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = last_state_wins(df, key_cols=["id"], tiebreak_cols=["event_id"]).collect()
    assert len(out) == 1
    assert out[0]["value"] == "v5"


def test_last_state_wins_tie_broken_by_event_id(spark):
    rows = [("UPDATE", _t(0), "k1", 1, "first"), ("UPDATE", _t(0), "k1", 2, "second")]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = last_state_wins(df, key_cols=["id"], tiebreak_cols=["event_id"]).collect()
    assert out[0]["value"] == "second"


def test_debounce_sessions_split_on_gap(spark):
    # DebounceResetsOnNewEvent (debounce_test.go:316): events 5ms apart stay in
    # one session even past the window; a gap > window starts a new session.
    rows = [
        ("UPDATE", _t(0), "k1", 1, "a"),
        ("UPDATE", _t(5_000), "k1", 2, "b"),
        ("UPDATE", _t(9_000), "k1", 3, "c"),     # gaps < 10s: same session
        ("UPDATE", _t(25_000), "k1", 4, "d"),    # 16s gap: new session
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = debounce(df, gap_ms=10_000, tiebreak_cols=["event_id"]).orderBy("event_ts").collect()
    assert [(r["session_id"], r["value"]) for r in out] == [(0, "c"), (1, "d")]


def test_debounce_multiple_keys_independent(spark):
    # BatchMultipleResources (debounce_test.go:228)
    rows = [
        ("UPDATE", _t(0), "k1", 1, "a"),
        ("UPDATE", _t(100), "k2", 2, "b"),
        ("UPDATE", _t(200), "k3", 3, "c"),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = debounce(df, gap_ms=10_000, tiebreak_cols=["event_id"])
    assert out.count() == 3


def test_delete_cancels_pending_upsert(spark):
    # DeleteCancelsPendingUpsert (debounce_test.go:161): UPDATE then DELETE in
    # the window -> only a delete comes out.
    rows = [
        ("UPDATE", _t(0), "k1", 1, "a"),
        ("DELETE", _t(100), "k1", 2, None),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = delete_cancels_pending(df, tiebreak_cols=["event_id"]).collect()
    assert len(out) == 1
    assert out[0]["op"] == "delete"


def test_delete_wins_tie_at_equal_timestamp(spark):
    rows = [
        ("DELETE", _t(0), "k1", 1, None),
        ("UPDATE", _t(0), "k1", 0, "a"),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = delete_cancels_pending(df, tiebreak_cols=[]).collect()
    assert out[0]["op"] == "delete"


def test_upsert_after_delete_survives(spark):
    # delete-then-readd: the later ADD must win (crd_debounce_test.go:267
    # DeleteThenReaddUsesNewGeneration semantics)
    rows = [
        ("DELETE", _t(0), "k1", 1, None),
        ("ADD", _t(100), "k1", 2, "readd"),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = delete_cancels_pending(df, tiebreak_cols=["event_id"]).collect()
    assert len(out) == 1
    assert out[0]["op"] == "upsert"
    assert out[0]["value"] == "readd"


def test_separate_upsert_and_delete_payloads(spark):
    # SeparateUpsertAndDeletePayloads (debounce_test.go:267)
    rows = [
        ("UPDATE", _t(0), "k1", 1, "a"),
        ("DELETE", _t(0), "k2", 2, None),
        ("ADD", _t(0), "k3", 3, "c"),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    resolved = delete_cancels_pending(df, tiebreak_cols=["event_id"])
    upserts, deletes = split_payloads(resolved)
    assert sorted(r["id"] for r in upserts.collect()) == ["k1", "k3"]
    assert [r["id"] for r in deletes.collect()] == ["k2"]
    assert "op" not in upserts.columns


def test_dedup_names_keeps_first(spark):
    # crd_debounce_test.go:128 DeduplicatesRepeatedAdds /
    # integration_test.go:609-645: 5 rapid adds -> exactly 1
    rows = [("ADD", _t(i * 10), "widgets.example.com", i) for i in range(5)] + [
        ("ADD", _t(0), "gadgets.example.com", 99)
    ]
    df = spark.createDataFrame(rows, "event_type string, event_ts timestamp, crd_name string, event_id long")
    out = dedup_names(df, tiebreak_cols=["event_id"]).orderBy("crd_name").collect()
    assert [(r["crd_name"], r["event_id"]) for r in out] == [
        ("gadgets.example.com", 99),
        ("widgets.example.com", 0),
    ]


def test_assign_batches_caps_size(spark):
    # batch size cap (debounce.go:153-161): 120 rows, cap 50 -> batches of
    # 50/50/20 with deterministic assignment
    rows = [("ADD", _t(i), f"k{i}", i, "v") for i in range(120)]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = assign_batches(df, batch_max_size=50, order_cols=["event_ts", "id"])
    sizes = {
        r["batch_id"]: r["n"]
        for r in out.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {0: 50, 1: 50, 2: 20}


def test_assign_sessions_zero_based_per_key(spark):
    rows = [
        ("UPDATE", _t(0), "k1", 1, "a"),
        ("UPDATE", _t(60_000), "k1", 2, "b"),
        ("UPDATE", _t(0), "k2", 3, "c"),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = assign_sessions(df, gap_ms=10_000, tiebreak_cols=["event_id"]).collect()
    by_event = {r["event_id"]: r["session_id"] for r in out}
    assert by_event == {1: 0, 2: 1, 3: 0}


def test_asof_join_backward_with_tolerance(spark):
    from k8s_vectordb_sync_spark.operators.debounce import asof_join

    left = spark.createDataFrame(
        [("k1", _t(10_000), 100), ("k1", _t(50_000), 101), ("k2", _t(10_000), 102)],
        "k string, lts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("k1", _t(5_000), 1), ("k1", _t(9_000), 2), ("k1", _t(40_000), 3)],
        "k string, rts timestamp, rid long",
    )
    out = {
        r["lid"]: (
            r["asof_match"]["rid"] if r["asof_match"] else None,
        )
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["rid"]
        ).collect()
    }
    # lid 100 matches rid 2 (latest <= 10s); 101 matches rid 3; k2 has none
    assert out == {100: (2,), 101: (3,), 102: (None,)}

    with_tol = {
        r["lid"]: (r["asof_match"]["rid"] if r["asof_match"] else None)
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["rid"], tolerance_ms=2_000
        ).collect()
    }
    # tolerance 2s: rid 2 is 1s before lid 100 (kept); rid 3 is 10s before
    # lid 101 (dropped)
    assert with_tol == {100: 2, 101: None, 102: None}


def test_scd2_history_versions(spark):
    from k8s_vectordb_sync_spark.operators.debounce import scd2_history

    rows = [
        ("UPDATE", _t(0), "k1", 1, "a"),
        ("UPDATE", _t(1_000), "k1", 2, "b"),
        ("UPDATE", _t(0), "k2", 3, "c"),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = {r["event_id"]: (r["valid_to_ms"] is None, r["is_current"]) for r in scd2_history(df, tiebreak_cols=["event_id"]).collect()}
    assert out == {1: (False, False), 2: (True, True), 3: (True, True)}


def test_lag_cumsum_debounce_equals_native_session_window(spark):
    # the lag+cumsum session assignment must group events exactly like
    # Spark's native session_window(gap) operator (same quiet-period model)
    import datetime as _dt

    rows = []
    base = _dt.datetime(2024, 1, 1)
    # irregular gaps around the 10s boundary across two keys
    offsets = [0, 3, 9, 25, 26, 50, 80, 89, 101]
    for i, off in enumerate(offsets):
        rows.append(("UPDATE", base + _dt.timedelta(seconds=off), "k1", i, "v"))
        rows.append(("UPDATE", base + _dt.timedelta(seconds=off * 2), "k2", 100 + i, "v"))
    df = spark.createDataFrame(rows, EVENT_SCHEMA)

    ours = debounce(df, gap_ms=10_000, tiebreak_cols=["event_id"])
    native = (
        df.groupBy(F.session_window("event_ts", "10 seconds").alias("w"), F.col("id"))
        .agg(F.max_by(F.col("event_id"), F.struct("event_ts", "event_id")).alias("last_event_id"))
    )
    # same number of sessions per key, same surviving last event ids
    assert sorted(r["event_id"] for r in ours.collect()) == sorted(
        r["last_event_id"] for r in native.collect()
    )
