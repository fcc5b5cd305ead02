"""Property-based tests (hypothesis) for the stateful operator core —
invariants over random event sequences, beyond the reference's example-based
suite (SURVEY §5 notes it has no property tests)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from k8s_vectordb_sync_spark.operators.debounce import (
    asof_join,
    assign_sessions,
    debounce,
    delete_cancels_pending,
    last_state_wins,
)

T0 = datetime.datetime(2024, 1, 1)

# (event_type, ts_offset_ms, key, value)
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["ADD", "UPDATE", "DELETE"]),
        st.integers(min_value=0, max_value=120_000),
        st.sampled_from(["k1", "k2", "k3"]),
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    data = [
        (et, T0 + datetime.timedelta(milliseconds=ms), k, i, v)
        for i, (et, ms, k, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_type string, event_ts timestamp, id string, event_id long, value double"
    )


@given(rows=events_strategy)
@SETTINGS
def test_last_state_wins_picks_global_max_per_key(spark, rows):
    df = _df(spark, rows)
    out = last_state_wins(df, tiebreak_cols=["event_id"]).collect()
    # model: per key, the row with max (ts, event_id)
    model = {}
    for i, (et, ms, k, v) in enumerate(rows):
        cur = model.get(k)
        if cur is None or (ms, i) > (cur[0], cur[1]):
            model[k] = (ms, i)
    assert {r["id"]: r["event_id"] for r in out} == {
        k: i for k, (ms, i) in model.items()
    }


@given(rows=events_strategy)
@SETTINGS
def test_sessions_split_exactly_on_gap(spark, rows):
    gap = 10_000
    df = _df(spark, rows)
    out = assign_sessions(df, gap_ms=gap, tiebreak_cols=["event_id"]).collect()
    # model: sort per key by (ts, event_id); session increments iff gap > 10s
    by_key: dict = {}
    for i, (et, ms, k, v) in enumerate(rows):
        by_key.setdefault(k, []).append((ms, i))
    expected = {}
    for k, items in by_key.items():
        items.sort()
        sid = -1
        prev = None
        for ms, i in items:
            if prev is None or ms - prev > gap:
                sid += 1
            expected[i] = sid
            prev = ms
    got = {r["event_id"]: r["session_id"] for r in out}
    assert got == expected


@given(rows=events_strategy)
@SETTINGS
def test_resolution_op_matches_latest_event_type(spark, rows):
    df = _df(spark, rows)
    out = delete_cancels_pending(df, tiebreak_cols=["event_id"]).collect()
    # exactly one row per key; op mirrors the latest event's type
    # (DELETE preferred at ties)
    model = {}
    for i, (et, ms, k, v) in enumerate(rows):
        rank = (ms, 1 if et == "DELETE" else 0, i)
        if k not in model or rank > model[k][0]:
            model[k] = (rank, et)
    assert len(out) == len(model)
    for r in out:
        assert r["op"] == ("delete" if model[r["id"]][1] == "DELETE" else "upsert")


@given(rows=events_strategy)
@SETTINGS
def test_debounce_output_bounded_and_last_state(spark, rows):
    df = _df(spark, rows)
    out = debounce(df, gap_ms=10_000, tiebreak_cols=["event_id"]).collect()
    keys = {k for _, _, k, _ in rows}
    # one row per (key, session); at most one session per event of the key
    assert len(out) >= len(keys)
    assert len(out) <= len(rows)
    # within each (key, session) the surviving row is the max (ts, event_id)
    per_ks = {}
    for r in out:
        assert per_ks.setdefault((r["id"], r["session_id"]), r) is r


@given(
    left_ts=st.lists(st.integers(0, 100_000), min_size=1, max_size=10),
    right_ts=st.lists(st.integers(0, 100_000), min_size=0, max_size=10),
)
@SETTINGS
def test_asof_join_matches_nested_loop_model(spark, left_ts, right_ts):
    left = spark.createDataFrame(
        [("k", T0 + datetime.timedelta(milliseconds=ms), i) for i, ms in enumerate(left_ts)],
        "k string, lts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("k", T0 + datetime.timedelta(milliseconds=ms), i) for i, ms in enumerate(right_ts)],
        "k string, rts timestamp, rid long",
    ) if right_ts else spark.createDataFrame([], "k string, rts timestamp, rid long")
    out = {
        r["lid"]: (r["asof_match"]["rid"] if r["asof_match"] else None)
        for r in asof_join(left, right, ["k"], "lts", "rts", ["rid"]).collect()
    }
    # model: latest right with rts <= lts, ties by largest rid
    model = {}
    for li, lms in enumerate(left_ts):
        best = None
        for ri, rms in enumerate(right_ts):
            if rms <= lms and (best is None or (rms, ri) > best):
                best = (rms, ri)
        model[li] = best[1] if best is not None else None
    assert out == model


# ---------------------------------------------------------------------------
# Curation-operator invariants
# ---------------------------------------------------------------------------

_sample_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.sampled_from(["sA", "sB", "sC"]),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(rows=_sample_rows, r1=st.sampled_from([0.1, 0.3, 0.5]), bump=st.sampled_from([0.2, 0.4]))
@SETTINGS
def test_stratified_samples_are_nested(spark, rows, r1, bump):
    # hash sampling's defining invariant: raising the rate only ADDS rows —
    # the sample at rate r is a subset of the sample at rate r' > r. (A
    # rand()-based sampler has no such property; this is what makes the
    # operator reproducible for training-data ablations.)
    from k8s_vectordb_sync_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(rows, "doc_id long, source string")
    r2 = r1 + bump
    small = {r["doc_id"] for r in stratified_sample(df, {}, default_rate=r1).collect()}
    big = {r["doc_id"] for r in stratified_sample(df, {}, default_rate=r2).collect()}
    assert small <= big


_text_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.text(alphabet="ab c", max_size=30),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(rows=_text_rows)
@SETTINGS
def test_bigram_count_is_tokens_minus_one(spark, rows):
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.functions.text import bigrams, tokens

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = df.select(
        F.size(tokens(F.col("text"))).alias("nt"),
        F.size(bigrams(F.col("text"))).alias("nb"),
    ).collect()
    for r in got:
        assert r["nb"] == max(r["nt"] - 1, 0)


vec_strategy = st.lists(
    st.lists(
        st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
        min_size=64,
        max_size=64,
    ),
    min_size=2,
    max_size=8,
)


@given(vecs=vec_strategy)
@SETTINGS
def test_hamming_is_a_metric_on_sign_codes(spark, vecs):
    """Hamming over sign codes: zero iff same sign pattern, symmetric,
    triangle inequality — checked against the Spark-computed codes."""
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.operators.similarity import sign_codes

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    codes = {
        r["vec_id"]: (r["w0"], r["w1"])
        for r in sign_codes(df, "vec_id", "embedding", 64).collect()
    }

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    ids = sorted(codes)
    for i in ids:
        assert ham(codes[i], codes[i]) == 0
        for j in ids:
            assert ham(codes[i], codes[j]) == ham(codes[j], codes[i])
            for l in ids:
                assert ham(codes[i], codes[l]) <= ham(codes[i], codes[j]) + ham(
                    codes[j], codes[l]
                )
            expect = sum((x >= 0) != (y >= 0) for x, y in zip(vecs[i], vecs[j]))
            assert ham(codes[i], codes[j]) == expect


grouped_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=10_000),
        st.floats(min_value=0, max_value=10, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=grouped_rows, cap=st.integers(min_value=1, max_value=6))
@SETTINGS
def test_group_cap_equals_naive_window_on_random_frames(spark, rows, cap):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.operators.sampling import group_cap

    data = [(g, i, v) for i, (g, _, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "grp string, rid long, val double"
    ).repartition(5)
    got = sorted(
        (r["grp"], r["rid"], r["rnk"])
        for r in group_cap(df, "grp", "val", "rid", cap).collect()
    )
    w = Window.partitionBy("grp").orderBy(F.col("val").desc(), F.col("rid"))
    naive = sorted(
        (r["grp"], r["rid"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= cap)
        .collect()
    )
    assert got == naive


join_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # join key (few keys -> hot)
        st.integers(min_value=0, max_value=1000),  # payload
    ),
    min_size=0,
    max_size=30,
)


@given(left=join_rows, right=join_rows)
@SETTINGS
def test_salted_join_equals_plain_join(spark, left, right):
    """operators/skew.py::salted_join is semantically the plain equi-join
    for ANY input multiset, including duplicate keys and keys present on
    only one side — multiplicities preserved, salt never leaks."""
    from k8s_vectordb_sync_spark.operators.skew import salted_join

    ldf = spark.createDataFrame(
        [(k, v) for k, v in left] or [(None, None)], "k int, lv int"
    ).filter("k is not null")
    rdf = spark.createDataFrame(
        [(k, v) for k, v in right] or [(None, None)], "k int, rv int"
    ).filter("k is not null")
    got = sorted(tuple(r) for r in salted_join(ldf, rdf, on=["k"], n_salts=4).collect())
    want = sorted(tuple(r) for r in ldf.join(rdf, "k").collect())
    assert got == want


@given(left=join_rows, right=join_rows)
@SETTINGS
def test_salted_left_join_equals_plain_left_join(spark, left, right):
    """The left-outer flavor is also salt-equivalent: an unmatched LEFT row
    carries exactly one salt value, so it survives exactly once."""
    from k8s_vectordb_sync_spark.operators.skew import salted_join

    ldf = spark.createDataFrame(
        [(k, v) for k, v in left] or [(None, None)], "k int, lv int"
    ).filter("k is not null")
    rdf = spark.createDataFrame(
        [(k, v) for k, v in right] or [(None, None)], "k int, rv int"
    ).filter("k is not null")
    got = sorted(
        tuple(r) for r in salted_join(ldf, rdf, on=["k"], n_salts=4, how="left").collect()
    )
    want = sorted(tuple(r) for r in ldf.join(rdf, "k", "left").collect())
    assert got == want


def test_salted_join_rejects_right_and_full_outer(spark):
    """right/full outer would emit each unmatched right row once per salt
    (the right side is replicated n_salts x) — salted_join must refuse,
    not silently duplicate (ADVICE r6)."""
    import pytest

    from k8s_vectordb_sync_spark.operators.skew import salted_join

    ldf = spark.createDataFrame([(1, 1)], "k int, lv int")
    rdf = spark.createDataFrame([(2, 2)], "k int, rv int")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="not salt-equivalent"):
            salted_join(ldf, rdf, on=["k"], n_salts=4, how=how)


_hll_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=50), st.sampled_from(["a", "b", "c"])),
    min_size=0,
    max_size=60,
)


@given(rows=_hll_rows)
@SETTINGS
def test_hll_intersection_exact_matches_set_model(spark, rows):
    """The exact audit column equals the Python set model |A ∩ B| for
    arbitrary multisets; the sketch estimate is clamped non-negative; and
    the zero-qualifying-rows case emits zero rows (the COUNT-gate
    contract)."""
    from k8s_vectordb_sync_spark.operators.sketches import hll_intersection

    df = spark.createDataFrame(
        [(k, g) for k, g in rows] or [(0, "zzz")], "user_id long, event_type string"
    )
    out = hll_intersection(df, "user_id", "event_type", "a", "b").collect()
    a = {k for k, g in rows if g == "a"}
    b = {k for k, g in rows if g == "b"}
    if not a and not b:
        assert out == []
    else:
        (r,) = out
        assert r["n_exact_inter"] == len(a & b)
        assert r["n_hll_inter"] >= 0.0
        # in the linear-counting regime (<=51 keys vs m=256) the sketch is
        # near-exact: union estimate within 2 of truth
        assert abs(r["n_hll_union"] - len(a | b)) <= 2
