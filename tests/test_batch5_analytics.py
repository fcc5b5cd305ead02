"""Business-analytics batch-5 queries on crafted inputs: market-basket
affinity counts, gap-fill carry-forward, CUSUM change-point on a planted
level shift, the two-proportion z-score vs a Python recompute, and OLS
trend vs numpy — including the degenerate single-day / zero-variance
series the ANSI-mode divide guard exists for.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

import numpy as np
import pytest

from k8s_vectordb_sync_spark.queries import QUERIES

T0 = datetime.datetime(2024, 3, 1)


def _write(df, d, name):
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _md5_prefix_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_brand_affinity_toy_baskets(spark, tmp_path):
    """support = pair/orders, confidence = pair/n(brand_a), lift exact on a
    4-basket corpus with a known co-occurrence table."""
    d = str(tmp_path)
    # parts: 1->A, 2->B, 3->C; baskets o1={A,B}, o2={A,B}, o3={A,C}, o4={B}
    part = spark.createDataFrame(
        [(1, "n", "A", "t", 1, 1.0), (2, "n", "B", "t", 1, 1.0), (3, "n", "C", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    li_rows = []
    baskets = {1: [1, 2], 2: [1, 2], 3: [1, 3], 4: [2]}
    for okey, parts in baskets.items():
        for i, pk in enumerate(parts):
            li_rows.append((okey, pk, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", T0))
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    _write(part, d, "part")
    _write(li, d, "lineitem")
    out = {
        (r["brand_a"], r["brand_b"]): r
        for r in QUERIES["orders_brand_affinity"](spark, d).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C")}  # (B,C) never co-occurs
    ab = out[("A", "B")]
    assert ab["pair_n"] == 2
    assert ab["support"] == round(2 / 4, 6)
    assert ab["confidence"] == round(2 / 3, 6)
    assert ab["lift"] == round(2 * 4 / (3 * 3), 6)
    ac = out[("A", "C")]
    assert ac["pair_n"] == 1
    assert ac["support"] == 0.25
    assert ac["confidence"] == round(1 / 3, 6)
    assert ac["lift"] == round(1 * 4 / (3 * 1), 6)


def test_hourly_gap_fill_carry_forward(spark, tmp_path):
    """A planted missing hour becomes an explicit is_gap row carrying the
    last observed mean; a type with no later data keeps carrying its last
    value to the end of the global spine."""
    d = str(tmp_path)
    h = datetime.timedelta(hours=1)
    rows = [
        (1, T0, 1, "X", 10.0, "{}"),
        (2, T0, 2, "X", 20.0, "{}"),  # hour 0 avg 15
        (3, T0 + 2 * h, 1, "X", 30.0, "{}"),  # hour 2 avg 30; hour 1 is a gap
        (4, T0, 3, "Y", 7.0, "{}"),  # Y only at hour 0
    ]
    _write(_events(spark, rows), d, "events")
    out = {
        (r["event_type"], r["hour_ms"]): r
        for r in QUERIES["events_hourly_gap_fill"](spark, d).collect()
    }
    ms0 = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    ms1, ms2 = ms0 + 3_600_000, ms0 + 7_200_000
    assert len(out) == 6  # 2 types x 3 spine hours
    assert out[("X", ms0)]["n"] == 2 and out[("X", ms0)]["filled_avg"] == 15.0
    gap = out[("X", ms1)]
    assert gap["n"] == 0 and gap["is_gap"] == 1 and gap["filled_avg"] == 15.0
    assert out[("X", ms2)]["filled_avg"] == 30.0 and out[("X", ms2)]["is_gap"] == 0
    # Y: observed once, then two gap rows carrying 7.0 across the spine
    assert out[("Y", ms0)]["filled_avg"] == 7.0
    assert out[("Y", ms1)]["is_gap"] == 1 and out[("Y", ms1)]["filled_avg"] == 7.0
    assert out[("Y", ms2)]["is_gap"] == 1 and out[("Y", ms2)]["filled_avg"] == 7.0


def test_cusum_peak_on_planted_level_shift(spark, tmp_path):
    """10 days at 10/day then 10 days at 20/day: mean 15, CUSUM walks to its
    extreme exactly at the shift day (day 10, s = -50)."""
    d = str(tmp_path)
    day = datetime.timedelta(days=1)
    rows = []
    for i in range(20):
        v = 10.0 if i < 10 else 20.0
        rows.append((i, T0 + i * day, i, "shift", v, "{}"))
    _write(_events(spark, rows), d, "events")
    out = QUERIES["events_cusum_changepoint"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    day10 = T0 + 9 * day  # 10th day, 0-indexed 9
    assert r["change_day_ms"] == int(
        day10.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
    )
    assert r["cusum_peak"] == -50.0
    assert r["n_days"] == 20


def test_ab_test_z_score_matches_python(spark, tmp_path):
    """Arm assignment replicated with hashlib.md5 and the pooled
    two-proportion z recomputed in Python must match bit-for-bit (6/4 dp)."""
    d = str(tmp_path)
    rows = []
    arms = {0: [0, 0], 1: [0, 0]}  # variant -> [n_users, n_conv]
    for uid in range(200):
        variant = _md5_prefix_long(str(uid)) % 2
        converted = uid % 3 == 0  # deterministic, independent of the hash
        arms[variant][0] += 1
        arms[variant][1] += int(converted)
        val = 500.0 if converted else 50.0
        rows.append((uid * 2, T0, uid, "purchase", val, "{}"))
        rows.append((uid * 2 + 1, T0, uid, "view", 999.0, "{}"))  # ignored type
    _write(_events(spark, rows), d, "events")
    (r,) = QUERIES["events_ab_test"](spark, d).collect()
    (n_a, conv_a), (n_b, conv_b) = arms[0], arms[1]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (n_a, conv_a, n_b, conv_b)
    assert r["rate_a"] == round(conv_a / n_a, 6)
    assert r["rate_b"] == round(conv_b / n_b, 6)
    pooled = (conv_a + conv_b) / (n_a + n_b)
    z = (conv_b / n_b - conv_a / n_a) / math.sqrt(
        pooled * (1 - pooled) * (1 / n_a + 1 / n_b)
    )
    assert r["z_score"] == pytest.approx(round(z, 4), abs=1e-9)


def test_ab_test_degenerate_pooled_rate_is_null(spark, tmp_path):
    """Everyone converts -> pooled rate 1 -> zero variance -> z_score NULL
    (not a DIVIDE_BY_ZERO crash under ANSI mode)."""
    d = str(tmp_path)
    rows = [(u, T0, u, "purchase", 500.0, "{}") for u in range(40)]
    _write(_events(spark, rows), d, "events")
    (r,) = QUERIES["events_ab_test"](spark, d).collect()
    assert r["conv_a"] == r["n_a"] and r["conv_b"] == r["n_b"]
    assert r["z_score"] is None


def test_trend_ols_matches_numpy(spark, tmp_path):
    """Slope/intercept/r2 vs numpy lstsq on the per-day totals; plus the two
    degenerate shapes: a single-day type (NULL everything) and a constant
    series (slope 0, r2 NULL) — the ANSI divide-guard paths."""
    d = str(tmp_path)
    day = datetime.timedelta(days=1)
    rows = []
    # "trend": two events per day so the daily total is a real SUM
    daily = {}
    for i in range(12):
        a, b = 3.0 + 2.5 * i, 1.0 + 0.1 * (i % 4)
        rows.append((100 + 2 * i, T0 + i * day, 1, "trend", a, "{}"))
        rows.append((101 + 2 * i, T0 + i * day, 2, "trend", b, "{}"))
        daily[i] = a + b
    rows.append((900, T0, 9, "oneday", 42.0, "{}"))  # n=1: den == 0
    for i in range(5):
        rows.append((950 + i, T0 + i * day, 9, "flat", 8.0, "{}"))  # zero variance
    _write(_events(spark, rows), d, "events")
    out = {r["event_type"]: r for r in QUERIES["events_daily_trend_ols"](spark, d).collect()}

    epoch_day0 = int(
        T0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
    ) // 86_400_000
    x = np.array([epoch_day0 + i for i in range(12)], dtype=float)
    y = np.array([daily[i] for i in range(12)])
    slope, intercept = np.polyfit(x, y, 1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    t = out["trend"]
    assert t["n_days"] == 12
    assert t["slope"] == pytest.approx(slope, abs=1e-5)
    assert t["intercept"] == pytest.approx(intercept, abs=1e-3)
    assert t["r2"] == pytest.approx(r2, abs=1e-5)

    one = out["oneday"]
    assert one["n_days"] == 1
    assert one["slope"] is None and one["intercept"] is None and one["r2"] is None

    flat = out["flat"]
    assert flat["n_days"] == 5
    assert flat["slope"] == 0.0 and flat["intercept"] == 8.0
    assert flat["r2"] is None  # zero y-variance: deny == 0


def test_rolling_7d_rounding_matches_exact_fractions(spark, tmp_path):
    """events_rolling_7d's integer round-half-up equals a Fraction-exact
    recompute on an adversarial corpus full of .00005-boundary means (the
    case where float round() diverges between engines)."""
    from fractions import Fraction

    d = str(tmp_path)
    day = datetime.timedelta(days=1)
    rows = []
    vals = {}
    eid = 0
    # values engineered so daily-sum/count often lands exactly on x.xxxx5
    for i in range(10):
        day_vals = [50.19125, 50.19135, 0.00005, 1.23455, 2.5 + i][: (i % 4) + 1]
        vals[i] = day_vals
        for v in day_vals:
            rows.append((eid, T0 + i * day, 1, "edge", float(v), "{}"))
            eid += 1
    _write(_events(spark, rows), d, "events")
    out = {
        r["day_ms"]: r for r in QUERIES["events_rolling_7d"](spark, d).collect()
    }
    ms0 = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    for i in range(10):
        window = [j for j in range(max(0, i - 6), i + 1)]
        # micro-unit exact: each value quantized to 6 dp first, like the engine
        sv6 = sum(round(Fraction(str(v)) * 10**6) for j in window for v in vals[j])
        n = sum(len(vals[j]) for j in window)
        exact = Fraction(sv6, 10**6) / n
        scaled = exact * 10**4
        want = (scaled.numerator * 2 + scaled.denominator) // (2 * scaled.denominator)
        got = out[ms0 + i * 86_400_000]
        assert got["n_7d"] == n
        assert got["avg_value_7d"] == want / 10**4, (i, got["avg_value_7d"], want)
