"""The broadcast-boundary quintile rework (round 6): plan-shape regression
tests pinning 'no global window' for the reworked queries, plus semantics
tests for the boundary bucket assignment (ties land in ONE bucket — the
documented divergence from ntile's equal split)."""

from __future__ import annotations

import datetime
import os

from k8s_vectordb_sync_spark.queries import QUERIES

T0 = datetime.datetime(2024, 3, 1)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rfm_and_pareto_plans_have_no_window(spark, sf_dir):
    """The r5 'weak': global ntile single-partitioned the O(#customers)
    frame. The boundary form must compile with ZERO window operators."""
    for name in ("customer_rfm_segments", "orders_pareto_share"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "Window" not in plan, f"{name} reintroduced a window:\n{plan[:2000]}"
        assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan, name


def test_rolling_7d_window_is_partitioned(spark, sf_dir):
    """events_rolling_7d keeps its window but PARTITIONED per type (never a
    global sort)."""
    plan = _plan(QUERIES["events_rolling_7d"](spark, sf_dir))
    assert "Window" in plan
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "event_type" in m.group(1), plan[:2000]


def test_pareto_boundary_ties_land_in_one_bucket(spark, tmp_path):
    """10 customers, all with IDENTICAL revenue: boundary semantics put all
    of them in quintile 1 (>= every cut), where ntile would have split them
    2-2-2-2-2. This pins the documented tie rule."""
    rows = [(i, i, "O", 100.0, T0, "1-URGENT") for i in range(10)]
    d = str(tmp_path)
    _orders(spark, rows).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    out = QUERIES["orders_pareto_share"](spark, d).collect()
    assert len(out) == 1
    (r,) = out
    assert r["quintile"] == 1 and r["n_customers"] == 10
    assert r["share"] == 1.0


def test_rfm_scores_monotone_and_bounded(spark, tmp_path):
    """Distinct metric values: scores span 1..5, and a strictly larger
    monetary total never gets a numerically larger (=worse) m_score."""
    rows = []
    for cust in range(20):
        # one order per customer, strictly increasing price, staggered dates
        rows.append(
            (cust, cust, "O", 100.0 + 10 * cust, T0 + datetime.timedelta(days=cust), "1-URGENT")
        )
    d = str(tmp_path)
    _orders(spark, rows).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    out = sorted(
        (r["monetary"], r["m_score"], r["r_score"], r["custkey"])
        for r in QUERIES["customer_rfm_segments"](spark, d).collect()
    )
    assert len(out) == 20
    scores = [s for _, s, _, _ in out]
    assert set(scores) == {1, 2, 3, 4, 5}
    # monetary ascending -> m_score non-increasing (1 = best = richest)
    assert scores == sorted(scores, reverse=True)
    # 20 distinct values over 4 interior cuts: exactly 4 per bucket
    assert [scores.count(s) for s in (5, 4, 3, 2, 1)] == [4, 4, 4, 4, 4]
