#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a count() (no driver-side collect of results);
wall-clock includes plan + execution. A warmup pass primes the JVM/codegen
so the numbers measure steady-state throughput, the regime that matters at
100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from k8s_vectordb_sync_spark.queries import QUERIES  # noqa: E402
from k8s_vectordb_sync_spark.session import build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship CDC pipeline + join/agg-heavy relational queries
# + the scale-critical extension operators.
BENCH_QUERIES = [
    "pipeline_sync_resolved",
    "cdc_last_state_wins",
    "cdc_debounce_sessions",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_revenue_forecast",
    "tpch_q10_returned_items",
    "events_sessionization",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_topk_bruteforce",
    "text_quality",
]


def main() -> None:
    spark = build_spark(app_name="kvs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: prime codegen + file listing with the cheapest query
    QUERIES["tpch_q6_revenue_forecast"](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
