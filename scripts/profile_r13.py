#!/usr/bin/env python
"""Round-13 optimization profiler: per-query timing + formatted-plan capture.

Usage:
  python scripts/profile_r13.py <query> [<query> ...] [--plans-out DIR --tag before]
  python scripts/profile_r13.py --top            # the round-13 heavy set

Methodology mirrors bench.py exactly (same session builder, same .count()
action, best-of-2, clearCache between queries) so numbers here are directly
comparable to the driver bench. Additionally records run1 (cold: includes
cache population) vs run2 (warm) — the split between "builds the cached
frames" and "consumes them" — and writes `.explain("formatted")` per query
when --plans-out is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from k8s_vectordb_sync_spark.queries import QUERIES  # noqa: E402
from k8s_vectordb_sync_spark.session import build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TOP = [
    "dedup_simhash_clusters",
    "documents_source_overlap",
    "ann_ivf_pq_topk",
    "dedup_substring_doc_rate",
    "dedup_substring_spans",
    "embeddings_pq_recon_error",
    "documents_contamination",
    "documents_duplicate_spans",
    "ann_recall_nprobe_sweep",
    "documents_despan_clean",
    "dedup_minhash_clusters",
    "dedup_cluster_pareto",
    "hybrid_search_rrf_indexed",
    "embeddings_cluster_sizes",
    "hybrid_search_rrf",
    "pipeline_training_mix",
    "ann_pq_adc_topk",
    "embeddings_kmeans_inertia",
    "dedup_family_agreement",
    "orders_priority_revenue_salted",
    "documents_tfidf_neardup_topk",
    "documents_budget_alloc",
    "documents_budget_sample",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--top", action="store_true")
    ap.add_argument("--plans-out", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        names = TOP + [n for n in names if n not in TOP]
    if not names:
        ap.error("no queries given")

    spark = build_spark(app_name="kvs-profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["tpch_q6_revenue_forecast"](spark, SF_DIR).count()  # warmup

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).count()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": runs, "best": min(runs)}
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            # plan captured AFTER the runs: cached frames are pinned, so this
            # is the plan the warm (best-of-2 winning) run actually executed
            df = QUERIES[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_out, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(txt)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"total_best": round(sum(v["best"] for v in out.values()), 3),
                      "sf_dir": SF_DIR, "detail": out}))
    spark.stop()


if __name__ == "__main__":
    main()
