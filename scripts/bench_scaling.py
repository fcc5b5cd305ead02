"""Scaling-decade evidence (VERDICT r6 item 2; r7 item 2 adds sf1->sf10).

Runs bench.py's top cost classes as an idle best-of-3 triple at two scale
factors a decade apart, then prints the per-query scaling exponent
alpha = log10(t_hi / t_lo) — alpha ~= 1.0 is linear-in-rows, < 1 is
fixed-cost-dominated, > 1 is super-linear and needs a look.

Usage: python scripts/bench_scaling.py [out_prefix] [lo_label=lo_dir hi_label=hi_dir] [--queries a,b,c]
Defaults to the first decade (sf0.1 testdata -> generated bench_data/sf1).
Writes bench_logs/<prefix>_<label>_run{1..3}.json + <prefix>_summary.json.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the top-20ish cost classes from BENCH_r06 + the round-6 audit: the
# substring family, simhash/minhash pair mining, the semantic/index tiers,
# heavy TPC-H joins, sessionization, and the full streaming pipeline
SUBSET = [
    "dedup_substring_spans",
    "dedup_substring_doc_rate",
    "documents_despan_clean",
    "documents_duplicate_spans",
    "documents_source_overlap",
    "dedup_simhash_clusters",
    "dedup_simhash_pairs",
    "dedup_minhash_lsh",
    "dedup_minhash_clusters",
    "dedup_minhash_sig_pairs",
    "dedup_exact",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_topk_indexed",
    "ann_ivf_pq_topk_autosized",  # r9: the self-sizing serving form
    "documents_bm25_topk_indexed",
    "hybrid_search_rrf_indexed",
    "dedup_semantic_indexed_diagnostic",
    "dedup_semantic_capped",
    "dedup_semantic_indexed_capped",  # r8: the scale-safe serving form
    "embeddings_kmeans_inertia_indexed",
    "tpch_q1_pricing_summary",
    "tpch_q9_profit",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "events_sessionization",
    "events_asof_attribution",
    "streaming_sync",
    # round-7b additions: tuning sweeps, monitoring, leakage, PCA, sketches
    "dedup_lsh_band_sweep",
    "ann_recall_nprobe_sweep",
    "dedup_family_agreement",
    "dedup_cluster_pareto",
    "embeddings_top_component",
    "documents_split_leakage",
    "events_hll_intersection",
]

RUNS = 3


def run_bench(sf_dir: str, out_path: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_QUERIES"] = ",".join(SUBSET)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=7200,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py produced no JSON (rc={out.returncode}); stderr tail:\n"
            + "\n".join(out.stderr.splitlines()[-30:])
        )
    rec = json.loads(lines[0])  # full per-query record
    with open(out_path, "w") as fh:
        json.dump(rec, fh)
    return rec


def main() -> None:
    global SUBSET
    args = list(sys.argv[1:])
    if "--queries" in args:
        i = args.index("--queries")
        SUBSET = [q for q in args[i + 1].split(",") if q]
        del args[i : i + 2]
    prefix = args[0] if args else "bench_scaling_r7"
    pairs = [a.split("=", 1) for a in args[1:]] or [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(REPO, "bench_data", "sf1")),
    ]
    assert len(pairs) == 2, "need exactly lo_label=dir hi_label=dir"
    (lo, _), (hi, _) = pairs
    logs = os.path.join(REPO, "bench_logs")
    os.makedirs(logs, exist_ok=True)
    best: dict[str, dict[str, float]] = {}
    for label, sf_dir in pairs:
        for i in range(1, RUNS + 1):
            out_path = os.path.join(logs, f"{prefix}_{label}_run{i}.json")
            rec = run_bench(sf_dir, out_path)
            for q, t in rec["queries"].items():
                cur = best.setdefault(q, {})
                cur[label] = min(cur.get(label, float("inf")), t)
            print(f"{label} run {i}: total {rec['value']}s", flush=True)
    summary = {}
    for q, t in sorted(best.items()):
        alpha = math.log10(t[hi] / t[lo]) if t[lo] > 0 else None
        summary[q] = {
            f"{lo}_best_sec": t[lo],
            f"{hi}_best_sec": t[hi],
            "exponent": round(alpha, 3) if alpha is not None else None,
        }
        print(f"{q:40s} {t[lo]:8.2f} {t[hi]:8.2f}  alpha={summary[q]['exponent']}")
    with open(os.path.join(logs, f"{prefix}_summary.json"), "w") as fh:
        json.dump({"runs": RUNS, "decade": [lo, hi], "queries": summary}, fh, indent=1)


if __name__ == "__main__":
    main()
