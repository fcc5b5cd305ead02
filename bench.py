#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
JSON record {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} followed by a compact one-line summary
(same keys; "queries" holds "total" plus every per-query time keyed by the
frozen short names in bench_short_names.json) — the driver records only the
last ~2000 chars of stdout, so the final line must fit whole; full names
alone are ~3.4 KB and cannot.

Each query is forced with a count() (no driver-side collect of results) and
timed as the best of two runs — the second run measures steady-state
throughput (warm code cache, warm file listing), which is the regime that
matters on a long-lived cluster; the jitter of a cold first run on a 32-way
local JVM is noise, not signal. `streaming_sync` drives the full Structured
Streaming pipeline (file source -> watermark -> dedup -> foreachBatch
resolution) end-to-end with a fresh checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python workers unpickle package functions (applyInPandas paths): they need
# the repo on *their* sys.path too, even when bench.py runs from another cwd.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from k8s_vectordb_sync_spark.queries import QUERIES  # noqa: E402
from k8s_vectordb_sync_spark.session import build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "pipeline_sync_resolved",
    "cdc_last_state_wins",
    "cdc_debounce_sessions",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_revenue_forecast",
    "tpch_q10_returned_items",
    "tpch_q9_profit",
    "tpch_q18_large_orders",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
    "dedup_minhash_clusters",
    "events_sessionization",
    "events_asof_attribution",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "ann_topk_bruteforce",
    "ann_lsh_topk",
    "text_quality",
    "text_langid",
    "events_funnel",
    "documents_topk_terms",
    "multimodal_decode",
    "cdc_scd2_history",
    "embeddings_quantize_int8",
    "documents_sample_stratified",
    "text_pii_scrub",
    "documents_vocab",
    "documents_bigram_counts",
    "pipeline_corpus_clean",
    "pipeline_training_mix",
    "events_value_percentiles",
    "documents_mixture_weights",
    "events_winsorized",
    "embeddings_project_rp",
    "text_normalize",
    "events_retention_cohorts",
    "documents_sample_fixed_n",
    "documents_contamination",
    "documents_chunked",
    "embeddings_pq_codes",
    "documents_quality_rules",
    "documents_lm_logprob",
    "documents_dsir_weights",
    "documents_oov_rate",
    "multimodal_segments",
    "events_sliding_windows",
    "events_value_deciles",
    "events_value_histogram",
    "dedup_minhash_estimate",
    "documents_bigram_logprob",
    "embeddings_matryoshka",
    "dedup_incremental",
    "documents_global_topk_quality",
    "documents_token_entropy",
    "events_anomaly_mad",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_topk_indexed",
    "ann_ivf_pq_topk_autosized",
    "cdc_key_churn",
    "documents_duplicate_spans",
    "ann_pq_adc_topk",
    "dedup_rate_by_source",
    "dedup_minhash_sig_pairs",
    "dedup_simhash_clusters",
    "documents_despan_clean",
    "embeddings_standardize",
    "events_session_windows",
    "cdc_last_state_wins_salted",
    "embeddings_cluster_sizes",
    "documents_bm25_topk",
    "documents_inverted_index",
    "hybrid_search_rrf",
    "dedup_substring_spans",
    "dedup_substring_doc_rate",
    "events_hll_distinct",
    "text_countmin_heavyhitters",
    "lineitem_bloom_prejoin",
    "text_bpe_pair_counts",
    "dedup_graph_pagerank",
    "documents_train_split",
    "documents_weighted_sample",
    "events_pivot_hourly",
    "events_cumulative_new_users",
    "events_zorder_key",
    "events_quantile_sketch",
    "events_hll_union",
    "dedup_graph_triangles",
    "events_key_skew_audit",
    "dedup_containment_pairs",
    "documents_term_pmi",
    "ann_hamming_topk",
    "ann_hamming_rerank",
    "ann_hamming_topk_indexed",
    "ann_recall_hamming",
    "documents_domain_cap",
    "documents_quality_percentile",
    "documents_ngram_novelty",
    "events_ewma",
    "documents_minhash_contamination",
    "dedup_incremental_bloom",
    "events_out_of_order_audit",
    "documents_tokenizer_fertility",
    "embeddings_norm_audit",
    "events_session_paths",
    "events_markov_transitions",
    "lineitem_rollup_incremental",
    "dedup_edit_distance_pairs",
    "documents_ccnet_buckets",
    "pipeline_funnel_report",
    "embeddings_kmeans_inertia",
    "documents_zipf_fit",
    "customer_rfm_segments",
    "events_autocorr_lag1",
    "documents_source_jsd",
    "orders_pareto_share",
    "orders_brand_affinity",
    "events_hourly_gap_fill",
    "events_cusum_changepoint",
    "events_ab_test",
    "events_daily_trend_ols",
    "dedup_semantic_indexed_capped",
    "dedup_semantic_delta_coldstart",
    "embeddings_cluster_sizes_indexed",
    "embeddings_kmeans_inertia_indexed",
    "events_rolling_7d",
    "events_dow_seasonality",
    "events_type_value_iqr",
    "documents_bm25_topk_indexed",
    "hybrid_search_rrf_indexed",
    "ann_recall_ivfpq",
    "documents_token_budget_mix",
    "orders_priority_revenue_salted",
    "events_burst_hours",
    "documents_source_overlap",
    "embeddings_dim_stats",
    "events_welch_ttest",
    "events_hourly_entropy",
    "orders_ship_latency_percentiles",
    "dedup_lsh_band_sweep",
    "documents_split_leakage",
    "events_hll_intersection",
    "ann_recall_nprobe_sweep",
    "dedup_family_agreement",
    "dedup_cluster_pareto",
    "embeddings_top_component",
    "documents_quality_by_split",
    "embeddings_pq_recon_error",
    # round 13: budget sampler + TF-IDF near-dup ranking
    "documents_budget_alloc",
    "documents_budget_sample",
    "documents_tfidf_neardup_topk",
]

# Best-of-N within one invocation; the sf10 scale probes drop to 1 via env
# (a single pass at 60M rows is signal enough, and 2x the wall time is not)
RUNS_PER_QUERY = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

# Optional subset (comma-separated query names) for scale-probe runs, e.g.
# the sf1 scaling evidence in bench_logs/: only the named queries execute
# ("streaming_sync" may be included by name).
_SUBSET = [q for q in os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",") if q]
if _SUBSET:
    BENCH_QUERIES = [q for q in _SUBSET if q != "streaming_sync"]

# Structural guard: diagnostic-only registry entries (quadratic reference
# forms kept for oracle-parity recall checks) never enter a timing set —
# even via the env-var subset path.
from k8s_vectordb_sync_spark.queries import DIAGNOSTIC_QUERIES  # noqa: E402

_diag_hits = sorted(set(BENCH_QUERIES) & DIAGNOSTIC_QUERIES)
if _diag_hits:
    raise SystemExit(
        f"refusing to bench diagnostic-only queries: {_diag_hits} "
        "(see queries.DIAGNOSTIC_QUERIES)"
    )


def time_streaming_sync(spark) -> float:
    """Full streaming pipeline end-to-end over the sf events (availableNow)."""
    from k8s_vectordb_sync_spark.config import EngineConfig
    from k8s_vectordb_sync_spark.sources.cdc import read_change_stream
    from k8s_vectordb_sync_spark.streaming.pipeline import start_instance_sync

    ckpt = tempfile.mkdtemp(prefix="kvs-bench-ckpt-")
    counts = []
    # The streaming file source requires a directory; the sf dir ships
    # events.parquet as a single file. Stage it as <tmp>/events.parquet/part.
    staged = tempfile.mkdtemp(prefix="kvs-bench-src-")
    os.makedirs(f"{staged}/events.parquet")
    src_tbl = os.path.join(SF_DIR, "events.parquet")
    if os.path.isdir(src_tbl):  # Spark-written table (e.g. the sf1 scale probe)
        import glob

        for i, f in enumerate(sorted(glob.glob(os.path.join(src_tbl, "*.parquet")))):
            shutil.copy(f, f"{staged}/events.parquet/part-{i:05d}.parquet")
    else:
        shutil.copy(src_tbl, f"{staged}/events.parquet/part-00000.parquet")
    try:
        stream = read_change_stream(spark, staged)
        t0 = time.perf_counter()
        q = start_instance_sync(
            stream,
            EngineConfig(),
            lambda df, bid: counts.append(df.count()),
            checkpoint_dir=ckpt,
            trigger={"availableNow": True},
        )
        budget = int(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT_S", "600"))
        finished = q.awaitTermination(budget)
        if not finished:
            q.stop()
            raise RuntimeError(
                f"streaming_sync did not finish within {budget}s — refusing "
                "to report a truncated timing (raise "
                "SPARK_GRAFT_STREAM_TIMEOUT_S for bigger corpora)"
            )
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)


def main() -> None:
    spark = build_spark(app_name="kvs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    QUERIES["tpch_q6_revenue_forecast"](spark, SF_DIR).count()  # warmup

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(RUNS_PER_QUERY):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # the dedup operators persist() shared frames (callers own the cache
        # lifecycle); drop them between queries so one query's cache doesn't
        # bleed memory pressure into the next query's timing
        spark.catalog.clearCache()

    if not _SUBSET or "streaming_sync" in _SUBSET:
        timings["streaming_sync"] = time_streaming_sync(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Full record first (complete per-query map with FULL names for humans /
    # bench_logs), then a compact summary as the FINAL line: the driver
    # records only the last ~2000 chars of stdout and parses the final JSON
    # line out of that tail, so the ~5 KB full-name map line gets its head
    # truncated there (BENCH_r04/r05 "parsed": null) — the last line must fit
    # whole. Full names alone weigh ~3.4 KB, so the final line keys each
    # query by the frozen short name from bench_short_names.json (generated
    # by scripts/gen_bench_short_names.py; "total" is unchanged and the
    # full-name line above keeps the authoritative record). This restores
    # the driver's per-query regression/scaling visibility lost since r05.
    print(json.dumps(out))
    print(json.dumps(_compact_record(out, timings), separators=(",", ":")))
    spark.stop()


# The driver's stdout tail is 2000 chars; the final line plus its newline
# must fit inside it whole.
_TAIL_BUDGET = 1990


def _short_names() -> dict[str, str]:
    path = os.path.join(_REPO, "bench_short_names.json")
    frozen: dict[str, str] = {}
    if os.path.exists(path):
        with open(path) as f:
            frozen = json.load(f)
    # widen genuinely new names against the frozen set (same rule as the
    # generator) so an unfrozen addition still gets a stable, unique key
    taken = set(frozen.values()) | {"total", "rest"}
    for name in BENCH_QUERIES + ["streaming_sync"]:
        if name in frozen:
            continue
        for k in range(1, 13):
            s = "".join(w[:k] for w in name.split("_"))
            if s not in taken:
                frozen[name] = s
                taken.add(s)
                break
        else:
            frozen[name] = name
    return frozen


def _compact_record(out: dict, timings: dict[str, float]) -> dict:
    short = _short_names()
    for digits in (3, 2, 1):
        qmap = {short.get(n, n): round(t, digits) for n, t in timings.items()}
        qmap["total"] = out["value"]
        compact = {
            "metric": out["metric"],
            "value": out["value"],
            "unit": "sec",
            "sf": out["sf"],
            "n_queries": len(timings),
            "queries": qmap,
        }
        if len(json.dumps(compact, separators=(",", ":"))) <= _TAIL_BUDGET:
            return compact
    # pathological fallback (should never trigger at current sizes): fold the
    # fastest queries into one "rest" bucket until the line fits
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    while len(ranked) > 1:
        ranked.pop()
        qmap = {short.get(n, n): round(t, 1) for n, t in ranked}
        qmap["rest"] = round(out["value"] - sum(t for _, t in ranked), 1)
        qmap["total"] = out["value"]
        compact["queries"] = qmap
        if len(json.dumps(compact, separators=(",", ":"))) <= _TAIL_BUDGET:
            break
    return compact


if __name__ == "__main__":
    main()
