"""Engine entry point — the analog of the reference's cmd/main.go wiring
(config -> watcher -> debouncer -> sender, cmd/main.go:106-182).

Usage:
  python -m k8s_vectordb_sync_spark sync   --events-dir DIR [--once] [--target PATH]
  python -m k8s_vectordb_sync_spark resync --events-dir DIR --target PATH
  python -m k8s_vectordb_sync_spark bench-queries
  python -m k8s_vectordb_sync_spark run-query NAME [--sf-dir DIR] [--limit N]

`sync` starts the standing instance-sync query (plus the CRD/capabilities
query when CAPABILITIES_ENDPOINT is set, cmd/main.go:147-171); `--once`
processes all available input and exits (Trigger.AvailableNow). `resync`
runs the full-snapshot reconciliation batch (SURVEY §3.2). All knobs come
from the same environment variables the reference reads (config.go:44-57).
"""

from __future__ import annotations

import argparse
import json
import sys
import threading

from .config import EngineConfig
from .session import build_spark

# Serializes full-snapshot resync runs. The reference's TriggerResync is
# concurrency-safe because it only emits events into the (serialized) debounce
# pipeline; here a resync is a whole Spark write job, and cmd_serve exposes TWO
# triggers for it (the PeriodicResync ticker and POST /api/v1/resync) — two
# overlapping runs would both mode('overwrite') the same .resynced directory.
_RESYNC_LOCK = threading.Lock()


def cmd_sync(args: argparse.Namespace) -> int:
    from .sources.cdc import read_change_stream
    from .streaming.pipeline import start_instance_sync
    from .streaming.sink import CollectingSink, http_poster, parquet_upsert_sink

    config = EngineConfig.from_env()
    spark = build_spark(app_name="kvs-sync")
    stream = read_change_stream(spark, args.events_dir)
    if args.target:
        write_batch = parquet_upsert_sink(args.target)
        sink = None
    else:
        # INSTANCES_ENDPOINT set -> real HTTP POSTs (rest.go:82-123);
        # unset -> collect locally and print payloads on exit.
        post = http_poster(config.instances_endpoint) if config.instances_endpoint else None
        sink = CollectingSink(batch_max_size=config.batch_max_size, post=post)
        write_batch = sink.write_batch
    trigger = (
        {"availableNow": True}
        if args.once
        else {"processingTime": f"{config.batch_flush_interval_ms} milliseconds"}
    )
    query = start_instance_sync(
        stream, config, write_batch, checkpoint_dir=args.checkpoint, trigger=trigger
    )
    query.awaitTermination()
    if sink is not None:
        print(sink.to_json_lines())
    spark.stop()
    return 0


def _run_resync(spark, events_dir: str, target_path: str):
    """Shared full-snapshot reconciliation core (cmd_resync + the ops server's
    POST /api/v1/resync + the PeriodicResync ticker all call this — the
    Resyncer role, server.go:16-18). Guarded by _RESYNC_LOCK so overlapping
    triggers queue instead of racing the overwrite of the same output dir.
    """
    from .api import trigger_resync
    from .operators.debounce import last_state_wins
    from .sources.cdc import events_as_change_stream
    from .sources.tables import load_table

    from pyspark.sql import functions as F

    with _RESYNC_LOCK:
        ch = events_as_change_stream(load_table(spark, events_dir, "events"))
        # The snapshot is the set of LIVE entities: keys whose latest event is
        # a DELETE must not re-enter the target (resync heals drift, it must
        # not resurrect deletions). Resolve latest-per-key first, then drop
        # deletes.
        snapshot = (
            last_state_wins(ch, tiebreak_cols=["event_id"])
            .filter(F.col("op_type") != "DELETE")
            .select("id", "event_id", "value")
        )
        try:
            target = spark.read.parquet(target_path)
        except Exception:
            target = snapshot.limit(0)
        merged, result = trigger_resync(snapshot, target)
        merged.write.mode("overwrite").parquet(target_path + ".resynced")
        return result


def cmd_resync(args: argparse.Namespace) -> int:
    spark = build_spark(app_name="kvs-resync")
    result = _run_resync(spark, args.events_dir, args.target)
    print(json.dumps({"status": result.status, "resources": result.resources, "message": result.message}))
    spark.stop()
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """Run the operational HTTP API (POST /api/v1/resync) plus the periodic
    resync ticker — the analog of the reference's API server and 24 h resync
    loop wired in cmd/main.go alongside the controller (watcher.go:125)."""
    from .api_server import OpsServer
    from .scheduler import PeriodicResync

    config = EngineConfig.from_env()
    spark = build_spark(app_name="kvs-ops")
    do_resync = lambda: _run_resync(spark, args.events_dir, args.target).resources
    search = None
    if args.sign_index or args.bm25_index or args.ivfpq_index:
        from .api import make_search_handler

        search = make_search_handler(
            spark,
            ivfpq_path=args.ivfpq_index or None,
            sign_path=args.sign_index or None,
            bm25_path=args.bm25_index or None,
        )
    server = OpsServer(
        resync=do_resync,
        bind_address=args.bind or config.api_bind_address,
        search=search,
    )
    # RESYNC_INTERVAL_MIN <= 0 disables the ticker (manual/HTTP-only resync)
    ticker = (
        PeriodicResync(do_resync, config.resync_interval_min * 60).start()
        if config.resync_interval_min > 0
        else None
    )
    host, port = server.start()
    print(
        json.dumps(
            {
                "listening": f"{host}:{port}",
                "resync_interval_min": config.resync_interval_min,
            }
        ),
        flush=True,
    )
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        if ticker is not None:
            ticker.stop()
        server.stop()
        spark.stop()
    return 0


def cmd_bench_queries(args: argparse.Namespace) -> int:
    from .queries import ORACLES, QUERIES

    print(json.dumps({"queries": sorted(QUERIES), "with_oracle": sorted(ORACLES)}))
    return 0


def cmd_run_query(args: argparse.Namespace) -> int:
    """Run one registered query and print its rows as JSON lines — the ad
    hoc analyst surface over the same registry the driver/bench use."""
    from .queries import QUERIES

    if args.name not in QUERIES:
        print(json.dumps({"error": "unknown query", "name": args.name}))
        return 2
    spark = build_spark(app_name=f"kvs-query-{args.name}")
    try:
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.limit:
            df = df.limit(args.limit)
        for row in df.toJSON().toLocalIterator():
            print(row)
    finally:
        spark.stop()
    return 0


def cmd_build_index(args: argparse.Namespace) -> int:
    """Build a persistent ANN index over an embeddings parquet — the
    corpus-scale job of the build-once / probe-many lifecycle
    (operators/ann_index.py)."""
    from .operators import ann_index as ai
    from .sources.tables import load_table

    spark = build_spark(app_name="kvs-build-index")
    try:
        emb = load_table(spark, args.sf_dir, "embeddings")
        if args.kind == "ivfpq":
            meta = ai.build_ivf_pq_index(
                emb, args.path, n_clusters=args.clusters,
                sample_hex=args.train_sample or None,
            )
        elif args.kind == "kmeans":
            meta = ai.build_kmeans_index(
                emb, args.path, n_clusters=args.clusters,
                sample_hex=args.train_sample or None,
            )
        elif args.kind == "bm25":
            from .operators import lexical_index as lx

            docs = load_table(spark, args.sf_dir, "documents")
            meta = lx.build_bm25_index(docs, args.path)
        else:
            meta = ai.build_sign_index(emb, args.path)
        print(json.dumps({"built": args.kind, "path": args.path, "meta": meta}))
    finally:
        spark.stop()
    return 0


def cmd_rebuild_index(args: argparse.Namespace) -> int:
    """Zero-downtime retrain of a persisted index over the current corpus
    (VERDICT r7 item 4): builds into a fresh version dir while probes keep
    serving the old generation, then publishes with one atomic _CURRENT
    pointer flip and resets the staleness ledger. With --if-stale, only
    rebuilds when the ledger crosses the drift threshold (the
    ann_needs_rebuild / needs_rebuild consumer)."""
    from .operators import ann_index as ai
    from .sources.tables import load_table

    if args.if_stale:
        if args.kind == "bm25":
            from .operators.lexical_index import needs_rebuild

            stale = needs_rebuild(args.path)
        else:
            stale = ai.ann_needs_rebuild(args.path)
        if not stale:
            print(json.dumps({"rebuilt": False, "reason": "not stale"}))
            return 0
    spark = build_spark(app_name="kvs-rebuild-index")
    try:
        if args.kind == "bm25":
            from .operators import lexical_index as lx

            docs = load_table(spark, args.sf_dir, "documents")
            meta = lx.bm25_index_rebuild(docs, args.path)
        else:
            emb = load_table(spark, args.sf_dir, "embeddings")
            fn = {
                "ivfpq": ai.ivf_pq_index_rebuild,
                "kmeans": ai.kmeans_index_rebuild,
                "sign": ai.sign_index_rebuild,
            }[args.kind]
            meta = fn(emb, args.path)
        print(json.dumps({"rebuilt": True, "path": args.path, "meta": meta}))
    finally:
        spark.stop()
    return 0


def cmd_probe_index(args: argparse.Namespace) -> int:
    """Probe a persisted ANN index with query vectors taken from the same
    embeddings table (vec_id < --queries) — the latency-sensitive serving
    job; prints the top-k as JSON lines."""
    from pyspark.sql import functions as F

    from .operators import ann_index as ai
    from .sources.tables import load_table

    spark = build_spark(app_name="kvs-probe-index")
    try:
        emb = load_table(spark, args.sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < args.queries).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        if args.kind == "ivfpq":
            out = ai.ivf_pq_probe(spark, args.path, q, k=args.k, n_probe=args.n_probe)
        elif args.kind == "kmeans":
            # clustering consumers probe assignments, not top-k: emit the
            # cluster-occupancy audit from the stored centroids
            from .queries import _cluster_sizes_body

            out = _cluster_sizes_body(emb, ai.load_kmeans_centroids(args.path))
        elif args.kind == "bm25":
            from .operators import lexical_index as lx

            qterms = lx.derive_query_terms_from_index(
                spark, args.path, int(args.queries), 5
            )
            out = lx.bm25_index_probe(spark, args.path, qterms, k=args.k)
        else:
            out = ai.sign_index_probe(spark, args.path, q, k=args.k)
        for row in out.toJSON().toLocalIterator():
            print(row)
    finally:
        spark.stop()
    return 0


def cmd_forget(args: argparse.Namespace) -> int:
    """Run the key-forget sweep (plans/forget.py) against a bucketed target
    and print the compliance audit."""
    from .plans.forget import forget_keys

    from .plans.forget import read_layout_meta

    spark = build_spark(app_name="kvs-forget")
    try:
        layout = read_layout_meta(args.target)
        key_col = args.key_col or (layout["key_col"] if layout else "id")
        ids = [int(x) for x in args.keys.split(",") if x.strip()]
        keys = spark.createDataFrame([(i,) for i in ids], f"{key_col} long")
        audit = forget_keys(
            spark, args.target, keys, key_col=key_col,
            num_buckets=args.buckets,
        )
        print(json.dumps(audit))
    finally:
        spark.stop()
    return 0


def cmd_index_status(args: argparse.Namespace) -> int:
    """Print the staleness report (adds since build, drift ratio, rebuild
    verdict) for a persisted index — the ops answer to 'how stale is the
    serving index?'."""
    if args.kind == "bm25":
        from .operators.lexical_index import REBUILD_THRESHOLD, index_status

        thr = args.threshold if args.threshold is not None else REBUILD_THRESHOLD
        print(json.dumps(index_status(args.path, thr)))
    else:
        from .operators.ann_index import ANN_REBUILD_THRESHOLD, ann_index_status

        thr = args.threshold if args.threshold is not None else ANN_REBUILD_THRESHOLD
        print(json.dumps(ann_index_status(args.path, thr)))
    return 0


def cmd_train_bpe(args: argparse.Namespace) -> int:
    """Learn a BPE merge table over the documents corpus and print it as
    JSON — the tokenizer-(re)training job (operators/bpe.py)."""
    from .operators.bpe import learn_bpe_merges
    from .sources.tables import load_table

    spark = build_spark(app_name="kvs-train-bpe")
    try:
        docs = load_table(spark, args.sf_dir, "documents")
        merges = learn_bpe_merges(docs, n_merges=args.merges)
        print(json.dumps({"n_merges": len(merges), "merges": merges}))
    finally:
        spark.stop()
    return 0


def cmd_tune(args: argparse.Namespace) -> int:
    """Print the dedup-LSH banding sweep or the IVF nprobe/recall sweep as
    JSON lines — the tuning readouts an operator consults before fixing a
    banding or probe count on a production corpus (operators/dedup.py::
    lsh_band_sweep, operators/similarity.py::ivf_nprobe_sweep)."""
    from pyspark.sql import functions as F

    from .sources.tables import load_table

    spark = build_spark(app_name="kvs-tune")
    try:
        if args.what == "lsh-bands":
            from .operators.dedup import lsh_band_sweep

            docs = load_table(spark, args.sf_dir, "documents")
            rows = lsh_band_sweep(docs, threshold=args.threshold).collect()
        elif args.what == "semantic-cap":
            from .operators.similarity import (
                choose_semantic_cap,
                semantic_cap_sweep,
            )

            emb = load_table(spark, args.sf_dir, "embeddings")
            caps = tuple(int(c) for c in args.caps.split(","))
            # collect ONCE: choose_semantic_cap accepts the collected rows,
            # so the inline k-means training + assignment scan runs a single
            # time for both the printout and the sizing rule (ADVICE r9).
            sweep_rows = semantic_cap_sweep(
                emb, caps, n_clusters=args.clusters
            ).collect()
            for r in sweep_rows:
                print(json.dumps(r.asDict()))
            print(json.dumps({
                "chosen_cap": choose_semantic_cap(
                    sweep_rows, pairs_per_row_budget=args.pairs_budget
                ),
                "pairs_per_row_budget": args.pairs_budget,
            }))
            return 0
        else:  # ivf-nprobe
            from .operators.similarity import ivf_nprobe_sweep

            emb = load_table(spark, args.sf_dir, "embeddings")
            queries = emb.filter(F.col("vec_id") < args.n_queries).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            rows = ivf_nprobe_sweep(
                emb, queries, k=args.k, n_clusters=args.clusters
            ).collect()
        for r in rows:
            print(json.dumps(r.asDict()))
    finally:
        spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="k8s_vectordb_sync_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_sync = sub.add_parser("sync", help="run the standing instance-sync pipeline")
    p_sync.add_argument("--events-dir", required=True)
    p_sync.add_argument("--target", default="", help="parquet MERGE target (default: print payloads)")
    p_sync.add_argument("--checkpoint", default="/tmp/kvs-sync-ckpt")
    p_sync.add_argument("--once", action="store_true", help="Trigger.AvailableNow and exit")
    p_sync.set_defaults(fn=cmd_sync)

    p_res = sub.add_parser("resync", help="full-snapshot reconciliation batch")
    p_res.add_argument("--events-dir", required=True)
    p_res.add_argument("--target", required=True)
    p_res.set_defaults(fn=cmd_resync)

    p_srv = sub.add_parser("serve", help="operational HTTP API (POST /api/v1/resync)")
    p_srv.add_argument("--events-dir", required=True)
    p_srv.add_argument("--target", required=True)
    p_srv.add_argument("--bind", default="", help="host:port (default $API_BIND_ADDRESS, :8082)")
    p_srv.add_argument("--sign-index", default="", help="persisted sign index for /api/v1/search")
    p_srv.add_argument("--ivfpq-index", default="", help="persisted IVF-PQ index for /api/v1/search")
    p_srv.add_argument("--bm25-index", default="", help="persisted BM25 index for /api/v1/search")
    p_srv.set_defaults(fn=cmd_serve)

    p_bq = sub.add_parser("bench-queries", help="list registered queries")
    p_bq.set_defaults(fn=cmd_bench_queries)

    p_rq = sub.add_parser("run-query", help="run one registered query, JSON-lines output")
    p_rq.add_argument("name")
    p_rq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_rq.add_argument("--limit", type=int, default=0, help="cap printed rows (0 = all)")
    p_rq.set_defaults(fn=cmd_run_query)

    p_bi = sub.add_parser("build-index", help="build a persistent ANN index")
    p_bi.add_argument("kind", choices=["ivfpq", "sign", "kmeans", "bm25"])
    p_bi.add_argument("--path", required=True, help="index directory")
    p_bi.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_bi.add_argument("--clusters", type=int, default=8)
    p_bi.add_argument("--train-sample", default="", help="hash-sample hex threshold")
    p_bi.set_defaults(fn=cmd_build_index)

    p_ri = sub.add_parser(
        "rebuild-index",
        help="zero-downtime retrain + atomic version flip of a persisted index",
    )
    p_ri.add_argument("kind", choices=["ivfpq", "sign", "kmeans", "bm25"])
    p_ri.add_argument("--path", required=True)
    p_ri.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_ri.add_argument("--if-stale", action="store_true",
                      help="only rebuild when the staleness ledger crosses the drift threshold")
    p_ri.set_defaults(fn=cmd_rebuild_index)

    p_pi = sub.add_parser("probe-index", help="probe a persisted ANN index")
    p_pi.add_argument("kind", choices=["ivfpq", "sign", "kmeans", "bm25"])
    p_pi.add_argument("--path", required=True)
    p_pi.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_pi.add_argument("--queries", type=int, default=8, help="use vec_id < N as queries")
    p_pi.add_argument("--k", type=int, default=5)
    p_pi.add_argument("--n-probe", type=int, default=2)
    p_pi.set_defaults(fn=cmd_probe_index)

    p_tb = sub.add_parser("train-bpe", help="learn a BPE merge table over documents")
    p_tb.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_tb.add_argument("--merges", type=int, default=50)
    p_tb.set_defaults(fn=cmd_train_bpe)

    p_fg = sub.add_parser("forget", help="remove keys from a bucketed target (takedown sweep)")
    p_fg.add_argument("--target", required=True)
    p_fg.add_argument("--keys", required=True, help="comma-separated key list")
    p_fg.add_argument("--key-col", default=None,
                      help="default: the target's persisted _layout.json (else 'id')")
    p_fg.add_argument("--buckets", type=int, default=None,
                      help="default: the target's persisted _layout.json (else 64)")
    p_fg.set_defaults(fn=cmd_forget)

    p_is = sub.add_parser("index-status", help="staleness report for a persisted index")
    p_is.add_argument("kind", choices=["ivfpq", "sign", "kmeans", "bm25"])
    p_is.add_argument("--path", required=True)
    p_is.add_argument("--threshold", type=float, default=None,
                      help="adds/corpus drift ratio that flags a rebuild (default 0.10)")
    p_is.set_defaults(fn=cmd_index_status)

    p_tu = sub.add_parser(
        "tune",
        help="dedup-LSH banding / IVF nprobe / SemDeDup cap tuning sweeps",
    )
    p_tu.add_argument("what", choices=["lsh-bands", "ivf-nprobe", "semantic-cap"])
    p_tu.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_tu.add_argument("--threshold", type=float, default=0.5,
                      help="lsh-bands: signature-estimate Jaccard gate")
    p_tu.add_argument("--clusters", type=int, default=8)
    p_tu.add_argument("--n-queries", type=int, default=8)
    p_tu.add_argument("--k", type=int, default=5)
    p_tu.add_argument("--caps", default="10,35,70,140",
                      help="semantic-cap: comma-separated caps to sweep")
    p_tu.add_argument("--pairs-budget", type=float, default=8.0,
                      help="semantic-cap: linear pair-volume budget per corpus row")
    p_tu.set_defaults(fn=cmd_tune)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
