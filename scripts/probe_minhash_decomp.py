"""Round-9 diagnosis probe: decompose dedup_minhash_clusters into its
stages at a given SF dir and print one JSON line per stage — the
measurement VERDICT r8 item 1 needs before picking a fix (is the
super-linear growth in pair MINING, pair VOLUME, or label PROPAGATION?).

Run isolated (fresh JVM, nothing else on the box):
    python scripts/probe_minhash_decomp.py bench_data/sf1
    python scripts/probe_minhash_decomp.py bench_data/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import functions as F  # noqa: E402

from k8s_vectordb_sync_spark.operators import dedup as dd  # noqa: E402
from k8s_vectordb_sync_spark.session import build_spark  # noqa: E402
from k8s_vectordb_sync_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "bench_data/sf1"
    spark = build_spark(app_name="probe-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    out = {"sf_dir": sf_dir, "n_docs": docs.count()}

    # stage 1: candidate generation (pre-verify) — bucket occupancy signal
    t0 = time.perf_counter()
    shingle_sets, sigs, candidates = dd._minhash_pipeline(
        docs, "text", "doc_id", 3, None, None
    )
    out["n_candidates"] = candidates.count()
    out["t_candidates_sec"] = round(time.perf_counter() - t0, 2)
    spark.catalog.clearCache()

    # stage 2: full verified pair mining (the registered pairs query)
    t0 = time.perf_counter()
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    out["n_pairs"] = pairs.count()
    out["t_pairs_sec"] = round(time.perf_counter() - t0, 2)
    spark.catalog.clearCache()

    # stage 3: pairs materialized to parquet, then clustering alone
    scratch = os.path.join(REPO, "bench_logs", ".probe_pairs")
    dd.minhash_lsh_pairs(docs, threshold=0.5).write.mode("overwrite").parquet(
        scratch
    )
    spark.catalog.clearCache()
    stored = spark.read.parquet(scratch)
    t0 = time.perf_counter()
    labels = dd.dup_clusters(stored)
    out["n_labeled"] = labels.count()
    out["t_clusters_only_sec"] = round(time.perf_counter() - t0, 2)
    spark.catalog.clearCache()

    # stage 4: the registered composition end-to-end (mining + clustering)
    t0 = time.perf_counter()
    out["n_clusters_rows"] = dd.dup_clusters(
        dd.minhash_lsh_pairs(docs, threshold=0.5)
    ).count()
    out["t_end_to_end_sec"] = round(time.perf_counter() - t0, 2)

    # occupancy telemetry: bucket-size distribution tail
    buckets = dd.minhash_band_buckets(
        dd.minhash_signature(docs)
    ).groupBy("band", "bucket").count()
    tail = (
        buckets.agg(
            F.max("count").alias("max_bucket"),
            F.expr("percentile_approx(count, 0.999)").alias("p999"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias(
                "sum_pair_expansion"
            ),
            F.count(F.lit(1)).alias("n_buckets"),
        ).collect()[0]
    )
    out.update({k: int(tail[k]) for k in tail.asDict()})
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
