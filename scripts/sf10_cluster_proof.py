#!/usr/bin/env python
"""sf10 re-proof of the dup_clusters family after the round-14 frontier loop
(VERDICT r13 item 4: the r13 exclusion list's rationale predated the loop
changes).

Runs the two real cluster graphs at sf10 (simhash pairs, minhash-LSH pairs)
through operators.dedup.dup_clusters with the Spark event log on, then:

1. label-invariant proof (rigorous for min-label CC, given the loop's
   in-component monotonicity which is unit/oracle-proven at sf0.001-0.1):
     (a) every edge's endpoints share a label  (labels constant/component)
     (b) label(v) <= v                          (monotone from identity)
     (c) every label value L is itself a node with label(L) = L
   (a)+(b)+(c) + in-component labels => label(v) == min(component(v)).
2. per-round shuffle evidence from the event log: for each loop round the
   shuffle bytes written, demonstrating rounds move frontier-sized frames
   (the round-14 claim), not corpus-sized ones.

Writes a human log to stdout (tee into bench_logs/).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "bench_data", "sf10")
EVDIR = "/tmp/evlog_sf10"


def build_spark_with_eventlog():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR)
    return (
        SparkSession.builder.appName("sf10-cluster-proof")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.minPartitionNum", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )


def check_invariants(labels, edges) -> None:
    lab = labels.persist()
    n = lab.count()
    # (b) monotone
    bad_b = lab.filter(F.col("cluster_id") > F.col("doc_id")).count()
    # (c) roots self-labeled
    roots = lab.select(F.col("cluster_id").alias("doc_id")).distinct()
    bad_c = (
        roots.join(lab, "doc_id", "left")
        .filter(F.col("cluster_id").isNull() | (F.col("cluster_id") != F.col("doc_id")))
        .count()
    )
    # (a) edges agree
    la = lab.select(F.col("doc_id").alias("src"), F.col("cluster_id").alias("cs"))
    lb = lab.select(F.col("doc_id").alias("dst"), F.col("cluster_id").alias("cd"))
    bad_a = (
        edges.join(la, "src").join(lb, "dst").filter(F.col("cs") != F.col("cd")).count()
    )
    print(f"   invariants: nodes={n} bad_monotone={bad_b} bad_roots={bad_c} bad_edges={bad_a}")
    assert bad_a == 0 and bad_b == 0 and bad_c == 0
    lab.unpersist()


def main() -> None:
    spark = build_spark_with_eventlog()
    spark.sparkContext.setLogLevel("ERROR")
    from k8s_vectordb_sync_spark.operators import dedup as dd
    from k8s_vectordb_sync_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    print(f"corpus: {docs.count()} documents ({SF_DIR})")

    graphs = {
        "minhash_lsh": lambda: dd.minhash_lsh_pairs(docs, threshold=0.5).select(
            "doc_a", "doc_b"
        ),
        "simhash": lambda: dd.simhash_pairs(docs, max_hamming=3).select(
            "doc_a", "doc_b"
        ),
    }
    for gname, mk in graphs.items():
        pairs = mk().persist()
        t0 = time.perf_counter()
        npairs = pairs.count()
        t_mine = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"LOOP:{gname}")
        t0 = time.perf_counter()
        labels = dd.dup_clusters(pairs)
        t_loop = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"== {gname}: {npairs} pairs; mining {t_mine:.1f}s, loop {t_loop:.1f}s")
        edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        check_invariants(labels, edges)
        pairs.unpersist()
    spark.stop()

    # per-round shuffle evidence from the event log
    jobs, stages = {}, {}
    paths = [p for p in glob.glob(f"{EVDIR}/**", recursive=True) if os.path.isfile(p) and "appstatus" not in p]
    for path in paths:
        for line in open(path, errors="ignore"):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = (
                    e.get("Properties", {}).get("spark.job.description", ""),
                    [s["Stage ID"] for s in e.get("Stage Infos", [])],
                )
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                acc = {a["Name"]: a.get("Value") for a in si.get("Accumulables", [])}
                stages[si["Stage ID"]] = dict(
                    dur=(si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0,
                    tasks=si.get("Number of Tasks"),
                    sw=int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0),
                )
    print("\nper-loop-job shuffle bytes written (frontier evidence):")
    for jid in sorted(jobs):
        desc, sids = jobs[jid]
        if not desc.startswith("LOOP:"):
            continue
        done = [s for s in sids if s in stages]
        sw = sum(stages[s]["sw"] for s in done)
        dur = sum(stages[s]["dur"] for s in done)
        print(f"  {desc} job {jid}: stages={len(done)} stage-time={dur:6.2f}s shuffle-written={sw/1024/1024:8.2f} MB")


if __name__ == "__main__":
    main()
