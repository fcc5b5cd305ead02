"""Generate an sf1-scale dataset (10x sf0.1, ~6M lineitem rows) for the
scaling-evidence bench (VERDICT r6 item 2).

The driver ships sf{0.001,0.01,0.1}; scaling exponents need one more decade.
sf1 is built deterministically from sf0.1: ten replicas unioned, with every
entity key shifted by replica*OFFSET so referential integrity holds
(orders.o_custkey still joins customer, lineitem.l_orderkey still joins
orders, ...). Dimension tables (region, nation) stay fixed — exactly how
TPC-H itself scales. Time columns are NOT shifted: 10x the data in the same
window models higher traffic density, which is the regime the windowed /
sessionized queries need to be stressed in.

Text and vectors are perturbed per replica (a "rep<i>" prefix token /
a small first-dim epsilon) so dedup and ANN queries face 10x the corpus,
not 10 identical copies of it — identical copies would make every document
a 10-way exact duplicate and turn dup-pair mining into a different
(quadratically easier-to-miscount) problem than a real 10x corpus.

Output: bench_logs stays in git; the generated parquet goes to
bench_data/sf1 (gitignored — ~200 MB, reproducible by this script).

Usage: python scripts/make_sf1.py [replicas] (default 10)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, "bench_data", "sf1")
OFFSET = 10_000_000  # > every key in sf0.1


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.session import build_spark
    from k8s_vectordb_sync_spark.sources.tables import load_table

    spark = build_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def replicate(name: str, shift: dict[str, bool], extra=None) -> None:
        """Union `replicas` copies of the table, adding i*OFFSET to every
        key column in `shift`; `extra(df, i)` applies per-replica content
        perturbation."""
        base = load_table(spark, SRC, name)
        parts: list[DataFrame] = []
        for i in range(replicas):
            df = base
            for col in shift:
                df = df.withColumn(col, F.col(col) + F.lit(i * OFFSET))
            if extra is not None:
                df = extra(df, i)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))
        print(f"{name}: {out.count()} rows")

    # dimensions: fixed (copied once)
    for name in ("region", "nation"):
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(DST, f"{name}.parquet")
        )
        print(f"{name}: copied")

    replicate("customer", {"c_custkey": True})
    replicate("supplier", {"s_suppkey": True})
    replicate("part", {"p_partkey": True})
    replicate("orders", {"o_orderkey": True, "o_custkey": True})
    replicate(
        "lineitem", {"l_orderkey": True, "l_partkey": True, "l_suppkey": True}
    )
    replicate("events", {"event_id": True, "user_id": True})
    replicate(
        "documents",
        {"doc_id": True},
        extra=lambda df, i: df.withColumn(
            "text",
            F.when(F.lit(i) == 0, F.col("text")).otherwise(
                F.concat(F.lit(f"rep{i} "), F.col("text"))
            ),
        ),
    )
    replicate(
        "embeddings",
        {"vec_id": True},
        extra=lambda df, i: df.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, j: F.when(j == 0, x + F.lit(i * 1e-3)).otherwise(x),
            ).cast("array<float>"),
        ),
    )
    spark.stop()
    print(f"done -> {DST}")


if __name__ == "__main__":
    main()
