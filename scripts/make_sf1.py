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

Text and vectors are made MUTUALLY DISSIMILAR across replicas — every
token carries a per-replica prefix (disjoint vocabularies, so
cross-replica shingle/minhash similarity is ~0) and vectors are
circularly rotated by a per-replica shift (near-orthogonal to their
siblings) — so each replica preserves sf0.1's internal duplicate/neighbor
structure and the TRUE pair volume scales linearly with rows. Leaving
replicas near-identical (a naive copy, or a single prefix token) would
multiply every duplicate group 10x and the pair volume 100x, measuring a
corpus artifact rather than engine scaling.

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
    def prefix_tokens(df, i):
        if i == 0:
            return df
        # disjoint per-replica vocabulary: cross-replica similarity ~ 0,
        # within-replica structure identical to sf0.1
        toks = F.split(F.col("text"), r"\s+")
        toks = F.filter(toks, lambda t: t != F.lit(""))
        return df.withColumn(
            "text",
            F.array_join(
                F.transform(toks, lambda t: F.concat(F.lit(f"r{i}"), t)), " "
            ),
        )

    def rotate_vec(df, i):
        if i == 0:
            return df
        shift = (i * 7) % 64
        # circular rotation: same norm/neighbor structure within a replica,
        # near-orthogonal to other replicas' copies of the same vector
        return df.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", shift + 1, 64 - shift),
                F.slice("embedding", 1, shift),
            ).cast("array<float>"),
        )

    replicate("documents", {"doc_id": True}, extra=prefix_tokens)
    replicate("embeddings", {"vec_id": True}, extra=rotate_vec)
    spark.stop()
    print(f"done -> {DST}")


if __name__ == "__main__":
    main()
