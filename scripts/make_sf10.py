"""Generate an sf10-scale dataset (10x sf1, ~60M lineitem rows) — the SECOND
scaling decade (VERDICT r7 item 2).

The sf0.1->sf1 exponents are fixed-overhead-dominated at these absolute
sizes (README "Reading:"); one more decade makes the per-row slopes visible.
sf10 is built deterministically from bench_data/sf1 (scripts/make_sf1.py)
with the same replica recipe: ten replicas unioned, every entity key shifted
by replica*OFFSET so referential integrity holds; dimensions stay fixed;
time columns are NOT shifted (10x density in the same window).

Replica dissimilarity — the property that keeps TRUE pair volume linear in
rows — needs a second mechanism per modality, because sf1's replicas already
consumed the first:

- text: sf1 prefixed tokens with ``r{i}``; sf10 prefixes with ``s{j}``.
  Every (j, i) pair yields a disjoint vocabulary (``s3r7token``), so
  cross-replica shingle/minhash similarity stays ~0 at both levels while
  within-replica duplicate structure is exactly sf0.1's.
- vectors: sf1 rotated circularly; only 64 distinct rotations exist, so
  rotating again could collide (rot_a(rot_b(v)) == rot_c(v)). sf10 instead
  multiplies by a per-replica deterministic +-1 DIAGONAL (sign pattern from
  md5(j, dim)): <D_j x, D_j y> == <x, y> exactly — every within-replica
  cosine/PQ/LSH structure is preserved bit-for-bit in magnitude — while
  cross-replica inner products decorrelate like a random sign flip. Signs
  are exact (*1.0 / *-1.0), so no float drift.

Output: bench_data/sf10 (gitignored, ~2 GB, reproducible by this script).

Usage: python scripts/make_sf10.py [replicas] (default 10)
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.path.join(REPO, "bench_data", "sf1")
DST = os.path.join(REPO, "bench_data", "sf10")
OFFSET = 1_000_000_000  # > every key in sf1 (sf1 max shift 9*10M + sf0.1 keys)
DIM = 64


def _sign_pattern(replica: int) -> list[float]:
    """Deterministic +-1 diagonal for replica j: bit b of md5("sf10:j:d")."""
    signs = []
    for d in range(DIM):
        h = hashlib.md5(f"sf10:{replica}:{d}".encode()).digest()
        signs.append(1.0 if h[0] & 1 else -1.0)
    return signs


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.session import build_spark

    if not os.path.isdir(SRC):
        raise SystemExit(f"{SRC} missing — run scripts/make_sf1.py first")
    spark = build_spark(app_name="make-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def load(name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))

    def replicate(name: str, shift: dict[str, bool], extra=None) -> None:
        base = load(name)
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
        print(f"{name}: {out.count()} rows", flush=True)

    for name in ("region", "nation"):
        load(name).write.mode("overwrite").parquet(
            os.path.join(DST, f"{name}.parquet")
        )
        print(f"{name}: copied", flush=True)

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
        toks = F.split(F.col("text"), r"\s+")
        toks = F.filter(toks, lambda t: t != F.lit(""))
        return df.withColumn(
            "text",
            F.array_join(
                F.transform(toks, lambda t: F.concat(F.lit(f"s{i}"), t)), " "
            ),
        )

    def flip_signs(df, i):
        if i == 0:
            return df
        signs = F.array(*[F.lit(s) for s in _sign_pattern(i)])
        return df.withColumn(
            "embedding",
            F.zip_with(F.col("embedding"), signs, lambda x, s: x * s).cast(
                "array<float>"
            ),
        )

    replicate("documents", {"doc_id": True}, extra=prefix_tokens)
    replicate("embeddings", {"vec_id": True}, extra=flip_signs)
    spark.stop()
    print(f"done -> {DST}", flush=True)


if __name__ == "__main__":
    main()
