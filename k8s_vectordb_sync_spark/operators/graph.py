"""Iterative graph analytics over similarity-pair graphs.

dedup.dup_clusters already computes connected components (min-label
propagation with pointer jumping); this module adds WEIGHTED iteration —
PageRank (Brin & Page, WWW'98) over the near-duplicate graph. The use in a
training-data pipeline: inside a duplicate cluster, centrality picks the
canonical copy (the version most other copies point at), a better survivor
policy than min-id when near-dups form hub-and-spoke shapes (boilerplate
template + variations).

Scale shape: each iteration is one equi-join (edges x current ranks, both
partitioned by the join key — a 1000-executor shuffle on src) and one
map-side-combined aggregation on dst. Degree and node frames are computed
once; the node count is a 1-row broadcast. Iterations are a fixed unroll
(the oracle replays them as CTEs), so lineage stays shallow — no
checkpointing needed at this depth.

Cross-engine determinism (same discipline as BM25/lm.py): per-edge
contributions pr/deg are rounded to 9 decimals and summed as DECIMAL(28,9)
— exact and order-independent — then the damping update runs in double with
literals generated from the SAME Python floats the oracle embeds
(1 - 0.85 != 0.15 in IEEE double; both engines must use the identical
constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

PAGERANK_ITERATIONS = 3
PAGERANK_DAMPING = 0.85


def pagerank(
    pairs: DataFrame,
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """PageRank over the undirected graph induced by a (doc_a, doc_b) pair
    frame. Returns (doc_id, degree, pagerank) for every node with >= 1 edge.

    pr_0 = 1/N; pr_{t+1} = (1-d)/N + d * sum_in(round(pr_t/deg, 9)) with the
    neighbor sum carried as DECIMAL(28,9). Every node of an undirected graph
    has in-edges, so no dangling-mass term is needed.
    """
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    # Every iteration references edges; without pinning, Spark re-runs the
    # whole upstream pair-mining pipeline per iteration. The edge list is
    # pair-sized (tiny relative to the corpus that produced it), so persist
    # it once — same caller-owns-cache contract as the dedup miners.
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_total = deg.agg(F.count(F.lit(1)).alias("n"))
    base = 1.0 - damping  # computed HERE so the oracle embeds the same float

    pr = deg.crossJoin(F.broadcast(n_total)).select(
        F.col("src").alias("doc_id"),
        "deg",
        (F.lit(1.0) / F.col("n")).alias("pr"),
    )
    for _ in range(iterations):
        contribs = edges.join(
            pr.select(F.col("doc_id").alias("src"), F.col("deg").alias("__d"), "pr"),
            "src",
        ).select(
            F.col("dst").alias("doc_id"),
            F.round(F.col("pr") / F.col("__d"), 9).cast("decimal(28,9)").alias("c"),
        )
        summed = contribs.groupBy("doc_id").agg(
            F.sum("c").cast("double").alias("csum")
        )
        pr = (
            deg.select(F.col("src").alias("doc_id"), "deg")
            .join(summed, "doc_id", "left")
            .crossJoin(F.broadcast(n_total))
            .select(
                "doc_id",
                "deg",
                (
                    F.lit(base) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("csum"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select(
        "doc_id",
        F.col("deg").alias("degree"),
        F.round("pr", 6).alias("pagerank"),
    )


def triangle_stats(
    pairs: DataFrame, src_col: str = "doc_a", dst_col: str = "doc_b"
) -> DataFrame:
    """Global triangle count + clustering coefficient of the undirected pair
    graph, via DEGREE-ORDERED edge orientation (the standard distributed
    trick: orienting each edge from its lower-degree endpoint bounds every
    node's out-degree by O(sqrt(E)), so the wedge self-join — the quadratic
    step — is bounded by sum(out_deg^2) = O(E^1.5) instead of the raw
    sum(deg^2), which a single celebrity node would otherwise blow up).

    Returns one row: (n_edges, n_wedges, n_triangles, clustering) where
    n_wedges counts open+closed 2-paths (sum deg*(deg-1)/2) and clustering
    = 3*T / wedges — the global transitivity readout for the near-dup
    graph: high transitivity means duplicates arrive as dense template
    families, low means chains of pairwise drift.
    """
    und = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(pairs.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # orient a -> b iff (deg_a, a) < (deg_b, b)
    da = deg.select(F.col("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("a").alias("b"), F.col("deg").alias("db"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    o1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"))
    o2 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges2 = o1.join(o2, "u").filter(F.col("v") < F.col("w"))
    canon = pairs.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("x"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("y"),
    ).distinct()
    tri = wedges2.join(
        canon,
        (F.col("v") == F.col("x")) & (F.col("w") == F.col("y")),
    )
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    totals = deg.agg(
        (F.sum("deg") / F.lit(2)).cast("bigint").alias("n_edges"),
        F.sum(F.col("deg") * (F.col("deg") - F.lit(1)) / F.lit(2))
        .cast("bigint")
        .alias("n_wedges"),
    )
    return totals.crossJoin(n_tri).select(
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )
