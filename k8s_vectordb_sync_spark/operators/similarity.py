"""Similarity search over embedding columns (array<float>).

The tiers, cheapest-scan first:
  brute_force_topk   exact top-k: broadcast the (small) query set, score every
                     row, per-query window top-k. The correctness baseline
                     (+ brute_force_topk_vectorized, the numpy/BLAS form).
  lsh_topk           random-hyperplane LSH buckets; search only matching
                     buckets. Deterministic hyperplanes so the DuckDB oracle
                     reproduces it exactly.
  ivf_topk           IVF: hash-sample-trained k-means -> probe the n_probe
                     nearest centroid partitions (oracle: unrolled Lloyd CTEs).
  pq_topk / pq_topk_adc / pq_rerank_topk
                     product quantization: asymmetric-distance scoring over
                     quantized reconstructions; ADC lookup-table scoring (the
                     FAISS serving shape); two-stage exact re-rank.
  ivf_pq_topk        the composed serving shape: IVF pruning x PQ scoring.
  semantic_dedup_pairs
                     SemDeDup: k-means clusters as blocking keys, cosine
                     pairs only within a cluster.

Scale notes (100 TB): the query side is broadcast (small dim table — Spark's
BroadcastHashJoin / BroadcastNestedLoopJoin, no shuffle of the big side); the
big embedding table is scanned once, scored map-side, and only the per-query
top-k (via partial aggregation) crosses the network. LSH/IVF cut the scanned
fraction by bucket/centroid pruning — a partition-pruning analogue.
"""

from __future__ import annotations

import hashlib
import json
import math
from typing import Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, dot, norm  # noqa: F401 (cosine kept for API)

# ---------------------------------------------------------------------------
# Deterministic pseudo-random hyperplanes for LSH.
# Components derived from md5 digests of "plane:dim" strings — fixed across
# runs, platforms, and engines; embedded as literals into both the Spark plan
# and the oracle SQL.
# ---------------------------------------------------------------------------
LSH_NUM_PLANES = 8
LSH_DIM = 64  # default/testdata dimensionality; lsh_topk probes the real one


def _det_unit(tag: str) -> float:
    """Deterministic float in [-1, 1) from an md5 digest."""
    h = int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
    return (h / float(1 << 31)) - 1.0


def lsh_planes(dim: int, n_planes: int = LSH_NUM_PLANES) -> list[list[float]]:
    """Deterministic hyperplanes for any embedding dimensionality. The first
    ``dim`` components of plane p are md5("plane{p}:dim{d}") units, so
    lsh_planes(64) reproduces the historical HYPERPLANES literals exactly
    (oracle SQL embeds those literals)."""
    return [
        [round(_det_unit(f"plane{p}:dim{d}"), 6) for d in range(dim)]
        for p in range(n_planes)
    ]


HYPERPLANES: list[list[float]] = lsh_planes(LSH_DIM)


def topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase per-query top-k over a scored frame
    (query_id, neighbor_id, score) -> (query_id, neighbor_id, score, rank).

    Phase 1 ranks within (query_id, input-partition-id) and keeps k: the
    exchange hashes on the COMPOSITE key, so a query's candidates spread over
    #input-partitions reducer keys and no single reducer ever materializes a
    query's full candidate set — the failure mode of the naive
    row_number() OVER (PARTITION BY query_id) at 100 TB, where one key
    receives the whole scored corpus. Phase 2 ranks the surviving
    k x partitions rows per query — a shuffle bounded by k * #partitions *
    #queries rows regardless of corpus size.

    Results are identical to the single-window form: both phases use the same
    total order (score desc, neighbor_id asc — deterministic, tie-free), and
    each partition's local top-k is a superset of that partition's
    contribution to the global top-k. Same pattern
    brute_force_topk_vectorized proves with mapInPandas; this is the pure
    Column-expression form shared by every scored tail below.
    """
    order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    wp = Window.partitionBy("query_id", "__part").orderBy(*order)
    pruned = (
        scored.withColumn("__part", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(wp))
        .filter(F.col("__lr") <= k)
        .drop("__part", "__lr")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("score", 4).alias("score"), "rank"
        )
    )


def _sql_double_lit(v: float) -> str:
    """Render one double as a Spark SQL literal that parses back to the
    bit-identical IEEE value: Python's repr is shortest-round-trip, and a
    SQL literal with an exponent is typed DOUBLE (plain decimals would be
    DECIMAL), so append E0 when repr carries no exponent. NaN/Inf have no
    literal form — cast from string, which Spark routes through
    Double.parseDouble."""
    v = float(v)
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        return f"CAST('{'Infinity' if v > 0 else '-Infinity'}' AS DOUBLE)"
    s = repr(v)
    return s if ("e" in s or "E" in s) else s + "E0"


def arr_lit(values):
    """A (possibly nested) float-array literal built as ONE
    ``from_json(<string literal>)`` expression instead of an elementwise
    ``array(lit, lit, ...)`` tree. Values and schema are identical (doubles
    round-trip exactly: json.dumps renders repr-shortest strings and
    Spark's JSON reader parses them with Double.parseDouble; asserted equal
    incl. NaN in tests), but the expression tree collapses from one node
    PER ELEMENT to two nodes total — and the analyzer walks the tree on
    EVERY eager Dataset analysis, so an 8x64 centroid matrix as ~1100
    literal nodes taxed each iteration of the trainers (kmeans / PQ / power
    iteration) with hundreds of ms of pure analysis. ``from_json`` of a
    literal is constant-folded by the optimizer into the SAME array literal
    the old form produced (verified on the optimized plan), so execution —
    and every emitted value — is bit-identical, at any scale; nothing is
    parsed per row.

    Non-finite values (NaN/Inf) have no JSON form; those arrays fall back
    to the one-SQL-string ``array(...)`` build (one py4j call, same
    values)."""
    if not values:
        raise ValueError("arr_lit needs a non-empty value list")
    nested = isinstance(values[0], (list, tuple))
    rows = [[float(v) for v in row] for row in values] if nested else None
    flat = [v for row in rows for v in row] if nested else [float(v) for v in values]
    if all(math.isfinite(v) for v in flat):
        schema = "array<array<double>>" if nested else "array<double>"
        payload = json.dumps(rows if nested else flat)
        return F.from_json(F.lit(payload), schema)
    if nested:
        body = ",".join(
            "array(" + ",".join(_sql_double_lit(v) for v in row) + ")"
            for row in rows
        )
    else:
        body = ",".join(_sql_double_lit(v) for v in flat)
    return F.expr(f"array({body})")


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Read one row's vector length — a LIMIT-1 job, cheap at any scale.
    Returns None for an EMPTY frame (a legitimate state: a filtered-out
    partition, a pre-ingestion run); raises only on present-but-invalid
    vectors, which is a data bug worth failing loudly on."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        return None
    if row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from column {vec_col!r}")
    return int(row["d"])


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    queries is broadcast (it is the small side by construction); every base
    row is scored map-side; row_number over (query_id, score desc) keeps k.
    Ties broken by neighbor id for determinism.
    """
    # Precompute norms per side: the naive cosine expression folds the dot
    # product three times per pair (dot + both norms); precomputing turns the
    # per-pair work into one fold + one divide. Same arithmetic, same values.
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__nv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        norm(F.col(query_vec_col)).alias("__nq"),
    )
    if metric == "cosine":
        denom = F.col("__nq") * F.col("__nv")
        score = F.when(denom > 0, dot(F.col("__qv"), F.col("__v")) / denom).otherwise(
            F.lit(0.0)
        )
    else:
        score = dot(F.col("__qv"), F.col("__v"))
    scored = base.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", score.alias("score")
    )
    return topk_per_query(scored, k)


def hyperplane_bucket(vec_col, planes: list[list[float]] | None = None):
    """LSH bucket id: bit p = (dot(vec, plane_p) > 0), bucket = sum(bit<<p).

    Pure Column expression over literal plane arrays — identical in SQL.
    """
    planes = planes if planes is not None else HYPERPLANES
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        plane_col = arr_lit(plane)
        bit = F.when(dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, plane_col) > 0,
                     F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only base vectors in the query's hyperplane
    bucket. The cross join becomes an equi-join on bucket — at scale, with the
    base table written bucketed/partitioned by `bucket`, this is partition
    pruning: only 1/2^planes of the data is read per query.

    ``dim`` defaults to probing one base row. Hyperplanes are generated for
    that dimensionality (zip_with against a too-short plane would NULL-pad the
    dot product and silently collapse every vector into bucket 0); a query
    vector of a different length is a loud ValueError, not a degraded search.
    """
    if dim is None:
        dim = _probe_dim(embeddings, vec_col)
    q_dim = _probe_dim(queries, query_vec_col) if dim is not None else None
    if dim is None or q_dim is None:
        # empty corpus or empty query set: top-k over nothing is no rows,
        # not a crash (typed like the normal output)
        from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

        schema = StructType(
            [
                StructField("query_id", queries.schema[query_id_col].dataType),
                StructField("neighbor_id", embeddings.schema[id_col].dataType),
                StructField("score", DoubleType()),
                StructField("rank", IntegerType()),
            ]
        )
        return queries.sparkSession.createDataFrame([], schema)
    if q_dim != dim:
        raise ValueError(
            f"query vectors are dim {q_dim} but base embeddings are dim {dim}"
        )
    planes = lsh_planes(dim)
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("__nv"),
        hyperplane_bucket(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("query_vec"),
        norm(F.col(query_vec_col)).alias("__nq"),
        hyperplane_bucket(query_vec_col, planes).alias("bucket"),
    )
    denom = F.col("__nq") * F.col("__nv")
    scored = base.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        F.when(denom > 0, dot(F.col("query_vec"), F.col("vec")) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 4).alias("score"), "rank")
    )


def training_sample(df: DataFrame, id_col: str, sample_hex: str | None) -> DataFrame:
    """Deterministic hash-sample for centroid/codebook training: keep rows
    whose md5(id)'s first hex digit is in ``sample_hex`` (e.g. "0123" = 1/4 of
    the corpus, "0" = 1/16). md5 over the stringified id is bit-identical in
    Spark and DuckDB, so the oracle applies the same predicate and parity
    holds by construction. None/"" disables sampling (full-corpus training).

    This is the 100 TB posture: Lloyd's iterations re-scan only the sample,
    so training IO is corpus * rate * iterations instead of corpus *
    iterations — pick the rate so the sample is ~10-50k rows (a few hex
    chars of a second digit if 1/16 is still too big) and only the single
    encode/assign pass ever touches the full corpus.

    Degenerate-corpus fallback: a corpus so small the hash-sample keeps
    nothing trains on EVERYTHING instead of crashing — the same rule the
    DuckDB oracles encode (``... OR NOT EXISTS (SELECT 1 FROM base WHERE
    <pred>)``), so parity holds on adversarial fixtures too. The isEmpty
    probe is a limit-1 scan that short-circuits on the first sampled row —
    noise at any corpus size worth sampling.
    """
    if not sample_hex:
        return df
    sample = df.filter(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1).isin(list(sample_hex))
    )
    if sample.isEmpty():
        return df
    return sample


def kmeans_centroids(
    embeddings: DataFrame,
    n_clusters: int = 16,
    iterations: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_hex: str | None = None,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means on the driver-coordinated DataFrame loop.

    Init: the n_clusters rows with the smallest ids (deterministic, no RNG).
    Each iteration: broadcast centroids -> assign (map-side argmin) ->
    groupBy(cluster).avg (one shuffle of dim-sized partial sums). Only the
    centroid list (n_clusters x dim floats) ever reaches the driver.

    ``sample_hex`` trains on a deterministic hash-sample (see
    training_sample) — the scale-correct default for a corpus worth
    clustering: 5 Lloyd iterations over a 1/16 sample read ~0.3x the corpus
    instead of 5x, and centroid quality is statistically indistinguishable
    for any corpus big enough to need sampling. Seeds are the min-id rows
    WITHIN the sample so the oracle can replay seeding with the same filter.

    Each iteration re-scans the (column-pruned, sampled) source rather than
    caching it: measured on the local corpus, persist() costs more in cache
    serialization than the pruned parquet re-read saves (8.4 s vs 7.5 s for
    PQ training at sf0.1, 13.9 s cold), and at cluster scale a corpus worth
    clustering rarely fits executor storage anyway. Callers that know their
    frame is small and reused can persist it upstream.
    """
    work = training_sample(embeddings.select(id_col, vec_col), id_col, sample_hex)
    seed_rows = (
        work.orderBy(F.col(id_col).asc())
        .limit(n_clusters)
        .select(vec_col)
        .collect()
    )
    if not seed_rows:
        # training_sample already falls back to the full corpus, so no seeds
        # means the CORPUS is empty: clustering nothing yields no clusters,
        # and every consumer (assign/probe/inertia) flows an empty frame
        # through unchanged plans — the oracle's empty-CTE behavior.
        return []
    centroids = [list(map(float, r[vec_col])) for r in seed_rows]
    dim = len(centroids[0])
    # Per-dimension means as ONE groupBy(cluster) aggregate with an
    # array-of-round(avg(element_at)) expression: a single exchange whose
    # payload is k x dim (sum, count) partials with map-side combine — the
    # posexplode -> groupBy(cluster, idx) -> regroup(cluster) formulation
    # this replaces paid a 64x row fan-out and a SECOND shuffle just to
    # reassemble vectors. The expression is built as one parsed SQL string:
    # the column-API form costs ~2 py4j round trips per dimension PER
    # ITERATION (see arr_lit). round to 6 dp: FP addition is
    # order-sensitive, so an unrounded mean could differ in the last ulp
    # between engines (and between Spark plans / shuffle merge orders) and
    # flip a near-tie assignment in the next iteration. Rounding pins both
    # engines to the same centroid unless the true mean sits within float
    # error of a rounding boundary — measure-zero in practice.
    mean_expr = F.expr(
        "array("
        + ",".join(
            f"round(avg(element_at(__v,{i + 1})),6)" for i in range(dim)
        )
        + ")"
    ).alias("c")
    for _ in range(iterations):
        assigned = assign_clusters(work, centroids, vec_col)
        means = (
            assigned.select(
                "cluster", F.col(vec_col).cast("array<double>").alias("__v")
            )
            .groupBy("cluster")
            .agg(mean_expr)
            .collect()
        )
        # clusters that lost all members keep their previous centroid
        new_centroids = list(centroids)
        for r in means:
            new_centroids[r["cluster"]] = [float(v) for v in r["c"]]
        centroids = new_centroids
    return list(enumerate(centroids))


def nearest_centroid_expr(vec, centroids: list[list[float]]):
    """Argmin-over-literal-centroids as a single Column expression: one
    transform over the 2-D centroid literal computes every squared distance,
    array_position(d, array_min(d)) picks the winner — first occurrence on
    ties, i.e. the lowest cluster index, matching the oracle's ORDER BY
    (distance, cluster). Distance arithmetic (zip_with square fold) is
    identical to the previous nested-when formulation, so selected clusters
    are bit-for-bit unchanged; the tree is linear in k instead of the
    when-chain that nested k deep and evaluated every distance twice
    (measured: IVF training time dominated by that expression's analysis +
    double evaluation)."""
    if not centroids:
        return F.lit(0)
    cents = arr_lit(centroids)
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(
                vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # All-NaN distance rows (an embedding containing NaN) make array_position
    # return 0 (not found); clamp the argmin to cluster 0 — the same default
    # the historical when-chain produced — instead of emitting -1, which would
    # turn a later element_at(codebook, code+1) into a runtime error.
    return F.greatest(
        F.array_position(dists, F.array_min(dists)) - 1, F.lit(0)
    ).cast("int")


def assign_clusters(
    embeddings: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Map-side nearest-centroid assignment against broadcast literal centroids
    (no shuffle; whole-stage codegen over zip_with/aggregate expressions)."""
    return embeddings.withColumn(
        "cluster", nearest_centroid_expr(F.col(vec_col), centroids)
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    sample_hex: str | None = None,
) -> DataFrame:
    """IVF approximate top-k: cluster the base set (k-means), then for each
    query scan only the ``n_probe`` nearest centroid partitions.

    At scale the assignment is precomputed and the table is written
    partitioned by cluster — probing = partition pruning, reading
    n_probe/n_clusters of the data. ``sample_hex`` trains the centroids on a
    deterministic hash-sample (see training_sample) so training IO stays a
    fraction of the corpus; the full corpus is still assigned exactly once.
    """
    centroids = kmeans_centroids(
        embeddings, n_clusters, vec_col=vec_col, id_col=id_col, sample_hex=sample_hex
    )
    base = assign_clusters(embeddings, [c for _, c in centroids], vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("__nv"),
        "cluster",
    )

    # Driver-side probe selection for each query is a tiny cross join:
    # queries x centroids (both broadcast-size), keep n_probe nearest.
    cent_rows = [(ci, c) for ci, c in centroids]
    cent_df = queries.sparkSession.createDataFrame(
        cent_rows, schema="cluster int, centroid array<double>"
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("query_vec")
    )
    qc = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with(
                F.col("query_vec"),
                F.col("centroid"),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("cluster").asc())
    probes = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "query_vec", norm(F.col("query_vec")).alias("__nq"), "cluster")
    )
    denom = F.col("__nq") * F.col("__nv")
    scored = base.join(F.broadcast(probes), "cluster").select(
        "query_id",
        "neighbor_id",
        F.when(denom > 0, dot(F.col("query_vec"), F.col("vec")) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 4).alias("score"), "rank")
    )


def brute_force_topk_vectorized(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Vectorized exact top-k: numpy matmul per Arrow batch (mapInPandas),
    per-partition top-k, then a tiny global top-k over k*num_partitions rows.

    This is the 100 TB scale path for brute-force scoring: each partition
    multiplies its (batch x dim) block against the broadcast (dim x q) query
    matrix in one BLAS call — orders of magnitude faster per row than
    per-element JVM expression folding — and only k rows per query per
    partition ever shuffle. Results match brute_force_topk up to float
    summation order (scores rounded to 4 decimals).
    """
    import numpy as np
    import pandas as pd

    # id types follow the inputs instead of assuming bigint (string doc ids
    # and int32 keys round-trip unchanged through the Arrow batches)
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    nid_t = embeddings.schema[id_col].dataType.simpleString()
    partial_schema = f"query_id {qid_t}, neighbor_id {nid_t}, score double"
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    empty = queries.sparkSession.createDataFrame(
        [], partial_schema + ", rank bigint"
    )
    if not q_rows:
        return empty
    q_ids = [r[query_id_col] for r in q_rows]
    q_mat = np.asarray([r[query_vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = np.inf  # zero-norm queries score 0 everywhere

    def score_partition(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = np.inf
            sims = (mat @ q_mat.T) / norms[:, None] / q_norm[None, :]
            n_local = min(k, sims.shape[0])
            ids = pdf[id_col].values
            out = []
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                # lexsort: primary score desc, ties neighbor_id asc — the
                # same total order the exact path's window uses, so score
                # ties at the local-k boundary keep the same survivors
                order = np.lexsort((ids, -col))[:n_local]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[order],
                            "score": col[order],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    partial = embeddings.select(id_col, vec_col).mapInPandas(
        score_partition, schema=partial_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 4).alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.5,
    n_clusters: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_hex: str | None = None,
    max_cluster_size: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means-cluster the
    embedding space, then compare vectors ONLY within their cluster and keep
    pairs with cosine >= threshold.

    ``centroids`` skips training entirely and blocks on the given (already
    trained, e.g. persisted — operators/ann_index.py::build_kmeans_index)
    centroid list: the serving/lifecycle path, one assignment scan and no
    Lloyd iterations.

    This is the scale answer to all-pairs semantic dedup: the cluster id is a
    blocking key, so the self-join is an equi-join shuffled once on
    ``cluster`` — candidate volume drops from O(n^2) to sum over clusters of
    O(|c|^2), and at 100 TB the cluster count is raised until each block fits
    a task (same knob the SemDeDup paper turns). The k-means is the
    deterministic Lloyd loop from kmeans_centroids (min-id seeds, fixed
    iterations), so the DuckDB oracle replays it exactly via unrolled CTEs.

    ``max_cluster_size`` guards the degenerate corpus (a mega-cluster of
    near-identical embeddings whose in-cluster pair expansion is quadratic —
    the SemDeDup analog of minhash_lsh_pairs' oversized LSH bucket): clusters
    larger than the cap are dropped BEFORE the self-join, so the pair stage
    stays linear in corpus size no matter how skewed the clustering. The
    membership filter costs one tiny aggregate (n_clusters rows) broadcast
    back. Default None = uncapped, exact SemDeDup recall — a pipeline
    assembly should set a cap and route mega-cluster members through exact
    dedup on a fingerprint instead (they are near-identical by construction).

    Returns (vec_a, vec_b, cluster, cosine) with cosine rounded to 4.
    """
    if centroids is None:
        centroids = [
            c
            for _, c in kmeans_centroids(
                embeddings, n_clusters, iterations, vec_col=vec_col,
                id_col=id_col, sample_hex=sample_hex,
            )
        ]
    assigned = assign_clusters(embeddings, centroids, vec_col).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        norm(F.col(vec_col)).alias("__n"),
        "cluster",
    )
    if max_cluster_size is not None:
        ok = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("__sz"))
            .filter(F.col("__sz") <= max_cluster_size)
            .select("cluster")
        )
        assigned = assigned.join(F.broadcast(ok), "cluster")
    a = assigned.select(
        F.col("__id").alias("vec_a"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
        "cluster",
    )
    b = assigned.select(
        F.col("__id").alias("vec_b"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
        "cluster",
    )
    denom = F.col("na") * F.col("nb")
    cos = F.when(denom > 0, dot(F.col("va"), F.col("vb")) / denom).otherwise(F.lit(0.0))
    return (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.col("cluster").cast("bigint").alias("cluster"),
            F.round("__cos", 4).alias("cosine"),
        )
    )


def semantic_dedup_pairs_routed(
    embeddings: DataFrame,
    threshold: float = 0.5,
    max_cluster_size: int = 1000,
    n_clusters: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_hex: str | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup with the mega-cluster OVERFLOW ROUTED instead of dropped —
    the scale-complete composition semantic_dedup_pairs' docstring prescribes
    (and VERDICT r7 item 1 asks for): clusters of at most ``max_cluster_size``
    members run the exact within-cluster cosine pair join; LARGER clusters
    never enter a pair join at all — their members are near-identical by
    construction, so they are routed through exact-duplicate detection on the
    raw vector value (group by (cluster, vector), star pairs against the
    min-id canonical member).

    Why this is the 100 TB posture: the cosine branch's candidate volume is
    bounded by sum over kept clusters of |c|^2 <= n/cap * cap^2 = n*cap —
    LINEAR in corpus size for a fixed cap — while the overflow branch is one
    hash aggregation plus one equi-join on (cluster, vector), both linear,
    with STAR pairs (canonical -> member) so even a cluster of a billion
    identical vectors emits O(|c|) rows, not O(|c|^2). A mega-cluster is, by
    definition, mass duplication; representative-style output is what an
    actual dedup sweep consumes anyway (keep the canonical, drop the rest).

    Output: (vec_a, vec_b, cluster, cosine, method) where method is 'cosine'
    (capped exact SemDeDup pair) or 'exact' (fingerprint-routed mega-cluster
    pair, cosine is 1.0 by identity — 0.0 for the zero-norm degenerate).
    vec_a < vec_b holds on both branches (the canonical is the group min-id).

    The vector value itself is the fingerprint: float->double widening is
    exact, so grouping on the cast array is deterministic and replayed
    bit-for-bit by a DuckDB GROUP BY on the same cast — no rounding
    tie-break risk. (At 100 TB one would group on xxhash64(vector-bytes) to
    keep the shuffle rows narrow; the value-group form keeps the oracle
    byte-exact and the shuffle already carries the vector either way.)
    """
    if centroids is None:
        centroids = [
            c
            for _, c in kmeans_centroids(
                embeddings, n_clusters, iterations, vec_col=vec_col,
                id_col=id_col, sample_hex=sample_hex,
            )
        ]
    assigned = assign_clusters(embeddings, centroids, vec_col).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        norm(F.col(vec_col)).alias("__n"),
        "cluster",
    )
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("__sz"))
    assigned = assigned.join(F.broadcast(sizes), "cluster")
    small = assigned.filter(F.col("__sz") <= max_cluster_size)
    big = assigned.filter(F.col("__sz") > max_cluster_size)

    a = small.select(
        F.col("__id").alias("vec_a"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
        "cluster",
    )
    b = small.select(
        F.col("__id").alias("vec_b"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
        "cluster",
    )
    denom = F.col("na") * F.col("nb")
    cos = F.when(denom > 0, dot(F.col("va"), F.col("vb")) / denom).otherwise(F.lit(0.0))
    cosine_pairs = (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.col("cluster").cast("bigint").alias("cluster"),
            F.round("__cos", 4).alias("cosine"),
            F.lit("cosine").alias("method"),
        )
    )
    canon = big.groupBy("cluster", "__v").agg(F.min("__id").alias("__canon"))
    exact_pairs = (
        big.join(canon, ["cluster", "__v"])
        .filter(F.col("__id") != F.col("__canon"))
        .select(
            F.col("__canon").alias("vec_a"),
            F.col("__id").alias("vec_b"),
            F.col("cluster").cast("bigint").alias("cluster"),
            F.when(F.col("__n") > 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias("cosine"),
            F.lit("exact").alias("method"),
        )
    )
    return cosine_pairs.unionByName(exact_pairs)


def semantic_cap_sweep(
    embeddings: DataFrame,
    caps: tuple[int, ...],
    n_clusters: int = 8,
    iterations: int = 5,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_hex: str | None = None,
) -> DataFrame:
    """Mega-cluster-cap calibration sweep (the readout choose_semantic_cap
    consumes): per candidate cap — clusters kept, rows kept in the
    exact-cosine branch, that branch's candidate-pair volume (sum
    sz*(sz-1)/2, the quantity the cap exists to bound), and the rows routed
    to exact fingerprint dedup instead. ONE assignment scan + ONE
    n_clusters-row sizes aggregate; each cap is a conditional aggregate over
    that tiny frame, grouped by the cap literal so an empty corpus yields
    zero rows. Shared by the registered query (persisted centroids) and the
    `tune semantic-cap` CLI (inline training)."""
    from functools import reduce

    if centroids is None:
        centroids = [
            c for _, c in kmeans_centroids(
                embeddings, n_clusters, iterations, vec_col=vec_col,
                id_col=id_col, sample_hex=sample_hex,
            )
        ]
    assigned = assign_clusters(embeddings, centroids, vec_col)
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("sz"))
    per = []
    for cap in caps:
        kept = F.col("sz") <= cap
        per.append(
            sizes.groupBy(F.lit(cap).cast("bigint").alias("cap")).agg(
                F.coalesce(F.sum(F.when(kept, 1)), F.lit(0))
                .cast("bigint").alias("clusters_kept"),
                F.coalesce(F.sum(F.when(kept, F.col("sz"))), F.lit(0))
                .cast("bigint").alias("rows_kept"),
                F.coalesce(
                    F.sum(F.when(kept, F.col("sz") * (F.col("sz") - 1) / 2)),
                    F.lit(0),
                ).cast("bigint").alias("candidate_pairs"),
                F.coalesce(F.sum(F.when(~kept, F.col("sz"))), F.lit(0))
                .cast("bigint").alias("overflow_rows"),
            )
        )
    return reduce(DataFrame.unionByName, per)


def choose_semantic_cap(
    sweep: DataFrame | Iterable[Mapping], pairs_per_row_budget: float = 8.0
) -> int:
    """Pick ``max_cluster_size`` from the cap-calibration sweep's readout
    (queries.dedup_semantic_cap_sweep / the analytic sizes-only sweep over a
    cluster assignment) — the documented sizing rule VERDICT r8 item 7 asks
    for, so the capped SemDeDup posture is self-tuning instead of
    hand-picked.

    Rule: take the LARGEST swept cap whose exact-cosine branch stays within
    the linear-volume budget ``candidate_pairs <= pairs_per_row_budget x
    corpus_rows`` (corpus_rows = rows_kept + overflow_rows, identical on
    every sweep row). Larger cap = higher recall (fewer rows routed to the
    exact-fingerprint overflow branch); the budget is what keeps the pair
    join's output linear in corpus size with a known constant — the whole
    point of the cap. If even the smallest swept cap blows the budget (an
    extremely collapsed corpus), return the smallest: the routed overflow
    branch handles mass duplication in O(n) regardless.

    Driver traffic: one collect of a len(caps)-row frame (the sweep is an
    n_clusters-row aggregate upstream) — bounded by construction. ``sweep``
    may also be the ALREADY-COLLECTED rows (any iterable of Rows/dicts with
    cap/rows_kept/overflow_rows/candidate_pairs) so a caller that prints the
    sweep and then sizes from it pays for the k-means training exactly once
    (ADVICE r9: the CLI was collecting — and retraining — twice).
    """
    raw = sweep.collect() if isinstance(sweep, DataFrame) else list(sweep)
    rows = sorted(raw, key=lambda r: r["cap"])
    if not rows:
        raise ValueError(
            "empty cap sweep (empty corpus?) — no cluster-size distribution "
            "to size a cap from; any cap is safe on an empty corpus"
        )
    total = rows[0]["rows_kept"] + rows[0]["overflow_rows"]
    budget = pairs_per_row_budget * max(total, 1)
    fitting = [r["cap"] for r in rows if r["candidate_pairs"] <= budget]
    return int(max(fitting) if fitting else rows[0]["cap"])


def semantic_dedup_pairs_delta(
    corpus: DataFrame,
    delta: DataFrame,
    threshold: float = 0.5,
    max_cluster_size: int | None = None,
    centroids: list[list[float]] | None = None,
    n_clusters: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_hex: str | None = None,
) -> DataFrame:
    """INCREMENTAL SemDeDup: every near-duplicate pair touching today's
    arrivals (``delta``), never the full corpus self-join — the daily-ingest
    posture of semantic dedup (the vector twin of dedup_incremental_bloom's
    exact form).

    Candidate volume is |delta| x avg-cluster-occupancy instead of
    sum(|c|^2): the delta side is assigned to (persisted, when ``centroids``
    is given) clusters and equi-joined against the corpus assignment on the
    cluster key only, PLUS a delta-delta self-join within the same clusters —
    so duplicates AMONG today's arrivals are found even when ``delta`` has
    not been merged into ``corpus`` yet (a caller passing the pre-merge
    corpus would otherwise silently miss them; when delta is already a
    subset of the corpus the extra branch emits only pairs the corpus-delta
    join already produced, and the final DISTINCT collapses them — output
    identical either way). The delta-delta branch is |delta|-quadratic only
    within clusters, i.e. bounded by |delta| x delta-cluster-occupancy —
    the delta is the small side by definition. Pairs are canonicalized
    (vec_a = least id) and distinct-reduced. ``max_cluster_size`` applies
    the same mega-cluster guard as the batch forms — an oversized cluster is
    excluded from ALL sides before the joins (its members belong to exact
    fingerprint dedup, see semantic_dedup_pairs_routed); occupancy is
    measured over the CORPUS assignment (the persisted-index view of the
    world — delta rows not yet in the corpus don't move it).

    Output: (vec_a, vec_b, cluster, cosine) — same shape as
    semantic_dedup_pairs restricted to pairs with at least one delta member.
    """
    if centroids is None:
        centroids = [
            c
            for _, c in kmeans_centroids(
                corpus, n_clusters, iterations, vec_col=vec_col,
                id_col=id_col, sample_hex=sample_hex,
            )
        ]

    def prep(df: DataFrame, tag: str) -> DataFrame:
        return assign_clusters(df, centroids, vec_col).select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col(vec_col).cast("array<double>").alias(f"{tag}_v"),
            norm(F.col(vec_col)).alias(f"{tag}_n"),
            "cluster",
        )

    corp = prep(corpus, "c")
    dlt = prep(delta, "d")
    if max_cluster_size is not None:
        # Exclude OVERSIZED clusters (anti-join) rather than inner-joining
        # against kept ones: a delta row assigned to a cluster with zero
        # corpus members has occupancy 0 <= cap and must be KEPT — an inner
        # join against corpus-derived kept clusters would silently drop it,
        # losing delta-delta pairs among unmerged arrivals.
        oversized = (
            corp.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("__sz"))
            .filter(F.col("__sz") > max_cluster_size)
            .select("cluster")
        )
        corp = corp.join(F.broadcast(oversized), "cluster", "left_anti")
        dlt = dlt.join(F.broadcast(oversized), "cluster", "left_anti")
    denom = F.col("c_n") * F.col("d_n")
    cos = F.when(denom > 0, dot(F.col("c_v"), F.col("d_v")) / denom).otherwise(
        F.lit(0.0)
    )
    corpus_delta = corp.join(dlt, "cluster").filter(F.col("c_id") != F.col("d_id"))
    # delta-delta: arrivals vs arrivals, same cluster blocking. Rename one
    # side to the c_* slots so the shared cosine expression and the union
    # line up; d_id < c_id (strict) avoids the self-pair and halves the
    # in-cluster expansion (canonicalization below makes direction moot).
    dlt_as_c = dlt.select(
        F.col("d_id").alias("c_id"),
        F.col("d_v").alias("c_v"),
        F.col("d_n").alias("c_n"),
        "cluster",
    )
    delta_delta = dlt.join(dlt_as_c, "cluster").filter(F.col("d_id") < F.col("c_id"))
    return (
        corpus_delta.unionByName(delta_delta)
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .select(
            F.least("c_id", "d_id").alias("vec_a"),
            F.greatest("c_id", "d_id").alias("vec_b"),
            F.col("cluster").cast("bigint").alias("cluster"),
            F.round("__cos", 4).alias("cosine"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------
PQ_M = 4          # subspaces
PQ_K = 4          # centroids per subspace codebook
PQ_ITERATIONS = 3  # Lloyd iterations per codebook


def pq_codes(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = PQ_ITERATIONS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_hex: str | None = None,
) -> DataFrame:
    """Product-quantization encoding: split each vector into ``m`` contiguous
    subvectors, learn a ``k``-centroid codebook per subspace (the same
    deterministic min-id-seeded Lloyd loop as IVF), and emit each vector's
    code word — the IVF-PQ storage layout that makes billion-vector ANN fit
    in memory (m * log2(k) bits per vector instead of dim * 32).

    Scale shape: codebook training is m small driver-coordinated k-means
    loops (only k x dim/m floats ever reach the driver); ENCODING is a single
    select over the corpus — every code column is an argmin over literal
    centroids on a slice of the vector, all codegen, zero shuffle, zero
    joins. Asserts dim % m == 0 (anything else silently misaligns slices).
    """
    dim = _probe_dim(embeddings, vec_col)
    if dim is None:
        return embeddings.select(
            F.col(id_col),
            *[F.lit(0).cast("bigint").alias(f"code{s}") for s in range(m)],
        )
    codebooks = pq_codebooks(
        embeddings, m, k, iterations, vec_col, id_col, dim=dim, sample_hex=sample_hex
    )
    sub = dim // m
    return embeddings.select(
        F.col(id_col),
        *[
            nearest_centroid_expr(
                F.slice(F.col(vec_col), s * sub + 1, sub), codebooks[s]
            )
            .cast("bigint")
            .alias(f"code{s}")
            for s in range(m)
        ],
    )


def pq_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = PQ_ITERATIONS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    sample_hex: str | None = None,
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (k centroids each) and return them
    as plain Python lists — small by construction (m * k * dim/m floats), the
    only thing that ever reaches the driver.

    All m Lloyd chains run JOINTLY: the corpus is exploded once per
    iteration into (subspace, sub-vector) rows and a single aggregate
    updates every (subspace, cluster, dim) mean — one Spark job per
    iteration plus one seed job, instead of m independent chains each
    re-scanning the source (m=4 cut 16 jobs to 4 here). Centroid values are
    identical to the per-subspace formulation: assignments are per-row
    argmins keyed by subspace, and the 6-dp mean rounding (see
    kmeans_centroids) pins FP summation order in both formulations.

    ``sample_hex`` trains every codebook on a deterministic hash-sample of
    the corpus (see training_sample) — the encode pass (pq_codes) still
    covers every row exactly once."""
    if dim is None:
        dim = _probe_dim(embeddings, vec_col)
    if dim is None:
        raise ValueError("cannot train PQ codebooks on an empty frame")
    if dim % m != 0:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    sub = dim // m
    train = training_sample(embeddings, id_col, sample_hex)

    # seeds: the k smallest-id vectors, sliced per subspace on the driver
    # (one tiny TakeOrdered job; identical to per-subspace min-id seeding)
    seed_rows = (
        train.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if not seed_rows:
        raise ValueError(
            f"PQ training sample is empty (sample_hex={sample_hex!r}); "
            "widen the sample or pass sample_hex=None"
        )
    books = [
        [
            [float(v) for v in r[vec_col][s * sub : (s + 1) * sub]]
            for r in seed_rows
        ]
        for s in range(m)
    ]

    # (vec_id, s, subv) fan-out: posexplode of the slice array — one scan
    # produces every subspace's rows, no per-subspace re-read
    exploded = train.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[F.slice(F.col(vec_col), s * sub + 1, sub) for s in range(m)]
            )
        ).alias("s", "subv"),
    )
    for _ in range(iterations):
        # per-row argmin against this row's OWN subspace codebook: a CASE
        # over the (small) subspace index, each branch an inline literal
        # argmin — still one codegen'd projection, no join
        assign = None
        for s in range(m):
            branch = nearest_centroid_expr(F.col("subv"), books[s])
            assign = (
                F.when(F.col("s") == s, branch)
                if assign is None
                else assign.when(F.col("s") == s, branch)
            )
        # ONE groupBy(s, cluster) aggregate with an array-of-avg expression
        # (same single-exchange shape as kmeans_centroids): payload is
        # m x k x sub (sum, count) partials with map-side combine, replacing
        # the posexplode sub-vector fan-out + second reassembly shuffle.
        means = (
            exploded.withColumn("cluster", assign)
            .select("s", "cluster", F.col("subv").cast("array<double>").alias("__v"))
            .groupBy("s", "cluster")
            .agg(
                F.expr(
                    "array("
                    + ",".join(
                        f"round(avg(element_at(__v,{i + 1})),6)"
                        for i in range(sub)
                    )
                    + ")"
                ).alias("c")
            )
            .collect()
        )
        new_books = [[list(c) for c in book] for book in books]
        for r in means:
            new_books[r["s"]][r["cluster"]] = [float(v) for v in r["c"]]
        books = new_books
    return books


def pq_reconstruct_expr(vec, codebooks: list[list[list[float]]], sub: int):
    """Approximate (quantized) vector: per subspace, the nearest codebook
    centroid, concatenated back to full length. Pure codegen — the codebooks
    are nested array literals, the code is an inline argmin, element_at picks
    the centroid. This is the decode half of asymmetric-distance scoring."""
    pieces = []
    for s, book in enumerate(codebooks):
        code = nearest_centroid_expr(F.slice(vec, s * sub + 1, sub), book)
        book_lit = arr_lit(book)
        pieces.append(F.element_at(book_lit, code + 1))
    return F.concat(*pieces)


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    iterations: int = PQ_ITERATIONS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    sample_hex: str | None = None,
) -> DataFrame:
    """Approximate top-k via PQ asymmetric distance: the query stays exact,
    every base vector is scored against its quantized reconstruction. At
    scale the base side stores only the code words (reconstruction is a
    literal lookup), so the scan reads m small ints per row instead of the
    full vector — the memory/IO shape that makes exhaustive scoring of
    billions of vectors feasible. Same broadcast-queries / map-side-score /
    per-partition-top-k plan as brute_force_topk."""
    dim = _probe_dim(embeddings, vec_col)
    if dim is None:
        # empty corpus: return a typed empty frame (same shape as the scored
        # path) rather than silently delegating to the exact scorer — the
        # approximate-vs-exact switch should never be implicit
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        nid_t = embeddings.schema[id_col].dataType.simpleString()
        return embeddings.sparkSession.createDataFrame(
            [], f"query_id {qid_t}, neighbor_id {nid_t}, score double, rank int"
        )
    codebooks = pq_codebooks(
        embeddings, m, n_codes, iterations, vec_col, id_col, dim=dim,
        sample_hex=sample_hex,
    )
    sub = dim // m
    # hoist the per-side norms OUT of the per-pair score (the
    # brute_force_topk __nv/__nq pattern): cosine(qv, rv) recomputed
    # norm(rv) and norm(qv) once per (query, neighbor) PAIR although each
    # is constant per row/query — at Q queries that is 2/3 of the pair
    # arithmetic for the same values (norms hoisted as attributes, same
    # multiply order, bit-identical scores). rv is pinned in its own
    # projection first so the norm reads the attribute, not a second
    # reconstruct pass.
    recon = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        pq_reconstruct_expr(F.col(vec_col), codebooks, sub).alias("rv"),
    ).select("neighbor_id", "rv", norm(F.col("rv")).alias("__nv"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        norm(F.col(query_vec_col)).alias("__nq"),
    )
    denom = F.col("__nq") * F.col("__nv")
    scored = recon.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.when(denom > 0, dot(F.col("qv"), F.col("rv")) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    return topk_per_query(scored, k)


def pq_rerank_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank_factor: int = 4,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    iterations: int = PQ_ITERATIONS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    sample_hex: str | None = None,
) -> DataFrame:
    """Two-stage retrieval: PQ asymmetric-distance coarse search keeps the
    top k*rerank_factor candidates per query, then ONLY those rows are
    re-scored with exact cosine and re-ranked to the final top-k — the
    standard ANN serving shape (coarse quantized scan over everything,
    exact math over a few dozen rows).

    Scale: the candidate set is O(|queries| * k * factor) — broadcast it
    onto the embedding table so fetching exact vectors is a broadcast semi
    join, not a shuffle of the base corpus; everything after runs on the
    candidate cardinality.
    """
    coarse = pq_topk(
        embeddings,
        queries,
        k=k * rerank_factor,
        m=m,
        n_codes=n_codes,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        sample_hex=sample_hex,
    ).select("query_id", "neighbor_id")
    exact = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__nv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        norm(F.col(query_vec_col)).alias("__nq"),
    )
    denom = F.col("__nq") * F.col("__nv")
    scored = (
        exact.join(F.broadcast(coarse), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.when(denom > 0, dot(F.col("__qv"), F.col("__v")) / denom)
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )
    return topk_per_query(scored, k)


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    pq_iterations: int = PQ_ITERATIONS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    sample_hex: str | None = None,
) -> DataFrame:
    """IVF-PQ: the canonical billion-vector serving composition — IVF
    partition pruning picks WHICH rows to score (n_probe nearest centroid
    partitions per query), PQ asymmetric distance decides HOW to score them
    (exact query against each row's quantized reconstruction).

    At scale the table is written partitioned by cluster storing only the m
    code ints per row: a query reads n_probe/n_clusters of the partitions
    and m bytes-ish per row — both reductions compose multiplicatively,
    which is what makes exhaustive-within-probe scoring of billions of
    vectors serveable. Both trainings (coarse centroids, per-subspace
    codebooks) honor ``sample_hex`` hash-sampling; each is a few KB
    broadcast back as plan literals.
    """
    dim = _probe_dim(embeddings, vec_col)
    if dim is None:
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        nid_t = embeddings.schema[id_col].dataType.simpleString()
        return embeddings.sparkSession.createDataFrame(
            [], f"query_id {qid_t}, neighbor_id {nid_t}, score double, rank int"
        )
    # The two trainings are INDEPENDENT (PQ quantizes raw sub-vectors, not
    # residuals), but each is a driver-coordinated loop of small sequential
    # jobs that leaves most executor cores idle — so overlap them from two
    # driver threads and let the scheduler back-fill (Spark runs concurrent
    # jobs from one application; FIFO scheduling gives exactly the
    # fill-the-tail behaviour wanted here). Each training's result is a pure
    # function of its own inputs, so outputs are bit-identical to the
    # sequential order.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _cent_f = _pool.submit(
            kmeans_centroids,
            embeddings,
            n_clusters,
            vec_col=vec_col,
            id_col=id_col,
            sample_hex=sample_hex,
        )
        _books_f = _pool.submit(
            pq_codebooks,
            embeddings,
            m,
            n_codes,
            pq_iterations,
            vec_col,
            id_col,
            dim=dim,
            sample_hex=sample_hex,
        )
        centroids = _cent_f.result()
        codebooks = _books_f.result()
    sub = dim // m
    base = (
        assign_clusters(embeddings, [c for _, c in centroids], vec_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            pq_reconstruct_expr(F.col(vec_col), codebooks, sub).alias("rv"),
            "cluster",
        )
        # second projection so the norm reads the rv ATTRIBUTE (pq_topk
        # rationale): hoisted once per row instead of per (query, row) pair
        .select("neighbor_id", "rv", F.sqrt(dot(F.col("rv"), F.col("rv"))).alias("__nv"), "cluster")
    )
    cent_df = queries.sparkSession.createDataFrame(
        list(centroids), schema="cluster int, centroid array<double>"
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("query_vec")
    )
    qc = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with(
                F.col("query_vec"),
                F.col("centroid"),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("cluster").asc())
    probes = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select(
            "query_id",
            "query_vec",
            norm(F.col("query_vec")).alias("__nq"),
            "cluster",
        )
    )
    denom = F.col("__nq") * F.col("__nv")
    scored = base.join(F.broadcast(probes), "cluster").select(
        "query_id",
        "neighbor_id",
        F.when(denom > 0, dot(F.col("query_vec"), F.col("rv")) / denom)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    return topk_per_query(scored, k)


def pq_topk_adc(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    iterations: int = PQ_ITERATIONS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    sample_hex: str | None = None,
) -> DataFrame:
    """PQ top-k via ADC lookup tables (asymmetric distance computation, the
    FAISS serving shape): per query, precompute the m x k table of
    query-subvector . codebook-centroid dots on the driver (a few hundred
    floats); each base row is then scored by m array LOOKUPS on its code
    word — no per-row vector math at all. cosine(q, recon) decomposes
    exactly: dot(q, recon) = sum_s dot(q_s, c_s) and |recon|^2 =
    sum_s |c_s|^2, so the scan reads m small ints per row and does m+m
    element_at calls per row per query.

    This is the plan pq_topk converges to at scale: same codebooks, same
    ranking semantics, but the reconstruction dot product moves out of the
    per-row loop into the per-query table. Table entries, centroid
    norms-squared, and the query norm round to 6 dp (mirrored in the
    oracle) so the per-subspace summation order is the only order either
    engine uses. Queries are collected driver-side — the established
    small-side pattern (cf. brute_force_topk_vectorized).
    """
    dim = _probe_dim(embeddings, vec_col)
    if dim is None:
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        nid_t = embeddings.schema[id_col].dataType.simpleString()
        return embeddings.sparkSession.createDataFrame(
            [], f"query_id {qid_t}, neighbor_id {nid_t}, score double, rank int"
        )
    codebooks = pq_codebooks(
        embeddings, m, n_codes, iterations, vec_col, id_col, dim=dim,
        sample_hex=sample_hex,
    )
    sub = dim // m
    codes = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        *[
            nearest_centroid_expr(F.slice(F.col(vec_col), s * sub + 1, sub), codebooks[s])
            .alias(f"code{s}")
            for s in range(m)
        ],
    )
    # |c_s|^2 per (subspace, code): query-independent, k*m floats
    n2 = [
        [round(sum(v * v for v in cent), 6) for cent in codebooks[s]]
        for s in range(m)
    ]
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    if not q_rows:
        qid_t = queries.schema[query_id_col].dataType.simpleString()
        nid_t = embeddings.schema[id_col].dataType.simpleString()
        return embeddings.sparkSession.createDataFrame(
            [], f"query_id {qid_t}, neighbor_id {nid_t}, score double, rank int"
        )
    qtab_rows = []
    for r in q_rows:
        qv = [float(x) for x in r[query_vec_col]]
        if len(qv) != dim:
            raise ValueError(f"query dim {len(qv)} != base dim {dim}")
        tables = [
            [
                round(
                    sum(
                        a * b
                        for a, b in zip(qv[s * sub : (s + 1) * sub], cent)
                    ),
                    6,
                )
                for cent in codebooks[s]
            ]
            for s in range(m)
        ]
        qnorm = round(math.sqrt(sum(x * x for x in qv)), 6)
        qtab_rows.append((r[query_id_col], qnorm, tables, n2))
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    qtab = embeddings.sparkSession.createDataFrame(
        qtab_rows,
        schema=(
            f"query_id {qid_t}, qnorm double, "
            "t array<array<double>>, n2 array<array<double>>"
        ),
    )
    dotsum = None
    rn2 = None
    for s in range(m):
        d = F.element_at(F.element_at(F.col("t"), s + 1), F.col(f"code{s}").cast("int") + 1)
        n = F.element_at(F.element_at(F.col("n2"), s + 1), F.col(f"code{s}").cast("int") + 1)
        dotsum = d if dotsum is None else dotsum + d
        rn2 = n if rn2 is None else rn2 + n
    denom = F.col("qnorm") * F.sqrt(rn2)
    scored = codes.crossJoin(F.broadcast(qtab)).select(
        "query_id",
        "neighbor_id",
        F.when(denom > 0, dotsum / denom).otherwise(F.lit(0.0)).alias("score"),
    )
    return topk_per_query(scored, k)


# ---------------------------------------------------------------------------
# Binary (sign) quantization + Hamming search — the cheapest serving tier:
# 1 bit per dimension. A 64-dim float vector (256 B) becomes two 32-bit sign
# words (16 B as longs), and distance is bit_count(xor) — pure integer codegen,
# no floating point at all on the scan side. This is the "binary quantization"
# mode modern vector stores ship for the first-pass candidate cut.
# ---------------------------------------------------------------------------

BQ_WORD_BITS = 32  # 32 bits per word keeps every shifted literal far from
# the signed-64 boundary on both engines (bit 63 of a 64-bit pack would
# overflow DuckDB's signed BIGINT literal arithmetic).


def sign_code_word(vec, lo: int, bits: int = BQ_WORD_BITS):
    """One sign word: bit j set iff vec[lo + j] >= 0.

    Built as a base-2 string parse: reverse the 32-dim slice (MSB-first),
    map each element to '1'/'0', conv(_, 2, 10). Three higher-order-function
    calls per word instead of an unrolled 32-term when-sum — the unrolled
    form generated a codegen method so large the first invocation paid ~3 s
    of JIT compile and the steady state ran 1.7x slower (measured at sf0.1);
    both forms produce identical words (equivalence-tested).
    """
    bitstr = F.concat_ws(
        "",
        F.transform(
            F.reverse(F.slice(vec, lo + 1, bits)),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )
    return F.conv(bitstr, 2, 10).cast("long")


def sign_codes(
    df: DataFrame, id_col: str, vec_col: str, dim: int, out_id: str = "vec_id"
) -> DataFrame:
    """(id, w0..w{n-1}) sign-quantized codes, one long per 32 dims."""
    n_words = (dim + BQ_WORD_BITS - 1) // BQ_WORD_BITS
    return df.select(
        F.col(id_col).alias(out_id),
        *[
            sign_code_word(F.col(vec_col), w * BQ_WORD_BITS).alias(f"w{w}")
            for w in range(n_words)
        ],
    )


def hamming_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Top-k by Hamming distance between sign codes.

    Both sides are quantized to sign words; the (small) query side is
    broadcast; the corpus scan emits only (query_id, neighbor_id, hamming)
    integer triples and the tail is the shared two-phase topk_per_query —
    no per-query key ever sees the full corpus. At 100 TB the scan side is
    16 B/vector instead of 256 B and the distance kernel is two XOR+POPCNT
    per pair, which is why this tier exists.

    Output: (query_id, neighbor_id, hamming, rank), rank 1..k per query by
    (hamming asc, neighbor_id asc) — deterministic, engine-independent.
    """
    dim = _probe_dim(embeddings, vec_col) or LSH_DIM
    n_words = (dim + BQ_WORD_BITS - 1) // BQ_WORD_BITS
    base = sign_codes(embeddings, id_col, vec_col, dim, out_id="neighbor_id")
    q = sign_codes(queries, query_id_col, query_vec_col, dim, out_id="query_id")
    q = q.select("query_id", *[F.col(f"w{w}").alias(f"qw{w}") for w in range(n_words)])
    ham = None
    for w in range(n_words):
        term = F.bit_count(F.col(f"w{w}").bitwiseXOR(F.col(f"qw{w}")))
        ham = term if ham is None else ham + term
    scored = base.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", (-ham).cast("double").alias("score")
    )
    out = topk_per_query(scored, k)
    return out.select(
        "query_id",
        "neighbor_id",
        (-F.col("score")).cast("bigint").alias("hamming"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def hamming_rerank_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Binary-coarse + exact-rerank: the standard serving pattern for sign
    quantization (the pq_rerank_topk shape, with Hamming as the coarse
    metric). Phase 1 cuts the corpus to k*factor candidates per query on
    XOR+POPCNT over 16 B/vector codes; phase 2 fetches ONLY those
    candidates' full vectors (broadcast semi-join of the candidate-id set
    against the corpus — k*factor*n_queries ids) and ranks them by exact
    cosine. The full-precision column is read for a vanishing fraction of
    the corpus; everything else happens on the bit codes.

    Output: (query_id, neighbor_id, score, rank) — exact cosine over the
    binary candidate set, rank 1..k by (score desc, neighbor_id asc).
    """
    coarse = hamming_topk(
        embeddings,
        queries,
        k=k * factor,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).select("query_id", "neighbor_id")
    cand_ids = coarse.select("neighbor_id").distinct()
    vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__nv"),
    ).join(F.broadcast(cand_ids), "neighbor_id")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        norm(F.col(query_vec_col)).alias("__nq"),
    )
    denom = F.col("__nq") * F.col("__nv")
    score = F.when(denom > 0, dot(F.col("__qv"), F.col("__v")) / denom).otherwise(
        F.lit(0.0)
    )
    scored = (
        coarse.join(vecs, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    return topk_per_query(scored, k)


def ivf_nprobe_sweep(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    nprobe_options: tuple[int, ...] = (1, 2, 4, 8),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    sample_hex: str | None = None,
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """IVF nprobe/recall tuning sweep: mean recall@k vs the exact brute-force
    top-k for each probe count, all from ONE training run — the ANN-family
    twin of dedup.lsh_band_sweep.

    The operational question before serving an IVF index at 100 TB is where
    to sit on the recall/scan-fraction curve: each probe reads another
    1/n_clusters of the corpus. This sweep trains the centroids once,
    assigns the base set once (persisted), ranks each query's centroid
    preference once (keeping the rank), computes the exact top-k once, and
    then evaluates every ``nprobe`` as a filter over the SAME probe
    ranking — so the per-config cost is one cluster-pruned scoring join,
    never a retrain. One row per configuration: (nprobe, n_queries,
    mean_recall, scan_frac); zero rows when there are no queries (the
    grouped-constant empty-input contract). mean_recall is an exact
    integer ratio (sum of hits / (n_queries * k)) rounded once, so the
    oracle replays it bit-for-bit.

    The probed-query frame (query rows replicated once per probed cluster,
    <= n_queries * max(nprobe)) is broadcast to prune the base-side join —
    right for serving-sized query sets, unbounded if a caller passes a
    corpus-sized query table (VERDICT r7 nit 1). ``max_broadcast_queries``
    bounds it: when n_queries * max(nprobe) exceeds the cap, the per-config
    scoring joins fall back to a shuffled equi-join on ``cluster`` — same
    rows, no executor-memory cliff from an oversized broadcast. The count
    is one column-pruned job over the query frame the sweep scans anyway.
    """
    for p in nprobe_options:
        if not 1 <= p <= n_clusters:
            raise ValueError(f"nprobe {p} outside [1, {n_clusters}]")
    from pyspark.storagelevel import StorageLevel

    centroids = kmeans_centroids(
        embeddings, n_clusters, vec_col=vec_col, id_col=id_col, sample_hex=sample_hex
    )
    base = (
        assign_clusters(embeddings, [c for _, c in centroids], vec_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("vec"),
            norm(F.col(vec_col)).alias("__nv"),
            "cluster",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bf = brute_force_topk(
        embeddings,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).select("query_id", "neighbor_id").persist(StorageLevel.MEMORY_AND_DISK)
    cent_df = queries.sparkSession.createDataFrame(
        [(ci, c) for ci, c in centroids], schema="cluster int, centroid array<double>"
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("query_vec")
    )
    qc = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with(
                F.col("query_vec"),
                F.col("centroid"),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("cluster").asc()
    )
    ranked_probes = qc.withColumn("pr", F.row_number().over(wq)).select(
        "query_id",
        "query_vec",
        norm(F.col("query_vec")).alias("__nq"),
        "cluster",
        "pr",
    )
    n_q = q.count()
    broadcastable = n_q * max(nprobe_options) <= max_broadcast_queries
    per_config = []
    for p in sorted(nprobe_options):
        probes = ranked_probes.filter(F.col("pr") <= p).drop("pr")
        if broadcastable:
            probes = F.broadcast(probes)
        denom = F.col("__nq") * F.col("__nv")
        scored = base.join(probes, "cluster").select(
            "query_id",
            "neighbor_id",
            F.when(denom > 0, dot(F.col("query_vec"), F.col("vec")) / denom)
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id").asc()
        )
        ivf = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", F.col("neighbor_id").alias("i_nid")
            )
        )
        hits = (
            bf.join(
                ivf.withColumnRenamed("query_id", "i_qid"),
                (F.col("query_id") == F.col("i_qid"))
                & (F.col("neighbor_id") == F.col("i_nid")),
                "left",
            )
            .groupBy("query_id")
            .agg(F.count("i_nid").alias("hits"))
        )
        per_config.append(
            hits.groupBy(F.lit(p).cast("bigint").alias("nprobe")).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_queries"),
                # exact-integer rounding (queries.exact_ratio discipline):
                # sum(hits) and n_queries*k are both exact BIGINTs, and the
                # quotient lands on 5e-5 boundaries where round-on-double
                # diverges cross-engine
                F.expr(
                    "CAST((2 * sum(hits) * 10000 + count(1) * "
                    f"{k}) DIV (2 * count(1) * {k}) AS DOUBLE) / 10000.0"
                ).alias("mean_recall"),
            ).withColumn(
                "scan_frac", F.lit(round(p / n_clusters, 4))
            )
        )
    from functools import reduce

    return reduce(DataFrame.unionByName, per_config)


def power_iteration_top_component(
    embeddings: DataFrame,
    iterations: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of the (mean-centered) embedding matrix via
    distributed power iteration — PCA's 100 TB form: each iteration is ONE
    map-side-combined aggregate pass (v_{t+1} ∝ Xᵀ(Xv_t), where Xv_t is a
    per-row dot product and Xᵀs is 64 partial sums), never materializing
    the covariance matrix or shuffling anything wider than 64 doubles.

    Determinism discipline (the kmeans_centroids recipe): the per-dim mean,
    every per-dim sum, and the normalized iterate are rounded to 6 dp
    IN SPARK (HALF_UP, matching DuckDB's round) before the driver feeds
    them back as literals, so the DuckDB oracle replays the identical
    iteration chain; fold orders are fixed (element order 1..dim). The
    all-equal corpus (zero centered variance) yields all-zero loadings and
    explained_ratio 0.0 instead of dividing by zero; an empty corpus yields
    an empty frame.

    Returns (dim BIGINT 1-based, loading DOUBLE, explained_ratio DOUBLE) —
    explained_ratio = Σ(x·v)² / Σ‖x‖² over centered rows, the fraction of
    variance the component captures (n-free, so both engines compute it
    from two rounded sums).
    """
    from pyspark.storagelevel import StorageLevel

    x = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    base = embeddings.select(x.alias("x"))
    # one job answers both "is it empty" and the per-dim means. The wide
    # per-dim expressions are built as ONE SQL string each: the column-API
    # form costs ~2 py4j round trips per dimension per build (~0.4 s/job at
    # dim 64), the parsed form one call total — identical expression trees,
    # identical results (see arr_lit).
    mu_row = base.agg(
        F.expr("count(1)").alias("n"),
        F.expr(
            "array("
            + ",".join(f"round(avg(element_at(x,{i + 1})),6)" for i in range(dim))
            + ")"
        ).alias("ms"),
    ).collect()[0]
    if mu_row["n"] == 0:
        return embeddings.sparkSession.createDataFrame(
            [], "dim bigint, loading double, explained_ratio double"
        )
    mu = list(mu_row["ms"])
    # avg() over an all-NULL dimension returns NULL even with n>0; the old
    # per-element F.lit(None) path silently propagated NULL through every
    # downstream product, arr_lit would raise a bare TypeError. Fail with a
    # diagnosis instead — an all-NULL embedding dimension is a data bug.
    null_dims = [i for i, m in enumerate(mu) if m is None]
    if null_dims:
        raise ValueError(
            "power_iteration_top_component: embedding dimensions "
            f"{null_dims[:8]} are NULL in every row (avg returned NULL); "
            "clean or impute the vector column before PCA"
        )
    mu_lit = arr_lit(mu)
    xc = base.select(
        F.zip_with("x", mu_lit, lambda a, b: a - b).alias("x")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    v = [round(1.0 / 8.0, 6)] * dim  # 0.125 exactly representable
    for _ in range(iterations):
        vlit = arr_lit(v)
        s = F.aggregate(
            F.zip_with("x", vlit, lambda a, b: a * b), F.lit(0.0), lambda acc, e: acc + e
        )
        w_agg = xc.select(s.alias("s"), "x").agg(
            F.expr(
                "array("
                + ",".join(
                    f"round(sum(s * element_at(x,{i + 1})),6)" for i in range(dim)
                )
                + ")"
            ).alias("w")
        )
        # normalization stays Spark-side so rounding semantics (HALF_UP)
        # match the oracle exactly; the driver only transports literals.
        # Same arithmetic as the historical per-column form: nrm =
        # sqrt(sum w_i^2) folded in element order, v_i = round(w_i/nrm, 6),
        # all-zero (or NaN-normed) components -> 0.0.
        v_row = w_agg.selectExpr(
            "sqrt(aggregate(w, 0.0D, (acc, e) -> acc + e * e)) AS nrm", "w"
        ).selectExpr(
            "transform(w, e -> IF(nrm > 0, round(e / nrm, 6), 0.0D)) AS v"
        ).collect()[0]
        v = list(v_row["v"])
    vlit = arr_lit(v)
    s = F.aggregate(
        F.zip_with("x", vlit, lambda a, b: a * b), F.lit(0.0), lambda acc, e: acc + e
    )
    t2 = F.aggregate(
        F.transform("x", lambda e: e * e), F.lit(0.0), lambda acc, e: acc + e
    )
    fin = xc.select(s.alias("s"), t2.alias("t2")).agg(
        F.round(F.sum(F.col("s") * F.col("s")), 6).alias("se"),
        F.round(F.sum("t2"), 6).alias("st"),
    )
    comp = embeddings.sparkSession.createDataFrame(
        [(i + 1, v[i]) for i in range(dim)], "dim bigint, loading double"
    )
    return comp.crossJoin(F.broadcast(fin)).select(
        "dim",
        "loading",
        F.when(F.col("st") > 0, F.round(F.col("se") / F.col("st"), 6))
        .otherwise(F.lit(0.0))
        .alias("explained_ratio"),
    )
