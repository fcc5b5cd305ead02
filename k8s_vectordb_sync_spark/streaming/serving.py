"""Streaming ANN serving: a stream of query vectors probing a PERSISTED
index (operators/ann_index.py) — the topology a deployed vector-sync system
actually runs. The reference ships changes TO a vector store and delegates
query serving to it (README.md:3-9); this module is that serving half,
Spark-native.

Shape: queries arrive as a (micro-batched) stream; the index is the static
side. Each micro-batch probes via the SAME batch probe functions the CLI and
the `_indexed` queries use (`ivf_pq_probe` / `sign_index_probe`), so a
streamed query returns bit-identical top-k to a batch probe of the same
vector — one code path, no serving/offline skew. foreachBatch is the right
Spark construct here rather than a raw stream-static join: the probe needs
the per-query top-k tail (aggregation over the candidate set), which in a
single declarative streaming plan would force watermark/output-mode
machinery onto a latency path, while the per-micro-batch form keeps each
probe a small bounded batch job against broadcast artifacts (the query side
of a probe is serving-sized by contract — thousands of vectors, not
corpus-sized).

At 100 TB the static side is the cluster-partitioned codes table; partition
pruning limits each micro-batch's scan to the probed clusters, and the
centroid/codebook artifacts are loaded once per executor from a few-KB
parquet, not per batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators import ann_index as ai


def start_ann_probe_stream(
    spark: SparkSession,
    index_path: str,
    query_stream: DataFrame,
    emit: Callable[[DataFrame, int], None],
    k: int = 10,
    n_probe: int = 2,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    tier: str = "ivfpq",
    query_name: str | None = None,
) -> StreamingQuery:
    """Start a standing top-k serving query over a persisted index.

    query_stream: streaming DataFrame with (query_id, query_vec) columns —
    except tier "bm25", whose stream carries (query_id, term) rows (a query
    arrives as its term set, the shape a search frontend emits).
    emit: receives the per-micro-batch top-k frame
          (query_id, neighbor_id, score|distance..., rank) and the batch id.
    tier: "ivfpq" (ADC scoring via ivf_pq_probe), "sign" (Hamming coarse +
          exact rerank via sign_index_probe), or "bm25" (lexical impact
          index, term-bucket-pruned — operators/lexical_index.py).

    The index must be complete (``_INDEX_OK``) before the stream starts —
    probes never observe a torn build (build_* removes the marker first and
    writes it last).
    """
    if tier not in ("ivfpq", "sign", "bm25"):
        raise ValueError(f"unknown serving tier {tier!r}")
    if not ai.index_is_built(index_path):
        raise FileNotFoundError(
            f"no complete index at {index_path}; build it before serving"
        )

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if tier == "ivfpq":
            out = ai.ivf_pq_probe(spark, index_path, batch_df, k=k, n_probe=n_probe)
        elif tier == "bm25":
            from ..operators import lexical_index as lx

            out = lx.bm25_index_probe(spark, index_path, batch_df, k=k)
        else:
            out = ai.sign_index_probe(spark, index_path, batch_df, k=k)
        emit(out, batch_id)

    writer = (
        query_stream.writeStream.outputMode("append")
        .foreachBatch(probe_batch)
        # query names must be unique per session: a serving fleet runs many
        # concurrent standing queries of the same tier (bench_serving_concurrent)
        .queryName(query_name or f"ann-serving-{tier}")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def start_hybrid_probe_stream(
    spark: SparkSession,
    bm25_index_path: str,
    ivfpq_index_path: str,
    query_stream: DataFrame,
    emit: Callable[[DataFrame, int], None],
    k: int = 10,
    pool_k: int = 20,
    n_probe: int = 2,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Standing HYBRID search: each micro-batch of queries probes the BM25
    impact index AND the IVF-PQ index, fused by reciprocal rank — the full
    serving topology of hybrid_search_rrf_indexed as a stream.

    query_stream rows carry both modalities of one query:
    (query_id, query_vec array<float>, terms array<string>). Each batch
    splits into the two probe shapes, runs the SAME batch probes the
    registered query uses, and fuses — so a streamed query returns exactly
    the batch hybrid's top-k (asserted in tests). Both indexes must be
    complete before serving starts.
    """
    from ..operators import lexical_index as lx
    from ..operators import retrieval as ret

    for path, what in ((bm25_index_path, "BM25"), (ivfpq_index_path, "IVF-PQ")):
        if not ai.index_is_built(path):
            raise FileNotFoundError(
                f"no complete {what} index at {path}; build it before serving"
            )

    from pyspark.sql import functions as F

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        qterms = batch_df.select(
            "query_id", F.explode("terms").alias("term")
        )
        lex = lx.bm25_index_probe(spark, bm25_index_path, qterms, k=pool_k)
        vq = batch_df.select("query_id", "query_vec")
        vec = ai.ivf_pq_probe(
            spark, ivfpq_index_path, vq, k=pool_k, n_probe=n_probe
        )
        emit(ret.rrf_fuse(lex, vec, k=k), batch_id)

    writer = (
        query_stream.writeStream.outputMode("append")
        .foreachBatch(probe_batch)
        .queryName("hybrid-serving")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
