"""Document chunking and sequence packing for training-data preparation.

Two operators an LLM-pretraining pipeline runs on every document after
cleaning/dedup (SURVEY §7 extension surface; no reference analog — the
reference's unit of work is a whole resource, ours must also feed
fixed-context-window training):

- ``chunk_documents``: split each document into overlapping fixed-size token
  windows (the shape embedding indexers and context-window packers consume).
  Pure map-side: tokenize once per row, explode a ``sequence`` of chunk
  starts, ``slice`` the token array — no shuffle, no UDF, all inside
  whole-stage codegen. At 100 TB this is embarrassingly parallel; the explode
  multiplies rows ~n_tokens/stride× but never crosses partitions.

- ``pack_sequences``: contiguous greedy packing of documents into
  fixed-token-budget training sequences ("bins"). Documents are processed in
  ``id`` order within a (source, shard) stripe; a document goes into bin
  ``floor(exclusive_prefix_token_sum / capacity)``. This is the deterministic,
  order-preserving variant of first-fit packing (a bin may overrun by at most
  one document — standard for pretraining packers that split the straddling
  document at the boundary). The running sum is a window over
  (source, shard), NOT a global window: sharding by ``doc_id % n_shards``
  bounds every window partition to ~1/n_shards of a source, so at scale no
  single task owns a whole source's cumsum. Raising n_shards trades packing
  locality for parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T

DEFAULT_CHUNK_SIZE = 64
DEFAULT_OVERLAP = 16
DEFAULT_PACK_CAPACITY = 256
DEFAULT_PACK_SHARDS = 8


def chunk_documents(
    documents: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunks of each document.

    Chunk starts are 0, stride, 2*stride, ... with stride = chunk_size -
    overlap; the last chunk starts at the smallest multiple of stride that
    reaches the end of the document (so every token is covered and a short
    tail is merged into the preceding window's overlap rather than emitted
    as a tiny fragment). Empty documents produce no chunks.

    Returns (id, chunk_id, n_tokens, chunk_text).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    base = documents.select(
        F.col(id_col), T.tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)
    n = F.size("__toks")
    # number of strides needed so the final window [last_start, last_start +
    # chunk_size) covers token n-1: ceil((n - chunk_size) / stride), floored
    # at 0 for docs shorter than one chunk.
    last_start = (
        F.greatest(F.ceil((n - F.lit(chunk_size)) / F.lit(stride)), F.lit(0)).cast(
            "int"
        )
        * stride
    )
    exploded = base.select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0), last_start, F.lit(stride))).alias("__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size)
    return exploded.select(
        id_col,
        (F.col("__start") / stride).cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_sequences(
    documents: DataFrame,
    capacity: int = DEFAULT_PACK_CAPACITY,
    n_shards: int = DEFAULT_PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins, then summarize
    each bin (doc count, token total, id range).

    Returns (stratum, shard, bin_id, n_docs, n_tokens, first_doc, last_doc).
    """
    ntok = T.token_count_ws(F.col(text_col)).cast("bigint")
    base = documents.select(
        F.col(stratum_col).alias("stratum"),
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        F.col(id_col).alias("__id"),
        ntok.alias("__ntok"),
    )
    w = (
        Window.partitionBy("stratum", "shard")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("__ntok").over(w), F.lit(0))
    binned = base.withColumn(
        "bin_id", F.floor(cum_excl / F.lit(capacity)).cast("bigint")
    )
    return binned.groupBy("stratum", "shard", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__ntok").cast("bigint").alias("n_tokens"),
        F.min("__id").cast("bigint").alias("first_doc"),
        F.max("__id").cast("bigint").alias("last_doc"),
    )
