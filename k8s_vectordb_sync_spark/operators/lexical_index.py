"""Persisted BM25 impact index: the lexical-retrieval half of the
build-once / probe-many lifecycle (operators/ann_index.py is the vector
half; /root/reference/README.md:3-9 delegates all query serving to the
downstream store — this is that serving path, Spark-native).

Everything a BM25 score depends on besides the query — tf, dl, avgdl, idf —
is fixed at build time, so the index stores the PRECOMPUTED per-(doc, term)
contribution ("impact", Anh & Moffat's impact-ordered-index idea): a probe
is one pruned scan + a broadcast query-term join + a DECIMAL sum. No
document lengths join, no idf join, no corpus statistics job at query time.

Layout under ``path``:

  postings/ bucket=B/...  (term, doc_id, tf, impact DECIMAL(28,6))
  meta.json               (k1, b, n_buckets, n_docs, avgdl)
  _INDEX_OK               marker written LAST (same torn-build contract as
                          the ANN indexes)

``bucket`` is a deterministic md5 bucket of the term (functions.text.
md5_prefix_long % n_buckets) — the lexical analog of IVF's cluster
partitioning: the prober computes the buckets of its (serving-sized) query
term set driver-side and scans ONLY those partitions. A stopword-heavy
query degrades to more buckets, never to a different plan. tf is stored
alongside impact so 'more-like-this' query derivation (top-tf terms of a
doc) can also run off the index alone.

Impacts are bit-identical to the inline scorer's summands (shared
retrieval.bm25_impact expression, 6 dp DECIMAL), so a probe returns
exactly what retrieval.bm25_topk returns and the inline oracle covers the
indexed query too.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_prefix_long
from ..sources.staging import recover_staged_swap, staged_partition_rewrite
from . import retrieval as ret
from .ann_index import (
    MARKER,
    _active_dir,
    _guard_not_versioned,
    _read_artifact_rows,
    _rebuild_into_version,
    index_is_built,
)
from .similarity import topk_per_query

N_BUCKETS = 32


def _bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of md5_prefix_long(term) % n_buckets."""
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_buckets


def build_bm25_index(
    documents: DataFrame,
    path: str,
    k1: float = ret.BM25_K1,
    b: float = ret.BM25_B,
    n_buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Tokenize, aggregate, and persist the impact index. One corpus scan
    feeds the posting frame; lengths/stats/idf derive from it (vocab-sized
    or 1-row); the impact projection + bucketed write is the only
    corpus-sized output. Marker removed first, written last."""
    _guard_not_versioned(path, "build_bm25_index")
    spark = documents.sparkSession
    marker = os.path.join(path, MARKER)
    if os.path.exists(marker):
        os.remove(marker)
    import shutil

    shutil.rmtree(os.path.join(path, "postings"), ignore_errors=True)

    if documents.isEmpty():
        # empty corpus -> valid empty index (mirrors ann_index): probes
        # answer "no results", adds require a rebuild. A partitioned write
        # of zero rows would leave no schema-bearing files, so no postings
        # table is written at all — the meta flag short-circuits readers.
        meta = {
            "k1": k1, "b": b, "n_buckets": n_buckets,
            "n_docs": 0, "avgdl": 0.0, "docs_added_since_build": 0,
            "empty": True,
        }
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        with open(marker, "w") as fh:
            fh.write("ok\n")
        return meta

    postings = ret.build_postings(documents, text_col, id_col)
    try:
        lengths = ret.doc_lengths(postings)
        stats = ret.corpus_stats(lengths)
        idf = ret.idf_table(postings, stats)
        rows = (
            postings.join(F.broadcast(idf.select("term", "idf")), "term")
            .join(lengths, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select(
                "term",
                "doc_id",
                "tf",
                ret.bm25_impact(k1, b).alias("impact"),
                (md5_prefix_long(F.col("term")) % n_buckets)
                .cast("int")
                .alias("bucket"),
            )
        )
        rows.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "postings")
        )
        srow = stats.collect()[0]
        meta = {
            "k1": k1, "b": b, "n_buckets": n_buckets,
            "n_docs": int(srow["n_docs"]), "avgdl": float(srow["avgdl"]),
            # staleness ledger: adds bump this; needs_rebuild() compares it
            # to n_docs so the idf/avgdl drift bound (O(added/corpus)) is a
            # monitored quantity, not a hope.
            "docs_added_since_build": 0,
        }
    finally:
        postings.unpersist()
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return meta


def load_bm25_meta(path: str) -> dict:
    path = _active_dir(path)
    if not index_is_built(path):
        raise FileNotFoundError(f"no complete BM25 index at {path} (missing {MARKER})")
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def bm25_index_probe(
    spark: SparkSession,
    path: str,
    query_terms: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k BM25 from the persisted impacts: collect the (serving-sized)
    distinct query terms, prune the postings scan to their md5 buckets, one
    broadcast join, one DECIMAL-sum aggregate, two-phase top-k. The corpus
    text is never read and no statistics job runs.

    Resolved to ONE immutable version up front (ann_index._active_dir):
    meta and the postings scan always come from the same generation, so a
    zero-downtime rebuild flipping the pointer mid-probe never mixes."""
    path = _active_dir(path)
    meta = load_bm25_meta(path)
    if meta.get("empty"):
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, score double, rank int"
        )
    terms = [r["term"] for r in query_terms.select("term").distinct().collect()]
    buckets = sorted({_bucket_py(t, meta["n_buckets"]) for t in terms})
    base = spark.read.parquet(os.path.join(path, "postings")).filter(
        F.col("bucket").isin(buckets)
    )
    scored = (
        base.join(F.broadcast(query_terms), "term")
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.sum("impact").cast("double").alias("score"))
    )
    return topk_per_query(scored, k)


def derive_query_terms_from_index(
    spark: SparkSession,
    path: str,
    n_queries: int,
    terms_per_query: int,
) -> DataFrame:
    """'More-like-this' query derivation off the index alone: top-tf terms
    of each query doc, read from the stored postings (tf travels with
    impact for exactly this). Semantics identical to
    retrieval.derive_query_terms over the inline posting frame."""
    path = _active_dir(path)
    meta = load_bm25_meta(path)  # marker check
    if meta.get("empty"):
        return spark.createDataFrame([], "query_id bigint, term string")
    base = spark.read.parquet(os.path.join(path, "postings")).select(
        "doc_id", "term", "tf"
    )
    return ret.derive_query_terms(base, n_queries, terms_per_query)


def bm25_index_add(
    documents: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Append newly-arrived documents to a built impact index WITHOUT a
    full rebuild: the delta's postings are scored with df re-derived from
    the CURRENT stored postings but N (n_docs) and avgdl frozen at build
    time; terms the index has never seen score with the df=0 idf.

    This is the standard serving compromise (every production engine
    serves stale statistics between refreshes): impacts of OLD documents
    are untouched, impacts of NEW documents drift from a full rebuild by
    O(delta_corpus / corpus) in idf/avgdl — bounded and shrinking per
    rebuild — and a periodic `build_bm25_index` re-trues everything,
    exactly like the IVF retrain cadence. The add itself scans ONLY the
    delta (plus one term-df pass over stored postings, no text).

    Adds are IDEMPOTENT: doc_ids already present in the stored postings are
    anti-joined away before scoring (re-adding would duplicate postings and
    inflate df), so CDC replay / at-least-once upstreams are safe.

    Returns {"added_docs": n, "skipped_existing": m} and bumps the meta
    staleness counter ``docs_added_since_build`` (see needs_rebuild).
    Probe-visible immediately (append to the bucketed postings; the marker
    never moves, so concurrent probes see a complete file set either
    way)."""
    import math

    path = _active_dir(path)
    meta = load_bm25_meta(path)
    if meta.get("empty"):
        raise ValueError(
            f"index at {path} was built over an empty corpus (no build-time "
            "statistics to score against); rebuild with data"
        )
    n_docs, avgdl = meta["n_docs"], meta["avgdl"]
    k1, b, n_buckets = meta["k1"], meta["b"], meta["n_buckets"]
    spark = documents.sparkSession

    requested = documents.select(id_col).distinct().count()
    postings = ret.doc_term_freqs(documents, text_col, id_col)
    # duplicate-add guard: drop docs the index already holds (column-pruned
    # id scan of the stored postings; df pass below reads them anyway)
    stored = spark.read.parquet(os.path.join(path, "postings"))
    postings = postings.join(
        stored.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    lengths = ret.doc_lengths(postings)
    # build-time idf for the delta's terms: df from the STORED postings
    df_tbl = stored.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_tbl.select(
        "term",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
            6,
        ).alias("idf"),
    )
    unseen_idf = round(math.log(1.0 + (n_docs + 0.5) / 0.5), 6)
    added = postings.agg(F.countDistinct("doc_id")).collect()[0][0]
    rows = (
        postings.join(F.broadcast(idf), "term", "left")
        .withColumn("idf", F.coalesce(F.col("idf"), F.lit(unseen_idf)))
        .join(lengths, "doc_id")
        .withColumn("avgdl", F.lit(float(avgdl)))
        .select(
            "term",
            "doc_id",
            "tf",
            ret.bm25_impact(k1, b).alias("impact"),
            (md5_prefix_long(F.col("term")) % n_buckets).cast("int").alias("bucket"),
        )
    )
    rows.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(path, "postings")
    )
    added = int(added)
    meta["docs_added_since_build"] = meta.get("docs_added_since_build", 0) + added
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return {"added_docs": added, "skipped_existing": int(requested) - added}


# Default drift bound: rebuild once adds exceed 10% of the built corpus —
# at that point the frozen idf/avgdl can be off by ~10% for new docs.
REBUILD_THRESHOLD = 0.10


def needs_rebuild(path: str, threshold: float = REBUILD_THRESHOLD) -> bool:
    """True when docs added since the last full build exceed ``threshold``
    × the built corpus size — the point where the frozen-statistics drift
    bound (O(added/corpus) in idf/avgdl, lexical_index.bm25_index_add
    docstring) stops being negligible and a `build_bm25_index` re-true is
    due. The analog of the IVF retrain cadence, but counter-driven instead
    of wall-clock-driven."""
    meta = load_bm25_meta(path)
    n_docs = max(int(meta.get("n_docs", 0)), 1)
    return meta.get("docs_added_since_build", 0) > threshold * n_docs


def index_status(path: str, threshold: float = REBUILD_THRESHOLD) -> dict:
    """Staleness report for the `index status` CLI: built-corpus size, adds
    since build, drift ratio, and the rebuild verdict."""
    meta = load_bm25_meta(path)
    n_docs = int(meta.get("n_docs", 0))
    added = int(meta.get("docs_added_since_build", 0))
    return {
        "kind": "bm25",
        "n_docs": n_docs,
        "docs_added_since_build": added,
        "drift_ratio": added / max(n_docs, 1),
        "threshold": threshold,
        "needs_rebuild": needs_rebuild(path, threshold),
    }


def bm25_index_remove(spark: SparkSession, path: str, doc_ids: DataFrame) -> dict:
    """Drop documents from the impact index: one scan finds the term
    buckets holding the docs' postings, only those bucket partitions are
    anti-join-rewritten (dynamic overwrite; emptied buckets cleared). Like
    bm25_index_add, corpus statistics stay at build-time values until the
    next rebuild — removed docs stop being SERVED immediately (the
    compliance requirement), idf drift re-trues at the rebuild cadence."""
    path = _active_dir(path)
    meta = load_bm25_meta(path)
    id_list = doc_ids.selectExpr("doc_id").distinct()
    requested = id_list.count()
    if meta.get("empty"):
        return {"requested": requested, "rows_removed": 0, "buckets_touched": 0}
    postings_path = os.path.join(path, "postings")
    # self-heal an interrupted prior swap before building the read plan
    recover_staged_swap(postings_path)
    postings = spark.read.parquet(postings_path)
    hit = postings.join(F.broadcast(id_list), "doc_id", "left_semi")
    touched = sorted(r["bucket"] for r in hit.select("bucket").distinct().collect())
    if not touched:
        return {"requested": requested, "rows_removed": 0, "buckets_touched": 0}
    sub = postings.filter(F.col("bucket").isin(touched))
    before = sub.count()
    kept = sub.join(F.broadcast(id_list), "doc_id", "left_anti")
    # crash-safe staged rewrite (round 7): the anti-join is written to a
    # hidden staging dir with full lineage, then rename-swapped per bucket —
    # a failure before the swap leaves the index byte-identical (the
    # localCheckpoint + in-place dynamic overwrite it replaces could lose
    # committed buckets on executor failure)
    after = staged_partition_rewrite(kept, postings_path, "bucket", touched)
    return {
        "requested": requested,
        "rows_removed": int(before - after),
        "buckets_touched": len(touched),
    }


def bm25_index_rebuild(
    documents: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **overrides,
) -> dict:
    """Zero-downtime re-true of the impact index (the consumer of
    needs_rebuild): full rebuild over the CURRENT corpus into a fresh
    version dir — re-deriving n_docs/avgdl/idf so the frozen-statistics
    drift accumulated by adds goes back to zero — published by the atomic
    ``_CURRENT`` pointer flip (ann_index._rebuild_into_version). Probes keep
    serving the old generation until the flip and never see a mix. Build
    parameters (k1/b/n_buckets) default to the active generation's meta."""
    meta = load_bm25_meta(path)
    params = dict(
        k1=meta.get("k1", ret.BM25_K1),
        b=meta.get("b", ret.BM25_B),
        n_buckets=meta.get("n_buckets", N_BUCKETS),
    )
    params.update(overrides)
    return _rebuild_into_version(
        path,
        lambda d: build_bm25_index(
            documents, d, text_col=text_col, id_col=id_col, **params
        ),
    )
