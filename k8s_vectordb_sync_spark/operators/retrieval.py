"""Lexical retrieval and hybrid lexical+vector search.

The reference system pairs a change-capture pipeline with a downstream
vector store and leaves keyword search to that store's engine
(/root/reference/README.md:3-9 scopes the sync side only). A training-data
engine at 100 TB needs the lexical half in-engine: BM25 scoring over an
inverted index is the standard retrieval baseline (Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond"), and hybrid
search fuses it with the ANN tiers in operators/similarity.py via
reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09).

Scale shape (the part that matters at 100 TB):

  * The corpus is scanned ONCE into a (doc_id, term, tf) posting frame; the
    groupBy is map-side partial (token occurrences combine to distinct
    (doc, term) pairs before the shuffle).
  * Everything derived from postings is either vocabulary-sized (df, idf —
    low millions of rows at web scale, broadcastable) or a 1-row aggregate
    (N, avgdl — broadcast as a literal frame). The ONLY corpus-sized
    shuffles are the posting groupBy and the per-(query, doc) score
    combine, which is bounded by |queries| x |matching docs|.
  * Query-term sets are tiny by construction and broadcast; scoring is a
    broadcast hash join against postings, never a corpus x corpus product.
  * Top-k uses similarity.topk_per_query's two-phase rank, so no reducer
    key ever receives a query's full candidate set.

Cross-engine determinism (same discipline as operators/lm.py): ln() may
differ by 1 ulp between the JVM and DuckDB's libm and double summation is
order-dependent, so idf and each per-term BM25 contribution are rounded to
6 decimals and the per-document score is summed as DECIMAL(28,6) — exact
and order-independent — then cast back to double. avgdl is computed as
exact-integer SUM(dl)/COUNT, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions import text as T
from . import similarity as sim

BM25_K1 = 1.2
BM25_B = 0.75
RRF_C = 60  # standard reciprocal-rank-fusion constant


def doc_term_freqs(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting frame: one row per (doc_id, term) with its term frequency.

    The explode -> groupBy combines map-side, so the shuffle carries
    distinct (doc, term) pairs, not token occurrences.
    """
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def doc_lengths(postings: DataFrame) -> DataFrame:
    """(doc_id, dl): token count per document, derived from the posting
    frame so the corpus text is not scanned a second time."""
    return postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def corpus_stats(lengths: DataFrame) -> DataFrame:
    """1-row frame (n_docs, avgdl). avgdl is exact-integer sum / count so
    both engines derive the identical double."""
    return lengths.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )


def idf_table(postings: DataFrame, stats: DataFrame) -> DataFrame:
    """(term, df, idf): Lucene-style BM25 idf = ln(1 + (N - df + .5)/(df + .5)),
    rounded to 6 decimals for cross-engine determinism. Vocabulary-sized."""
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        "df",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
            6,
        ).alias("idf"),
    )


def derive_query_terms(
    postings: DataFrame, n_queries: int, terms_per_query: int
) -> DataFrame:
    """Query workload derived from the corpus itself: for each query doc
    (doc_id < n_queries) keep its top-M terms by tf (ties by term asc).
    Deterministic, and representative of 'more like this' retrieval."""
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        postings.filter(F.col("doc_id") < n_queries)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= terms_per_query)
        .select(F.col("doc_id").alias("query_id"), "term")
    )


def bm25_scored(
    postings: DataFrame,
    query_terms: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, neighbor_id, score): BM25 score of every matching document
    against every query's term set, over a PREBUILT posting frame
    (doc_term_freqs output). The posting frame is the reused asset — real
    engines materialize it as the index — so callers build it once,
    persist it, and pass it to every retrieval operator (plain column
    pruning makes the per-branch subtrees non-identical, so Catalyst's
    ReuseExchange cannot dedupe repeated rebuilds on its own).

    query_terms (query_id, term) is broadcast — it is tiny by construction.
    The idf table is vocabulary-sized and also broadcast. The per-document
    combine sums DECIMAL(28,6)-rounded contributions, so the result is
    independent of partitioning and matches the DuckDB oracle bit-for-bit.
    """
    lengths = doc_lengths(postings)
    stats = corpus_stats(lengths)
    idf = idf_table(postings, stats)

    scored_terms = (
        postings.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(idf.select("term", "idf")), "term")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    return (
        scored_terms.select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            bm25_impact(k1, b).alias("__c"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__c").cast("double").alias("score"))
    )


def bm25_impact(k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """The per-(doc, term) BM25 contribution ("impact"), rounded to 6 dp and
    cast DECIMAL(28,6) — the cross-engine-exact summand. Same expression
    tree as the oracle: idf * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    Shared by the inline scorer and the persisted impact index (everything
    it depends on — tf, dl, avgdl, idf — is known at BUILD time, so an
    impact-ordered index can precompute it, Anh & Moffat-style)."""
    contrib = (
        F.col("idf")
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return F.round(contrib, 6).cast("decimal(28,6)")


def bm25_topk(
    postings: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k BM25 matches per query: two-phase rank via topk_per_query, so
    the plan shape survives a corpus 1000x wider."""
    scored = bm25_scored(postings, query_terms)
    return sim.topk_per_query(scored, k)


def build_postings(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    storage_level: StorageLevel | None = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Build-and-pin the posting frame: the single corpus scan every
    retrieval operator shares. Caller owns the cache lifecycle (same
    contract as the dedup miners); pass storage_level=None to skip pinning
    (e.g. when the postings are about to be written out as a table)."""
    postings = doc_term_freqs(documents, text_col, id_col)
    if storage_level is not None:
        postings = postings.persist(storage_level)
    return postings


def inverted_index(
    postings: DataFrame,
    max_postings: int = 100,
) -> DataFrame:
    """(term, df, cf, postings): document frequency, collection frequency,
    and the first `max_postings` doc ids (ascending) per term.

    df/cf aggregate over ALL postings; the materialized posting LIST is
    capped BEFORE collect_list via a windowed rank, so a stopword-like term
    at 100 TB never builds a corpus-sized array on one reducer — real
    engines shard long posting lists; the cap models that truncation
    explicitly rather than OOMing.
    """
    stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("term").orderBy(F.col("doc_id").asc())
    capped = (
        postings.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= max_postings)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return stats.join(capped, "term")


NEARDUP_SHINGLE_DF_MAX = 10  # candidate pairs must share a shingle this rare
NEARDUP_TOPK = 50


def tfidf_weights(postings: DataFrame) -> DataFrame:
    """(doc_id, term, df, w): TF-IDF term weights over the posting frame —
    w = round(tf * idf, 6) with the Lucene-style idf from idf_table (always
    > 0, so every posted term carries weight). The df column rides along for
    the rare-term candidate filter. One broadcast join against the
    vocabulary-sized idf table; no second corpus scan."""
    stats = corpus_stats(doc_lengths(postings))
    idf = idf_table(postings, stats)
    return postings.join(F.broadcast(idf), "term").select(
        "doc_id", "term", "df", F.round(F.col("tf") * F.col("idf"), 6).alias("w")
    )


def tfidf_doc_norms(weights: DataFrame) -> DataFrame:
    """(doc_id, norm_sq): squared TF-IDF vector norm per document, summed as
    6dp-rounded DECIMAL(28,6) terms so the value is exact and
    partition-order-independent on both engines (the bm25_impact
    discipline)."""
    return weights.groupBy("doc_id").agg(
        F.sum(
            F.round(F.col("w") * F.col("w"), 6).cast("decimal(28,6)")
        ).alias("norm_sq")
    )


def neardup_candidates(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_df_max: int = NEARDUP_SHINGLE_DF_MAX,
) -> DataFrame:
    """(doc1, doc2) candidate pairs sharing at least one RARE word 3-shingle
    (2 <= shingle-df <= shingle_df_max). Shingles, not unigrams, are the
    blocking unit: a unigram vocabulary can be tiny (this corpus holds 31
    distinct words, min unigram df 25 — unigram-rarity blocking is vacuous),
    while the shingle space grows combinatorially and near-duplicates share
    rare shingles by construction (Broder's shingling argument). The df cap
    bounds every shingle's contribution at C(df_max, 2) pairs — the same
    blowup bound as the LSH band join; df=1 shingles pair with nothing and
    drop out via the df >= 2 side of the band."""
    # shingles hash to int64 immediately (md5-prefix, engine-exact): every
    # downstream shuffle/join moves 8-byte keys instead of ~20-char strings
    # (the documents_source_overlap span-hash trick); a 60-bit hash over a
    # shingle vocabulary is collision-negligible and IDENTICAL in the
    # oracle, so any collision affects both engines equally.
    # _spread: the shingle build is CPU-bound per row; a local parquet file
    # can arrive as fewer splits than cores (row-group floor), serializing
    # it — at warehouse scale the input is already many splits and the
    # repartition is a no-op (operators/dedup.py convention).
    from .dedup import _spread

    sh = (
        _spread(documents.select(text_col, id_col))
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(T.shingles(F.col(text_col))).alias("s"),
        )
        .select("doc_id", T.md5_prefix_long(F.col("s")).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sdf = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("sdf"))
    # rare is tiny (df-capped: at most df_max rows per surviving shingle) —
    # pin it so the self-join reads the cache instead of re-exploding the
    # corpus on both sides. The band filter joins on the 8-byte hash; at
    # 100 TB the rare-shingle vocabulary is far beyond broadcast size, so
    # this stays a shuffle join by design.
    rare = sh.join(
        sdf.filter(
            (F.col("sdf") >= 2) & (F.col("sdf") <= shingle_df_max)
        ).select("sh"),
        "sh",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # The pair dedup rides ONE exchange pinned at defaultParallelism
    # (REPARTITION_BY_NUM, which AQE never coalesces; hash(doc1, doc2)
    # satisfies the dropDuplicates clustering — the dup_clusters edge-cache
    # pattern). A bare distinct() here let AQE coalesce the exchange by its
    # BYTE size (3.5 MB at sf0.1 -> 3 partitions), but the downstream
    # dot-product stage expands each pair ~26x and is CPU-bound: the whole
    # 11.2M-row expansion + aggregation ran on 3 of 32 cores — 5.4 s of the
    # 8 s warm query in one under-parallel stage (event-log stage profile;
    # §2.5 cost-model blind spot: AQE sizes by bytes, not downstream FLOPs).
    # Cost: the exchange carries raw instead of partially-deduped pairs —
    # +5% rows here (457,936 vs 435,954; pairs rarely share two rare
    # shingles) — and at warehouse scale the pair frame is big enough that
    # AQE never coalesces it anyway, so pinning is a no-op there.
    return (
        rare.alias("a")
        .join(rare.alias("b"), "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .repartition(
            documents.sparkSession.sparkContext.defaultParallelism,
            F.col("doc1"),
            F.col("doc2"),
        )
        .dropDuplicates()
    )


def tfidf_neardup_topk(
    documents: DataFrame,
    postings: DataFrame,
    shingle_df_max: int = NEARDUP_SHINGLE_DF_MAX,
    k: int = NEARDUP_TOPK,
) -> DataFrame:
    """TF-IDF-weighted near-duplicate scoring: rank document pairs by full
    TF-IDF cosine similarity, candidates generated through rare shared
    shingles (neardup_candidates). The threshold-free complement to the
    dedup miners (operators/dedup.py): MinHash/SimHash ANSWER "is this a
    dup at cutoff t"; this RANKS pairs by graded lexical overlap weighted
    by term informativeness — the curation view for choosing a cutoff or
    auditing near-miss pairs (Broder's shingling ranks by raw Jaccard;
    weighting by idf is the standard refinement when ubiquitous-term
    overlap must not dominate the score).

    Semantics: candidates = pairs sharing >= 1 shingle with df in
    [2, shingle_df_max] (the documented truncation that makes the operator
    subquadratic); each candidate's score is then the EXACT TF-IDF cosine
    over ALL shared terms of the posting frame, not just the blocking
    shingles.

    Scale shape: the candidate self-join is df-capped (<= C(df_max, 2)
    pairs per shingle — no hot-shingle blowup, the LSH band-join bound).
    The dot product joins the bounded candidate set back to the weight
    frame on doc_id (hash-partitioned, corpus-sized but linear),
    contributions sum as 6dp DECIMAL(28,6) (exact, order-independent), and
    norms are decimal-exact, so score = round(dot / sqrt(n1 * n2), 6) is
    bit-identical across engines. Final global top-k is orderBy + limit
    (TakeOrderedAndProject: per-partition top-k, k-row driver merge, never
    a global sort) with the rank attached over the k-row survivor frame.
    """
    cand = neardup_candidates(documents, shingle_df_max=shingle_df_max)
    # the weight frame is referenced four ways (norms x2 via the pair join
    # and both dot-product legs) — pin it like the posting frame so the
    # corpus-derived subtree computes once; the static plan re-expands per
    # reference (the lint baseline counts that fresh-cache shape), but at
    # runtime every reference reads this cache and the identical
    # broadcast-idf subtrees are ReuseExchange'd.
    weights = tfidf_weights(postings).persist(StorageLevel.MEMORY_AND_DISK)
    # norms ride THROUGH the dot-product join instead of two post-aggregate
    # joins: each weight leg carries its document's norm_sq (one doc-keyed
    # join against the cached weight frame, before the pair expansion), the
    # pair groupBy picks it up with max() (constant within a group), and the
    # score is computed directly on the aggregate — two shuffles of the
    # pair frame removed from the critical path.
    # norm_sq is summed as DECIMAL(38,6) for cross-engine exactness, but the
    # score only ever consumes it AS A DOUBLE (sqrt(n1 * n2) after casts) and
    # as a > 0 guard — both give identical answers on the double image
    # (cast(decimal -> double) is deterministic; any norm >= 1e-6 stays > 0).
    # Cast ONCE here, before the pair expansion: a decimal(38,6) is a boxed
    # BigDecimal in every join copy and aggregate compare, and two of them
    # riding the |pairs| x |terms| expansion dominated the whole query
    # (measured at sf0.1: the dots stage dropped 12.9 s -> ~2.4 s when the
    # norm columns left the expansion; riding them as 8-byte doubles keeps
    # the single-pass scale shape at ~the pruned cost). At 100 TB the same
    # cast halves the norm bytes crossing the pair-join shuffle (§2.3
    # narrower types).
    norms = tfidf_doc_norms(weights).select(
        "doc_id", F.col("norm_sq").cast("double").alias("norm_sq")
    )
    wn = weights.join(norms, "doc_id")
    wa = wn.select(
        F.col("doc_id").alias("doc1"),
        "term",
        F.col("w").alias("w1"),
        F.col("norm_sq").alias("n1"),
    )
    wb = wn.select(
        F.col("doc_id").alias("doc2"),
        "term",
        F.col("w").alias("w2"),
        F.col("norm_sq").alias("n2"),
    )
    dots = (
        cand.join(wa, "doc1")
        .join(wb, ["doc2", "term"])
        .select(
            "doc1",
            "doc2",
            "n1",
            "n2",
            F.round(F.col("w1") * F.col("w2"), 6)
            .cast("decimal(28,6)")
            .alias("c"),
        )
        .groupBy("doc1", "doc2")
        .agg(
            F.sum("c").cast("double").alias("dot"),
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
    )
    scored = dots.select(
        "doc1",
        "doc2",
        "n_shared",
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            F.round(F.col("dot") / F.sqrt(F.col("n1") * F.col("n2")), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    topk = scored.orderBy(
        F.col("score").desc(), F.col("doc1").asc(), F.col("doc2").asc()
    ).limit(k)
    w = Window.orderBy(
        F.col("score").desc(), F.col("doc1").asc(), F.col("doc2").asc()
    )
    return topk.withColumn("rank", F.row_number().over(w).cast("bigint"))


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a vector ranking.

    Both inputs are (query_id, neighbor_id, ..., rank) top-k frames — each
    already k-bounded per query, so the full-outer join is tiny regardless
    of corpus size. rrf = sum over present rankings of 1/(c + rank); the
    two-term sum has a FIXED evaluation order (it is one expression, not an
    aggregation), so it is deterministic.
    """
    lex = lexical.select(
        "query_id", "neighbor_id", F.col("rank").alias("lex_rank")
    )
    vec = vector.select(
        "query_id", "neighbor_id", F.col("rank").alias("vec_rank")
    )
    fused = lex.join(vec, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("lex_rank").cast("bigint").alias("lex_rank"),
            F.col("vec_rank").cast("bigint").alias("vec_rank"),
            "rank",
        )
    )
