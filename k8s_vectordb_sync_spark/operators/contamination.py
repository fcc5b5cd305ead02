"""Benchmark-contamination detection: n-gram overlap between a training
corpus and an evaluation/benchmark set.

The standard decontamination step of an LLM data pipeline (SURVEY §7
extension surface): for every training document, count how many of its word
k-shingles also occur anywhere in the eval set, and flag documents whose
overlap ratio crosses a threshold.

Scale shape: the eval set is small BY CONSTRUCTION (benchmarks are thousands
of documents, the corpus is billions), so its distinct hashed-gram set is
collected into a broadcast hash join side — the corpus-side explode + join +
per-doc count is one map-side join followed by a single groupBy(doc_id)
shuffle of pre-combined counts. Grams travel as 60-bit md5-prefix hashes
(functions.text.md5_prefix_long), never as strings, so the shuffle rows are
fixed-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.exact import exact_ratio

DEFAULT_NGRAM_K = 5


def ngram_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    k: int = DEFAULT_NGRAM_K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-training-document eval-set overlap.

    Returns (id, n_grams, n_hits, contamination) where ``n_grams`` is the
    document's distinct word-k-shingle count, ``n_hits`` how many of those
    shingles appear in the eval set, and ``contamination`` the ratio rounded
    to 4 decimals. Every training document appears exactly once (zero-hit
    docs included, so the output is a complete decontamination report).
    """
    eval_grams = (
        eval_set.select(F.explode(T.shingles(F.col(text_col), k)).alias("g"))
        .select(T.md5_prefix_long(F.col("g")).alias("gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # single corpus pass: explode grams, mark eval membership via the
    # broadcast left join, then count total and hit grams in ONE aggregate —
    # an earlier two-branch form (hits agg + join back onto totals) scanned
    # the training corpus twice and shuffled twice
    ex = train.select(
        F.col(id_col), F.explode_outer(T.shingles(F.col(text_col), k)).alias("g")
    ).select(id_col, T.md5_prefix_long(F.col("g")).alias("gh"))
    flagged = ex.join(F.broadcast(eval_grams), "gh", "left")
    n_hits = F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("gh").cast("bigint").alias("n_grams"),
            n_hits.alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            # degenerate docs (shorter than k tokens / NULL text) have zero
            # grams; emit contamination = 0.0 explicitly instead of 0/0,
            # which is NULL in Spark but NaN in DuckDB (IEEE division)
            F.when(
                F.col("n_grams") > 0,
                exact_ratio("n_hits", "n_grams", 4),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


def minhash_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuzzy decontamination: training documents NEAR-duplicating an eval
    document, found via the MinHash LSH band machinery instead of exact
    gram membership.

    ngram_contamination catches verbatim benchmark leakage; this catches the
    paraphrased/reformatted copies that still share most of their shingles
    (the contamination mode exact-gram filters miss — see the GPT-3 appendix
    on fuzzy dedup of benchmarks). A train doc is flagged when it shares an
    LSH band bucket with an eval doc AND the signature-agreement estimate
    clears ``threshold``.

    Scale shape: signatures for both sides come from the shared
    explode+min aggregation (operators.dedup.minhash_signature — 16 longs
    per doc); the eval side (benchmarks: thousands of docs) rides BROADCAST
    joins for both the bucket match and the signature compare, so the
    corpus-side plan is scan -> map-side join -> one groupBy(doc_id) of
    pre-combined counts. Nothing pairwise ever shuffles.

    Returns (doc_id, n_eval_matches, max_est): one row per flagged train doc.
    """
    from ..operators.dedup import NUM_MINHASHES, minhash_band_buckets, minhash_signature

    tr_sigs = minhash_signature(train, text_col=text_col, id_col=id_col)
    ev_sigs = minhash_signature(eval_set, text_col=text_col, id_col=id_col)
    tr_buckets = minhash_band_buckets(tr_sigs)
    ev_buckets = minhash_band_buckets(ev_sigs).select(
        F.col("doc_id").alias("eval_id"), "band", "bucket"
    )
    cand = (
        tr_buckets.join(F.broadcast(ev_buckets), ["band", "bucket"])
        .select("doc_id", "eval_id")
        .distinct()
    )
    sa = tr_sigs.select("doc_id", F.col("sig").alias("sig_a"))
    sb = ev_sigs.select(F.col("doc_id").alias("eval_id"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda t: t,
        )
    ) / F.lit(NUM_MINHASHES)
    scored = (
        cand.join(sa, "doc_id")
        .join(F.broadcast(sb), "eval_id")
        .withColumn("est", est)
        .filter(F.col("est") >= F.lit(threshold))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_matches"),
        F.round(F.max("est"), 4).alias("max_est"),
    )
