"""Statistical language-model scoring for training-data curation.

Two standard corpus-quality signals built on unigram statistics:

  doc_logprob    mean per-token log-probability under the corpus's own
                 unigram LM — the cheap stand-in for perplexity filtering
                 (CCNet-style: drop documents whose tokens are collectively
                 improbable).
  dsir_weights   importance weight of each document for a *target* domain:
                 sum of per-token log-likelihood ratios between a target
                 unigram LM and the corpus unigram LM (the DSIR recipe —
                 Data Selection via Importance Resampling — reduced to
                 hashed-unigram features).

Scale shape: the vocabulary table (one row per distinct token) is tiny
relative to the corpus — low thousands here, low millions at 100 TB — so
token->probability lookup is a broadcast hash join against the exploded
corpus; the corpus is read once per LM and the only corpus-sized shuffle is
the final pre-combined groupBy(doc_id).

Cross-engine determinism: ln() may differ by 1 ulp between the JVM and
DuckDB's libm, and the order Spark sums doubles in is plan-dependent — so
every per-token log term is rounded to 4 decimals and summed as
DECIMAL(28,4) (exact, order-independent); both engines then divide the same
decimal by the same integer count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.exact import exact_ratio


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per token OCCURRENCE (not distinct): (id, tok)."""
    return df.select(
        F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("tok")
    )


def _doc_tokens_outer(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Like _doc_tokens but zero-token documents keep one NULL-token row
    (explode_outer), so the final groupBy(id) emits every document and no
    join-back onto the doc table is needed — the join-back costs a
    corpus-sized sort-merge join (two extra shuffles) that this shape
    avoids; count(tok) ignores the NULL rows."""
    return df.select(
        F.col(id_col), F.explode_outer(T.tokens(F.col(text_col))).alias("tok")
    )


def exact_mean_4dp_expr(sum_units_sql: str, n_col: str) -> F.Column:
    """round(sum/n, 4) computed ENTIRELY in BIGINT arithmetic, half away
    from zero — ``sum_units_sql`` is a SQL expression for the sum as an
    exact BIGINT count of 1e-4 units (e.g. ``CAST(lp_sum * 10000 AS
    BIGINT)`` for a DECIMAL(_,4) sum), ``n_col`` a positive BIGINT count.

    The double formulation round(double(sum)/n, 4) diverges between engines
    exactly when the true quotient lands on a .00005 boundary (a fixed-dp
    sum divided by a small n does land there): the quotient's nearest
    double sits on one side or the other, and Spark's
    BigDecimal-of-shortest-repr HALF_UP disagrees with DuckDB's C-library
    rounding about which. Integer half-away-from-zero —
    sign * floor((2|S| + n) / (2n)) in 1e-4 units — has no boundary to
    disagree about: both engines produce the identical integer, and /1e4
    of an integer this size is exact in a double. Found by the first full
    sf0.1 parity sweep (round 9); at smaller SFs no row hit a boundary.
    The DuckDB oracles inline the same arithmetic with ``//`` for DIV."""
    s = sum_units_sql
    # CAST ... AS DOUBLE before the /10000.0: a bare decimal literal makes
    # the division DECIMAL-typed in both engines (scale-7 Decimals in the
    # output), and the contract is a DOUBLE column
    return F.expr(
        f"CAST(CASE WHEN {s} < 0 THEN -1 ELSE 1 END"
        f" * ((2 * abs({s}) + {n_col}) DIV (2 * {n_col})) AS DOUBLE) / 10000.0"
    )


def unigram_logprob(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability.

    Returns (id, n_tokens, mean_logprob) for every document, including
    zero-token documents (mean_logprob = 0.0 — explicit, engine-agnostic).
    Probabilities are unsmoothed: every scored token is by construction in
    the vocabulary (the LM is trained on the same corpus).
    """
    toks = _doc_tokens(corpus, text_col, id_col)
    # vocab with totals: one partial-aggregated groupBy; the grand total is a
    # 1-row aggregate over the counts frame cross-join-broadcast back — NOT
    # an unpartitioned window, which would sort the whole O(V) vocab into one
    # partition (fatal at a web-scale 10^8-token vocabulary). Both branches
    # share the counts exchange (ReusedExchange), so the corpus explode still
    # runs once; the total branch re-reads only the O(V) shuffle output.
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    vocab = counts.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("cnt") / F.col("total")), 4)
        .cast("decimal(28,4)")
        .alias("lp"),
    )
    # left join over the OUTER-exploded corpus: zero-token docs ride through
    # as NULL-token rows, so one groupBy emits every document
    scored = _doc_tokens_outer(corpus, text_col, id_col).join(
        F.broadcast(vocab), "tok", "left"
    )
    return scored.groupBy(id_col).agg(
        F.count("tok").cast("bigint").alias("n_tokens"),
        F.sum("lp").alias("lp_sum"),
    ).select(
        id_col,
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            exact_mean_4dp_expr("CAST(lp_sum * 10000 AS BIGINT)", "n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_logprob"),
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weight per corpus document.

    weight(d) = sum over token occurrences t in d of
                ln p_target(t) - ln p_corpus(t)
    with add-one smoothing on BOTH models over the corpus vocabulary (so
    target-unseen tokens are defined). Higher = more target-like; resample
    the corpus proportionally to exp(weight) to shift its distribution
    toward the target domain.

    Returns (id, n_tokens, dsir_logratio), one row per corpus document
    (zero-token docs get 0.0).
    """
    toks = _doc_tokens(corpus, text_col, id_col)
    t_toks = target.select(F.explode(T.tokens(F.col(text_col))).alias("tok"))

    c_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("ccnt"))
    t_counts = t_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tcnt"))
    # corpus vocab is the feature space; target counts attach by left join
    # (missing -> 0, handled by smoothing). Totals + vocab size are ONE 1-row
    # aggregate over the joined O(V) frame, cross-join-broadcast back — not
    # unpartitioned windows, which would funnel the whole vocabulary through
    # a single partition. The join's input exchanges are shared between the
    # two branches (ReusedExchange), so neither corpus is scanned twice.
    joined = c_counts.join(t_counts, "tok", "left").withColumn(
        "tcnt", F.coalesce(F.col("tcnt"), F.lit(0))
    )
    totals = joined.agg(
        F.sum("ccnt").alias("ctot"),
        F.sum("tcnt").alias("ttot"),
        F.count(F.lit(1)).alias("vsize"),
    )
    stats = joined.crossJoin(F.broadcast(totals))
    lr = F.round(
        F.log((F.col("tcnt") + 1) / (F.col("ttot") + F.col("vsize")))
        - F.log((F.col("ccnt") + 1) / (F.col("ctot") + F.col("vsize"))),
        4,
    ).cast("decimal(28,4)")
    lookup = stats.select("tok", lr.alias("lr"))

    scored = _doc_tokens_outer(corpus, text_col, id_col).join(
        F.broadcast(lookup), "tok", "left"
    )
    return scored.groupBy(id_col).agg(
        F.count("tok").cast("bigint").alias("n_tokens"),
        F.sum("lr").alias("lr_sum"),
    ).select(
        id_col,
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("lr_sum").cast("double"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("dsir_logratio"),
    )


def oov_rate(
    corpus: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary rate per document against a top-N frequency vocab —
    the tokenizer-coverage check run before committing to a vocabulary size
    (high OOV = the tokenizer will shred those documents into bytes).

    The vocabulary is the ``vocab_size`` most frequent tokens (ties broken
    by token string, so the cut is deterministic). Returns
    (id, n_tokens, n_oov, oov_rate) for every document.

    Scale: token counts are one partial-aggregated groupBy; the top-N cut is
    a distributed sort+limit (TakeOrderedAndProject — per-partition partial
    top-N, never a single-partition global sort) whose LAST element becomes a
    broadcast threshold: token t is in the vocabulary iff its sort key
    (-cnt, tok) <= that threshold, which is exactly rank <= N because the
    order is total (tok is unique in the counts frame). Membership is then a
    broadcast-filtered counts frame joined against the exploded corpus, and
    one pre-combined groupBy(doc) finishes.
    """
    toks = _doc_tokens(corpus, text_col, id_col)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    key = F.struct((-F.col("cnt")).alias("nc"), F.col("tok").alias("tk"))
    cut = (
        counts.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .agg(F.max(key).alias("__thr"))
    )
    vocab = (
        counts.crossJoin(F.broadcast(cut))
        .filter(key <= F.col("__thr"))
        .select("tok", F.lit(1).alias("__in"))
    )
    flagged = _doc_tokens_outer(corpus, text_col, id_col).join(
        F.broadcast(vocab), "tok", "left"
    )
    return flagged.groupBy(id_col).agg(
        F.count("tok").cast("bigint").alias("n_tokens"),
        # NULL-token rows (zero-token docs) must not count as OOV
        F.sum(
            F.when(F.col("tok").isNotNull() & F.col("__in").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_oov"),
    ).select(
        id_col,
        "n_tokens",
        "n_oov",
        F.when(
            F.col("n_tokens") > 0,
            exact_ratio("n_oov", "n_tokens", 4),
        )
        .otherwise(F.lit(0.0))
        .alias("oov_rate"),
    )


def bigram_logprob(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean bigram log-probability: ln p(w2|w1) averaged over
    the document's adjacent token pairs, with add-one smoothing over the
    unigram vocabulary — one order up from unigram_logprob (KenLM-lite),
    sensitive to word-order scrambling that unigram scoring cannot see.

    p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), V = distinct-token count.
    Documents with fewer than 2 tokens report 0.0. Same determinism
    discipline: each log term rounds to 4 dp and sums as DECIMAL(28,4).

    Scale: bigram and context tables are groupBys over the exploded corpus
    (bigger than the unigram vocab but still sublinear in corpus size);
    lookup is a broadcast join keyed on the bigram string.
    """
    occ = corpus.select(
        F.col(id_col), F.explode(T.bigrams(F.col(text_col))).alias("bg")
    )
    bg_counts = occ.groupBy("bg").agg(F.count(F.lit(1)).alias("cbg"))
    ctx = (
        bg_counts.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .groupBy("w1")
        .agg(F.sum("cbg").alias("cctx"))
    )
    vsize = (
        corpus.select(F.explode(T.tokens(F.col(text_col))).alias("tok"))
        .agg(F.countDistinct("tok").alias("vsize"))
    )
    lookup = (
        bg_counts.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "bg",
            F.round(
                F.log((F.col("cbg") + 1) / (F.col("cctx") + F.col("vsize"))), 4
            )
            .cast("decimal(28,4)")
            .alias("lp"),
        )
    )
    # OUTER-exploded bigrams: sub-2-token docs keep a NULL row so one
    # groupBy emits every document (no join-back onto the doc table)
    occ_outer = corpus.select(
        F.col(id_col), F.explode_outer(T.bigrams(F.col(text_col))).alias("bg")
    )
    return (
        occ_outer.join(F.broadcast(lookup), "bg", "left")
        .groupBy(id_col)
        .agg(
            F.count("bg").cast("bigint").alias("n_bigrams"),
            F.sum("lp").alias("lp_sum"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.when(
                F.col("n_bigrams") > 0,
                exact_mean_4dp_expr("CAST(lp_sum * 10000 AS BIGINT)", "n_bigrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_bigram_logprob"),
        )
    )


def token_entropy(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, in nats:
    H = ln(N) - (sum_t cnt_t * ln(cnt_t)) / N over token-type counts.

    The information-theoretic cousin of the Gopher repetition signals
    (documents_repetition): boilerplate and keyword-stuffed text score low,
    diverse prose scores near ln(N). Zero-token and single-distinct-token
    documents score exactly 0.0.

    Plan: explode_outer -> (doc, tok) count -> per-doc aggregate — two
    map-side-combined shuffles, no join back onto the corpus (zero-token
    docs ride through as NULL-token rows). Determinism: each type's
    cnt*ln(cnt) term rounds to 6 dp and sums as DECIMAL (FP summation order
    is engine-specific); ln(N) is a single libm call both engines agree on.
    """
    occ = _doc_tokens_outer(corpus, text_col, id_col)
    cc = occ.groupBy(id_col, "tok").agg(F.count("tok").alias("cnt"))
    term = (
        F.when(F.col("cnt") > 0, F.round(F.col("cnt") * F.log(F.col("cnt")), 6))
        .otherwise(F.lit(0.0))
        .cast("decimal(28,6)")
    )
    per = cc.groupBy(id_col).agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum(term).alias("s"),
    )
    return per.select(
        id_col,
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.log(F.col("n_tokens").cast("double"))
                - F.col("s").cast("double") / F.col("n_tokens").cast("double"),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("token_entropy"),
    )
