"""In-engine BPE tokenizer training (Sennrich, Haddow & Birch, ACL'16).

A training-data platform doesn't just COUNT tokens (operators/lm.py,
text_bpe_pair_counts) — it periodically retrains the tokenizer on the
current corpus mix. This module runs the classic byte-pair-merge learning
loop Spark-side.

Scale shape — the part that makes this viable at 100 TB:

  * BPE training operates on the WORD VOCABULARY with frequencies, not the
    running text (the standard formulation): ONE corpus scan aggregates
    (word, freq); every merge iteration after that runs on the vocab frame,
    which is millions of rows at web scale, not billions. At 100 TB the
    corpus scan dominates and the N-merge loop is noise.
  * Each iteration is: pair-count over the vocab (map-side combined,
    freq-weighted), ONE tiny best-pair reduce to the driver (a single row —
    the same driver-contract as kmeans_centroids' centroid list), and a
    codegen'd regexp merge application. No Python UDFs anywhere.
  * The symbol sequence is a space-joined string; applying merge (a, b) is
    a left-to-right, non-overlapping regex replace — exactly BPE's greedy
    semantics on repeats ("a a a" -> "aa a").
  * Lineage is truncated with localCheckpoint every few iterations so the
    50-merge loop doesn't build a 50-deep plan.

Determinism: ties on pair frequency break on (pair_a, pair_b) ascending, so
the learned merge table is reproducible run-to-run and matches the pure-
Python reference implementation in tests symbol-for-symbol.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"
_CHECKPOINT_EVERY = 8


def word_vocab(
    documents: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq): the corpus word vocabulary — the single corpus-scale
    job of BPE training."""
    from ..functions.text import tokens

    out = (
        documents.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def _spaced(word_col) -> F.Column:
    """Initial symbol sequence: characters space-joined, plus the
    end-of-word marker ("low" -> "l o w </w>")."""
    chars = F.split(word_col, "")
    chars = F.filter(chars, lambda c: c != F.lit(""))
    return F.concat(F.array_join(chars, " "), F.lit(" " + END))


def _merge_expr(sym_col, a: str, b: str):
    """Apply merge (a, b) -> "ab" to a spaced symbol string: whole-symbol,
    left-to-right, non-overlapping (Java regex replaceAll semantics ==
    BPE's greedy merge)."""
    pat = r"(?<=^|\s)" + re.escape(a) + r" " + re.escape(b) + r"(?=\s|$)"
    # Replacement string follows Java Matcher semantics: backslash escapes
    # the next char and '$' starts a group reference. Tokens are arbitrary
    # corpus text, so quote BOTH (backslash first — Matcher.quoteReplacement
    # order), else a token containing '\' corrupts the merge or throws
    # IllegalArgumentException on a trailing backslash.
    repl = (a + b).replace("\\", "\\\\").replace("$", r"\$")
    return F.regexp_replace(sym_col, pat, repl)


def learn_bpe_merges(
    documents: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` byte-pair merges over the corpus; returns
    the ordered merge table (the tokenizer artifact). Stops early when the
    best remaining pair drops below ``min_pair_freq``."""
    vocab = word_vocab(documents, text_col).select(
        _spaced(F.col("word")).alias("sym"), "freq"
    )
    vocab = vocab.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        # let-bind the split array (functions/text.py::shingles rationale):
        # element_at(arr, i) inside the per-index lambda re-split the word
        # once per pair position — O(len^2) per word per merge round
        def _pairs_of(a):
            # guard the fully-merged single-symbol word: sequence(1, 0)
            # would generate DESCENDING [1, 0] and index out of bounds (the
            # _span_arrays pitfall; CaseWhen evaluates lazily)
            return F.when(
                F.size(a) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(a) - 1),
                    lambda i: F.struct(
                        F.element_at(a, i).alias("a"),
                        F.element_at(a, i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

        pair_arr = F.element_at(
            F.transform(F.array(F.split(F.col("sym"), " ")), _pairs_of), 1
        )
        pairs = vocab.select("freq", F.explode(pair_arr).alias("p"))
        best = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a"), F.col("p.b"))
            .first()
        )
        if best is None or best["n"] < min_pair_freq:
            break
        a, b = best["p"]["a"], best["p"]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("sym", _merge_expr(F.col("sym"), a, b))
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe",
) -> DataFrame:
    """Tokenize with a learned merge table: per word, start from characters
    and apply the merges in learned order — the standard greedy encoder,
    compiled to a chain of codegen'd regexp replaces over the spaced word
    (bounded by len(merges); no Python in the row path). Output is an
    array of subword symbols per document."""
    from ..functions.text import tokens

    word = F.col("w")
    sym = _spaced(word)
    for a, b in merges:
        sym = _merge_expr(sym, a, b)
    exploded = df.select(
        "*", F.posexplode_outer(tokens(F.col(text_col))).alias("__pos", "w")
    )
    pieces = exploded.withColumn("__sym", F.when(word.isNotNull(), sym))
    keys = [c for c in df.columns]
    return (
        pieces.groupBy(*keys)
        .agg(
            F.flatten(
                F.transform(
                    # collect_list order is non-deterministic; reassemble by
                    # the word's position via array_sort over (pos, syms)
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__sym").isNotNull(),
                                F.struct(
                                    F.col("__pos").alias("i"),
                                    F.col("__sym").alias("s"),
                                ),
                            )
                        )
                    ),
                    lambda st: F.split(st["s"], " "),
                )
            ).alias(out_col)
        )
    )
