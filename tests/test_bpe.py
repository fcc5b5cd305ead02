"""In-engine BPE training (operators/bpe.py) vs the classic pure-Python
reference (Sennrich et al. get_stats/merge_vocab): identical merge tables on
crafted and real corpora, greedy repeat semantics, and a round-trippable
encoder."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.operators import bpe


# --- pure-Python reference (Sennrich ACL'16 pseudocode) -------------------


def _ref_vocab(texts):
    vocab = {}
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                key = " ".join(list(w)) + " " + bpe.END
                vocab[key] = vocab.get(key, 0) + 1
    return vocab


def _ref_stats(vocab):
    stats = {}
    for word, freq in vocab.items():
        syms = word.split(" ")
        for i in range(len(syms) - 1):
            stats[(syms[i], syms[i + 1])] = stats.get((syms[i], syms[i + 1]), 0) + freq
    return stats


def _ref_merge(vocab, pair):
    a, b = pair
    pat = re.compile(r"(?<!\S)" + re.escape(a) + r" " + re.escape(b) + r"(?!\S)")
    # function replacement = literal text (Python re.sub treats string
    # replacements' backslashes as escapes, same hazard as Java replaceAll)
    return {pat.sub(lambda m: a + b, w): f for w, f in vocab.items()}


def _ref_learn(texts, n_merges, min_pair_freq=2):
    vocab = _ref_vocab(texts)
    merges = []
    for _ in range(n_merges):
        stats = _ref_stats(vocab)
        if not stats:
            break
        # deterministic tie-break: count desc, then (a, b) ASC
        top = max(stats.values())
        cands = sorted(k for k, v in stats.items() if v == top)
        best_pair = cands[0]
        if top < min_pair_freq:
            break
        merges.append(best_pair)
        vocab = _ref_merge(vocab, best_pair)
    return merges


def test_learned_merges_match_reference_on_crafted_corpus(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low newer low wide lowest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = bpe.learn_bpe_merges(df, n_merges=12)
    want = _ref_learn(texts, 12)
    assert got == want and len(got) == 12


def test_greedy_repeat_semantics(spark):
    # applying merge (a, a) to "a a a a" is greedy left-to-right,
    # non-overlapping: "aa aa", never "a aa a" or triple-merges
    row = spark.createDataFrame([("a a a a </w>",)], "s string").select(
        bpe._merge_expr(F.col("s"), "a", "a").alias("m")
    ).first()
    assert row["m"] == "aa aa </w>"
    # an odd run leaves the straggler: "a a a" -> "aa a"
    row = spark.createDataFrame([("a a a </w>",)], "s string").select(
        bpe._merge_expr(F.col("s"), "a", "a").alias("m")
    ).first()
    assert row["m"] == "aa a </w>"
    # and the full learning loop still matches the reference on repeats
    df = spark.createDataFrame([(1, "aaaa aaaa aaaa")], "doc_id long, text string")
    merges = bpe.learn_bpe_merges(df, n_merges=3)
    assert merges[0] == ("a", "a")
    assert merges == _ref_learn(["aaaa aaaa aaaa"], 3)


def test_learned_merges_match_reference_on_corpus_sample(spark, sf_dir):
    from k8s_vectordb_sync_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe.learn_bpe_merges(docs, n_merges=25)
    want = _ref_learn(texts, 25)
    assert got == want and len(got) == 25


def test_encoder_applies_merges_in_order(spark):
    df = spark.createDataFrame(
        [(1, "low lower"), (2, "newest"), (3, "")], "doc_id long, text string"
    )
    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]
    out = {r["doc_id"]: r["bpe"] for r in bpe.bpe_encode(df, merges).collect()}
    assert out[1] == ["low", bpe.END, "low", "e", "r", bpe.END]
    assert out[2] == ["n", "e", "w", "est", bpe.END]
    assert out[3] == []  # empty doc -> empty symbol list, row preserved


def test_merges_with_backslash_and_dollar_tokens(spark):
    """Replacement-string escaping (ADVICE r6): tokens are arbitrary corpus
    text, so a learned pair whose concatenation contains '\\' or '$' must
    survive Java replaceAll's replacement semantics (backslash = escape,
    dollar = group ref). Windows-path-and-currency corpus: the engine must
    match the pure-Python reference symbol-for-symbol, not throw."""
    texts = [
        r"c:\data c:\data c:\data $5 $5 $5",
        r"c:\data $5 c:\data $5",
        r"\\ \\ \\ $$ $$",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe.learn_bpe_merges(df, n_merges=10)
    want = _ref_learn(texts, 10)
    assert got == want and len(got) > 0
    # the encoder path applies the same merge expressions
    enc = {r["doc_id"]: r["bpe"] for r in bpe.bpe_encode(df, got).collect()}
    assert all(isinstance(v, list) for v in enc.values())
