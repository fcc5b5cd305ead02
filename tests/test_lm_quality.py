"""Unit tests for the statistical-LM curation signals (operators/lm.py) and
the rule-based quality gate (operators/quality.py): hand-computed expected
values on tiny corpora plus the degenerate edges (empty text, empty target)
that the synthetic fixtures never hit.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from k8s_vectordb_sync_spark.operators.lm import dsir_weights, unigram_logprob
from k8s_vectordb_sync_spark.operators.quality import quality_rules


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_logprob_hand_computed(spark):
    # corpus: "a a b" + "b" -> counts a:2 b:2 total 4, p=0.5 each
    df = _docs(spark, [(1, "a a b"), (2, "b")])
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    lp = round(math.log(0.5), 4)
    assert got[1]["n_tokens"] == 3
    assert got[1]["mean_logprob"] == round(3 * lp / 3, 4)
    assert got[2]["n_tokens"] == 1
    assert got[2]["mean_logprob"] == lp


def test_unigram_logprob_empty_doc_is_zero(spark):
    df = _docs(spark, [(1, "x y"), (2, "   ")])
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert got[2]["n_tokens"] == 0
    assert got[2]["mean_logprob"] == 0.0
    # every input doc appears exactly once
    assert set(got) == {1, 2}


def test_dsir_weights_prefers_target_like_docs(spark):
    # target doc is pure "ml ml ml"; corpus has an ml-heavy and a web-heavy doc
    df = _docs(
        spark,
        [(0, "ml ml ml"), (1, "ml ml web"), (2, "web web web web")],
    )
    target = df.filter(F.col("doc_id") == 0)
    got = {r["doc_id"]: r["dsir_logratio"] for r in dsir_weights(df, target).collect()}
    # the ml-heavy doc must score strictly higher than the web-heavy one
    assert got[0] > got[1] > got[2]


def test_dsir_weights_empty_target_defined_by_smoothing(spark):
    df = _docs(spark, [(1, "a b"), (2, "b c")])
    target = df.filter(F.col("doc_id") < 0)  # empty
    out = dsir_weights(df, target).collect()
    assert len(out) == 2
    # with an empty target every token has tcnt 0: ratio ln(1/V) - ln((c+1)/(tot+V))
    assert all(r["dsir_logratio"] is not None for r in out)


def test_quality_rules_flags_and_keep(spark):
    # 46 tokens, all distinct: stopwords present, mean word length ~5.5
    good = "the a and of to in " + " ".join(f"word{i:02d}" for i in range(40))
    rows = [
        (1, good),
        (2, "word " * 10),          # too short (10 tokens) + all-dup
        (3, "the " + "x " * 60),    # mean word length too low
        (4, "a " + "somewhat reasonable " * 20),  # dup ratio too high
    ]
    got = {r["doc_id"]: r for r in quality_rules(_docs(spark, rows)).collect()}
    assert got[1]["keep"] is True and all(
        got[1][c] for c in ("r_len", "r_wordlen", "r_stop", "r_dup")
    )
    assert got[2]["r_len"] is False and got[2]["keep"] is False
    assert got[3]["r_wordlen"] is False and got[3]["keep"] is False
    assert got[4]["r_dup"] is False and got[4]["keep"] is False


def test_quality_rules_empty_text(spark):
    got = quality_rules(_docs(spark, [(1, "")])).collect()[0]
    assert got["n_tokens"] == 0
    assert got["keep"] is False


def test_oov_rate_top_vocab_cut(spark):
    # tokens: a(3) b(2) c(1) -> vocab_size=2 keeps {a, b}; c is OOV
    df = _docs(spark, [(1, "a a a b"), (2, "b c")])
    from k8s_vectordb_sync_spark.operators.lm import oov_rate

    got = {r["doc_id"]: r for r in oov_rate(df, vocab_size=2).collect()}
    assert got[1]["n_oov"] == 0 and got[1]["oov_rate"] == 0.0
    assert got[2]["n_oov"] == 1 and got[2]["oov_rate"] == 0.5


def test_segment_media_edges(spark):
    from k8s_vectordb_sync_spark.operators.multimodal import (
        segment_media,
        to_media_table,
    )

    rows = [
        (1, "x" * 200),  # 200 bytes: offsets 0,48,96 -> greatest(200-64,0)=136 -> 0..136 step 48 = 0,48,96 (144>136)
        (2, "y" * 10),   # shorter than one window -> single truncated segment
        (3, ""),         # empty -> one zero-length segment
    ]
    media = to_media_table(_docs(spark, rows))
    segs = segment_media(media, window=64, hop=48)
    by_doc = {}
    for r in segs.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [s["seg_start"] for s in sorted(by_doc[1], key=lambda r: r["seg_idx"])] == [0, 48, 96]
    assert all(s["seg_len"] == 64 for s in by_doc[1][:2])
    assert len(by_doc[2]) == 1 and by_doc[2][0]["seg_len"] == 10
    assert len(by_doc[3]) == 1 and by_doc[3][0]["seg_len"] == 0
    # md5 of identical windows of identical payloads agree
    assert by_doc[1][0]["seg_md5"] == by_doc[1][1]["seg_md5"]  # both 64x 'x'


def test_token_entropy_crafted(spark):
    import math

    from k8s_vectordb_sync_spark.operators.lm import token_entropy

    rows = [
        (1, "a a a a"),          # one token type -> H = 0
        (2, "a b"),              # two equiprobable -> H = ln 2
        (3, ""),                 # zero tokens -> 0.0 by convention
        (4, "a a b b c c d d"),  # four equiprobable -> ln 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["token_entropy"]) for r in token_entropy(df).collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (2, round(math.log(2), 4))
    assert got[3] == (0, 0.0)
    assert got[4] == (8, round(math.log(4), 4))
