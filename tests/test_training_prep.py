"""Training-prep operators (round-2 extension surface): chunking, sequence
packing, contamination, repetition signals, semantic dedup — crafted-input
edge cases the corpus-level parity queries can't isolate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from k8s_vectordb_sync_spark.operators.chunking import chunk_documents, pack_sequences
from k8s_vectordb_sync_spark.operators.contamination import ngram_contamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunking_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "a b c")])
    out = chunk_documents(df, chunk_size=4, overlap=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chunk_id"], r["n_tokens"], r["chunk_text"]) == (0, 3, "a b c")


def test_chunking_exact_boundary_no_extra_chunk(spark):
    # exactly chunk_size tokens -> one chunk, not a trailing overlap-only one
    df = _docs(spark, [(1, "a b c d")])
    out = chunk_documents(df, chunk_size=4, overlap=2).collect()
    assert len(out) == 1


def test_chunking_overlap_and_coverage(spark):
    toks = [f"t{i}" for i in range(10)]
    df = _docs(spark, [(1, " ".join(toks))])
    out = sorted(
        chunk_documents(df, chunk_size=4, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 2: starts 0,2,4,6 (ceil((10-4)/2)=3 strides) -> 4 chunks
    assert [r["chunk_id"] for r in out] == [0, 1, 2, 3]
    # consecutive chunks share exactly `overlap` tokens
    assert out[0]["chunk_text"].split()[2:] == out[1]["chunk_text"].split()[:2]
    # every token covered
    covered = set()
    for r in out:
        covered.update(r["chunk_text"].split())
    assert covered == set(toks)


def test_chunking_empty_doc_dropped(spark):
    df = _docs(spark, [(1, "   "), (2, "x")])
    out = chunk_documents(df, chunk_size=4, overlap=1).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_chunking_rejects_bad_overlap(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_packing_bins_follow_exclusive_prefix_sum(spark):
    # one stratum, one shard; docs of 3 tokens each, capacity 6:
    # cum-excl 0,3,6,9 -> bins 0,0,1,1
    rows = [(i * 8, "w w w", "s") for i in range(4)]  # doc_id % 8 == 0 keeps one shard
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["bin_id"]: r for r in pack_sequences(df, capacity=6, n_shards=8).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_docs"] == 2 and out[0]["n_tokens"] == 6
    assert out[1]["first_doc"] == 16 and out[1]["last_doc"] == 24


def test_packing_overrun_document_stays_in_current_bin(spark):
    # doc 2 (5 tokens) starts at cum-excl 4 < capacity 6 -> bin 0 overruns;
    # doc 3 then starts at 9 -> bin 1 (greedy, order-preserving)
    rows = [(0, "a a a a", "s"), (8, "b b b b b", "s"), (16, "c", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["bin_id"]: r for r in pack_sequences(df, capacity=6, n_shards=8).collect()}
    assert out[0]["n_docs"] == 2 and out[0]["n_tokens"] == 9
    assert out[1]["n_docs"] == 1 and out[1]["first_doc"] == 16


def test_packing_shards_partition_the_cumsum(spark):
    # same source, two shards: each shard's cumsum starts at 0
    rows = [(0, "w w w w w", "s"), (1, "w w w w w", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = pack_sequences(df, capacity=4, n_shards=2).collect()
    assert sorted((r["shard"], r["bin_id"]) for r in out) == [(0, 0), (1, 0)]


# ---------------------------------------------------------------------------
# ngram_contamination
# ---------------------------------------------------------------------------


def test_contamination_exact_copy_fully_flagged(spark):
    text = "the quick brown fox jumps over the lazy dog"
    train = _docs(spark, [(1, text), (2, "completely different words here entirely now")])
    eval_set = _docs(spark, [(100, text)])
    out = {r["doc_id"]: r for r in ngram_contamination(train, eval_set, k=3).collect()}
    assert out[1]["contamination"] == 1.0
    assert out[2]["n_hits"] == 0 and out[2]["contamination"] == 0.0
    # complete report: every train doc present
    assert set(out) == {1, 2}


def test_contamination_partial_overlap(spark):
    # train doc shares its first 5 tokens with eval -> 3 of 6 trigrams hit
    train = _docs(spark, [(1, "a b c d e x y z")])
    eval_set = _docs(spark, [(100, "a b c d e")])
    r = ngram_contamination(train, eval_set, k=3).collect()[0]
    assert r["n_grams"] == 6 and r["n_hits"] == 3
    assert r["contamination"] == 0.5


def test_contamination_empty_eval_set(spark):
    train = _docs(spark, [(1, "a b c d")])
    eval_set = _docs(spark, []).filter(F.lit(False))
    r = ngram_contamination(train, eval_set, k=3).collect()[0]
    assert r["n_hits"] == 0 and r["contamination"] == 0.0


# ---------------------------------------------------------------------------
# semantic_dedup_pairs
# ---------------------------------------------------------------------------


def test_semantic_dedup_finds_within_cluster_near_dups(spark):
    from k8s_vectordb_sync_spark.operators.similarity import semantic_dedup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_pairs(df, threshold=0.9, n_clusters=2, iterations=2)
    pairs = {(r["vec_a"], r["vec_b"]) for r in out.collect()}
    assert (0, 1) in pairs
    # orthogonal vectors never pair
    assert all(a < b for a, b in pairs)
    assert (2, 3) not in pairs


# ---------------------------------------------------------------------------
# mixture_weights
# ---------------------------------------------------------------------------


def test_mixture_weights_sum_to_one_and_upsample_tail(spark):
    from k8s_vectordb_sync_spark.operators.sampling import mixture_weights

    rows = [(i, "w " * 100, "big") for i in range(16)] + [(100, "w " * 100, "small")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["stratum"]: r
        for r in mixture_weights(
            df, F.size(F.split(F.trim(F.col("text")), " ")), token_budget=1000
        ).collect()
    }
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
    # alpha=0.5: 16x the tokens -> only 4x the weight (sqrt scaling)
    assert abs(out["big"]["weight"] / out["small"]["weight"] - 4.0) < 1e-4
    # the small source repeats more often per token than the big one
    assert out["small"]["epochs"] > out["big"]["epochs"]
    assert out["big"]["n_docs"] == 16 and out["small"]["n_docs"] == 1


def test_mixture_weights_deterministic(spark):
    from k8s_vectordb_sync_spark.operators.sampling import mixture_weights

    rows = [(i, "x " * (i + 1), f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tok = F.size(F.split(F.trim(F.col("text")), " "))
    a = sorted(map(tuple, mixture_weights(df, tok).collect()))
    b = sorted(map(tuple, mixture_weights(df, tok).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# clean_text
# ---------------------------------------------------------------------------


def test_clean_text_strips_control_and_collapses_ws(spark):
    from k8s_vectordb_sync_spark.functions.text import clean_text

    rows = [
        (1, "a\x00b\x07c"),          # control chars -> single spaces
        (2, "  Mixed \t Case\n\n x "),  # ws collapse + trim, case kept
        (3, "\x1f\x7f"),             # all-control -> empty after trim
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["c"] for r in df.select("doc_id", clean_text(F.col("text")).alias("c")).collect()}
    assert got[1] == "a b c"
    assert got[2] == "Mixed Case x"
    assert got[3] == ""


# ---------------------------------------------------------------------------
# project (random projection)
# ---------------------------------------------------------------------------


def test_project_matches_manual_dot(spark):
    from k8s_vectordb_sync_spark.functions.vectors import project

    planes = [[1.0, 0.0, 2.0], [0.0, -1.0, 0.5]]
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "vec_id long, v array<float>")
    (row,) = df.select(project(F.col("v"), planes).alias("p")).collect()
    assert row["p"] == [pytest.approx(7.0), pytest.approx(-0.5)]


def test_duplicate_spans_crafted(spark, tmp_path):
    """Planted boilerplate: three docs share an identical 8+-token passage
    wrapped in different surroundings (whole-doc dedup misses them); one doc
    is fully unique. The shared spans are flagged, the unique doc scores 0."""
    from k8s_vectordb_sync_spark.queries import QUERIES

    boiler = "please subscribe to our newsletter for the latest updates today"
    rows = [
        (1, f"alpha beta {boiler}", "s"),
        (2, f"{boiler} gamma delta", "s"),
        (3, f"epsilon {boiler} zeta", "s"),
        (4, "a completely unique document about adaptive query execution plans", "s"),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {
        r["doc_id"]: (r["n_common_spans"], r["common_ratio"])
        for r in QUERIES["documents_duplicate_spans"](spark, d).collect()
    }
    assert out[4] == (0, 0.0)
    # the 10-token boilerplate contributes 3 shared 8-grams to each carrier
    assert all(out[i][0] == 3 for i in (1, 2, 3))
    assert all(out[i][1] > 0 for i in (1, 2, 3))


def test_embeddings_standardize_crafted(spark, tmp_path):
    """Known per-dimension stats: dim 1 has mean 2, stddev 1 over {1,2,3};
    dim 2 is constant (sigma 0 -> z 0.0 by convention)."""
    from k8s_vectordb_sync_spark.queries import QUERIES

    rows = [(1, [1.0, 7.0]), (2, [2.0, 7.0]), (3, [3.0, 7.0])]
    d = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(d + "/embeddings.parquet")
    out = {r["vec_id"]: list(r["z"]) for r in QUERIES["embeddings_standardize"](spark, d).collect()}
    assert out == {1: [-1.0, 0.0], 2: [0.0, 0.0], 3: [1.0, 0.0]}


def test_despan_clean_drops_majority_boilerplate(spark, tmp_path):
    """A doc that is pure shared boilerplate (common_ratio 1.0) is dropped;
    docs where the boilerplate is a minority of their spans are kept."""
    from k8s_vectordb_sync_spark.queries import QUERIES

    boiler = "one two three four five six seven eight"  # exactly one 8-gram
    unique_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    unique_b = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    unique_c = "phi chi psi omega aleph bet gimel dalet he vav"
    rows = [
        (1, boiler, "s"),                      # 100% common -> dropped
        (2, boiler, "s"),                      # 100% common -> dropped
        (3, boiler, "s"),                      # 100% common -> dropped
        (4, f"{unique_a} {boiler}", "s"),      # minority common -> kept
        (5, f"{unique_b} {boiler}", "s"),      # minority common -> kept
        (6, unique_c, "s"),                    # no common spans -> kept
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.mode(
        "overwrite"
    ).parquet(d + "/documents.parquet")
    out = {r["source"]: (r["n_docs"], r["n_kept"]) for r in QUERIES["documents_despan_clean"](spark, d).collect()}
    assert out == {"s": (6, 3)}


def test_token_budget_mix_sqrt_allocation(spark, tmp_path):
    """Crafted 2-source corpus: budgets split by sqrt token mass, fill stops
    exactly at the boundary, and the manifest is deterministic."""
    import math
    import os

    from k8s_vectordb_sync_spark.queries import QUERIES, _BUDGET_TOKENS

    rows = []
    did = 0
    for src, n_docs, words in (("big", 90, 300), ("small", 10, 300)):
        for _ in range(n_docs):
            rows.append((did, src, " ".join(f"w{i}" for i in range(words))))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = QUERIES["documents_token_budget_mix"](spark, d).collect()
    assert len(out) == 100
    sq_big = round(math.sqrt(90 * 300), 6)
    sq_small = round(math.sqrt(10 * 300), 6)
    budget = {
        "big": _BUDGET_TOKENS * (sq_big / (sq_big + sq_small)),
        "small": _BUDGET_TOKENS * (sq_small / (sq_big + sq_small)),
    }
    for src in ("big", "small"):
        kept = [r for r in out if r["source"] == src and r["kept"]]
        dropped = [r for r in out if r["source"] == src and not r["kept"]]
        # every kept doc fits inside the source budget; the first dropped
        # doc would have crossed it
        assert all(r["cum_tokens"] <= budget[src] for r in kept)
        assert all(r["cum_tokens"] > budget[src] for r in dropped)
        assert len(kept) == min(100, int(budget[src] // 300)) or len(kept) == len(
            [r for r in out if r["source"] == src]
        )
    # sqrt weighting upsamples the tail: small source keeps a ~3x larger
    # fraction of its docs than its 10% share of the corpus
    frac_small = len([r for r in out if r["source"] == "small" and r["kept"]]) / 10
    frac_big = len([r for r in out if r["source"] == "big" and r["kept"]]) / 90
    assert frac_small > frac_big
