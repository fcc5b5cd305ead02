"""Unit tests for the dedup family, similarity search, text analysis, and
multimodal operators (SURVEY §7 extension surface) on small crafted inputs."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.functions.text import (
    detect_language,
    fingerprint,
    shingles,
    token_count_bpe,
    token_count_ws,
)
from k8s_vectordb_sync_spark.functions.vectors import cosine, dot, l2_distance
from k8s_vectordb_sync_spark.operators.dedup import (
    BAND_SIZE,
    embedding_cosine_pairs,
    exact_dedup,
    lsh_band_sweep,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from k8s_vectordb_sync_spark.operators.multimodal import (
    decode_media_meta,
    frame_sample_plan,
    to_media_table,
)
from k8s_vectordb_sync_spark.operators.similarity import (
    brute_force_topk,
    ivf_nprobe_sweep,
    ivf_topk,
    lsh_topk,
)

DOCS_SCHEMA = "doc_id long, text string, source string"


def test_exact_dedup_groups_whitespace_case_variants(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello  World", "s"),
            (2, "hello world", "s"),  # same after normalization
            (3, "different doc", "s"),
        ],
        DOCS_SCHEMA,
    )
    out = {r["keep_doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_finds_planted_near_duplicate(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely unrelated text about spark query engines and shuffles here"
    docs = spark.createDataFrame(
        [(1, base, "s"), (2, near, "s"), (3, far, "s")], DOCS_SCHEMA
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_storage_level_none_matches_default(spark, sf_dir):
    """The shingle-cache escape hatch: storage_level=None recomputes shingles
    in each consumer instead of caching arrays ~k x the text size — at 100 TB
    that cache is a storage event, so the uncached mode must be a pure
    performance choice with identical output."""
    from k8s_vectordb_sync_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cached = {tuple(r) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    uncached = {
        tuple(r)
        for r in minhash_lsh_pairs(docs, threshold=0.5, storage_level=None).collect()
    }
    assert cached == uncached
    assert len(cached) > 0


def test_minhash_signature_verify_mode(spark):
    """verify='signature' gates candidates on the signature-agreement
    estimate instead of exact shingle Jaccard — zero shingle caching, 16
    longs per doc of pipeline state. On planted data: identical docs
    (estimate 1.0) and clear non-dups survive/are-dropped exactly as in
    exact mode; the estimate's 1/16 granularity near the threshold is the
    documented tradeoff (minhash_estimate_eval calibrates it)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base, "s"),
        (2, base, "s"),  # identical -> estimate 1.0
        (3, "completely unrelated text about spark query engines here", "s"),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    sig_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5, verify="signature").collect()
    }
    exact_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert set(sig_pairs) == set(exact_pairs) == {(1, 2)}
    assert sig_pairs[(1, 2)] == 1.0 and exact_pairs[(1, 2)] == 1.0
    with pytest.raises(ValueError, match="verify"):
        minhash_lsh_pairs(docs, verify="estimate")


def test_lsh_bucket_cap_keeps_pathological_corpus_linear(spark):
    """Boilerplate burst: 1000 near-identical docs land in the same
    (band, bucket) in EVERY band, so uncapped pair expansion is ~O(n^2)
    (hundreds of thousands of candidate pairs). With max_bucket_size set the
    oversized buckets are dropped BEFORE expansion — the stage stays linear —
    while small legitimate near-dup groups still surface. This is the
    pipeline-assembly setting (pipeline_training_mix passes the cap)."""
    boiler = "identical boilerplate template text repeated across the corpus"
    legit = "a genuinely unique document about spark shuffle partitioning"
    rows = [(i, f"{boiler} variant {i % 4}", "s") for i in range(1000)]
    rows += [(2000 + j, legit, "s") for j in range(3)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    pairs = minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=16).collect()
    ids = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert ids == {2000, 2001, 2002}  # the burst never reaches pair expansion
    assert len(pairs) == 3  # 3 choose 2, each identical -> jaccard 1.0
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_simhash_identical_docs_equal_hamming_zero(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "s"), (2, "alpha beta gamma", "s"), (3, "x y z", "s")],
        DOCS_SCHEMA,
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sigs[1] == sigs[2]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=0).collect()}
    assert pairs == {(1, 2): 0}


def test_simhash_pairs_banded_equals_naive_blocked_join(spark):
    # the chunk-banded candidate generation must have EXACT recall vs the
    # naive within-block all-pairs join (pigeonhole: hamming<=m => one of the
    # m+1 signature chunks matches exactly)
    import random

    from k8s_vectordb_sync_spark.operators.dedup import hamming32

    rng = random.Random(7)
    words = [f"w{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.sample(words, 12)), "s" if i % 4 else "t")
            for i in range(60)
        ],
        DOCS_SCHEMA,
    )
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(docs, max_hamming=8).collect()
    }
    sigs = simhash(docs).join(docs.select("doc_id", F.col("source").alias("blk")), "doc_id")
    a, b = sigs.alias("a"), sigs.alias("b")
    naive = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("hamming", hamming32(F.col("a.simhash"), F.col("b.simhash")))
        .filter(F.col("hamming") <= 8)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), "hamming"
        )
        .collect()
    }
    assert banded == naive
    assert len(naive) > 0  # the equivalence is not vacuous


def test_minhash_bucket_cap_keeps_pathological_corpus_linear(spark):
    # 1000 near-identical docs put every signature in one LSH bucket: the
    # uncapped pair expansion is ~500k candidates; with the cap the bucket is
    # dropped and the stage stays linear (zero candidates to verify)
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(i, base, "s") for i in range(1000)], DOCS_SCHEMA
    )
    capped = minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=10)
    assert capped.count() == 0


def test_ngram_jaccard_blocked_pairs(spark):
    a = "one two three four five six seven eight nine ten"
    b = "one two three four five six seven eight nine eleven"
    docs = spark.createDataFrame(
        [(1, a, "s"), (2, b, "s"), (3, a, "OTHER-SOURCE")], DOCS_SCHEMA
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)  # blocking: other source never joined


def test_embedding_cosine_pairs_threshold(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.999, 0.01], 0),
            (3, [0.0, 1.0], 0),
            (4, [1.0, 0.0], 1),  # other block: never paired with 1
        ],
        "vec_id long, embedding array<float>, label int",
    )
    pairs = {(r["vec_a"], r["vec_b"]) for r in embedding_cosine_pairs(emb, threshold=0.99).collect()}
    assert pairs == {(1, 2)}


def test_vector_functions(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [3.0, 4.0])], "a array<float>, b array<float>"
    )
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        cosine(F.col("a"), F.col("b")).alias("c"),
        l2_distance(F.col("a"), F.col("b")).alias("l2"),
    ).first()
    assert row["d"] == pytest.approx(25.0)
    assert row["c"] == pytest.approx(1.0)
    assert row["l2"] == pytest.approx(0.0)


def test_brute_force_topk_exact_order(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 6)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<float>"
    )
    out = brute_force_topk(emb, queries, k=3).orderBy("rank").collect()
    # cosine with [1,0] increases with i/sqrt(i^2+1): neighbor 5 is best
    assert [r["neighbor_id"] for r in out] == [5, 4, 3]
    assert out[0]["rank"] == 1


def test_lsh_topk_subset_of_bruteforce_scores(spark, sf_dir):
    from k8s_vectordb_sync_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = lsh_topk(emb, q, k=3).collect()
    # every query finds at least itself (same bucket, cosine 1.0)
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert any(r["neighbor_id"] == qid and r["score"] == 1.0 for r in rows)


def test_ivf_topk_self_hit(spark, sf_dir):
    from k8s_vectordb_sync_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(emb, q, k=3, n_clusters=4, n_probe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    # the probed partition always contains the query's own cluster -> self-hit
    for qid, rows in by_q.items():
        assert any(r["neighbor_id"] == qid for r in rows)


def test_ivf_sampled_training_recall_close_to_full(spark, sf_dir):
    """Sampled centroid training (the 100 TB IO posture: Lloyd's over a
    deterministic md5 hash-sample, one full-corpus assignment pass) vs
    full-corpus training, measured at sf0.001 (500 vectors, 8 clusters,
    2 probes). Recall@5 vs exact brute force: full-training 0.975, 1/4-sample
    0.675 (1/2-sample 0.65 — not monotone in rate at this size) — the gap is
    a SMALL-SAMPLE artifact (125 training rows for 8 centroids; the
    sampled-training guidance is >=1000 rows per centroid, at which point
    centroid quality is statistically indistinguishable). The assertions pin
    the measured floor so a real
    regression (e.g. a broken sample predicate collapsing to one centroid)
    fails loudly, while the sampling path's documented cost at toy scale
    stays visible here rather than hidden by a loose tolerance."""
    from k8s_vectordb_sync_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }

    def recall(sample_hex):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, q, k=5, n_clusters=8, n_probe=2, sample_hex=sample_hex
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_full, r_sampled = recall(None), recall("0123")
    assert r_full >= 0.9
    assert r_sampled >= 0.6


def test_kmeans_empty_training_sample_falls_back_to_full_corpus(spark):
    """Degenerate-corpus fallback (round-7 gate): a hash-sample that keeps
    nothing trains on EVERYTHING — same centroids as unsampled training —
    instead of crashing; an EMPTY corpus trains no clusters at all (the
    oracles encode the identical OR NOT EXISTS rule)."""
    from k8s_vectordb_sync_spark.operators.similarity import kmeans_centroids

    emb = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    # hex never contains 'z', so the sample is provably empty -> fallback
    got = kmeans_centroids(emb, n_clusters=2, sample_hex="z")
    want = kmeans_centroids(emb, n_clusters=2, sample_hex=None)
    assert got == want and len(got) == 2
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_centroids(empty, n_clusters=2, sample_hex="z") == []


def test_text_functions(spark):
    df = spark.createDataFrame([("The quick brown fox, 42 times!",)], "text string")
    row = df.select(
        token_count_ws(F.col("text")).alias("ws"),
        token_count_bpe(F.col("text")).alias("bpe"),
        detect_language(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    ).first()
    assert row["ws"] == 6
    # the, quick, brown, fox, ',', 42, times, '!' -> 8
    assert row["bpe"] == 8
    assert row["lang"] == "en"
    # fingerprint invariant under case/whitespace
    row2 = (
        spark.createDataFrame([("  the QUICK   brown fox, 42 times!  ",)], "text string")
        .select(fingerprint(F.col("text")).alias("fp"))
        .first()
    )
    assert row["fp"] == row2["fp"]


def test_shingles_short_text_fallback(spark):
    df = spark.createDataFrame([("one two",)], "text string")
    row = df.select(shingles(F.col("text"), 3).alias("sh")).first()
    assert row["sh"] == ["one two"]


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(0, "x" * 100, "s"), (1, "y" * 50, "s"), (2, "z" * 70, "s")],
        DOCS_SCHEMA,
    )
    media = to_media_table(docs)
    assert dict(media.dtypes)["content"] == "binary"
    decoded = decode_media_meta(media)
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert rows[0]["media_type"] == "image"
    assert rows[0]["width"] == 100 % 640 + 16 and rows[0]["n_frames"] == 1
    assert rows[1]["media_type"] == "audio"
    assert rows[1]["sample_rate"] == 8000 + (50 % 4) * 8000
    assert rows[2]["media_type"] == "video"
    assert rows[2]["n_frames"] == 70 % 300 + 1
    frames = frame_sample_plan(decoded, every_n=30).collect()
    assert [r["frame_idx"] for r in frames] == [0, 30, 60]


def test_vectorized_topk_matches_expression_topk(spark, sf_dir):
    from k8s_vectordb_sync_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )
    from k8s_vectordb_sync_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    fast = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in brute_force_topk_vectorized(emb, q, k=5).collect()
    }
    assert exact == fast


def test_salted_last_state_wins_identical_to_plain(spark, sf_dir):
    from k8s_vectordb_sync_spark.operators.debounce import (
        last_state_wins,
        salted_last_state_wins,
    )
    from k8s_vectordb_sync_spark.sources.cdc import events_as_change_stream
    from k8s_vectordb_sync_spark.sources.tables import load_table

    ch = events_as_change_stream(load_table(spark, sf_dir, "events"))
    plain = sorted(
        tuple(r) for r in last_state_wins(ch, tiebreak_cols=["event_id"]).collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_last_state_wins(ch, tiebreak_cols=["event_id"]).collect()
    )
    assert plain == salted


def test_dup_clusters_transitive_components(spark):
    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters

    # chain 1-2-3 is one component even though (1,3) was never a pair;
    # (10,11) is a separate component
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dup_clusters_stats_reset_equivalence(spark):
    """Round-8 sf10 finding: localCheckpoint truncates lineage but INHERITS
    the parent's sizeInBytes estimate, so the label-propagation joins
    compound it ~2.6x per round until Catalyst's BigInt estimate overflows
    (`BigInteger would overflow supported range` at ~round 23 on the
    22M-edge sf10 graph). The periodic parquet stats reset caps the
    compounding; labels are bit-identical with the reset at every round, at
    the default cadence, and disabled — on a 40-link chain that forces many
    rounds through the reset path."""
    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    a = sorted(map(tuple, dup_clusters(pairs).collect()))
    b = sorted(map(tuple, dup_clusters(pairs, stats_reset_every=1).collect()))
    c = sorted(map(tuple, dup_clusters(pairs, stats_reset_every=0).collect()))
    assert a == b == c
    assert len(a) == 41 and all(cid == 0 for _, cid in a)


def test_dup_clusters_on_minhash_pairs(spark, sf_dir):
    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters
    from k8s_vectordb_sync_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    clusters = dup_clusters(pairs)
    n_pairs = pairs.count()
    if n_pairs:
        # every doc in a pair got a cluster; representatives are minima
        assert clusters.count() > 0
        reps = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
        assert reps.count() <= clusters.count()
        assert clusters.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0


@pytest.mark.parametrize("dim", [32, 128])
def test_lsh_topk_non64_dims_match_numpy_reference(spark, dim):
    # ADVICE r1: hardcoded 64-dim planes silently collapsed other dims into
    # bucket 0. lsh_topk must now reproduce the full bucketed search at any
    # dim — checked exactly against a numpy implementation of the same
    # deterministic planes.
    import numpy as np

    from k8s_vectordb_sync_spark.operators.similarity import lsh_planes

    rng = np.random.default_rng(dim)
    base = rng.standard_normal((60, dim)).round(3)
    qs = rng.standard_normal((3, dim)).round(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in qs[i]]) for i in range(3)],
        "query_id long, query_vec array<float>",
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in lsh_topk(emb, queries, k=3).collect()
    }

    planes = np.asarray(lsh_planes(dim))
    # float32 storage: compare against the float32-rounded vectors
    b32 = base.astype(np.float32).astype(np.float64)
    q32 = qs.astype(np.float32).astype(np.float64)
    bucket = lambda m: ((m @ planes.T) > 0).astype(int) @ (1 << np.arange(8))
    b_buckets, q_buckets = bucket(b32), bucket(q32)
    assert len(set(b_buckets)) > 1  # planes actually split the space
    expected = {}
    for qi in range(3):
        cand = [i for i in range(60) if b_buckets[i] == q_buckets[qi]]
        scores = sorted(
            (
                (
                    -(b32[i] @ q32[qi])
                    / (np.linalg.norm(b32[i]) * np.linalg.norm(q32[qi])),
                    i,
                )
                for i in cand
            ),
        )[:3]
        for rank, (neg, i) in enumerate(scores, 1):
            expected[(qi, rank)] = (i, round(-neg, 4))
    assert set(got) == set(expected)
    for key in expected:
        assert got[key][0] == expected[key][0]
        assert got[key][1] == pytest.approx(expected[key][1], abs=1e-4)


def test_lsh_topk_dim_mismatch_raises(spark):
    emb = spark.createDataFrame(
        [(1, [1.0] * 32)], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(1, [1.0] * 64)], "query_id long, query_vec array<float>"
    )
    with pytest.raises(ValueError, match="dim 64"):
        lsh_topk(emb, queries)


def test_vectorized_topk_string_ids(spark):
    # id schema follows the input (was hardcoded bigint)
    from k8s_vectordb_sync_spark.operators.similarity import brute_force_topk_vectorized

    emb = spark.createDataFrame(
        [(f"doc{i}", [float(i), 1.0]) for i in range(1, 6)],
        "vec_id string, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "query_id string, query_vec array<float>"
    )
    out = brute_force_topk_vectorized(emb, queries, k=2).collect()
    assert [r["neighbor_id"] for r in out] == ["doc5", "doc4"]
    assert all(r["query_id"] == "q1" for r in out)


def test_dup_clusters_long_chain_converges(spark):
    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters

    # a 20-node chain has diameter 19 > the old 10-iteration budget; the loop
    # must run to convergence, never return partially-propagated labels
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert out == {i: 0 for i in range(21)}


def test_dup_clusters_raises_when_budget_exhausted(spark):
    import pytest

    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iterations=2)


def test_ngram_jaccard_prefix_filter_equals_naive_blocked_join(spark):
    # prefix filtering must have EXACT recall: J(A,B) >= t implies the sets
    # share an element among each one's first |s| - ceil(t|s|) + 1 sorted
    # shingles — verified against the naive within-block all-pairs join
    import random

    rng = random.Random(11)
    words = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(0, 80, 2):
        toks = rng.sample(words, rng.randint(6, 10))
        near = list(toks)
        near[-1] = rng.choice(words)  # one-word edit: high but not 1.0 Jaccard
        src = "s" if i % 3 else "t"
        rows.append((i, " ".join(toks), src))
        rows.append((i + 1, " ".join(near), src))
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    from k8s_vectordb_sync_spark.functions.text import shingles as sh_expr

    filtered = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    base = docs.select(
        F.col("doc_id"),
        sh_expr(F.col("text"), 3).alias("sh"),
        F.col("source").alias("blk"),
        (F.length("text") / F.lit(100)).cast("bigint").alias("lbkt"),
    )
    a, b = base.alias("a"), base.alias("b")
    naive = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.lbkt") == F.col("b.lbkt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
            / F.size(F.array_union(F.col("a.sh"), F.col("b.sh"))),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round("jaccard", 4).alias("jaccard"),
        )
        .collect()
    }
    assert filtered == naive
    assert len(naive) > 0


def test_lsh_topk_empty_inputs_yield_empty_result(spark):
    # an empty corpus (pre-ingestion, filtered-out partition) must return
    # zero rows with the normal schema, not crash on dim probing
    from k8s_vectordb_sync_spark.operators.similarity import lsh_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "query_id long, query_vec array<double>"
    )
    out = lsh_topk(empty, queries, k=3)
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
    assert out.count() == 0
    # and the symmetric case: no queries
    base = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    no_q = spark.createDataFrame([], "query_id long, query_vec array<double>")
    assert lsh_topk(base, no_q, k=3).count() == 0


# ---------------------------------------------------------------------------
# pq_codes
# ---------------------------------------------------------------------------


def test_pq_codes_shape_range_and_determinism(spark):
    from k8s_vectordb_sync_spark.operators.similarity import pq_codes

    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_codes(df, m=2, k=3, iterations=2)
    got = sorted(map(tuple, out.collect()))
    assert len(got) == 20
    assert all(0 <= r[1] < 3 and 0 <= r[2] < 3 for r in got)
    assert got == sorted(map(tuple, pq_codes(df, m=2, k=3, iterations=2).collect()))


def test_pq_codes_identical_vectors_share_codes(spark):
    from k8s_vectordb_sync_spark.operators.similarity import pq_codes

    rows = [(1, [1.0, 0.0, 5.0, 5.0]), (2, [1.0, 0.0, 5.0, 5.0]), (3, [9.0, 9.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["code0"], r["code1"]) for r in pq_codes(df, m=2, k=2, iterations=2).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_pq_codes_dim_not_divisible_raises(spark):
    from k8s_vectordb_sync_spark.operators.similarity import pq_codes

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_codes(df, m=2)


def test_ivf_pq_probe_all_equals_pq(spark, sf_dir):
    """With n_probe = n_clusters the IVF stage prunes nothing, so the
    composed IVF-PQ search must equal plain PQ asymmetric-distance search
    exactly (same codebooks, same scoring, same tie order) — the pruning and
    the scoring are orthogonal, which is what makes the composition sound."""
    from k8s_vectordb_sync_spark.operators.similarity import ivf_pq_topk, pq_topk
    from k8s_vectordb_sync_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    composed = {
        tuple(r)
        for r in ivf_pq_topk(emb, q, k=4, n_clusters=4, n_probe=4).collect()
    }
    plain = {tuple(r) for r in pq_topk(emb, q, k=4).collect()}
    assert composed == plain and len(plain) == 12


def test_pq_adc_matches_reconstruction_scoring(spark, sf_dir):
    """ADC lookup-table scoring must agree with per-row reconstruction
    scoring (pq_topk): cosine(q, recon) decomposes exactly into per-subspace
    table entries, so the same codebooks give the same neighbors — scores
    may differ only by the 6-dp table rounding + FP association, absorbed by
    the 4-dp output rounding."""
    from k8s_vectordb_sync_spark.operators.similarity import pq_topk, pq_topk_adc
    from k8s_vectordb_sync_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    adc = {(r["query_id"], r["neighbor_id"]): r["score"] for r in pq_topk_adc(emb, q, k=4).collect()}
    rec = {(r["query_id"], r["neighbor_id"]): r["score"] for r in pq_topk(emb, q, k=4).collect()}
    assert set(adc) == set(rec)
    for key in rec:
        assert abs(adc[key] - rec[key]) <= 2e-4  # 4-dp rounding boundary slack


def test_semantic_cluster_cap_keeps_pathological_corpus_linear(spark):
    """SemDeDup mega-cluster guard: 300 identical embeddings all land in one
    k-means cluster, so uncapped in-cluster pair expansion is ~45k pairs;
    with max_cluster_size the mega-cluster is dropped BEFORE the self-join
    (the stage stays linear) while a small legitimate near-dup group still
    surfaces with cosine 1.0 — mirroring the LSH max_bucket_size semantics."""
    from k8s_vectordb_sync_spark.operators.similarity import semantic_dedup_pairs

    mega = [0.9, 0.1, 0.0, 0.2]
    legit = [-0.8, 0.7, -0.5, 0.1]
    rows = [(0, mega), (1, legit), (2, legit), (3, legit)]
    rows += [(10 + i, mega) for i in range(297)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = semantic_dedup_pairs(
        emb, threshold=0.5, n_clusters=2, iterations=2, max_cluster_size=10
    ).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in capped} == {(1, 2), (1, 3), (2, 3)}
    assert all(r["cosine"] == 1.0 for r in capped)
    uncapped = semantic_dedup_pairs(
        emb, threshold=0.5, n_clusters=2, iterations=2
    )
    assert uncapped.count() == 298 * 297 // 2 + 3  # the quadratic blow-up the cap removes


def test_semantic_routed_overflow_star_pairs(spark):
    """semantic_dedup_pairs_routed (VERDICT r7 item 1): the mega-cluster is
    ROUTED through exact vector-value dedup instead of dropped — 299
    identical vectors emit 298 STAR pairs against the min-id canonical
    (linear, never the ~44k all-pairs expansion), method='exact',
    cosine 1.0 by identity; the small legitimate near-dup group still runs
    the exact cosine branch (method='cosine'). A mega-cluster member whose
    vector differs (no value-duplicate) emits nothing — routing is exact
    dedup, not approximate recall."""
    from k8s_vectordb_sync_spark.operators.similarity import (
        semantic_dedup_pairs_routed,
    )

    mega = [0.9, 0.1, 0.0, 0.2]
    lone = [0.85, 0.2, 0.05, 0.15]  # lands in the mega cluster, unique value
    legit = [-0.8, 0.7, -0.5, 0.1]
    rows = [(0, mega), (1, legit), (2, legit), (3, legit), (4, lone)]
    rows += [(10 + i, mega) for i in range(298)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup_pairs_routed(
        emb, threshold=0.5, n_clusters=2, iterations=2, max_cluster_size=10
    ).collect()
    exact = [r for r in out if r["method"] == "exact"]
    cosine = [r for r in out if r["method"] == "cosine"]
    # star shape: every exact pair anchors at the canonical min id (0)
    assert len(exact) == 298
    assert all(r["vec_a"] == 0 and r["cosine"] == 1.0 for r in exact)
    assert {r["vec_b"] for r in exact} == {10 + i for i in range(298)}
    # the small cluster still gets true SemDeDup cosine pairs
    assert {(r["vec_a"], r["vec_b"]) for r in cosine} == {(1, 2), (1, 3), (2, 3)}
    # the lone non-duplicate mega-cluster member emits nothing
    assert all(4 not in (r["vec_a"], r["vec_b"]) for r in out)


def test_semantic_routed_zero_norm_duplicates(spark):
    """Zero-norm duplicate vectors in a routed mega-cluster pair with
    cosine 0.0 (the 0/0 guard), not NaN — the degenerate-fixture contract."""
    from k8s_vectordb_sync_spark.operators.similarity import (
        semantic_dedup_pairs_routed,
    )

    rows = [(i, [0.0, 0.0, 0.0, 0.0]) for i in range(20)]
    rows += [(100 + i, [0.5, 0.5, 0.1, 0.3]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup_pairs_routed(
        emb, threshold=0.5, n_clusters=2, iterations=2, max_cluster_size=5
    ).collect()
    assert all(r["method"] == "exact" for r in out)
    zero = [r for r in out if r["vec_a"] == 0]
    live = [r for r in out if r["vec_a"] == 100]
    assert len(zero) == 19 and all(r["cosine"] == 0.0 for r in zero)
    assert len(live) == 19 and all(r["cosine"] == 1.0 for r in live)


def test_semantic_delta_pairs_touch_delta_only(spark):
    """semantic_dedup_pairs_delta: exactly the full-join pairs that touch a
    delta member — corpus-corpus pairs are absent, delta-delta pairs appear
    once (canonicalized + distinct), and the result equals the batch
    semantic_dedup_pairs filtered to delta-touching pairs."""
    from k8s_vectordb_sync_spark.operators.similarity import (
        semantic_dedup_pairs,
        semantic_dedup_pairs_delta,
    )

    base = [0.5, 0.1, -0.2, 0.3]
    rows = [
        (i, [round(v + 0.01 * (i % 5), 4) for v in base]) for i in range(30)
    ]
    rows += [(100 + i, [-0.7, 0.6, 0.2, -0.1]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    delta = emb.filter(F.col("vec_id") % 2 == 1)
    got = sorted(
        map(tuple, semantic_dedup_pairs_delta(
            emb, delta, threshold=0.9, n_clusters=2, iterations=2
        ).collect())
    )
    full = semantic_dedup_pairs(
        emb, threshold=0.9, n_clusters=2, iterations=2
    ).collect()
    want = sorted(
        tuple(r) for r in full if r["vec_a"] % 2 == 1 or r["vec_b"] % 2 == 1
    )
    assert got == want and len(got) > 0
    assert len(got) < len(full)  # corpus-corpus (even-even) pairs excluded
    assert len(got) == len(set(got))  # delta-delta pairs not double-counted


def test_topk_per_query_two_phase_plan_and_equivalence(spark):
    """topk_per_query (the shared scored-tail ranker) must (a) produce the
    same rows as the naive single-window form and (b) contain the partial
    phase in its plan: a local rank filter BEFORE the final per-query window,
    so no single reducer key ever receives a query's full candidate set."""
    import random

    from pyspark.sql.window import Window as W

    from k8s_vectordb_sync_spark.operators.similarity import topk_per_query

    rng = random.Random(11)
    rows = [
        (q, n, round(rng.uniform(-1, 1), 6))
        for q in range(4)
        for n in range(500)
    ]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, score double"
    ).repartition(8)
    two_phase = topk_per_query(scored, k=7)
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    naive = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
        .select("query_id", "neighbor_id", F.round("score", 4).alias("score"), "rank")
    )
    assert sorted(map(tuple, two_phase.collect())) == sorted(map(tuple, naive.collect()))
    plan = two_phase._jdf.queryExecution().executedPlan().toString()
    # two Window nodes (partial then final) and the bounding local-rank filter
    assert plan.count("Window") >= 2
    assert "__lr" in plan and "SPARK_PARTITION_ID" in plan.upper()


# ---------------------------------------------------------------------------
# Round-5 batch 2: binary quantization, novelty, fuzzy decontamination
# ---------------------------------------------------------------------------


def test_sign_codes_and_hamming_crafted(spark):
    """Sign words match a direct per-dimension sign comparison; hamming(v, v)
    = 0 and hamming(v, -v) = dim."""
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.operators.similarity import hamming_topk, sign_codes

    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(4)]
    vecs.append([-x for x in vecs[0]])  # id 4 = negation of id 0
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    codes = {r["vec_id"]: (r["w0"], r["w1"]) for r in sign_codes(df, "vec_id", "embedding", 64).collect()}
    for i, v in enumerate(vecs):
        expect = [sum((1 << j) for j in range(32) if v[w * 32 + j] >= 0) for w in range(2)]
        assert codes[i] == tuple(expect)

    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = {r["neighbor_id"]: r["hamming"] for r in hamming_topk(df, q, k=5).collect()}
    assert out[0] == 0
    assert out[4] == 64


def test_hamming_topk_matches_python_oracle(spark):
    """Rank order equals a Python-computed sign-mismatch count ranking."""
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.operators.similarity import hamming_topk

    import random

    rng = random.Random(13)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["hamming"])
        for r in hamming_topk(df, q, k=4).collect()
    ]
    for qid in (0, 1):
        qv = vecs[qid][1]
        hams = sorted(
            (sum((a >= 0) != (b >= 0) for a, b in zip(qv, v)), i) for i, v in vecs
        )
        expect = [(qid, rk + 1, i, h) for rk, (h, i) in enumerate(hams[:4])]
        assert sorted(x for x in got if x[0] == qid) == expect


def test_ngram_novelty_bounds(spark):
    """A doc duplicated verbatim scores 0 novelty; a fully unique doc 1.0."""
    from k8s_vectordb_sync_spark.operators.dedup import ngram_novelty

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "completely different unique words appear nowhere else here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0
    assert out[3]["n_unique"] == out[3]["n_shingles"]


def test_minhash_contamination_flags_near_dup_only(spark):
    """A train doc identical to an eval doc is flagged at est 1.0; an
    unrelated train doc is absent from the report."""
    from k8s_vectordb_sync_spark.operators.contamination import minhash_contamination

    eval_rows = [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    train_rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "nothing in common with the benchmark text at all whatsoever"),
    ]
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in minhash_contamination(tr, ev).collect()}
    assert set(out) == {1}
    assert out[1]["max_est"] == 1.0
    assert out[1]["n_eval_matches"] == 1


def test_bloom_incremental_no_false_negatives_crafted(spark):
    """The invariant dedup_incremental_bloom rests on: every true duplicate
    is a bloom candidate (no false negatives), so gating the exact join on
    the bloom bit cannot change the dedup outcome."""
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.operators import bloom as bl

    hist = spark.createDataFrame(
        [(f"fp{i}",) for i in range(200)], "fp string"
    )
    # 50 new keys: 25 present in history, 25 fresh
    new = spark.createDataFrame(
        [(f"fp{i}",) for i in range(150, 175)] + [(f"xx{i}",) for i in range(25)],
        "fp string",
    )
    bloom = bl.build_bloom(hist.select(F.col("fp").alias("__k")), "__k")
    probed = new.crossJoin(F.broadcast(bloom)).select(
        "fp", F.expr(bl.might_contain_sql("fp")).alias("hit")
    )
    rows = {r["fp"]: r["hit"] for r in probed.collect()}
    # no false negatives: every true member is a candidate
    assert all(rows[f"fp{i}"] for i in range(150, 175))
    # gated join == plain join
    hist_k = hist.select("fp", F.lit(True).alias("in_hist"))
    plain = {
        r["fp"]: r["in_hist"] is not None
        for r in new.join(hist_k, "fp", "left").collect()
    }
    gated_cand = probed.filter("hit").join(hist_k, "fp", "left")
    gated = {r["fp"]: r["in_hist"] is not None for r in gated_cand.collect()}
    for fp_key, dup in plain.items():
        assert gated.get(fp_key, False) == dup


def test_edit_distance_pairs_crafted(spark):
    """Single-character edits are found; a head-edited pair (different
    leading tokens) is the documented blocking recall gap; identical docs
    score 0."""
    from k8s_vectordb_sync_spark.operators.dedup import edit_distance_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dogs"),  # 1 edit
        (3, "the quick brown fox jumps over the lazy dog"),  # identical to 1
        (4, "teh quick brown fox jumps over the lazy dog"),  # HEAD edit -> other block
        (5, "completely unrelated text about something else entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["dist"] for r in edit_distance_pairs(df).collect()}
    assert out[(1, 2)] == 1
    assert out[(1, 3)] == 0 and out[(2, 3)] == 1
    # head edit lands in a different block: not a candidate (recall caveat)
    assert (1, 4) not in out
    assert not any(5 in pair for pair in out)


def test_edit_distance_block_cap_drops_degenerate_block(spark):
    """A block larger than max_block_size produces no pairs — the quadratic
    guard for boilerplate openings."""
    from k8s_vectordb_sync_spark.operators.dedup import edit_distance_pairs

    rows = [(i, f"same opening words here variant {i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert edit_distance_pairs(df, max_block_size=10).count() == 0
    assert edit_distance_pairs(df, max_block_size=100, max_dist=2).count() > 0


def test_round5_ops_handle_empty_inputs(spark):
    """Empty frames flow through the new operators without errors — the
    pre-ingestion / filtered-out-partition state."""
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.operators.dedup import (
        edit_distance_pairs,
        ngram_novelty,
    )
    from k8s_vectordb_sync_spark.operators.sampling import group_cap
    from k8s_vectordb_sync_spark.operators.similarity import hamming_topk

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert ngram_novelty(empty_docs).count() == 0
    assert edit_distance_pairs(empty_docs).count() == 0

    empty_scored = spark.createDataFrame([], "source string, doc_id long, quality double")
    assert group_cap(empty_scored, "source", "quality", "doc_id", 5).count() == 0

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [0.5] * 64)], "query_id long, query_vec array<double>"
    )
    assert hamming_topk(empty_emb, q, k=5).count() == 0


def test_lsh_band_sweep_nesting_and_band_size_config(spark):
    """Aligned band slices nest: an r=8 bucket match implies both contained
    r=4 matches, so candidate counts are monotone nonincreasing in rows-per-
    band. The r=BAND_SIZE configuration's true-pair count must equal the
    registered signature-verify miner's pair count (same buckets, same
    gate); non-divisors of NUM_MINHASHES are rejected."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base, "s"),
        (2, base, "s"),
        (3, base + " slightly changed tail words", "s"),
        (4, "completely unrelated text about spark query engines here", "s"),
        (5, "another distinct document mentioning parquet shuffles only", "s"),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    sweep = {
        r["rows_per_band"]: r.asDict()
        for r in lsh_band_sweep(docs, threshold=0.5).collect()
    }
    assert sorted(sweep) == [1, 2, 4, 8]
    # more rows per band -> equal-or-fewer candidates (nested buckets)
    assert (
        sweep[8]["n_candidates"]
        <= sweep[4]["n_candidates"]
        <= sweep[2]["n_candidates"]
        <= sweep[1]["n_candidates"]
    )
    # the r=BAND_SIZE row replays the registered signature-verify miner
    n_sig_pairs = minhash_lsh_pairs(docs, threshold=0.5, verify="signature").count()
    assert sweep[BAND_SIZE]["n_true_pairs"] == n_sig_pairs
    # identical docs are candidates under every banding
    assert sweep[8]["n_candidates"] >= 1
    for r in (1, 2, 4, 8):
        cfg = sweep[r]
        assert cfg["n_bands"] == 16 // r
        if cfg["n_candidates"] > 0:
            assert 0.0 <= cfg["precision"] <= 1.0
        assert 0.0 < cfg["t50"] < 1.0
    with pytest.raises(ValueError, match="does not divide"):
        lsh_band_sweep(docs, rows_per_band_options=(3,)).collect()


def test_ivf_nprobe_sweep_monotone_and_full_scan_anchor(spark):
    """Probe sets nest, so candidate sets nest; every exact-top-k member
    present among candidates outranks every non-member, so hits — and mean
    recall — are monotone nondecreasing in nprobe, and nprobe = n_clusters
    is a full scan with recall exactly 1.0. Out-of-range probe counts are
    rejected."""
    import random

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = {
        r["nprobe"]: r.asDict()
        for r in ivf_nprobe_sweep(
            emb, q, k=5, n_clusters=4, nprobe_options=(1, 2, 4)
        ).collect()
    }
    assert sorted(out) == [1, 2, 4]
    assert out[1]["mean_recall"] <= out[2]["mean_recall"] <= out[4]["mean_recall"]
    assert out[4]["mean_recall"] == 1.0  # full scan
    assert out[4]["scan_frac"] == 1.0 and out[1]["scan_frac"] == 0.25
    assert all(r["n_queries"] == 4 for r in out.values())
    with pytest.raises(ValueError, match="outside"):
        ivf_nprobe_sweep(emb, q, n_clusters=4, nprobe_options=(8,)).collect()


def test_ivf_nprobe_sweep_broadcast_bound(spark):
    """max_broadcast_queries (VERDICT r7 nit 1): above the cap the probe
    frame is NOT broadcast — the per-config scoring joins run as shuffled
    equi-joins on cluster — and the sweep output is identical row-for-row
    (the guard changes the physical join strategy only)."""
    import random

    rng = random.Random(13)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    kwargs = dict(k=5, n_clusters=4, nprobe_options=(1, 4))
    bcast = ivf_nprobe_sweep(emb, q, **kwargs)  # 4 * 4 <= default cap
    capped = ivf_nprobe_sweep(emb, q, max_broadcast_queries=8, **kwargs)
    assert sorted(map(tuple, bcast.collect())) == sorted(map(tuple, capped.collect()))
    plan_b = bcast._jdf.queryExecution().optimizedPlan().toString()
    plan_c = capped._jdf.queryExecution().optimizedPlan().toString()
    # the guard strips the FORCED broadcast hint from the per-config probe
    # joins (2 configs here); AQE may still freely pick a broadcast at
    # runtime from ACTUAL sizes — that adaptive fallback is the point, so
    # assert on the hint, not the executed strategy
    assert (
        plan_c.count("strategy=broadcast")
        == plan_b.count("strategy=broadcast") - 2
    )


def test_family_agreement_counts_scope_difference(spark):
    """MinHash mines pairs globally; SimHash blocks candidates within
    source. Two identical docs in ONE source are found by both; two
    identical docs split ACROSS sources are found only by MinHash — the
    agreement readout surfaces exactly that scope gap."""
    import os
    import tempfile

    from k8s_vectordb_sync_spark.queries import QUERIES

    text_a = "the quick brown fox jumps over the lazy dog again and again today"
    text_b = "completely different words about parquet shuffle partitioning at scale"
    rows = [
        (1, text_a, "en", "s", 10),
        (2, text_a, "en", "s", 10),   # same source -> both families
        (3, text_b, "en", "t", 10),
        (4, text_b, "en", "u", 10),   # cross-source -> minhash only
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp(prefix="kvs-fam-")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = QUERIES["dedup_family_agreement"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_minhash"] == 2 and r["n_simhash"] == 1
    assert r["n_both"] == 1 and r["n_either"] == 2
    assert r["agreement"] == 0.5


def test_cluster_pareto_known_cluster_sizes(spark):
    """A 3-doc identical family and a separate 2-doc identical family yield
    exactly two distribution rows: (size 3, 1 cluster, 60% of clustered
    docs) and (size 2, 1 cluster, 40%). Unique docs never enter the graph."""
    import os
    import tempfile

    from k8s_vectordb_sync_spark.queries import QUERIES

    fam3 = "the quick brown fox jumps over the lazy dog again and again today"
    fam2 = "completely different words about parquet shuffle partitioning at scale"
    uniq = "a third unrelated document mentioning watermarks and state stores"
    rows = [(i, fam3, "en", "s", 10) for i in (1, 2, 3)]
    rows += [(i, fam2, "en", "s", 10) for i in (10, 11)]
    rows += [(20, uniq, "en", "s", 10)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp(prefix="kvs-pareto-")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["cluster_size"]: r for r in QUERIES["dedup_cluster_pareto"](spark, d).collect()}
    assert sorted(out) == [2, 3]
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[3]["doc_share"] == 0.6 and out[2]["doc_share"] == 0.4


def test_power_iteration_recovers_dominant_direction(spark):
    """Vectors spread along e1 with small e2 noise: the top component must
    align with e1 (|loading_1| ≈ 1, others ≈ 0) and explain most of the
    variance. An all-equal corpus has zero centered variance — all-zero
    loadings, ratio 0.0 — and an empty corpus yields an empty frame."""
    from k8s_vectordb_sync_spark.operators.similarity import (
        power_iteration_top_component,
    )

    dim = 8
    rows = []
    for i in range(40):
        v = [0.0] * dim
        v[0] = float(i - 20)           # dominant spread
        v[1] = 0.05 * ((i * 7) % 5 - 2)  # small noise
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["dim"]: r for r in power_iteration_top_component(emb, dim=dim).collect()}
    assert sorted(out) == list(range(1, dim + 1))
    assert abs(abs(out[1]["loading"]) - 1.0) < 0.01
    assert all(abs(out[d]["loading"]) < 0.05 for d in range(2, dim + 1))
    assert out[1]["explained_ratio"] > 0.95
    # zero centered variance -> all-zero loadings, ratio 0.0
    const = spark.createDataFrame(
        [(i, [0.5] * dim) for i in range(5)], "vec_id long, embedding array<double>"
    )
    cz = power_iteration_top_component(const, dim=dim).collect()
    assert all(r["loading"] == 0.0 and r["explained_ratio"] == 0.0 for r in cz)
    # empty corpus -> empty frame with the right schema
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    eout = power_iteration_top_component(empty, dim=dim)
    assert eout.count() == 0
    assert eout.columns == ["dim", "loading", "explained_ratio"]


def test_dup_clusters_frontier_propagation_matches_union_find(spark):
    """Round 14: each round's edge join streams the changed-label FRONTIER
    instead of the full label frame. On a graph mixing shapes that exercise
    several frontier generations (two chains of different diameters, a star,
    an isolated pair), the labels must equal the ground-truth component
    minima from a driver-side union-find."""
    from k8s_vectordb_sync_spark.operators.dedup import dup_clusters

    edges = (
        [(i, i + 1) for i in range(12)]
        + [(100 + i, 101 + i) for i in range(7)]
        + [(200, 200 + i) for i in range(1, 6)]
        + [(500, 501)]
    )
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert out == truth
    assert set(out.values()) == {0, 100, 200, 500}
