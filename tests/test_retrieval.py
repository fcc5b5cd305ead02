"""Lexical retrieval (BM25, inverted index, RRF hybrid), exact-substring
dedup, and sketch (HLL / Count-Min) operator tests on hand-built corpora
with hand-checkable expectations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.operators import dedup as dd
from k8s_vectordb_sync_spark.operators import retrieval as ret
from k8s_vectordb_sync_spark.operators import sketches as sk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --- BM25 ------------------------------------------------------------------


def test_doc_term_freqs_counts_occurrences(spark):
    df = _docs(spark, [(0, "a b a"), (1, "b")])
    tf = {(r.doc_id, r.term): r.tf for r in ret.doc_term_freqs(df).collect()}
    assert tf == {(0, "a"): 2, (0, "b"): 1, (1, "b"): 1}


def test_bm25_matches_hand_formula(spark):
    # Corpus: doc0 'x x y', doc1 'x z', doc2 'y y'. Query terms {x} only.
    df = _docs(spark, [(0, "x x y"), (1, "x z"), (2, "y y")])
    qterms = spark.createDataFrame([(9, "x")], "query_id bigint, term string")
    out = {
        r.neighbor_id: r.score
        for r in ret.bm25_scored(ret.doc_term_freqs(df), qterms).collect()
    }
    # N=3, avgdl = (3+2+2)/3; df(x)=2 -> idf = round(ln(1 + 1.5/2.5), 6)
    idf = round(math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5)), 6)
    def s(tf, dl):
        return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (7 / 3))), 6)
    assert out == {0: s(2, 3), 1: s(1, 2)}  # doc2 has no 'x', absent


def test_bm25_topk_self_retrieval(spark, sf_dir):
    # A query doc's own top terms should retrieve the doc itself highly.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings = ret.build_postings(docs)
    qterms = ret.derive_query_terms(postings, n_queries=2, terms_per_query=5)
    top = ret.bm25_topk(postings, qterms, k=10).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    for qid, neighbors in by_q.items():
        assert qid in neighbors


def test_inverted_index_caps_postings(spark):
    rows = [(i, "common word" if i < 150 else "rare item") for i in range(160)]
    df = _docs(spark, rows)
    idx = {
        r.term: r
        for r in ret.inverted_index(
            ret.doc_term_freqs(df), max_postings=100
        ).collect()
    }
    assert idx["common"].df == 150  # df counts ALL docs
    assert len(idx["common"].postings) == 100  # list capped
    assert idx["common"].postings == sorted(idx["common"].postings)
    assert idx["rare"].df == 10
    assert len(idx["rare"].postings) == 10


def test_rrf_fuse_hand_check(spark):
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id bigint, neighbor_id bigint, rank int"
    )
    vec = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id bigint, neighbor_id bigint, rank int"
    )
    out = {r.neighbor_id: r for r in ret.rrf_fuse(lex, vec, k=10).collect()}
    # doc 11 appears in both rankings -> highest fused score
    assert out[11].rank == 1
    assert out[11].rrf_score == round(1.0 / 62 + 1.0 / 61, 6)
    assert out[10].lex_rank == 1 and out[10].vec_rank is None
    assert out[12].vec_rank == 2 and out[12].lex_rank is None
    assert out[10].rrf_score == round(1.0 / 61, 6)


# --- exact-substring dedup -------------------------------------------------


def test_substring_spans_finds_planted_copy(spark):
    shared = "one two three four five six seven eight"
    df = _docs(
        spark,
        [
            (0, f"intro {shared} tail0"),
            (1, f"other {shared} tail1"),
            (2, "totally different words with no overlap at all here"),
        ],
    )
    spans = dd.substring_spans(df, n=8, min_docs=2).collect()
    assert any(r.span == shared and r.n_docs == 2 for r in spans)
    # no span from doc2 is shared
    assert all("totally" not in r.span for r in spans)


def test_substring_spans_short_docs_empty(spark):
    df = _docs(spark, [(0, "a b c"), (1, "a b c")])
    assert dd.substring_spans(df, n=8).count() == 0


def test_substring_dup_rate_all_docs_emitted(spark):
    shared = "one two three four five six seven eight"
    df = _docs(
        spark,
        [
            (0, shared),  # every span (exactly 1) duplicated -> rate 1.0
            (1, f"{shared} and some extra trailing words beyond"),
            (2, "totally different words with no overlap at all here"),
            (3, "short"),  # zero spans -> rate 0.0
        ],
    )
    out = {r.doc_id: r for r in dd.substring_dup_rate(df, n=8).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0].n_spans == 1 and out[0].dup_rate == 1.0
    assert out[1].dup_spans == 1  # only the aligned window matches
    assert 0.0 < out[1].dup_rate < 1.0
    assert out[2].dup_spans == 0 and out[2].dup_rate == 0.0
    assert out[3].n_spans == 0 and out[3].dup_rate == 0.0


# --- sketches --------------------------------------------------------------


def test_hll_estimate_within_error(spark):
    # 2000 distinct keys in one group: HLL with m=256 has ~6.5% std error;
    # assert a generous 3-sigma bound. Deterministic hashing -> stable value.
    rows = [("g", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, k bigint")
    (r,) = sk.hll_distinct(df, key_col="k", group_cols=["grp"]).collect()
    assert r.n_exact == 2000
    assert r.rel_err < 0.2
    # run twice -> identical estimate (pure deterministic arithmetic)
    (r2,) = sk.hll_distinct(df, key_col="k", group_cols=["grp"]).collect()
    assert r2.n_hll == r.n_hll


def test_hll_small_range_correction_exactish(spark):
    # 5 distinct keys: linear-counting regime, estimate lands near 5.
    df = spark.createDataFrame(
        [("g", i) for i in range(5)], "grp string, k bigint"
    )
    (r,) = sk.hll_distinct(df, key_col="k", group_cols=["grp"]).collect()
    assert r.n_exact == 5
    assert abs(r.n_hll - 5) < 1


def test_cms_overestimates_only(spark):
    rows = [(0, " ".join(f"w{i % 37}" for i in range(300)))]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = sk.cms_heavy_hitters(df, top_n=20).collect()
    assert len(out) == 20
    for r in out:
        assert r.cms_n >= r.exact_n  # one-sided error
        assert r.overestimate == r.cms_n - r.exact_n


# --- bloom pre-join --------------------------------------------------------


def test_bloom_no_false_negatives_and_audit(spark):
    from k8s_vectordb_sync_spark.operators import bloom as bl

    keys = spark.createDataFrame([(i * 7,) for i in range(50)], "k bigint")
    fact = spark.createDataFrame([(i,) for i in range(400)], "fk bigint")
    (r,) = bl.bloom_prejoin_audit(fact, keys, "fk", "k").collect()
    assert r.n_fact == 400
    # members of fact: multiples of 7 under 350 -> 50 keys, all < 400? 49*7=343
    assert r.n_true == 50
    # Bloom filters NEVER miss a member: candidates cover all true matches.
    assert r.n_candidates >= r.n_true
    assert r.n_false_pos == r.n_candidates - r.n_true
    # 150 bits set at most in 65536 -> fp rate must be tiny here
    assert r.fp_rate < 0.01


def test_bloom_words_dense_array(spark):
    from k8s_vectordb_sync_spark.operators import bloom as bl

    keys = spark.createDataFrame([(1,), (2,)], "k bigint")
    (row,) = bl.build_bloom(keys, "k").collect()
    assert len(row.words) == bl.BLOOM_WORDS
    # exactly <= K*2 bits set across all words
    set_bits = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in row.words)
    assert 1 <= set_bits <= bl.BLOOM_K * 2


# --- BPE pair counts -------------------------------------------------------


def test_bpe_pair_counts_hand_check(spark, sf_dir):
    from k8s_vectordb_sync_spark.queries import QUERIES

    out = QUERIES["text_bpe_pair_counts"](spark, sf_dir).collect()
    assert len(out) == 20
    assert out[0].rnk == 1
    # counts descend, ties broken by pair text
    ns = [r.n for r in out]
    assert ns == sorted(ns, reverse=True)


# --- streaming HLL sketch --------------------------------------------------


def test_streaming_hll_matches_batch(spark, tmp_path):
    """The HLL bucket-max state is a plain MAX aggregation, so it runs as an
    incremental stateful aggregation under Structured Streaming; finalizing
    the memory-sink state gives EXACTLY the batch estimate (the sketch is
    deterministic arithmetic, so streaming == batch bit-for-bit)."""
    import pyspark.sql.functions as F

    rows = [("a", i % 700) for i in range(2000)] + [("b", i % 37) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, k bigint")
    src = f"{tmp_path}/src"
    df.repartition(4).write.parquet(src)

    batch = {
        r.grp: r.n_hll
        for r in sk.hll_distinct(
            spark.read.parquet(src), "k", ["grp"]
        ).collect()
    }

    raw = spark.readStream.schema(df.schema).parquet(src)
    q = (
        sk.hll_bucket_maxes(raw, "k", ["grp"])
        .writeStream.format("memory")
        .queryName("hll_state")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = spark.sql("SELECT * FROM hll_state")
    est = {
        r.grp: r.n_hll
        for r in sk.hll_estimate(state, ["grp"])
        .select("grp", F.round("__est", 2).alias("n_hll"))
        .collect()
    }
    assert est == batch


# --- pagerank --------------------------------------------------------------


def test_pagerank_hand_computed_path_graph(spark):
    """Path graph 1-2-3: node 2 (the hub) must outrank the leaves, and the
    values must equal the formula replayed in plain Python with the same
    rounding discipline."""
    from k8s_vectordb_sync_spark.operators.graph import pagerank

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a bigint, doc_b bigint")
    out = {r.doc_id: r for r in pagerank(pairs, iterations=3, damping=0.85).collect()}
    assert out[1].degree == 1 and out[2].degree == 2 and out[3].degree == 1

    deg = {1: 1, 2: 2, 3: 1}
    nbrs = {1: [2], 2: [1, 3], 3: [2]}
    pr = {k: 1.0 / 3 for k in deg}
    base = 1.0 - 0.85
    for _ in range(3):
        pr = {
            k: base / 3
            + 0.85 * sum(round(pr[u] / deg[u], 9) for u in nbrs[k])
            for k in deg
        }
    for k in deg:
        assert out[k].pagerank == round(pr[k], 6)
    assert out[2].pagerank > out[1].pagerank == out[3].pagerank


# --- split + weighted sampling ---------------------------------------------


def test_train_split_deterministic_and_proportional(spark):
    from k8s_vectordb_sync_spark.operators.sampling import train_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    a = {r.doc_id: r.split for r in train_split(df).collect()}
    b = {r.doc_id: r.split for r in train_split(df.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    from collections import Counter

    c = Counter(a.values())
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.07 < c["val"] / 2000 < 0.13
    assert 0.07 < c["test"] / 2000 < 0.13


def test_weighted_sample_biases_toward_heavy_rows(spark):
    from k8s_vectordb_sync_spark.operators.sampling import weighted_sample

    # 100 heavy rows (w=1000) vs 900 light rows (w=1): heavy rows should
    # dominate a 50-row sample, and zero-weight rows never appear.
    rows = [(i, 1000 if i < 100 else (0 if i >= 990 else 1)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = weighted_sample(df, weight_col="w", n=50, key_col="doc_id").collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r.doc_id < 100)
    assert heavy > 35
    assert all(r.doc_id < 990 for r in got)  # zero-weight excluded
    again = weighted_sample(df.repartition(5), weight_col="w", n=50).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in got)


def test_quantile_sketch_bounded_error(spark):
    """Uniform values on [0, 500): the 256-bin sketch over a 512-wide domain
    has bin width 2, so interpolation error is bounded by one bin width."""
    rows = [("g", (i * 37) % 500 + 0.5) for i in range(5000)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = sk.quantile_sketch_estimates(df, "v", ["grp"], [0.5, 0.95])
    for r in out.collect():
        assert r.abs_err <= 2.0 * sk.QSK_WIDTH


def test_hll_union_at_least_max_side(spark):
    rows = [("a", i) for i in range(800)] + [("b", i + 400) for i in range(800)]
    df = spark.createDataFrame(rows, "grp string, k bigint")
    (r,) = sk.hll_union(df, "k", "grp", ["a", "b"]).collect()
    assert r.n_exact == 1200  # 800 + 800 - 400 overlap
    assert r.rel_err < 0.2
    # merged estimate must be >= each side's estimate (monotone union)
    sides = {
        x.grp: x.n_hll for x in sk.hll_distinct(df, "k", ["grp"]).collect()
    }
    assert r.n_hll >= max(sides.values()) * 0.99


def test_triangle_stats_hand_checked(spark):
    from k8s_vectordb_sync_spark.operators.graph import triangle_stats

    # K3 plus a pendant: triangles(1,2,3); wedges = C(2,2)*3 for the
    # triangle nodes with deg 2,2,3 -> 1+1+3 = 5; clustering = 3*1/5
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a bigint, doc_b bigint"
    )
    (r,) = triangle_stats(pairs).collect()
    assert r.n_edges == 4
    assert r.n_triangles == 1
    assert r.n_wedges == 5
    assert r.clustering == round(3.0 * 1 / 5, 6)


def test_triangle_stats_celebrity_star_no_triangles(spark):
    from k8s_vectordb_sync_spark.operators.graph import triangle_stats

    # star graph: hub with 50 spokes -> 0 triangles, C(50,2) wedges, and the
    # degree-ordered orientation keeps the hub's out-degree at 0 (all edges
    # orient INTO the hub), so the wedge join stays empty -> linear.
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 51)], "doc_a bigint, doc_b bigint"
    )
    (r,) = triangle_stats(pairs).collect()
    assert r.n_triangles == 0
    assert r.n_wedges == 50 * 49 // 2
    assert r.clustering == 0.0


def test_containment_catches_subset_duplicate_jaccard_misses(spark):
    """A doc pasted whole into a larger host (still band-colliding): the
    symmetric Jaccard miner at 0.9 misses it, but the small side's
    containment is exactly 1.0 — the subset-duplicate signal."""
    small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    host = small + " " + " ".join(f"pad{i}" for i in range(5))
    df = spark.createDataFrame(
        [(0, small), (1, host)], "doc_id bigint, text string"
    )
    assert dd.minhash_lsh_pairs(df, threshold=0.9).collect() == []
    cont = dd.containment_pairs(df, threshold=0.7).collect()
    assert len(cont) == 1
    (r,) = cont
    assert r.doc_a == 0 and r.doc_b == 1
    assert r.containment_a == 1.0  # small side fully contained
    assert r.containment_b < 0.7  # host side below threshold (asymmetry)


def test_containment_blocking_recall_caveat_documented(spark):
    """The documented LSH-blocking caveat: a tiny doc inside a MUCH larger
    host shares no band (the host's shingles dominate the signature), so
    the blocked miner finds nothing — the reason production adds a second
    small-side blocking pass. This test pins the behavior the docstring
    promises rather than pretending the miner has full recall."""
    small = "alpha beta gamma delta epsilon zeta eta theta"
    host = small + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(30))
    df = spark.createDataFrame(
        [(0, small), (1, host)], "doc_id bigint, text string"
    )
    assert dd.containment_pairs(df, threshold=0.7).collect() == []


def test_streaming_cms_state_matches_batch(spark, tmp_path):
    """The CMS bucket sums are plain SUM aggregations, so the sketch builds
    incrementally under Structured Streaming; finalized bucket state equals
    the batch sketch exactly (deterministic integer arithmetic)."""
    rows = [(i, " ".join(f"w{(i + j) % 23}" for j in range(20))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    src = f"{tmp_path}/cms_src"
    df.repartition(4).write.parquet(src)

    from k8s_vectordb_sync_spark.functions.text import tokens

    def bucket_sums(frame):
        occ = frame.select(F.explode(tokens(F.col("text"))).alias("term"))
        rows_arr = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), sk.cms_bucket(F.col("term"), j).alias("b")
                )
                for j in range(sk.CMS_DEPTH)
            ]
        )
        return (
            occ.select(F.explode(rows_arr).alias("rb"))
            .groupBy(F.col("rb.j").alias("j"), F.col("rb.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("bucket_n"))
        )

    batch = {
        (r.j, r.b): r.bucket_n
        for r in bucket_sums(spark.read.parquet(src)).collect()
    }
    raw = spark.readStream.schema(df.schema).parquet(src)
    q = (
        bucket_sums(raw)
        .writeStream.format("memory")
        .queryName("cms_state")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/cms_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.j, r.b): r.bucket_n for r in spark.sql("SELECT * FROM cms_state").collect()
    }
    assert got == batch


def test_hll_intersection_overlap_disjoint_and_empty(spark):
    """Inclusion-exclusion overlap: 300 users click, 300 purchase, 100 do
    both. Each sketch has ~6.5% relative error; the intersection estimate
    compounds all three, so assert a generous 3-sigma-ish band around 100.
    Disjoint populations estimate ≈ 0 (clamped at 0 exactly when the union
    estimate exceeds the sum). Empty input yields zero rows."""
    rows = [(i, "click") for i in range(300)]
    rows += [(i, "purchase") for i in range(200, 500)]
    rows += [(i, "view") for i in range(1000)]  # ignored type
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = sk.hll_intersection(df, "user_id", "event_type", "click", "purchase").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_exact_inter"] == 100
    assert abs(r["n_hll_a"] - 300) / 300 < 0.25
    assert abs(r["n_hll_b"] - 300) / 300 < 0.25
    assert abs(r["n_hll_union"] - 500) / 500 < 0.25
    assert abs(r["n_hll_inter"] - 100) < 75  # three compounded sketches
    # disjoint: exact 0, estimate small (clamped at 0 from below)
    dj = spark.createDataFrame(
        [(i, "click") for i in range(250)] + [(1000 + i, "purchase") for i in range(250)],
        "user_id long, event_type string",
    )
    rd = sk.hll_intersection(dj, "user_id", "event_type", "click", "purchase").collect()[0]
    assert rd["n_exact_inter"] == 0
    assert 0.0 <= rd["n_hll_inter"] < 60
    # one side empty: row still emitted, empty sketch estimates 0.0
    one = sk.hll_intersection(
        spark.createDataFrame([(1, "click")], "user_id long, event_type string"),
        "user_id", "event_type", "click", "purchase",
    ).collect()[0]
    assert one["n_hll_b"] == 0.0 and one["n_exact_inter"] == 0
    # no qualifying rows at all: zero rows
    empty = sk.hll_intersection(
        spark.createDataFrame([(1, "view")], "user_id long, event_type string"),
        "user_id", "event_type", "click", "purchase",
    )
    assert empty.count() == 0


def test_streaming_hll_intersection_matches_batch(spark, tmp_path):
    """The three HLL states behind hll_intersection are each a per-(tag,
    bucket) MAX — an incremental stateful streaming aggregation. Tag each
    event with its own type AND the union tag, stream the bucket maxes, and
    finalize the memory-sink state: the inclusion-exclusion estimate equals
    the batch query's bit-for-bit (the sketch is deterministic arithmetic)."""
    rows = [(i, "click") for i in range(300)] + [
        (i, "purchase") for i in range(200, 500)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    src = f"{tmp_path}/isrc"
    df.repartition(4).write.parquet(src)

    batch = sk.hll_intersection(
        spark.read.parquet(src), "user_id", "event_type", "click", "purchase"
    ).collect()[0]

    raw = spark.readStream.schema(df.schema).parquet(src)
    # one stateful aggregation carries all three sketches: each row feeds
    # its own type's state and the union state
    tagged = raw.select(
        "user_id",
        F.explode(F.array(F.col("event_type"), F.lit("__union"))).alias("tag"),
    )
    q = (
        sk.hll_bucket_maxes(tagged, "user_id", ["tag"])
        .writeStream.format("memory")
        .queryName("hll_inter_state")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/ickpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = spark.sql("SELECT * FROM hll_inter_state")
    est = {
        r.tag: r.e
        for r in sk.hll_estimate(state, ["tag"])
        .select("tag", F.col("__est").alias("e"))
        .collect()
    }
    n_a = round(est.get("click", 0.0), 2)
    n_b = round(est.get("purchase", 0.0), 2)
    n_u = round(est["__union"], 2)
    inter = round(
        max(est.get("click", 0.0) + est.get("purchase", 0.0) - est["__union"], 0.0), 2
    )
    assert (n_a, n_b, n_u, inter) == (
        batch["n_hll_a"],
        batch["n_hll_b"],
        batch["n_hll_union"],
        batch["n_hll_inter"],
    )
