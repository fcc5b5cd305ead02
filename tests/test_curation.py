"""Training-data curation operators: deterministic stratified sampling, PII
scrubbing (crafted inputs — the synthetic corpus contains no PII), bigram
construction edge cases, and the composed cleaning pipeline's invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from k8s_vectordb_sync_spark.functions.text import bigrams, scrub_pii
from k8s_vectordb_sync_spark.operators.sampling import stratified_sample


def test_scrub_pii_crafted(spark):
    rows = [
        (1, "contact john.doe+spam@example.co.uk for details"),
        (2, "call 555-867-5309 or 555.867.5309 today"),
        (3, "server at 192.168.1.254 went down"),
        (4, "ssn 123-45-6789 leaked"),
        (5, "no pii here at all"),
        (6, "mixed: a@b.io then 10.0.0.1 then 111-22-3333"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", scrub_pii(F.col("text")).alias("s")).collect()
    }
    assert got[1] == "contact [EMAIL] for details"
    assert got[2] == "call [PHONE] or [PHONE] today"
    assert got[3] == "server at [IP] went down"
    assert got[4] == "ssn [SSN] leaked"
    assert got[5] == "no pii here at all"
    assert got[6] == "mixed: [EMAIL] then [IP] then [SSN]"


def test_scrub_pii_phone_not_claimed_by_ssn(spark):
    # a phone matched first must not leave an SSN-shaped remnant
    df = spark.createDataFrame([(1, "dial 415-555-1234 now")], "doc_id long, text string")
    assert (
        df.select(scrub_pii(F.col("text")).alias("s")).first()["s"]
        == "dial [PHONE] now"
    )


def test_stratified_sample_deterministic_and_rate(spark):
    rows = [(i, f"src{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out1 = stratified_sample(df, rates, default_rate=0.25)
    out2 = stratified_sample(df, rates, default_rate=0.25)
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids2 = sorted(r["doc_id"] for r in out2.collect())
    assert ids1 == ids2  # deterministic, not rand()

    by_src = {
        r["source"]: r["n"]
        for r in out1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src["src0"] == 1000  # rate 1.0 keeps everything
    assert "src2" not in by_src  # rate 0.0 keeps nothing
    assert 400 <= by_src["src1"] <= 600  # ~0.5 of 1000
    assert 150 <= by_src.get("src3", 0) <= 350  # default 0.25 of 1000


def test_stratified_sample_is_scan_predicate(spark):
    df = spark.createDataFrame([(1, "src0")], "doc_id long, source string")
    plan = (
        stratified_sample(df, {"src0": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure per-row predicate, no shuffle


def test_bigrams_edges(spark):
    rows = [(1, "a b c"), (2, "solo"), (3, ""), (4, "x  y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", bigrams(F.col("text")).alias("b")).collect()
    }
    assert got[1] == ["a b", "b c"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == ["x y"]  # empty tokens removed before pairing


def test_corpus_clean_pipeline_invariants(spark, sf_dir):
    from k8s_vectordb_sync_spark.queries import QUERIES

    out = {r["source"]: r for r in QUERIES["pipeline_corpus_clean"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_src = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert out  # gate keeps a non-trivial subset
    for src, row in out.items():
        assert 0 < row["n_docs"] <= per_src[src]
        assert row["n_tokens"] >= row["n_docs"]  # every kept doc has tokens


def test_scrub_pii_oracle_chain_matches_spark_on_crafted_pii(spark):
    # the corpus has no PII, so query parity alone can't prove the DuckDB
    # oracle chain works — pin Spark vs DuckDB on strings that DO contain PII
    import duckdb

    from k8s_vectordb_sync_spark.queries import _sql_pii_chain

    samples = [
        "contact john.doe+spam@example.co.uk for details",
        "call 555-867-5309 or 555.867.5309 today",
        "server at 192.168.1.254 went down",
        "ssn 123-45-6789 leaked",
        "mixed: a@b.io then 10.0.0.1 then 111-22-3333",
        "no pii here",
    ]
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, text string")
    got_spark = [
        r["s"]
        for r in sdf.select("i", scrub_pii(F.col("text")).alias("s")).orderBy("i").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, text VARCHAR)")
    for i, s in enumerate(samples):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
    got_duck = [
        r[0] for r in con.execute(f"SELECT {_sql_pii_chain('text')} FROM t ORDER BY i").fetchall()
    ]
    assert got_spark == got_duck
    assert got_spark[0] == "contact [EMAIL] for details"  # not vacuous


# ---------------------------------------------------------------------------
# fixed_size_sample
# ---------------------------------------------------------------------------


def test_fixed_size_sample_exact_n_and_deterministic(spark):
    from k8s_vectordb_sync_spark.operators.sampling import fixed_size_sample

    rows = [(i, "big" if i < 80 else "small") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = fixed_size_sample(df, 5, key_col="doc_id", strata_col="source")
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"big": 5, "small": 5}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in fixed_size_sample(df, 5).collect())
    assert a == b


def test_fixed_size_sample_small_stratum_returned_whole(spark):
    from k8s_vectordb_sync_spark.operators.sampling import fixed_size_sample

    df = spark.createDataFrame([(1, "s"), (2, "s")], "doc_id long, source string")
    assert fixed_size_sample(df, 10).count() == 2


def test_grouped_udf_zscore_matches_window(spark):
    """The Arrow-batched grouped-UDF (applyInPandas) surface, demonstrated on
    the z-score shape and checked against the pure-JVM window formulation the
    registered events_user_zscore query uses. The UDF form lives here rather
    than in the engine registry: Catalyst computes avg/stddev natively, so a
    registered query should never pay per-group Python serialization for
    arithmetic — but the grouped-UDF API itself (group -> pandas frame ->
    typed result) is part of the engine's surface and stays exercised."""
    import pandas as pd

    rows = [
        (i, i % 5, float((i * 37) % 100) / 7.0) for i in range(200)
    ] + [(900, 99, 1.25)]  # single-event user: sigma undefined -> dropped
    ev = spark.createDataFrame(rows, "event_id long, user_id long, value double")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=1)
        if not sigma > 0:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(zscore=0.0)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": ((pdf["value"] - mu) / sigma).round(3),
            }
        )

    udf_out = {
        (r["event_id"], r["user_id"]): r["zscore"]
        for r in ev.groupBy("user_id")
        .applyInPandas(zscore, schema="event_id long, user_id long, zscore double")
        .collect()
    }

    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    jvm_out = {
        (r["event_id"], r["user_id"]): r["zscore"]
        for r in ev.withColumn("mu", F.avg("value").over(w))
        .withColumn("sigma", F.stddev_samp("value").over(w))
        .filter(F.col("sigma") > 0)
        .select(
            "event_id",
            "user_id",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 3).alias(
                "zscore"
            ),
        )
        .collect()
    }
    assert set(udf_out) == set(jvm_out)
    for key, v in jvm_out.items():
        assert abs(udf_out[key] - v) <= 0.001  # 3-dp rounding boundary slack
    assert all(k[1] != 99 for k in jvm_out)  # sigma-undefined user dropped


def test_events_anomaly_mad_crafted(spark):
    """MAD outlier detection on crafted data: a tight cluster plus one wild
    value — the median/MAD ignore the outlier (robustness), the threshold
    flags exactly it."""
    from k8s_vectordb_sync_spark.queries import QUERIES
    import tempfile, os

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0, i, "purchase", float(v), "{}")
        for i, v in enumerate([10, 11, 12, 13, 14, 1000])
    ]
    rows += [(100 + i, t0, i, "view", 5.0, "{}") for i in range(4)]  # mad 0
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tempfile.mkdtemp(prefix="kvs-mad-")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in QUERIES["events_anomaly_mad"](spark, d).collect()}
    p = out["purchase"]
    assert p["median"] == 12.5 and p["mad"] == 1.5
    assert p["n_outliers"] == 1  # only the 1000
    v = out["view"]
    assert v["mad"] == 0.0 and v["n_outliers"] == 0  # all equal: nothing flagged


def test_group_cap_two_phase_equals_single_window(spark):
    """group_cap (partition-local prune then global rank) returns exactly the
    naive single-window top-cap, on a skewed frame spread over partitions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.operators.sampling import group_cap

    rows = [(f"g{(i % 3) if i < 90 else 0}", i, float((i * 37) % 50)) for i in range(120)]
    df = spark.createDataFrame(rows, "source string, doc_id long, quality double").repartition(7)
    got = sorted(
        (r["source"], r["doc_id"], r["rnk"])
        for r in group_cap(df, "source", "quality", "doc_id", 5).collect()
    )
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), F.col("doc_id"))
    naive = sorted(
        (r["source"], r["doc_id"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .collect()
    )
    assert got == naive
    assert len(got) == 15


def test_ewma_truncated_matches_python(spark, sf_dir):
    """events_ewma equals a per-user Python recompute of the truncated,
    renormalized exponential weights."""
    from k8s_vectordb_sync_spark.queries import QUERIES, _EWMA_SPAN, _EWMA_W
    from k8s_vectordb_sync_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out = {
        r["event_id"]: r["ewma"]
        for r in QUERIES["events_ewma"](spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value")
        .collect()
    )
    by_user: dict = {}
    for r in sorted(ev, key=lambda r: (r["ts_us"], r["event_id"])):
        hist = by_user.setdefault(r["user_id"], [])
        hist.append(r["value"])
        tail = hist[-_EWMA_SPAN:]
        num = sum(v * _EWMA_W ** (len(tail) - 1 - i) for i, v in enumerate(tail))
        den = (1 - _EWMA_W ** len(tail)) / (1 - _EWMA_W)
        assert abs(out[r["event_id"]] - num / den) < 1e-3, r["event_id"]


def test_split_leakage_detects_planted_train_to_test_copy(spark):
    """documents_split_leakage flags a val/test doc iff it shares an 8-token
    span with some train doc. doc_ids are chosen by replaying the split hash:
    1,3,4 are train; 2,8 are val; 25,54 are test. Doc 25 copies train doc 1's
    text (leaks); doc 2 shares an 8-token prefix with train doc 3 (leaks);
    docs 54 and 8 are unique (clean)."""
    import os
    import tempfile

    from k8s_vectordb_sync_spark.queries import QUERIES

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, "one two three four five six seven eight nine ten", "en", "s", 10),
        (3, shared + " completely different continuation words here now", "en", "s", 10),
        (4, "nothing in common with anything else at all whatsoever", "en", "s", 10),
        (2, shared + " another tail that differs from the train doc", "en", "s", 10),
        (8, "unique val document with its own words only here", "en", "s", 10),
        (25, "one two three four five six seven eight nine ten", "en", "s", 10),
        (54, "unique test document sharing no span with training data", "en", "s", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp(prefix="kvs-leak-")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["split"]: r for r in QUERIES["documents_split_leakage"](spark, d).collect()}
    assert out["val"]["n_docs"] == 2 and out["val"]["n_leaked"] == 1
    assert out["val"]["leak_rate"] == 0.5
    assert out["test"]["n_docs"] == 2 and out["test"]["n_leaked"] == 1
    assert out["test"]["leak_rate"] == 0.5


def test_quality_by_split_uniform_corpus_balanced(spark):
    """With every document identical, quality is constant, so each split's
    mean/min/max collapse to the same value — the null case of the
    split-balance audit; doc counts sum to the corpus size."""
    import os
    import tempfile

    from k8s_vectordb_sync_spark.queries import QUERIES

    text = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, text, "en", "s", len(text)) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp(prefix="kvs-qsplit-")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = QUERIES["documents_quality_by_split"](spark, d).collect()
    assert sum(r["n_docs"] for r in out) == 60
    vals = {(r["mean_quality"], r["min_quality"], r["max_quality"]) for r in out}
    assert len(vals) == 1
    m, lo, hi = vals.pop()
    assert m == lo == hi and 0.0 < m <= 1.0


def test_pq_recon_error_exact_on_representable_corpus(spark):
    """A corpus of copies of ONE vector is exactly representable no matter
    which rows the hash-sampled training keeps: every centroid lands on the
    single distinct subvector, reconstruction is exact, every cosine is
    1.0 (bin 19) and the corpus mean is 1.0."""
    import os
    import random
    import tempfile

    from k8s_vectordb_sync_spark.queries import QUERIES

    rng = random.Random(3)
    proto = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
    rows = [(i, list(proto)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = tempfile.mkdtemp(prefix="kvs-pqerr-")
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = QUERIES["embeddings_pq_recon_error"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bin"] == 19 and r["bin_lo"] == 0.95
    assert r["n_vectors"] == 40
    assert r["mean_cos"] == 1.0
