"""Key-forget sweep (plans/forget.py): rows for the opt-out list vanish,
untouched bucket directories are never rewritten (pruning proven by file
mtimes), the audit counts are exact, and the sweep is idempotent."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.plans.forget import forget_keys

N_BUCKETS = 8


@pytest.fixture()
def bucketed_target(spark, tmp_path):
    path = str(tmp_path / "target")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "id long, value string"
    ).withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("id")), F.lit(N_BUCKETS)).cast("int")
    )
    df.write.mode("overwrite").partitionBy("_bucket").parquet(path)
    return path


def _bucket_mtimes(path):
    out = {}
    for d in glob.glob(os.path.join(path, "_bucket=*")):
        out[os.path.basename(d)] = max(
            os.path.getmtime(f) for f in glob.glob(os.path.join(d, "*.parquet"))
        )
    return out


def test_forget_removes_only_listed_keys_and_prunes(spark, bucketed_target, tmp_path):
    keys = spark.createDataFrame([(3,), (77,), (150,), (9999,)], "id long")
    before = _bucket_mtimes(bucketed_target)
    audit = forget_keys(spark, bucketed_target, keys, num_buckets=N_BUCKETS)
    assert audit["requested_keys"] == 4
    assert audit["matched_keys"] == 3  # 9999 not present
    assert audit["rows_removed"] == 3
    assert 1 <= audit["buckets_touched"] <= 4
    back = spark.read.parquet(bucketed_target)
    ids = {r["id"] for r in back.select("id").collect()}
    assert ids == set(range(200)) - {3, 77, 150}
    # pruning proof: buckets outside the touched set were not rewritten
    after = _bucket_mtimes(bucketed_target)
    touched_buckets = {
        f"_bucket={r['_b']}"
        for r in keys.select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(N_BUCKETS)).cast("int").alias("_b")
        ).collect()
    }
    for b, mt in before.items():
        if b not in touched_buckets:
            assert after[b] == mt, f"untouched {b} was rewritten"

    # idempotent: second sweep removes nothing
    audit2 = forget_keys(spark, bucketed_target, keys, num_buckets=N_BUCKETS)
    assert audit2["rows_removed"] == 0 and audit2["matched_keys"] == 0


def test_forget_clears_fully_emptied_bucket(spark, tmp_path):
    path = str(tmp_path / "t2")
    df = spark.createDataFrame([(i, "x") for i in range(20)], "id long, value string")
    df = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("id")), F.lit(4)).cast("int")
    )
    df.write.mode("overwrite").partitionBy("_bucket").parquet(path)
    # forget EVERY key in one bucket
    one_bucket = {
        r["id"]
        for r in df.filter(F.col("_bucket") == 0).select("id").collect()
    }
    keys = spark.createDataFrame([(i,) for i in one_bucket], "id long")
    forget_keys(spark, path, keys, num_buckets=4)
    back = spark.read.parquet(path)
    assert back.filter(F.col("id").isin(list(one_bucket))).count() == 0
    assert back.count() == 20 - len(one_bucket)


def test_forget_requires_bucketed_layout(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.createDataFrame([(1, "a")], "id long, value string").write.parquet(path)
    with pytest.raises(ValueError):
        forget_keys(spark, path, spark.createDataFrame([(1,)], "id long"))


def test_forget_crash_before_swap_leaves_target_intact(
    spark, bucketed_target, monkeypatch
):
    """Crash safety (VERDICT r6): the heavy phase (scan, anti-join, staged
    write) happens in a hidden staging dir; a failure before the bucket
    swap leaves the target byte-identical and still fully served, and a
    re-run completes the sweep."""
    import k8s_vectordb_sync_spark.plans.forget as fg
    import k8s_vectordb_sync_spark.sources.staging as staging

    keys = spark.createDataFrame([(3,), (77,)], "id long")

    def boom(*a, **k):
        raise RuntimeError("injected crash between staging write and swap")

    monkeypatch.setattr(staging, "_swap_partitions", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        fg.forget_keys(spark, bucketed_target, keys, num_buckets=N_BUCKETS)
    # pre-forget rows all still served (the stale _stage_tmp staging dir is
    # underscore-hidden from parquet readers)
    back = spark.read.parquet(bucketed_target)
    assert {r["id"] for r in back.select("id").collect()} == set(range(200))

    monkeypatch.undo()
    audit = fg.forget_keys(spark, bucketed_target, keys, num_buckets=N_BUCKETS)
    assert audit["rows_removed"] == 2
    ids = {r["id"] for r in spark.read.parquet(bucketed_target).select("id").collect()}
    assert ids == set(range(200)) - {3, 77}
    # staging/trash dirs cleaned up after the successful sweep
    assert not os.path.exists(os.path.join(bucketed_target, staging.STAGE_DIR))
    assert not os.path.exists(os.path.join(bucketed_target, staging.TRASH_DIR))


def test_forget_honors_persisted_layout_meta(spark, bucketed_target):
    """With the sink's _layout.json present, forget_keys needs no layout
    arguments and refuses contradicting ones (ADVICE r6: a wrong
    num_buckets must not silently prune the wrong buckets)."""
    from k8s_vectordb_sync_spark.plans.forget import write_layout_meta

    write_layout_meta(bucketed_target, "id", N_BUCKETS)
    keys = spark.createDataFrame([(5,)], "id long")
    audit = forget_keys(spark, bucketed_target, keys)
    assert audit["rows_removed"] == 1
    assert audit["layout_verified"] is True
    assert audit["buckets_total"] == N_BUCKETS
    with pytest.raises(ValueError, match="contradicts"):
        forget_keys(spark, bucketed_target, keys, num_buckets=N_BUCKETS * 2)
    with pytest.raises(ValueError, match="contradicts"):
        forget_keys(spark, bucketed_target, keys, key_col="value")


def test_forget_detects_wrong_bucket_count_without_meta(spark, bucketed_target):
    """No meta file: every row read is re-hashed against its directory
    bucket, so an assumed num_buckets that disagrees with the write-time
    layout aborts BEFORE any rewrite instead of silently missing keys."""
    keys = spark.createDataFrame([(i,) for i in range(20)], "id long")
    with pytest.raises(ValueError, match="re-hash"):
        forget_keys(spark, bucketed_target, keys, num_buckets=N_BUCKETS * 2)
    assert spark.read.parquet(bucketed_target).count() == 200  # untouched


def test_forget_rejects_mismatched_key_type(spark, bucketed_target):
    """xxhash64 is type-sensitive: an int keys frame against a long target
    would compute different buckets — refuse rather than cast silently."""
    keys = spark.createDataFrame([(3,)], "id int")
    with pytest.raises(ValueError, match="type-sensitive"):
        forget_keys(spark, bucketed_target, keys, num_buckets=N_BUCKETS)
