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
