"""Bucketed/partitioned write-path tests: the layout strategies must actually
change the physical plan (no exchange on bucketed joins; partition pruning on
partitioned reads)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from k8s_vectordb_sync_spark.sources.writers import (
    read_table,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="kvs-writers-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_shuffle_exchange(spark, workdir):
    left = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_left", f"{workdir}/left", key_col="id", buckets=4)
    write_bucketed(right, "t_right", f"{workdir}/right", key_col="id", buckets=4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "t_left").join(read_table(spark, "t_right"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no hash-partition exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_bucketed_aggregation_has_no_exchange(spark, workdir):
    df = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("key"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_agg", f"{workdir}/agg", key_col="key", buckets=4)
    try:
        agg = read_table(spark, "t_agg").groupBy("key").agg(F.max("v"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg")


def test_partitioned_write_prunes(spark, workdir):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    )
    write_partitioned(df, f"{workdir}/parts", ["part"])
    back = spark.read.parquet(f"{workdir}/parts").filter(F.col("part") == 2)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 25
    # the predicate must land in the scan's PartitionFilters segment (pruning
    # at listing time), not survive as a post-scan Filter
    assert "PartitionFilters" in plan
    pf_segment = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "= 2" in pf_segment
