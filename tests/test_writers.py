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


def test_ivf_index_partitioned_probe_prunes(spark, workdir):
    """The ANN IVF scale path made concrete (mirror of the LSH layout test
    below): train centroids, write the corpus partitioned by assigned
    cluster, and a probe for one query's n_probe nearest centroids prunes
    the scan to exactly those partitions at listing time — reading
    n_probe/n_clusters of the data, as the ivf_topk docstring promises."""
    import pyspark.sql.functions as F

    from k8s_vectordb_sync_spark.operators.similarity import (
        assign_clusters,
        kmeans_centroids,
    )

    dim, n_clusters, n_probe = 8, 4, 2
    emb = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.col("id") * i, F.lit(7)) - F.lit(3.0)).cast("double"),
        ).alias("embedding"),
    )
    centroids = kmeans_centroids(emb, n_clusters=n_clusters, iterations=3)
    cvecs = [c for _, c in centroids]
    indexed = assign_clusters(emb, cvecs)
    write_partitioned(indexed, f"{workdir}/ivf_index", ["cluster"])

    # n_probe nearest centroids for one query vector, chosen driver-side —
    # the same tiny math ivf_topk does per query
    qv = emb.first()["embedding"]
    d2 = lambda a, b: sum((x - y) ** 2 for x, y in zip(a, b))
    probes = sorted(range(n_clusters), key=lambda ci: (d2(qv, cvecs[ci]), ci))[:n_probe]

    back = spark.read.parquet(f"{workdir}/ivf_index")
    probe = back.filter(F.col("cluster").isin(probes))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_segment = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert all(str(ci) in pf_segment for ci in probes)
    # pruned read returns exactly the probed clusters' members
    assert probe.count() == indexed.filter(F.col("cluster").isin(probes)).count()
    assert 0 < probe.count() < 200  # probing genuinely skips partitions


def test_lsh_index_partitioned_probe_prunes(spark, workdir):
    # the ANN LSH scale path made concrete: persist the corpus partitioned by
    # hyperplane bucket, and a probe for one query's bucket prunes to that
    # partition at listing time — the 1/2^planes read the lsh_topk docstring
    # promises, verified on the real layout
    import pyspark.sql.functions as F

    from k8s_vectordb_sync_spark.operators.similarity import (
        hyperplane_bucket,
        lsh_planes,
    )

    dim = 8
    planes = lsh_planes(dim, n_planes=4)
    emb = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.col("id") * i, F.lit(7)) - F.lit(3.0)).cast("double"),
        ).alias("embedding"),
    )
    indexed = emb.withColumn("bucket", hyperplane_bucket("embedding", planes))
    write_partitioned(indexed, f"{workdir}/lsh_index", ["bucket"])

    back = spark.read.parquet(f"{workdir}/lsh_index")
    some_bucket = indexed.first()["bucket"]
    probe = back.filter(F.col("bucket") == some_bucket)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_segment = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert str(some_bucket) in pf_segment
    # pruned read returns exactly the bucket members
    assert probe.count() == indexed.filter(F.col("bucket") == some_bucket).count()


def test_aqe_splits_skewed_join(spark, workdir):
    """The 100 TB skew story made concrete: a join where one key holds ~90%
    of the fact rows. With AQE skew-join enabled (build_spark sets it) and
    test-scaled thresholds, the oversized partition is split into parallel
    subtasks — visible as `isSkew=true` / skew markers in the final adaptive
    plan — and the join result is unchanged."""
    import pyspark.sql.functions as F

    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 97).select(F.col("id").alias("k"), (F.col("id") * 2).alias("d"))
    fact.write.mode("overwrite").parquet(f"{workdir}/fact")
    dim.write.mode("overwrite").parquet(f"{workdir}/dim")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = (
            spark.read.parquet(f"{workdir}/fact")
            .join(spark.read.parquet(f"{workdir}/dim"), "k")
        )
        # execute THIS QueryExecution (count() would build a separate one
        # whose adaptive plan finalizes instead of joined's)
        n = len(joined.collect())
        assert n == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan or "isSkew=true" in plan or "Skew" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_prunes_box_queries_better_than_linear_sort(spark, tmp_path):
    """Range-partitioning files by the Morton key makes file-level min/max
    stats selective in BOTH dimensions: a 2D box predicate touches fewer
    files than under a linear (x-only) sort — the OPTIMIZE ZORDER claim,
    proven on real parquet footer statistics."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from k8s_vectordb_sync_spark.sources.writers import zorder_key

    n = 20000
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 65536).cast("bigint").alias("x"),
        ((F.col("id") * 40503 + 1237) % 65536).cast("bigint").alias("y"),
    )
    pz, px = f"{tmp_path}/zsorted", f"{tmp_path}/xsorted"
    df.withColumn("zkey", zorder_key(F.col("x"), F.col("y"))).repartitionByRange(
        32, "zkey"
    ).write.parquet(pz)
    df.repartitionByRange(32, "x").write.parquet(px)

    def touched(path, lo, hi):
        total, hit = 0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name not in ("x", "y"):
                        continue
                    st = col.statistics
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
            total += 1
            if all(mins[c] <= hi and maxs[c] >= lo for c in ("x", "y")):
                hit += 1
        return hit, total

    z_hit, z_total = touched(pz, 0, 8191)  # 1/8 x 1/8 box at the origin
    x_hit, x_total = touched(px, 0, 8191)
    assert z_total > 4 and x_total > 4
    # z-order touches strictly fewer files, and a small fraction overall
    assert z_hit / z_total < x_hit / x_total
    assert z_hit / z_total <= 0.25


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from k8s_vectordb_sync_spark.sources.writers import compact_parquet

    path = f"{tmp_path}/frag"
    spark.range(2000).repartition(40).write.parquet(path)
    before_rows = spark.read.parquet(path).count()
    nb, na = compact_parquet(spark, path, target_files=4)
    assert nb == 40 and na <= 4
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert sorted(r.id for r in after.collect()) == list(range(2000))


def test_jsonl_sharded_roundtrip_and_shard_bound(spark, tmp_path):
    """write_jsonl_sharded: every shard respects maxRecordsPerFile, and
    reading the JSONL back with the writing schema reproduces the frame."""
    import glob
    import json
    import os

    from k8s_vectordb_sync_spark.sources.writers import write_jsonl_sharded

    df = spark.createDataFrame(
        [(i, f"doc {i}", float(i) / 4) for i in range(1000)],
        "doc_id long, text string, score double",
    )
    path = str(tmp_path / "export")
    write_jsonl_sharded(df, path, records_per_shard=150, shards=2)
    files = sorted(glob.glob(os.path.join(path, "part-*")))
    assert len(files) >= 1000 // 150  # rolled into bounded shards
    counts = []
    rows = []
    for f in files:
        with open(f) as fh:
            lines = [json.loads(l) for l in fh if l.strip()]
        counts.append(len(lines))
        rows.extend(lines)
    assert max(counts) <= 150
    assert sorted(r["doc_id"] for r in rows) == list(range(1000))
    back = spark.read.schema(df.schema).json(path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_jsonl_sharded_default_partitioning(spark, tmp_path):
    """Without `shards`, the writer keeps upstream partitioning (no extra
    exchange) and still bounds per-file records via maxRecordsPerFile."""
    import glob
    import json
    import os

    from k8s_vectordb_sync_spark.sources.writers import write_jsonl_sharded

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(400)], "doc_id long, text string"
    ).repartition(3)
    path = str(tmp_path / "export-default")
    write_jsonl_sharded(df, path, records_per_shard=100)
    files = glob.glob(os.path.join(path, "part-*"))
    counts = []
    ids = []
    for f in files:
        with open(f) as fh:
            lines = [json.loads(l) for l in fh if l.strip()]
        counts.append(len(lines))
        ids.extend(r["doc_id"] for r in lines)
    assert max(counts) <= 100
    assert sorted(ids) == list(range(400))
