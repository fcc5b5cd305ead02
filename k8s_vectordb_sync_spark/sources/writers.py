"""Write-side layout strategies for scale.

At 100 TB the dominant cost of the sync/resync MERGE and of any key-key join
is the shuffle. Bucketing fixes the layout once at write time so every later
join/aggregation on the key is exchange-free:

  - `write_bucketed`: hash-bucket + sort by key (Spark native bucketing).
    Two tables bucketed by the same key into the same bucket count sort-merge
    join with NO Exchange on either side (verified by test_writers).
  - `write_partitioned`: directory partitioning for pruning on low-cardinality
    columns (date, source, cluster id) — the IVF/LSH probe path reads only
    matching partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key_col: str = "id",
    buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed, per-bucket-sorted external table. Joins and
    aggregations on ``key_col`` between tables sharing the bucket spec run
    without a shuffle (the write pre-pays the exchange once)."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, key_col)
        .sortBy(key_col)
        .saveAsTable(table_name)
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: filters on partition_cols become
    partition pruning (the scan lists only matching directories)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


ZORDER_BITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton (Z-order) interleave of the low `bits` bits of two non-negative
    integer columns — the multi-dimensional clustering key behind
    OPTIMIZE ZORDER-style layouts: sorting/range-partitioning files by this
    key makes file-level min/max statistics selective for BOX predicates on
    (x, y) simultaneously, where a linear sort is selective in one dimension
    only. Pure integer expression (shift/mask/multiply), bit-identical in
    DuckDB, zero shuffle.
    """
    terms = []
    for i in range(bits):
        terms.append(
            (F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def zorder_key_sql(x_sql: str, y_sql: str, bits: int = ZORDER_BITS) -> str:
    """The DuckDB mirror of zorder_key, as a SQL expression string."""
    terms = []
    for i in range(bits):
        terms.append(
            f"((({x_sql}) >> {i}) & 1) * {1 << (2 * i)}"
            f" + ((({y_sql}) >> {i}) & 1) * {1 << (2 * i + 1)}"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def compact_parquet(
    spark: SparkSession, path: str, target_files: int
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into
    `target_files` files (atomic via temp-dir + rename). Streaming sinks
    and frequent MERGEs accrete small files that poison scan parallelism
    and NameNode/listing pressure at 100 TB; periodic compaction is the
    standing maintenance job every table format schedules (Delta OPTIMIZE,
    Iceberg rewrite_data_files). Returns (files_before, files_after).

    coalesce() (not repartition) avoids a shuffle: compaction is IO-bound
    rewriting, and narrow coalesce keeps it a single map-only stage.
    """
    import glob
    import os
    import shutil

    files_before = len(glob.glob(os.path.join(path, "part-*")))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compacting"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = len(glob.glob(os.path.join(path, "part-*")))
    return files_before, files_after


def write_jsonl_sharded(
    df: DataFrame,
    path: str,
    records_per_shard: int = 100_000,
    shards: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Export a frame as sharded JSONL — the interchange format training
    loaders actually consume. Each row serializes via to_json(struct(*)),
    written as text with ``maxRecordsPerFile`` bounding shard size (the JVM
    writer rolls files, so a skewed partition still yields bounded shards —
    no repartition-by-count shuffle needed). Pass ``shards`` to ALSO fix
    the partition count (e.g. for a downstream loader that wants ~equal
    file counts); default leaves the upstream partitioning untouched,
    which at 100 TB avoids an extra full-data exchange.

    Round-trips through sources.jsonl's reader (tested): JSON field order
    is the struct's column order and values use Spark's JSON encoders, so
    re-reading with the writing schema reproduces the frame.
    """
    out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    if shards is not None:
        out = out.repartition(shards)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", records_per_shard)
        .text(path)
    )
