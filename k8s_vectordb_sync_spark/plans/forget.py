"""Key-forget sweep (right-to-be-forgotten / takedown propagation).

A training-data platform must be able to remove every record belonging to
an opt-out key list from its durable stores — a compliance sweep, run
against targets that are orders of magnitude larger than the list. This is
the batch complement of the sink's delete path (streaming/sink.py handles
deletes that ARRIVE as events; this removes keys retroactively).

Scale shape: the target uses the sink's ``_bucket=pmod(xxhash64(key), N)``
layout, so the sweep reads ONLY the buckets the forget keys hash into
(partition pruning), anti-joins the broadcast key list, and
dynamic-partition-overwrites just those buckets. Cost is O(|touched
buckets|), not O(|target|): forgetting 100 keys on a 100 TB target reads
and rewrites at most 100/N of it. Buckets left empty are cleared
explicitly (dynamic overwrite skips partitions absent from the output —
same edge the sink handles). On Delta/Iceberg this is
``MERGE/DELETE WHERE key IN (...)`` with the same pruning.

The audit dict is the compliance artifact: requested keys, matched keys,
rows removed, buckets touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def forget_keys(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key_col: str = "id",
    num_buckets: int = 64,
) -> dict:
    """Remove every row of ``target_path`` whose ``key_col`` appears in
    ``keys`` (a small frame — it is broadcast). Returns the audit dict.
    Idempotent: re-running with the same list removes nothing further."""
    key_list = keys.select(key_col).distinct()
    bucket_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")
    requested = key_list.count()

    target = spark.read.parquet(target_path)
    if "_bucket" not in target.columns:
        raise ValueError(
            f"{target_path} is not bucket-partitioned; forget_keys requires "
            "the sink's _bucket layout (or run a full-rewrite migration first)"
        )
    touched = sorted(
        r["_b"] for r in key_list.select(bucket_expr.alias("_b")).distinct().collect()
    )
    sub = target.filter(F.col("_bucket").isin(touched))
    before = sub.count()
    kept = sub.join(F.broadcast(key_list), key_col, "left_anti")
    # matched = forget keys actually present (compliance wants to know)
    matched = (
        sub.join(F.broadcast(key_list), key_col, "left_semi")
        .select(key_col)
        .distinct()
        .count()
    )
    kept = kept.localCheckpoint()  # cannot overwrite a path being read
    after = kept.count()
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(target_path)
    )
    remaining = {r["_bucket"] for r in kept.select("_bucket").distinct().collect()}
    empty = spark.createDataFrame([], kept.drop("_bucket").schema)
    for b in set(touched) - remaining:
        empty.write.mode("overwrite").parquet(f"{target_path}/_bucket={b}")
    return {
        "requested_keys": requested,
        "matched_keys": matched,
        "rows_removed": before - after,
        "buckets_touched": len(touched),
        "buckets_total": num_buckets,
    }
