"""Key-forget sweep (right-to-be-forgotten / takedown propagation).

A training-data platform must be able to remove every record belonging to
an opt-out key list from its durable stores — a compliance sweep, run
against targets that are orders of magnitude larger than the list. This is
the batch complement of the sink's delete path (streaming/sink.py handles
deletes that ARRIVE as events; this removes keys retroactively).

Scale shape: the target uses the sink's ``_bucket=pmod(xxhash64(key), N)``
layout, so the sweep reads ONLY the buckets the forget keys hash into
(partition pruning), anti-joins the broadcast key list, and swaps in the
rewritten buckets. Cost is O(|touched buckets|), not O(|target|):
forgetting 100 keys on a 100 TB target reads and rewrites at most 100/N of
it. On Delta/Iceberg this is ``MERGE/DELETE WHERE key IN (...)`` with the
same pruning.

Layout safety (a compliance sweep that silently prunes the WRONG buckets
is worse than no sweep):

- The sink records its layout in ``_layout.json`` (key column + bucket
  count) when it first writes a target; `forget_keys` reads it and refuses
  caller arguments that contradict it.
- For targets without the meta file (hand-written, pre-meta), every row in
  the buckets actually read is re-hashed and asserted to land in its own
  directory bucket — a wrong ``num_buckets`` (or a key column whose TYPE
  differs, which changes xxhash64) fails loudly instead of missing rows.
- The key frame's column type must equal the target's (no silent casts).

Durability: the kept rows are written to a hidden staging dir
(``_stage_tmp`` — underscore-prefixed, invisible to parquet readers) with
full recomputable lineage, and only after the write commits are the bucket
directories swapped in with per-bucket renames (old bucket parked in
``_stage_trash`` until the swap completes — sources/staging.py, shared
with the index delete-propagation ops). A failure any time during the
heavy phase — scan, anti-join, staging write — leaves the target byte-for-
byte untouched. The swap itself is O(buckets) metadata renames; a crash
inside it parks the previous bucket content in a journaled trash dir, and
every staged-rewrite entry point (this sweep, the sink merge, the index
delete ops) rolls the table back automatically via
sources/staging.py::recover_staged_swap before its next read (a plain
filesystem cannot commit N renames atomically — that final gap is exactly
what Delta/Iceberg snapshot commits close in a real deployment).

The audit dict is the compliance artifact: requested keys, matched keys,
rows removed, buckets touched, and whether the layout was verified against
persisted metadata or by the row-level re-hash check.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYOUT_FILE = "_layout.json"


def write_layout_meta(target_path: str, key_col: str, num_buckets: int) -> None:
    """Persist the bucket layout next to the data (hidden from readers by
    the underscore prefix). Written by the sink at target creation; read by
    forget_keys so the sweep can never assume a wrong layout."""
    os.makedirs(target_path, exist_ok=True)
    with open(os.path.join(target_path, LAYOUT_FILE), "w") as fh:
        json.dump({"key_col": key_col, "num_buckets": int(num_buckets)}, fh)


def read_layout_meta(target_path: str) -> dict | None:
    p = os.path.join(target_path, LAYOUT_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


# staged write + per-bucket rename swap shared with the index
# delete-propagation ops (extracted round 7)
from ..sources.staging import recover_staged_swap, staged_partition_rewrite  # noqa: E402


def forget_keys(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key_col: str | None = None,
    num_buckets: int | None = None,
) -> dict:
    """Remove every row of ``target_path`` whose key appears in ``keys``
    (a small frame — it is broadcast). Returns the audit dict.
    Idempotent: re-running with the same list removes nothing further.

    ``key_col``/``num_buckets`` default to the target's persisted
    ``_layout.json`` (written by the sink); passing values that contradict
    the meta raises. Without the meta file, both default to the sink's
    defaults ("id", 64) and the layout is verified row-level instead.
    """
    layout = read_layout_meta(target_path)
    if layout is not None:
        if key_col is not None and key_col != layout["key_col"]:
            raise ValueError(
                f"forget_keys: key_col={key_col!r} contradicts the target's "
                f"persisted layout (key_col={layout['key_col']!r})"
            )
        if num_buckets is not None and num_buckets != layout["num_buckets"]:
            raise ValueError(
                f"forget_keys: num_buckets={num_buckets} contradicts the "
                f"target's persisted layout (num_buckets={layout['num_buckets']})"
            )
        key_col = layout["key_col"]
        num_buckets = int(layout["num_buckets"])
    else:
        key_col = key_col or "id"
        num_buckets = num_buckets or 64

    # self-heal an interrupted prior swap before building the read plan
    # (restores journaled in-flight buckets; no-op on a clean target)
    recover_staged_swap(target_path)
    target = spark.read.parquet(target_path)
    if "_bucket" not in target.columns:
        raise ValueError(
            f"{target_path} is not bucket-partitioned; forget_keys requires "
            "the sink's _bucket layout (or run a full-rewrite migration first)"
        )
    # type guard: xxhash64(cast) != xxhash64(original), so a keys frame of a
    # different type would prune the WRONG buckets — refuse, don't cast.
    tgt_type = target.schema[key_col].dataType
    key_list = keys.select(key_col).distinct()
    in_type = key_list.schema[key_col].dataType
    if in_type != tgt_type:
        raise ValueError(
            f"forget_keys: keys.{key_col} is {in_type.simpleString()} but the "
            f"target stores {tgt_type.simpleString()}; xxhash64 (hence the "
            "bucket layout) is type-sensitive — cast the keys frame explicitly"
        )

    bucket_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")
    requested = key_list.count()
    touched = sorted(
        r["_b"] for r in key_list.select(bucket_expr.alias("_b")).distinct().collect()
    )
    sub = target.filter(F.col("_bucket").isin(touched))
    # one combined pass over the pruned subset: row count + layout check
    # (re-hash every row read; any row not in its own directory bucket means
    # the assumed num_buckets/key_col is wrong — abort before writing)
    stats = sub.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(bucket_expr != F.col("_bucket"), F.lit(1)).otherwise(F.lit(0))
        ).alias("bad"),
    ).collect()[0]
    before, bad = int(stats["n"]), int(stats["bad"] or 0)
    if bad:
        raise ValueError(
            f"forget_keys: {bad} of {before} rows in the read buckets do not "
            f"re-hash to their directory bucket under num_buckets={num_buckets}/"
            f"key_col={key_col!r} — the target was written with a different "
            "layout; aborting before any rewrite"
        )
    layout_verified = layout is not None or before > 0

    kept = sub.join(F.broadcast(key_list), key_col, "left_anti")
    # matched = forget keys actually present (compliance wants to know)
    matched = (
        sub.join(F.broadcast(key_list), key_col, "left_semi")
        .select(key_col)
        .distinct()
        .count()
    )

    # stage the rewrite OUTSIDE the live bucket dirs (full lineage retained,
    # re-computable on executor loss; target untouched until the swap), then
    # per-bucket rename swap — sources/staging.py
    after = staged_partition_rewrite(kept, target_path, "_bucket", touched)
    return {
        "requested_keys": requested,
        "matched_keys": matched,
        "rows_removed": before - after,
        "buckets_touched": len(touched),
        "buckets_total": num_buckets,
        "layout_verified": layout_verified,
    }
