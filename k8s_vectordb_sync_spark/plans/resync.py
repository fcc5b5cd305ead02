"""Full-snapshot reconciliation (resync) — SURVEY §3.2.

The reference re-lists every watched source and replays each row as an ADD
(watcher.go:349-383); the idempotent upsert sink heals drift, and by design
deletes are healed only by live events (1-resource-sync-controller.md:199).

Spark form: a batch MERGE between the snapshot (source of truth) and the sync
target. We implement MERGE semantics on plain parquet via joins (no Delta in
this container):

  upserts  = every snapshot row        (ADD replay — reference parity)
  deletes  = target keys missing from the snapshot (left-anti join) — the
             optional *improvement* SURVEY §2.4 notes: the reference cannot
             emit these; the full-outer reconciliation can.

At scale both sides are large: the anti-join shuffles on the key — with both
tables bucketed by `id` it is a co-located sort-merge join with no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resync_plan(snapshot: DataFrame, target: DataFrame, key_col: str = "id") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (upserts, stale_deletes, counts).

    counts is a 1-row DataFrame (resources_synced, stale_deleted) mirroring the
    resync response payload {status, resources, message} (api/server.go:79-97).
    """
    upserts = snapshot
    stale = target.join(
        snapshot.select(key_col), on=key_col, how="left_anti"
    ).select(F.col(key_col))
    counts = upserts.agg(F.count(F.lit(1)).alias("resources_synced")).crossJoin(
        stale.agg(F.count(F.lit(1)).alias("stale_deleted"))
    )
    return upserts, stale, counts


def merge_upserts(
    target: DataFrame, upserts: DataFrame, key_col: str = "id"
) -> DataFrame:
    """MERGE INTO target USING upserts ON key
    WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT * —
    implemented on plain parquet as (target anti-join upserts) UNION upserts.
    One shuffle on the key; co-located (exchange-free) when both sides are
    bucketed by the key.
    """
    kept = target.join(upserts.select(key_col), on=key_col, how="left_anti")
    return kept.unionByName(upserts)


def merge_deletes(target: DataFrame, delete_keys: DataFrame, key_col: str = "id") -> DataFrame:
    """MERGE ... WHEN MATCHED THEN DELETE: anti-join the delete keys away."""
    return target.join(delete_keys.select(key_col), on=key_col, how="left_anti")
