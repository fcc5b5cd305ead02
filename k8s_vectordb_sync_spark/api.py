"""Ops surface — the analog of the reference's HTTP API (internal/api/server.go).

The reference exposes POST /api/v1/resync (server.go:38,79-97) returning
{status, resources, message}, plus operational counts (readyCount /
pendingCount, debounce.go:165-173; WatchedGVRCount, watcher.go:386-390).

Here the engine surface is a plain Python API (`trigger_resync`, `counts`);
the listening HTTP endpoint lives in ``api_server.OpsServer`` (stdlib
``http.server``, wired via ``python -m k8s_vectordb_sync_spark serve``) and
mirrors the reference's response contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .plans.resync import merge_deletes, merge_upserts, resync_plan


@dataclass
class ResyncResult:
    """server.go:73-96 response contract."""

    status: str
    resources: int
    message: str


def trigger_resync(snapshot: DataFrame, target: DataFrame, key_col: str = "id") -> tuple[DataFrame, ResyncResult]:
    """Run the full-snapshot reconciliation (watcher.go:349-383): returns the
    merged target and the {status, resources, message} summary."""
    upserts, stale, counts = resync_plan(snapshot, target, key_col)
    row = counts.first()
    merged = merge_deletes(merge_upserts(target, upserts, key_col), stale, key_col)
    n = int(row["resources_synced"])
    return merged, ResyncResult(
        status="completed",
        resources=n,
        message=f"resync completed: {n} resources, {int(row['stale_deleted'])} stale removed",
    )


def pipeline_counts(resolved: DataFrame) -> dict[str, int]:
    """Operational counts (readyCount/pendingCount analog): rows by op."""
    rows = resolved.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    by_op = {r["op"]: int(r["n"]) for r in rows}
    return {
        "upserts": by_op.get("upsert", 0),
        "deletes": by_op.get("delete", 0),
        "total": sum(by_op.values()),
    }
