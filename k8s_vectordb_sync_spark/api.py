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


def make_search_handler(
    spark,
    ivfpq_path: str | None = None,
    sign_path: str | None = None,
    bm25_path: str | None = None,
    default_k: int = 10,
    n_probe: int = 2,
):
    """Request handler for the ops server's POST /api/v1/search route: turns
    a JSON search request into a probe of the configured persisted indexes
    and returns the top-k rows as dicts.

    Request shapes:
      {"tier": "ivfpq"|"sign", "query_vec": [floats], "k": n}
      {"tier": "bm25", "terms": ["w1", ...], "k": n}

    The probes are the SAME batch functions every other surface uses
    (one code path: CLI, registered queries, streaming serving, HTTP).
    Ops traffic is low-rate by construction; each request is one bounded
    Spark job against broadcast artifacts + a pruned scan. Unknown tier or
    missing index -> ValueError (the server maps it to HTTP 400)."""
    from .operators import ann_index as ai
    from .operators import lexical_index as lx

    def handle(req: dict) -> list[dict]:
        tier = req.get("tier", "ivfpq")
        k = int(req.get("k", default_k))
        qid = int(req.get("query_id", 0))
        if tier == "bm25":
            if not bm25_path:
                raise ValueError("bm25 index not configured")
            terms = list(req["terms"])
            qt = spark.createDataFrame(
                [(qid, t) for t in terms], "query_id long, term string"
            )
            out = lx.bm25_index_probe(spark, bm25_path, qt, k=k)
        elif tier in ("ivfpq", "sign"):
            path = ivfpq_path if tier == "ivfpq" else sign_path
            if not path:
                raise ValueError(f"{tier} index not configured")
            vec = [float(x) for x in req["query_vec"]]
            qdf = spark.createDataFrame(
                [(qid, vec)], "query_id long, query_vec array<double>"
            )
            if tier == "ivfpq":
                out = ai.ivf_pq_probe(spark, path, qdf, k=k, n_probe=n_probe)
            else:
                out = ai.sign_index_probe(spark, path, qdf, k=k)
        else:
            raise ValueError(f"unknown tier {tier!r}")
        import decimal

        def plain(v):
            return float(v) if isinstance(v, decimal.Decimal) else v

        return [
            {name: plain(v) for name, v in r.asDict().items()} for r in out.collect()
        ]

    return handle
