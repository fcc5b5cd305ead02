"""Filter / predicate operators (SURVEY §2.3).

All are pure Column predicates so Catalyst pushes them to the scan (the Spark
form of the reference's source pruning: filters applied at discovery so
unwatched types are never read, watcher.go:182-184).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import DEFAULT_EXCLUDED_RESOURCE_TYPES, EVENT_DELETE


def _norm(col: Column) -> Column:
    return F.lower(F.trim(col))


def should_watch(
    resource_name: Column,
    allowlist: Sequence[str] = (),
    blocklist: Sequence[str] = DEFAULT_EXCLUDED_RESOURCE_TYPES,
) -> Column:
    """Resource-type allowlist/blocklist predicate.

    Reference: internal/filter/filter.go:11-57,75-84. Non-empty allowlist takes
    precedence over the blocklist; matching is case-insensitive on trimmed
    names (filter.go:75-84).
    """
    name = _norm(resource_name)
    allow = [a.strip().lower() for a in allowlist if a.strip()]
    if allow:
        return name.isin(allow)
    block = [b.strip().lower() for b in blocklist if b.strip()]
    if not block:
        return F.lit(True)
    return ~name.isin(block)


def has_watch_capability(verbs: Column) -> Column:
    """Only sources supporting both 'list' and 'watch' (filter.go:61-73)."""
    return F.array_contains(verbs, "list") & F.array_contains(verbs, "watch")


def is_subresource(resource_name: Column) -> Column:
    """Catalog entries with '/' in the name (e.g. 'pods/status') are skipped
    (watcher.go:177-180)."""
    return resource_name.contains("/")


def discover_sources(
    catalog: DataFrame,
    allowlist: Sequence[str] = (),
    blocklist: Sequence[str] = DEFAULT_EXCLUDED_RESOURCE_TYPES,
) -> DataFrame:
    """Catalog discovery scan (watcher.go:159-206): list candidate sources,
    skip subresources, require list+watch verbs, apply allow/blocklist.

    This is source pruning: types filtered here are never read at all.
    """
    return catalog.filter(
        ~is_subresource(F.col("resource_name"))
        & has_watch_capability(F.col("verbs"))
        & should_watch(F.col("resource_name"), allowlist, blocklist)
    )


def is_crd(kind: Column, api_version: Column) -> Column:
    """CRD routing predicate (watcher.go:209-212): kind ==
    'CustomResourceDefinition' AND apiVersion prefix 'apiextensions.k8s.io/'."""
    return (kind == F.lit("CustomResourceDefinition")) & api_version.startswith(
        "apiextensions.k8s.io/"
    )


def split_crd_stream(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route events into (instance_stream, crd_stream) (watcher.go:223-228).

    CRD UPDATE events are dropped entirely (watcher.go:241-243).
    """
    crd_pred = is_crd(F.col("kind"), F.col("api_version"))
    instances = events.filter(~crd_pred)
    crds = events.filter(crd_pred & (F.col("event_type") != "UPDATE"))
    return instances, crds


def suppress_unchanged_updates(
    events: DataFrame,
    key_col: str = "id",
    ts_col: str = "event_ts",
    state_cols: Sequence[str] = ("resource_version",),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Change suppression (watcher.go:244-247,315-331): drop UPDATE events whose
    tracked state (resourceVersion, or labels+filtered annotations) is unchanged
    from the previous event for the same key. ADD/DELETE always pass.

    Batch form: lag() over Window.partitionBy(key).orderBy(ts) — one shuffle by
    key, which the downstream debounce reuses (same partitioning) so Catalyst
    plans a single exchange. Streaming form: see streaming.pipeline
    (dropDuplicatesWithinWatermark on (key, state-hash)).
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    state = F.struct(*[F.col(c) for c in state_cols])
    with_prev = events.withColumn("__prev_state", F.lag(state).over(w))
    changed = (
        (F.col("event_type") != "UPDATE")
        | F.col("__prev_state").isNull()
        | (~F.col("__prev_state").eqNullSafe(state))
    )
    return with_prev.filter(changed).drop("__prev_state")


def is_delete(event_type: Column) -> Column:
    """Delete-event bypass predicate (debounce.go:105-121)."""
    return event_type == F.lit(EVENT_DELETE)
