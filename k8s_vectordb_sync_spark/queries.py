"""Query registry: every operator from SURVEY §2 (+ the §7 extension surface)
as a named (Spark callable, DuckDB oracle SQL) pair.

The driver's t2 gate runs queries()[name](spark, sf_dir) AND oracle_sql()[name]
on the same parquet tables and compares row count + schema + order-insensitive
value hash. Parity rules used throughout:

  - integers out as BIGINT on both sides (Spark casts, SQL casts)
  - no raw timestamps out: epoch milliseconds (unix_millis / epoch_ms)
  - window orderings tie-broken by a unique id; the oracle orders by
    epoch_us(ts) because Spark's timestamp is microseconds while the raw
    parquet is nanoseconds
  - money aggregates via DECIMAL(18,2) sums (exact, order-independent) cast
    to DOUBLE at the end; ratio outputs rounded to 4 decimals
  - all hashing is md5-based: Spark conv(substring(md5 x,1,N),16,10) ==
    DuckDB cast('0x'||substring(md5 x,1,N) as bigint)
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import text as T
from .functions.exact import (
    exact_mean_units,
    exact_ratio,
    sql_exact_mean_units,
    sql_exact_ratio,
)
from .functions.vectors import cosine
from .functions.vectors import norm as vnorm
from .operators import debounce as dbn
from .operators import dedup as dd
from .operators import multimodal as mm
from .operators import similarity as sim
from .operators.dedup import BAND_SIZE, MINHASH_COEFFS, MINHASH_P, NUM_MINHASHES, SIMHASH_BITS
from .operators.filters import discover_sources, should_watch, suppress_unchanged_updates
from .operators.similarity import HYPERPLANES
from .sources.cdc import events_as_change_stream
from .sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Queries registered ONLY as correctness/recall references, with a shape
# (e.g. uncapped quadratic pair joins) that must never enter a timing set.
# bench.py and any future timing harness consume this set; a test asserts
# benched-set ∩ DIAGNOSTIC_QUERIES == ∅, so the exclusion is an invariant
# of the registry, not a listing choice (VERDICT r10 item 5).
DIAGNOSTIC_QUERIES: frozenset[str] = frozenset(
    {"dedup_semantic_indexed_diagnostic"}
)


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Exact-integer ratio/share/rate rounding (VERDICT r9/r10 hygiene item):
# both the Spark Column form and the DuckDB oracle fragment live in
# functions/exact.py so operator modules can share them without importing
# this registry.


# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB dialect, matching the Spark transforms above)
# ---------------------------------------------------------------------------

# events -> change stream (sources.cdc.events_as_change_stream)
SQL_CH = """
ch AS (
  SELECT CASE WHEN event_type = 'signup' THEN 'ADD'
              WHEN event_type = 'error' THEN 'DELETE'
              ELSE 'UPDATE' END AS op_type,
         'user/' || CAST(user_id AS VARCHAR) AS id,
         event_id, user_id, event_type AS raw_event_type, value, props,
         epoch_ms(ts) AS ts_ms, epoch_us(ts) AS ts_us
  FROM events
)
"""

# documents -> whitespace tokens of lowered text
SQL_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
)
# normalized text (functions.text.normalize_text)
SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# normalized tokens (single-space separated after normalization)
SQL_NTOKS = f"string_split({SQL_NORM}, ' ')"


def _sql_shingles(toks: str, k: int = 3) -> str:
    """Distinct word k-shingles — mirror of functions.text.shingles."""
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {k} + 2), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' '))) "
        f"ELSE list_distinct([array_to_string({toks}, ' ')]) END"
    )


SQL_H15 = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"
SQL_H8 = "CAST(('0x' || substring(md5({x}), 1, 8)) AS BIGINT)"

DEBOUNCE_GAP_MS = 2 * 60 * 60 * 1000  # 2h quiet period suits the events data
SESSION_GAP_MS = 30 * 60 * 1000

# Session assignment over the change stream (operators.debounce.assign_sessions)
SQL_SESSIONS = f"""
marks AS (
  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                   OR ts_ms - lag(ts_ms) OVER w > {DEBOUNCE_GAP_MS}
            THEN 1 ELSE 0 END AS ns
  FROM ch
  WINDOW w AS (PARTITION BY id ORDER BY ts_us, event_id)
),
sessioned AS (
  SELECT *, CAST(SUM(ns) OVER (PARTITION BY id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
  FROM marks
)
"""

# Delete-cancels-upsert resolution per (id, session)
SQL_RESOLVED = f"""
{SQL_SESSIONS},
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY id, session_id
      ORDER BY ts_us DESC,
               CASE WHEN op_type = 'DELETE' THEN 1 ELSE 0 END DESC,
               event_id DESC) AS rn
  FROM sessioned
),
resolved AS (
  SELECT id, session_id, event_id, value, ts_ms, raw_event_type,
         CASE WHEN op_type = 'DELETE' THEN 'delete' ELSE 'upsert' END AS op
  FROM ranked WHERE rn = 1
)
"""


def _ch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_change_stream(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# §2.1/§2.2 — CDC surface: projection, filters, catalog, suppression
# ---------------------------------------------------------------------------


@register(
    "cdc_projection",
    f"WITH {SQL_CH} SELECT id, op_type, ts_ms, event_id, user_id, raw_event_type, value, props FROM ch",
)
def cdc_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-stream projection (Extract() analog, extract.go:31-52): key
    synthesis + op mapping, pure narrow projection pushed into the scan."""
    ch = _ch(spark, sf_dir)
    return ch.select(
        "id",
        "op_type",
        F.unix_millis("event_ts").alias("ts_ms"),
        "event_id",
        "user_id",
        "raw_event_type",
        "value",
        "props",
    )


@register(
    "cdc_filter_blocklist",
    "SELECT event_id, event_type AS raw_event_type FROM events "
    "WHERE lower(trim(event_type)) NOT IN ('view', 'click')",
)
def cdc_filter_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-type blocklist filter (filter.go:11-57): case-insensitive,
    trimmed, pushed to the parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        should_watch(F.col("event_type"), blocklist=("view", "click"))
    ).select("event_id", F.col("event_type").alias("raw_event_type"))


SQL_CATALOG = """
catalog AS (
  SELECT DISTINCT
    CASE WHEN p_partkey % 10 = 0 THEN lower(p_brand) || '/status'
         ELSE lower(p_brand) END AS resource_name,
    CASE WHEN p_size % 3 = 0 THEN ['list'] ELSE ['list', 'watch'] END AS verbs
  FROM part
)
"""


@register(
    "cdc_catalog_discovery",
    f"WITH {SQL_CATALOG} SELECT DISTINCT resource_name FROM catalog "
    "WHERE NOT contains(resource_name, '/') "
    "AND list_contains(verbs, 'list') AND list_contains(verbs, 'watch')",
)
def cdc_catalog_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog discovery scan (watcher.go:159-206): enumerate candidate
    sources (synthesized from `part`), skip subresources, require list+watch.
    """
    part = load_table(spark, sf_dir, "part")
    catalog = part.select(
        F.when(
            F.col("p_partkey") % 10 == 0,
            F.concat(F.lower("p_brand"), F.lit("/status")),
        )
        .otherwise(F.lower("p_brand"))
        .alias("resource_name"),
        F.when(F.col("p_size") % 3 == 0, F.array(F.lit("list")))
        .otherwise(F.array(F.lit("list"), F.lit("watch")))
        .alias("verbs"),
    ).distinct()
    return discover_sources(catalog, blocklist=()).select("resource_name").distinct()


@register(
    "cdc_change_suppression",
    f"""WITH {SQL_CH},
    lagged AS (
      SELECT event_id, op_type, value,
             row_number() OVER (PARTITION BY id ORDER BY ts_us, event_id) AS rn,
             lag(value) OVER (PARTITION BY id ORDER BY ts_us, event_id) AS prev_value
      FROM ch)
    SELECT event_id FROM lagged
    WHERE op_type <> 'UPDATE' OR rn = 1 OR prev_value IS DISTINCT FROM value""",
)
def cdc_change_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change suppression (watcher.go:244-247,315-331): drop UPDATE events
    whose tracked state is unchanged vs the previous event for the key."""
    ch = _ch(spark, sf_dir).withColumnRenamed("op_type", "event_type")
    out = suppress_unchanged_updates(
        ch, state_cols=["value"], tiebreak_cols=["event_id"]
    )
    return out.select("event_id")


# ---------------------------------------------------------------------------
# §2.4 — debounce / dedup / batching core
# ---------------------------------------------------------------------------


@register(
    "cdc_last_state_wins",
    f"""WITH {SQL_CH},
    r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts_us DESC, event_id DESC) rn FROM ch)
    SELECT id, event_id AS last_event_id, value AS last_value,
           ts_ms AS last_ts_ms, op_type AS last_op
    FROM r WHERE rn = 1""",
)
def cdc_last_state_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key last-state-wins (debounce.go:127-149): one max_by hash agg,
    partial map-side — the shuffle carries one row per key per task."""
    ch = _ch(spark, sf_dir)
    latest = dbn.last_state_wins(ch, key_cols=["id"], tiebreak_cols=["event_id"])
    return latest.select(
        "id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
        F.unix_millis("event_ts").alias("last_ts_ms"),
        F.col("op_type").alias("last_op"),
    )


@register(
    "cdc_debounce_sessions",
    f"""WITH {SQL_CH}, {SQL_SESSIONS.strip().lstrip()},
    r AS (SELECT *, row_number() OVER (PARTITION BY id, session_id ORDER BY ts_us DESC, event_id DESC) rn
          FROM sessioned)
    SELECT id, session_id, event_id AS last_event_id, value AS last_value
    FROM r WHERE rn = 1""",
)
def cdc_debounce_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quiet-period debounce (the reference's core semantic, debounce.go:32-149):
    per key, sessions split on >gap quiet; last state per session survives."""
    ch = _ch(spark, sf_dir)
    out = dbn.debounce(
        ch, key_cols=["id"], gap_ms=DEBOUNCE_GAP_MS, tiebreak_cols=["event_id"]
    )
    return out.select(
        "id",
        "session_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


@register(
    "cdc_delete_cancels_upsert",
    f"WITH {SQL_CH}, {SQL_RESOLVED.strip().lstrip()} "
    "SELECT id, session_id, op, event_id, value FROM resolved",
)
def cdc_delete_cancels_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-cancels-pending-upsert (debounce.go:107-113): per (key, session)
    the latest event decides the op; DELETE wins timestamp ties."""
    ch = _ch(spark, sf_dir)
    sessioned = dbn.assign_sessions(
        ch, key_cols=["id"], gap_ms=DEBOUNCE_GAP_MS, tiebreak_cols=["event_id"]
    ).withColumnRenamed("op_type", "event_type")
    resolved = dbn.delete_cancels_pending(
        sessioned,
        key_cols=["id", "session_id"],
        event_type_col="event_type",
        tiebreak_cols=["event_id"],
    )
    return resolved.select("id", "session_id", "op", "event_id", "value")


@register(
    "cdc_payload_batches",
    f"""WITH {SQL_CH}, {SQL_RESOLVED.strip().lstrip()},
    ups AS (SELECT * FROM resolved WHERE op = 'upsert'),
    numbered AS (
      SELECT id, session_id, event_id,
             row_number() OVER (ORDER BY event_id) - 1 AS rn
      FROM ups)
    SELECT id, session_id, event_id, CAST(rn // 50 AS BIGINT) AS batch_id FROM numbered""",
)
def cdc_payload_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch assembly (debounce.go:153-207): upserts chunked into payloads of
    <= 50 rows over a deterministic order (deletes flush separately/alone)."""
    resolved = cdc_delete_cancels_upsert(spark, sf_dir)
    upserts = resolved.filter(F.col("op") == "upsert")
    batched = dbn.assign_batches(upserts, batch_max_size=50, order_cols=["event_id"])
    return batched.select("id", "session_id", "event_id", "batch_id")


@register(
    "cdc_crd_dedup",
    f"""WITH {SQL_CH},
    r AS (SELECT *, row_number() OVER (PARTITION BY raw_event_type ORDER BY ts_us, event_id) rn FROM ch)
    SELECT raw_event_type AS crd_name, event_id AS first_event_id, ts_ms AS first_ts_ms
    FROM r WHERE rn = 1""",
)
def cdc_crd_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRD name dedup (crd_debounce.go:125-148): N adds of one name -> 1,
    keeping the first occurrence (min_by)."""
    ch = _ch(spark, sf_dir)
    out = dbn.dedup_names(
        ch, name_col="raw_event_type", tiebreak_cols=["event_id"]
    )
    return out.select(
        F.col("raw_event_type").alias("crd_name"),
        F.col("event_id").alias("first_event_id"),
        F.unix_millis("event_ts").alias("first_ts_ms"),
    )


@register(
    "cdc_resync_merge",
    f"""WITH {SQL_CH},
    tgt AS (SELECT id, event_id, value FROM (
        SELECT id, event_id, value,
               row_number() OVER (PARTITION BY id ORDER BY ts_us DESC, event_id DESC) rn
        FROM ch WHERE event_id % 2 = 0) WHERE rn = 1),
    snap AS (SELECT id, event_id, value FROM (
        SELECT id, event_id, value,
               row_number() OVER (PARTITION BY id ORDER BY ts_us DESC, event_id DESC) rn
        FROM ch WHERE event_id % 2 = 1) WHERE rn = 1)
    SELECT id, event_id, value, 'upsert' AS action FROM snap
    UNION ALL
    SELECT t.id, t.event_id, t.value, 'stale_delete' AS action
    FROM tgt t LEFT JOIN snap s ON t.id = s.id WHERE s.id IS NULL""",
)
def cdc_resync_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-snapshot reconciliation (watcher.go:349-383 + SURVEY §2.4's
    full-outer improvement): snapshot rows replay as upserts; target keys
    missing from the snapshot surface as stale deletes (left-anti join)."""
    ch = _ch(spark, sf_dir)
    tgt = dbn.last_state_wins(
        ch.filter(F.col("event_id") % 2 == 0), key_cols=["id"], tiebreak_cols=["event_id"]
    ).select("id", "event_id", "value")
    snap = dbn.last_state_wins(
        ch.filter(F.col("event_id") % 2 == 1), key_cols=["id"], tiebreak_cols=["event_id"]
    ).select("id", "event_id", "value")
    return snap.withColumn("action", F.lit("upsert")).unionByName(
        tgt.join(snap.select("id"), "id", "left_anti").withColumn(
            "action", F.lit("stale_delete")
        )
    )


@register(
    "cdc_resync_drift",
    f"""WITH {SQL_CH},
    tgt AS (SELECT id, raw_event_type AS kind, value FROM (
        SELECT id, raw_event_type, value,
               row_number() OVER (PARTITION BY id ORDER BY ts_us DESC, event_id DESC) rn
        FROM ch WHERE event_id % 2 = 0) WHERE rn = 1),
    snap AS (SELECT id, raw_event_type AS kind, value FROM (
        SELECT id, raw_event_type, value,
               row_number() OVER (PARTITION BY id ORDER BY ts_us DESC, event_id DESC) rn
        FROM ch WHERE event_id % 2 = 1) WHERE rn = 1),
    j AS (
      SELECT COALESCE(s.kind, t.kind) AS kind,
             CASE WHEN t.id IS NULL THEN 'missed_upsert'
                  WHEN s.id IS NULL THEN 'missed_delete'
                  WHEN s.value IS DISTINCT FROM t.value THEN 'changed'
                  ELSE 'in_sync' END AS status
      FROM snap s FULL OUTER JOIN tgt t ON s.id = t.id)
    SELECT kind, status, CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM j GROUP BY kind, status""",
)
def cdc_resync_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-vs-target drift report: the full-outer reconciliation audit
    behind resync (SURVEY §2.4). The reference can only heal drift it can
    SEE — its resync replays snapshot rows as ADDs (watcher.go:349-383), so
    stale target keys (missed deletes) survive until a live DELETE arrives
    (1-resource-sync-controller.md:199). plans/resync.py's full-outer form
    heals both directions; this query is the driver-verifiable readout:
    per kind, how many keys are missing from the target (missed_upsert),
    stale in it (missed_delete), present-but-changed, or in sync.

    Plan: two last-state-wins windows (partial-aggregated per key), ONE
    full-outer sort-merge join on the key — co-located/exchange-free when
    both sides are bucketed by id (sources/writers.py) — and a
    map-side-combined count per (kind, status)."""
    ch = _ch(spark, sf_dir)
    tgt = dbn.last_state_wins(
        ch.filter(F.col("event_id") % 2 == 0), key_cols=["id"], tiebreak_cols=["event_id"]
    ).select(
        F.col("id").alias("t_id"),
        F.col("raw_event_type").alias("t_kind"),
        F.col("value").alias("t_value"),
    )
    snap = dbn.last_state_wins(
        ch.filter(F.col("event_id") % 2 == 1), key_cols=["id"], tiebreak_cols=["event_id"]
    ).select(
        F.col("id").alias("s_id"),
        F.col("raw_event_type").alias("s_kind"),
        F.col("value").alias("s_value"),
    )
    j = snap.join(tgt, snap["s_id"] == tgt["t_id"], "full_outer").select(
        F.coalesce(F.col("s_kind"), F.col("t_kind")).alias("kind"),
        F.when(F.col("t_id").isNull(), F.lit("missed_upsert"))
        .when(F.col("s_id").isNull(), F.lit("missed_delete"))
        .when(~F.col("s_value").eqNullSafe(F.col("t_value")), F.lit("changed"))
        .otherwise(F.lit("in_sync"))
        .alias("status"),
    )
    return j.groupBy("kind", "status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )


@register(
    "pipeline_sync_resolved",
    f"""WITH {SQL_CH},
    lagged AS (
      SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts_us, event_id) AS first_rn,
             lag(value) OVER (PARTITION BY id ORDER BY ts_us, event_id) AS prev_value
      FROM ch),
    kept AS (
      SELECT * FROM lagged
      WHERE op_type <> 'UPDATE' OR first_rn = 1 OR prev_value IS DISTINCT FROM value),
    marks AS (
      SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                       OR ts_ms - lag(ts_ms) OVER w > {DEBOUNCE_GAP_MS}
                THEN 1 ELSE 0 END AS ns
      FROM kept
      WINDOW w AS (PARTITION BY id ORDER BY ts_us, event_id)),
    sessioned AS (
      SELECT *, CAST(SUM(ns) OVER (PARTITION BY id ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
      FROM marks),
    ranked AS (
      SELECT *, row_number() OVER (
          PARTITION BY id, session_id
          ORDER BY ts_us DESC,
                   CASE WHEN op_type = 'DELETE' THEN 1 ELSE 0 END DESC,
                   event_id DESC) AS rn
      FROM sessioned)
    SELECT id, session_id, event_id, value, ts_ms,
           CASE WHEN op_type = 'DELETE' THEN 'delete' ELSE 'upsert' END AS op
    FROM ranked WHERE rn = 1""",
)
def pipeline_sync_resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: the full instance-sync pipeline, batch form (SURVEY §3.1) —
    projection -> change suppression -> quiet-period debounce ->
    delete-cancels-upsert resolution. One shuffle by key end-to-end."""
    from .config import EngineConfig
    from .plans.sync import resolve_changes

    ch = _ch(spark, sf_dir)
    resolved = resolve_changes(
        ch, config=EngineConfig(debounce_window_ms=DEBOUNCE_GAP_MS)
    )
    return resolved.select(
        "id",
        "session_id",
        "event_id",
        "value",
        F.unix_millis("event_ts").alias("ts_ms"),
        "op",
    )


# ---------------------------------------------------------------------------
# Relational surface over the star schema (free from Spark SQL; exercised for
# bench + scale-plan validation)
# ---------------------------------------------------------------------------

_DP = "CAST({x} AS DECIMAL(12,2))"  # prices/quantities (< 1e10)
_DF = "CAST({x} AS DECIMAL(4,2))"   # discount/tax factors (< 100)


@register(
    "tpch_q1_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
        CAST(CAST(SUM({_DP.format(x='l_quantity')}) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(SUM({_DP.format(x='l_extendedprice')}) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')} * {_DF.format(x='1 + l_tax')}) AS VARCHAR) AS DOUBLE) AS sum_charge,
        CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation. DECIMAL sums (exact,
    order-independent) cast to double — bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    decp = lambda c: c.cast("decimal(12,2)")
    decf = lambda c: c.cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(decp(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(decp(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(
                decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                decp(F.col("l_extendedprice"))
                * decf(F.lit(1) - F.col("l_discount"))
                * decf(F.lit(1) + F.col("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    f"""SELECT l_orderkey,
        CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue,
        epoch_ms(o_orderdate) AS orderdate_ms, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact joins -> top-k.
    customer is the small side: broadcast join, no shuffle of lineitem."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-01-01"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1998-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            # parquet NTZ timestamp -> session-UTC timestamp, same instant
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    f"""SELECT n_name,
        CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name""",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Dims (region/nation/supplier/customer)
    broadcast; the only shuffle joins are on the fact keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q6_revenue_forecast",
    f"""SELECT CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-filter scan + global agg (no shuffle at all
    beyond the final single-row reduce)."""
    li = load_table(spark, sf_dir, "lineitem")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(decp(F.col("l_extendedprice")) * decf(F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q10_returned_items",
    f"""SELECT c_custkey, c_name, n_name,
        CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-07-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "events_windowed_agg",
    """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2""",
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (streaming window analog, batch form)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias("hour_ms"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


@register(
    "events_sessionization",
    f"""WITH marks AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                    OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
             THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    sessioned AS (
      SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
      FROM marks)
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(ts_ms) - MIN(ts_ms) AS duration_ms
    FROM sessioned GROUP BY user_id, session_id""",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic user sessionization (30 min gap): session sizes + durations."""
    ev = load_table(spark, sf_dir, "events").withColumnRenamed("ts", "event_ts")
    sessioned = dbn.assign_sessions(
        ev, key_cols=["user_id"], gap_ms=SESSION_GAP_MS, tiebreak_cols=["event_id"]
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.unix_millis("event_ts")) - F.min(F.unix_millis("event_ts"))).alias(
            "duration_ms"
        ),
    )


@register(
    "top_customers_per_nation",
    """SELECT n_name, c_custkey, c_acctbal, CAST(rnk AS BIGINT) AS rnk FROM (
         SELECT n_name, c_custkey, c_acctbal,
                row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rnk
         FROM customer JOIN nation ON c_nationkey = n_nationkey)
       WHERE rnk <= 3""",
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function top-k per group (rank within partition)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# Text analysis (SURVEY §7 extension surface)
# ---------------------------------------------------------------------------


@register(
    "text_token_counts",
    f"""SELECT doc_id,
        CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens_ws,
        CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tokens_bpe
    FROM documents""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex tokenization."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count_ws(F.col("text")).cast("bigint").alias("n_tokens_ws"),
        T.token_count_bpe(F.col("text")).cast("bigint").alias("n_tokens_bpe"),
    )


_SQL_STOPS = ", ".join(f"'{s}'" for s in T.STOPWORDS)

# quality-family integer counts (DuckDB side), mirroring
# functions.text.with_quality_counts — null-safe (NULL text scores like
# empty text), so the rounded quality emissions ride the exact-integer
# discipline in functions/exact.py instead of round-on-double
_SQL_QCOUNTS = f"""COALESCE(length(text), 0) AS q_nchars,
             COALESCE(len({SQL_TOKS}), 0) AS q_nt,
             COALESCE(len(list_filter({SQL_TOKS}, t -> t IN ({_SQL_STOPS}))), 0) AS q_ns,
             COALESCE(length(regexp_replace(text, '\\s+', '', 'g')), 0) AS q_dp,
             COALESCE(length(regexp_replace(regexp_replace(text, '\\s+', '', 'g'), '[a-zA-Z0-9]', '', 'g')), 0) AS q_np,
             COALESCE(list_sum(list_transform({SQL_TOKS}, t -> length(t))), 0) AS q_chars"""

_SQL_QUALITY_NUM = (
    "(least(q_nchars, 500) * greatest(q_dp, 1) * greatest(q_nt, 1)"
    " + (greatest(q_dp, 1) - least(4 * q_np, greatest(q_dp, 1)))"
    " * 500 * greatest(q_nt, 1)"
    " + least(5 * q_ns, greatest(q_nt, 1)) * 500 * greatest(q_dp, 1))"
)
_SQL_QUALITY_DEN = "(1500 * greatest(q_dp, 1) * greatest(q_nt, 1))"
# round(quality, 4) as one exact-integer expression over the q_* counts
SQL_QUALITY_4DP = sql_exact_ratio(_SQL_QUALITY_NUM, _SQL_QUALITY_DEN, 4)

# per-language marker IN-lists for oracle SQL, generated from the single
# source of truth in functions.text (hand-copied literals desync silently)
_SQL_MARK = {
    lang: ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
    for lang in T.LANG_MARKERS
}


@register(
    "text_quality",
    f"""WITH m AS (
      SELECT doc_id, {_SQL_QCOUNTS}
      FROM documents)
    SELECT doc_id,
           CASE WHEN q_nt > 0 THEN {sql_exact_ratio("q_ns", "q_nt", 4)}
                ELSE 0.0 END AS stop_ratio,
           CASE WHEN q_dp > 0 THEN {sql_exact_ratio("q_np", "q_dp", 4)}
                ELSE 0.0 END AS punct_ratio,
           CASE WHEN q_nt > 0 THEN {sql_exact_ratio("q_chars", "q_nt", 4)}
                ELSE 0.0 END AS mean_word_len,
           {SQL_QUALITY_4DP} AS quality
    FROM m""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword/punctuation ratios, mean word length, and
    the composite quality score — all codegen'd column expressions, with
    every rounded emission on the exact-integer discipline
    (functions/exact.py) over the shared quality counts."""
    docs = load_table(spark, sf_dir, "documents")
    # pinned-token-array counts (T.with_quality_counts): one tokenization
    # per row instead of one per count expression
    m = T.with_quality_counts(docs.select("doc_id", "text")).drop("text")
    return m.select(
        "doc_id",
        F.when(F.col("q_nt") > 0, exact_ratio("q_ns", "q_nt", 4))
        .otherwise(F.lit(0.0))
        .alias("stop_ratio"),
        F.when(F.col("q_dp") > 0, exact_ratio("q_np", "q_dp", 4))
        .otherwise(F.lit(0.0))
        .alias("punct_ratio"),
        F.when(F.col("q_nt") > 0, exact_ratio("q_chars", "q_nt", 4))
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        T.quality_4dp_from_counts().alias("quality"),
    )


def _sql_langid() -> str:
    score_exprs = []
    for lang in sorted(T.LANG_MARKERS):
        markers = ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
        score_exprs.append(
            f"len(list_filter(toks, t -> t IN ({markers}))) AS s_{lang}"
        )
    langs = sorted(T.LANG_MARKERS)
    # alphabetically-first language wins ties; 'und' when all scores are 0
    best = "CASE "
    for lang in langs:
        others_strict = [f"s_{lang} > s_{o}" for o in langs if o < lang]
        others_ge = [f"s_{lang} >= s_{o}" for o in langs if o > lang]
        conds = [f"s_{lang} > 0"] + others_strict + others_ge
        best += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    best += "ELSE 'und' END"
    return f"""WITH base AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    scored AS (SELECT doc_id, {', '.join(score_exprs)} FROM base)
    SELECT doc_id, {best} AS detected_lang FROM scored"""


@register("text_langid", _sql_langid())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-word argmax with deterministic ties."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.detect_language(F.col("text")).alias("detected_lang")
    )


@register(
    "text_fingerprint",
    f"SELECT doc_id, {SQL_H15.format(x=SQL_NORM)} AS fp FROM documents",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 60-bit hash of normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


# ---------------------------------------------------------------------------
# Dedup family (SURVEY §7 extension surface)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""SELECT {SQL_H15.format(x=SQL_NORM)} AS fp,
        MIN(doc_id) AS keep_doc_id, CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY 1""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs)


def _sql_minhash_ctes(threshold: float = 0.5, max_bucket_size: int | None = None) -> str:
    """Shared CTE chain ending in `pairs(doc_a, doc_b, jaccard)` — reused by
    the pair query and the recursive clusters oracle. ``max_bucket_size``
    mirrors the Spark operator's degenerate-bucket guard: (band, bucket)
    groups above the cap are dropped before pair expansion, so parity holds
    by construction when a pipeline assembly sets the cap."""
    sh = _sql_shingles(SQL_NTOKS)
    sig_entries = ", ".join(
        f"list_min(list_transform(hx, x -> ({a} * x + {b}) % {MINHASH_P}))"
        for a, b in MINHASH_COEFFS
    )
    n_bands = NUM_MINHASHES // BAND_SIZE
    cand_src = "buckets"
    cap_cte = ""
    if max_bucket_size is not None:
        cap_cte = f"""capped AS (
      SELECT doc_id, band, bucket FROM (
        SELECT doc_id, band, bucket,
               COUNT(*) OVER (PARTITION BY band, bucket) AS bn
        FROM buckets) t WHERE bn <= {max_bucket_size}),
    """
        cand_src = "capped"
    return f"""sh AS (SELECT doc_id, {sh} AS s FROM documents),
    hx AS (SELECT doc_id, s, list_transform(s, e -> {SQL_H8.format(x='e')}) AS hx FROM sh),
    sigs AS (SELECT doc_id, s, [{sig_entries}] AS sig FROM hx),
    buckets AS (
      SELECT doc_id, b.band,
             md5(array_to_string(list_transform(
                 list_slice(sig, b.band * {BAND_SIZE} + 1, b.band * {BAND_SIZE} + {BAND_SIZE}),
                 v -> CAST(v AS VARCHAR)), '-')) AS bucket
      FROM sigs, (SELECT unnest(range(0, {n_bands})) AS band) b),
    {cap_cte}cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM {cand_src} l JOIN {cand_src} r ON l.band = r.band AND l.bucket = r.bucket
                                    AND l.doc_id < r.doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
      FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id),
    pairs AS (
      SELECT doc_a, doc_b, {sql_exact_ratio("i", "u", 4)} AS jaccard
      FROM verified WHERE i::DOUBLE / u >= {threshold})"""


def _sql_minhash_pairs(threshold: float = 0.5) -> str:
    return f"""WITH {_sql_minhash_ctes(threshold)}
    SELECT doc_a, doc_b, jaccard FROM pairs"""


def _sql_minhash_clusters(threshold: float = 0.5) -> str:
    """Connected components over the near-dup pair graph: min reachable id per
    node via a recursive reachability closure — the closed form of the Spark
    side's min-label propagation (operators.dedup.dup_clusters), which loops
    until converged, i.e. until every node carries its component minimum."""
    return f"""WITH RECURSIVE {_sql_minhash_ctes(threshold)},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id)
    SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id"""


@register("dedup_minhash_lsh", _sql_minhash_pairs())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, threshold=0.5)


def _sql_simhash() -> str:
    return f"""WITH toks AS (
      SELECT doc_id, source, list_distinct({SQL_TOKS}) AS tk FROM documents),
    hx AS (SELECT doc_id, source, list_transform(tk, t -> {SQL_H8.format(x='t')}) AS hx FROM toks),
    votes AS (
      SELECT doc_id, source,
             list_transform(range(0, {SIMHASH_BITS}),
               b -> list_sum(list_transform(hx,
                 x -> CASE WHEN CAST(floor(x / 2 ** b) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END)))
             AS v
      FROM hx),
    sigs AS (
      SELECT doc_id, source,
             CAST(list_sum(list_transform(range(0, {SIMHASH_BITS}),
               b -> CASE WHEN list_extract(v, b + 1) > 0 THEN CAST(2 ** b AS BIGINT) ELSE 0 END))
             AS BIGINT) AS simhash
      FROM votes)"""


@register(
    "dedup_simhash",
    _sql_simhash() + " SELECT doc_id, simhash FROM sigs",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash(docs)


@register(
    "dedup_simhash_pairs",
    _sql_simhash()
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = dd.simhash_pairs(docs, max_hamming=3)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("bigint").alias("hamming"))


def _sql_ngram_jaccard(threshold: float = 0.5) -> str:
    sh = _sql_shingles(SQL_NTOKS)
    return f"""WITH base AS (
      SELECT doc_id, source AS blk, CAST(strlen(text) // 100 AS BIGINT) AS lbkt,
             {sh} AS s
      FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           {sql_exact_ratio("len(list_intersect(a.s, b.s))",
                            "len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))", 4)} AS jaccard
    FROM base a JOIN base b
      ON a.blk = b.blk AND a.lbkt = b.lbkt AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}"""


@register("dedup_ngram_jaccard", _sql_ngram_jaccard())
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, threshold=0.5)


SQL_COS = (
    "CASE WHEN sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})) > 0 "
    "THEN list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))) "
    "ELSE 0.0 END"
)


@register(
    "dedup_embedding_cosine",
    f"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({SQL_COS.format(a='a.v', b='b.v')}, 4) AS cosine
    FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {SQL_COS.format(a='a.v', b='b.v')} >= 0.3""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dd.embedding_cosine_pairs(emb, threshold=0.3)


# ---------------------------------------------------------------------------
# Similarity search (SURVEY §7 extension surface)
# ---------------------------------------------------------------------------

ANN_QUERY_MAX_ID = 8
ANN_K = 5


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < ANN_QUERY_MAX_ID).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@register(
    "ann_topk_bruteforce",
    f"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID}),
    base AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {SQL_COS.format(a='qv', b='v')} AS score
      FROM q CROSS JOIN base),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, round(score, 4) AS score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {ANN_K}""",
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.brute_force_topk(emb, _queries_df(spark, sf_dir), k=ANN_K)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


def _sql_planes_values() -> str:
    rows = []
    for p, plane in enumerate(HYPERPLANES):
        lits = ", ".join(repr(v) for v in plane)
        rows.append(f"({p}, [{lits}]::DOUBLE[])")
    return ", ".join(rows)


@register(
    "ann_lsh_topk",
    f"""WITH planes(p, w) AS (VALUES {_sql_planes_values()}),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bk AS (
      SELECT vec_id, CAST(SUM(CASE WHEN list_dot_product(v, w) > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      FROM base CROSS JOIN planes GROUP BY vec_id),
    b2 AS (SELECT b.vec_id, b.v, k.bucket FROM base b JOIN bk k ON b.vec_id = k.vec_id),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b2 WHERE vec_id < {ANN_QUERY_MAX_ID}),
    scored AS (
      SELECT q.query_id, b2.vec_id AS neighbor_id, {SQL_COS.format(a='q.qv', b='b2.v')} AS score
      FROM q JOIN b2 ON q.bucket = b2.bucket),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, round(score, 4) AS score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {ANN_K}""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.lsh_topk(emb, _queries_df(spark, sf_dir), k=ANN_K)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# Deterministic hash-sample for centroid/codebook training (matches
# operators/similarity.py::training_sample): md5 over the stringified id is
# bit-identical in Spark and DuckDB, so both engines train on the same rows.
# "0123" keeps ~1/4 of the corpus — big enough that every local SF trains on
# >= n_clusters rows, small enough to demonstrate the sampled-training IO
# shape (at 100 TB the rate drops to ~10-50k rows, same predicate).
_TRAIN_SAMPLE_HEX = "0123"


def _sql_train_pred(sample_hex: str, id_expr: str = "vec_id") -> str:
    chars = ", ".join(f"'{c}'" for c in sample_hex)
    return f"substr(md5(CAST({id_expr} AS VARCHAR)), 1, 1) IN ({chars})"


def _sql_train_cte(src: str, sample_hex: str, cond: str = "") -> str:
    """Training-sample CTE body with the degenerate-corpus fallback the
    Spark side applies (similarity.py::training_sample): when the
    hash-sample keeps nothing, train on the whole source instead of
    producing an empty (crash-or-empty-result) Lloyd chain. ``cond`` is an
    extra training restriction (e.g. the incremental query's even-id half);
    the fallback widens only the SAMPLE, never the restriction — exactly
    what training_sample(df.filter(cond), hex) does."""
    sample = _sql_train_pred(sample_hex)
    scoped = f"({sample} AND ({cond}))" if cond else f"({sample})"
    keep = f"({sample} OR NOT EXISTS (SELECT 1 FROM {src} WHERE {scoped}))"
    if cond:
        keep = f"({cond}) AND {keep}"
    return f"SELECT * FROM {src} WHERE {keep}"


def _sql_ivf_parts(
    n_clusters: int = 8,
    iterations: int = 5,
    n_probe: int = 2,
    sample_hex: str = _TRAIN_SAMPLE_HEX,
    train_extra: str = "",
    sized_target: int | None = None,
) -> list:
    """Unrolled k-means oracle for IVF: the Spark path is fully deterministic
    (min-id seeds, fixed Lloyd iterations, ties to the lowest cluster index),
    so each assign/update iteration becomes a chained CTE pair. Squared
    euclidean is written as the same elementwise sum both engines fold;
    empty clusters keep their previous centroid (COALESCE over LEFT JOIN),
    mirroring kmeans_centroids. Returns the CTE list ending in `ranked` so
    both the top-k query and the recall evaluation can share it.

    Centroid means are rounded to 6 dp in BOTH engines (here and in
    kmeans_centroids) before the next assignment step: FP addition is
    order-sensitive, and an unrounded last-ulp difference between engines
    (or between Spark plans) could flip a near-tie assignment and cascade
    through the unrolled iterations. With rounding, divergence requires the
    true mean to sit within float error of a 0.5e-6 boundary —
    measure-zero in practice."""
    d2 = (
        "list_sum(list_transform(range(1, len(b.v) + 1),"
        " i -> (b.v[i] - c.c[i]) * (b.v[i] - c.c[i])))"
    )
    # Lloyd's runs on the hash-sampled `train` CTE (the sampled-training IO
    # posture — see similarity.py::training_sample); only the one final
    # assignment `af` touches the full corpus.
    parts = [
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"train AS ({_sql_train_cte('base', sample_hex, train_extra)})",
    ]
    if sized_target:
        # Mirror of ann_index._sized_n_clusters(n, target, floor=n_clusters):
        # k = clamp(ceil(corpus / target), n_clusters .. MAX_DERIVED_CLUSTERS),
        # computed from the SAME full-corpus count the Spark build counts —
        # the oracle derives the cluster count instead of freezing it, so one
        # static SQL string stays correct at every scale factor.
        parts.append(
            f"""nc AS (
          SELECT GREATEST({n_clusters}, LEAST(65536,
                 CAST(CEIL(COUNT(*) / {sized_target}.0) AS BIGINT))) AS k
          FROM base)"""
        )
        parts.append(
            """c0 AS (
          SELECT cluster, c FROM (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
            FROM train) t, nc WHERE t.cluster < nc.k)"""
        )
    else:
        parts.append(
            f"""c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
          FROM (SELECT vec_id, v FROM train ORDER BY vec_id LIMIT {n_clusters}))"""
        )
    for it in range(1, iterations + 1):
        prev = f"c{it - 1}"
        parts.append(f"""a{it} AS (
          SELECT vec_id, v, cluster FROM (
            SELECT b.vec_id, b.v, c.cluster,
                   row_number() OVER (PARTITION BY b.vec_id
                                      ORDER BY {d2} ASC, c.cluster ASC) AS rn
            FROM train b CROSS JOIN {prev} c) t WHERE rn = 1)""")
        parts.append(f"""u{it} AS (
          SELECT cluster, list(m ORDER BY idx) AS c FROM (
            SELECT cluster, idx, round(AVG(val), 6) AS m FROM (
              SELECT cluster, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS idx
              FROM a{it}) z
            GROUP BY cluster, idx) g GROUP BY cluster)""")
        parts.append(f"""c{it} AS (
          SELECT p.cluster, COALESCE(u.c, p.c) AS c
          FROM {prev} p LEFT JOIN u{it} u ON p.cluster = u.cluster)""")
    fin = f"c{iterations}"
    parts.append(f"""af AS (
      SELECT vec_id, v, cluster FROM (
        SELECT b.vec_id, b.v, c.cluster,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {d2} ASC, c.cluster ASC) AS rn
        FROM base b CROSS JOIN {fin} c) t WHERE rn = 1)""")
    qd2 = d2.replace("b.v", "q.qv")
    parts.append(f"""probes AS (
      SELECT query_id, qv, cluster FROM (
        SELECT q.query_id, q.qv, c.cluster,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {qd2} ASC, c.cluster ASC) AS pr
        FROM (SELECT vec_id AS query_id, v AS qv FROM base
              WHERE vec_id < {ANN_QUERY_MAX_ID}) q
        CROSS JOIN {fin} c) t WHERE pr <= {n_probe})""")
    parts.append(f"""scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {SQL_COS.format(a='p.qv', b='a.v')} AS score
      FROM probes p JOIN af a ON p.cluster = a.cluster)""")
    parts.append("""ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored)""")
    return parts


def _sql_ivf(n_clusters: int = 8, iterations: int = 5, n_probe: int = 2) -> str:
    body = ",\n    ".join(_sql_ivf_parts(n_clusters, iterations, n_probe))
    return f"""WITH {body}
    SELECT query_id, neighbor_id, round(score, 4) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {ANN_K}"""


@register("ann_ivf_topk", _sql_ivf())
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.ivf_topk(
        emb, _queries_df(spark, sf_dir), k=ANN_K, n_clusters=8, n_probe=2,
        sample_hex=_TRAIN_SAMPLE_HEX,
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# Multimodal columns (SURVEY §7 extension surface)
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode",
    """WITH media AS (
      SELECT doc_id, ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             strlen(text) AS byte_len
      FROM documents)
    SELECT doc_id, media_type, CAST(byte_len AS BIGINT) AS byte_len,
      CAST(CASE WHEN media_type IN ('image','video') THEN byte_len % 640 + 16 ELSE 0 END AS INT) AS width,
      CAST(CASE WHEN media_type IN ('image','video') THEN byte_len % 480 + 16 ELSE 0 END AS INT) AS height,
      CAST(CASE WHEN media_type = 'image' THEN 1
                WHEN media_type = 'video' THEN byte_len % 300 + 1 ELSE 0 END AS INT) AS n_frames,
      CAST(CASE WHEN media_type = 'audio' THEN 8000 + (byte_len % 4) * 8000 ELSE 0 END AS INT) AS sample_rate
    FROM media""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns + Arrow-batched decode (deterministic fake probe;
    real Spark plumbing: binary column, mapInPandas, explicit schema)."""
    docs = load_table(spark, sf_dir, "documents")
    media = mm.to_media_table(docs)
    return mm.decode_media_meta(media)


@register(
    "multimodal_frame_sample",
    """WITH media AS (
      SELECT doc_id, ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             strlen(text) AS byte_len
      FROM documents),
    vids AS (SELECT doc_id, byte_len % 300 + 1 AS n_frames FROM media WHERE media_type = 'video')
    SELECT doc_id, CAST(unnest(range(0, n_frames, 30)) AS BIGINT) AS frame_idx FROM vids""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = multimodal_decode(spark, sf_dir)
    return mm.frame_sample_plan(decoded, every_n=30).select(
        "doc_id", F.col("frame_idx").cast("bigint").alias("frame_idx")
    )


# ---------------------------------------------------------------------------
# Additional §2 parity: map-state suppression, set ops, rollup
# ---------------------------------------------------------------------------


@register(
    "cdc_change_suppression_props",
    f"""WITH {SQL_CH},
    lagged AS (
      SELECT event_id, op_type, props,
             row_number() OVER (PARTITION BY id ORDER BY ts_us, event_id) AS rn,
             lag(props) OVER (PARTITION BY id ORDER BY ts_us, event_id) AS prev_props
      FROM ch)
    SELECT event_id FROM lagged
    WHERE op_type <> 'UPDATE' OR rn = 1 OR prev_props IS DISTINCT FROM props""",
)
def cdc_change_suppression_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-state change suppression (watcher.go:315-331: labels+annotations
    compared via mapsEqual): the props JSON is parsed to a real MAP column and
    compared with the null-safe map-equality operator — Spark cannot compare
    MapType with =, so this exercises functions.extract.maps_equal. (The
    oracle compares the canonical JSON strings, equivalent on this data.)"""
    from pyspark.sql.types import LongType, MapType, StringType

    from .functions.extract import maps_equal

    ch = _ch(spark, sf_dir).withColumn(
        "props_map", F.from_json("props", MapType(StringType(), LongType()))
    )
    w = Window.partitionBy("id").orderBy(F.col("event_ts").asc(), F.col("event_id").asc())
    lagged = ch.withColumn("prev_map", F.lag("props_map").over(w))
    kept = lagged.filter(
        (F.col("op_type") != "UPDATE")
        | F.col("prev_map").isNull()
        | ~maps_equal(F.col("prev_map"), F.col("props_map"))
    )
    return kept.select("event_id")


@register(
    "events_set_ops",
    """SELECT user_id, 'both' AS grp FROM (
         SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         INTERSECT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
       UNION ALL
       SELECT user_id, 'purchase_only' AS grp FROM (
         SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         EXCEPT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'error')""",
)
def events_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (INTERSECT / EXCEPT / UNION ALL) over the event stream."""
    ev = load_table(spark, sf_dir, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erroring = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = purchasers.intersect(erroring).withColumn("grp", F.lit("both"))
    only = purchasers.exceptAll(erroring).withColumn("grp", F.lit("purchase_only"))
    return both.unionByName(only)


@register(
    "events_rollup",
    """SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day_ms,
       CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY ROLLUP(event_type, date_trunc('day', ts))""",
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation (ROLLUP grouping sets): per (type, day),
    per type, and grand total.

    SQL-standard empty-input semantics: grouping set () yields one global
    row even over zero input rows. Spark's rollup() omits it (unlike
    DuckDB/Postgres), so the empty case returns the grand row explicitly —
    the isEmpty probe is a limit-1 scan, noise at any scale."""
    ev = load_table(spark, sf_dir, "events")
    if ev.isEmpty():
        return spark.createDataFrame(
            [(None, None, 0)], "event_type string, day_ms bigint, n bigint"
        )
    return (
        ev.rollup(F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("__day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.unix_millis("__day").alias("day_ms"),
            "n",
        )
    )


@register(
    "tpch_q14_promo_revenue",
    f"""SELECT
      CAST(100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN {_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS VARCHAR) AS DOUBLE)
      AS DOUBLE) AS promo_revenue_pct,
      CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact-dim join + conditional aggregation. `part` is
    broadcast (dim side); the promo share is a ratio of two exact DECIMAL
    sums converted to double."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    decp = lambda c: c.cast("decimal(12,2)")
    decf = lambda c: c.cast("decimal(4,2)")
    disc = decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-02-01"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q4_priority_semijoin",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority""",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left-semi join, then grouped count."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-04-01"))
        )
        .join(heavy, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q18_large_orders",
    f"""WITH totals AS (
      SELECT l_orderkey, CAST(CAST(SUM({_DP.format(x='l_quantity')}) AS VARCHAR) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM({_DP.format(x='l_quantity')}) > CAST(300 AS DECIMAL(12,2)))
    SELECT c_custkey, c_name, o_orderkey, total_qty
    FROM totals JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey LIMIT 20""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: grouped HAVING filter feeding joins + top-k. The
    aggregation runs FIRST (shrinks lineitem to qualifying orderkeys) so the
    joins see only the heavy hitters."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    decp = lambda col: col.cast("decimal(12,2)")
    totals = (
        li.groupBy("l_orderkey")
        .agg(F.sum(decp(F.col("l_quantity"))).alias("__tq"))
        .filter(F.col("__tq") > F.lit(300).cast("decimal(12,2)"))
        .select("l_orderkey", F.col("__tq").cast("double").alias("total_qty"))
    )
    return (
        totals.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "events_user_zscore",
    """WITH stats AS (
      SELECT user_id,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT e.event_id, e.user_id,
           round((e.value - s.mu) / s.sigma, 3) AS zscore
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE e.event_type = 'purchase' AND s.sigma > 0""",
)
def events_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of purchase values — pure-JVM window expressions
    (avg/stddev_samp over the user partition + one projection): one user-keyed
    Exchange, whole-stage codegen, no Python stage. Output rounded to 3
    decimals to absorb summation-order differences vs the SQL oracle (float
    reduction order is engine-specific). The Arrow-batched grouped-UDF
    formulation of the same shape lives in
    tests/test_curation.py::test_grouped_udf_zscore_matches_window — the
    applyInPandas surface is demonstrated there, not registered as an engine
    query, because Catalyst does this arithmetic natively."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn("mu", F.avg("value").over(w))
        .withColumn("sigma", F.stddev_samp("value").over(w))
        .filter(F.col("sigma") > 0)
        .select(
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("user_id").cast("bigint").alias("user_id"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 3).alias(
                "zscore"
            ),
        )
    )


@register(
    "events_asof_attribution",
    """WITH tagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us, epoch_ms(ts) AS ts_ms, event_id,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side,
             CASE WHEN event_type = 'view' THEN event_id END AS view_event_id
      FROM events WHERE event_type IN ('view', 'purchase')),
    carried AS (
      SELECT *,
             last_value(view_event_id IGNORE NULLS) OVER w AS matched_view,
             last_value(CASE WHEN side = 0 THEN ts_ms END IGNORE NULLS) OVER w AS matched_ts
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, view_event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id AS purchase_event_id, ts_ms AS purchase_ts_ms,
           matched_view, matched_ts
    FROM carried WHERE side = 1""",
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (last-touch attribution): each purchase matched to the
    user's latest preceding view. Union-merge formulation — one shuffle on
    the key, no range-join explosion (operators.debounce.asof_join)."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("event_id").alias("view_event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_event_id")
    )
    joined = dbn.asof_join(
        purchases,
        views,
        key_cols=["user_id"],
        left_ts="purchase_ts",
        right_ts="view_ts",
        right_payload=["view_event_id"],
    )
    return joined.select(
        "user_id",
        "purchase_event_id",
        F.unix_millis("purchase_ts").alias("purchase_ts_ms"),
        F.col("asof_match.view_event_id").alias("matched_view"),
        F.unix_millis("asof_ts").alias("matched_ts"),
    )


@register(
    "cdc_scd2_history",
    f"""WITH {SQL_CH}
    SELECT id, event_id, value, ts_ms AS valid_from_ms,
           lead(ts_ms) OVER (PARTITION BY id ORDER BY ts_us, event_id) AS valid_to_ms,
           lead(ts_ms) OVER (PARTITION BY id ORDER BY ts_us, event_id) IS NULL AS is_current
    FROM ch""",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history of the sync target: each change opens a version
    valid until the next change; the open version is current."""
    ch = _ch(spark, sf_dir)
    out = dbn.scd2_history(ch, tiebreak_cols=["event_id"])
    return out.select(
        "id", "event_id", "value", "valid_from_ms", "valid_to_ms", "is_current"
    )


@register(
    "cdc_payload_json",
    f"""WITH {SQL_CH}, {SQL_RESOLVED.strip().lstrip()}
    SELECT id, to_json(struct_pack(id := id, event_id := event_id,
                                   value := value, ts_ms := ts_ms))::VARCHAR AS payload_json
    FROM resolved WHERE op = 'upsert'""",
)
def cdc_payload_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload serialization (rest.go:87-90 contract via to_json):
    upsert rows rendered to the wire format. Spark's to_json omits null
    fields — the engine-level match for the reference's `omitempty` — so the
    query covers the (all-non-null) upsert payload."""
    resolved = cdc_delete_cancels_upsert(spark, sf_dir)
    ups = resolved.filter(F.col("op") == "upsert")
    ch = _ch(spark, sf_dir).select(
        "event_id", F.unix_millis("event_ts").alias("ts_ms")
    )
    ups = ups.join(ch, "event_id")
    return ups.select(
        "id",
        F.to_json(F.struct("id", "event_id", "value", "ts_ms")).alias("payload_json"),
    )


@register(
    "embeddings_quantize_int8",
    """WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
      FROM embeddings),
    qt AS (
      SELECT vec_id, amax,
             CASE WHEN amax > 0
               THEN list_transform(v, x -> CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT))
               ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
      FROM s)
    SELECT vec_id, i - 1 AS j, q[i] AS qval, round(amax / 127.0, 6) AS scale
    FROM qt, unnest(range(1, len(q) + 1)) AS r(i)""",
)
def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 vector quantization (per-vector symmetric scale), exploded to
    (vec_id, dim, qval, scale) for full value verification. 4x compression
    of the embedding store; floor(x+0.5) for engine-exact rounding."""
    from .functions.vectors import quantize_int8, quantize_scale

    emb = load_table(spark, sf_dir, "embeddings")
    qt = emb.select(
        "vec_id",
        quantize_int8(F.col("embedding")).alias("q"),
        F.round(quantize_scale(F.col("embedding")), 6).alias("scale"),
    )
    return qt.select(
        "vec_id", F.posexplode("q").alias("j", "qval"), "scale"
    ).select("vec_id", F.col("j").cast("bigint").alias("j"), "qval", "scale")


@register(
    "tpch_q7_volume_shipping",
    f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    Both nation lookups broadcast; the OR-pair predicate evaluates after the
    joins (Catalyst can't split it, but the dims are tiny)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate")).cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q9_profit",
    f"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}
                 - {_DP.format(x='p_retailprice')} * {_DF.format(x='0.8')} * {_DP.format(x='l_quantity')}) AS VARCHAR) AS DOUBLE) AS profit
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE contains(p_name, 'widget')
    GROUP BY n_name, year(o_orderdate)""",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year (retail price as
    the cost proxy — the schema has no partsupp). Exact decimal arithmetic
    throughout including the subtraction."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    profit = decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount")) - decp(
        F.col("p_retailprice")
    ) * decf(F.lit(0.8)) * decp(F.col("l_quantity"))
    return (
        li.join(F.broadcast(p.filter(F.col("p_name").contains("widget"))), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year(F.col("o_orderdate")).cast("bigint").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "tpch_q12_quantity_bands",
    """SELECT o_orderpriority,
        CASE WHEN l_quantity < 10 THEN 'low'
             WHEN l_quantity < 30 THEN 'mid'
             ELSE 'high' END AS qty_band,
        CAST(COUNT(*) AS BIGINT) AS n
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority, 2""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipment counts bucketed by priority x quantity band."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", band.alias("qty_band"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "tpch_q19_disjunctive",
    f"""SELECT CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-branch predicate across the join.
    Catalyst extracts the common p_size/l_quantity bounds where it can; the
    OR stays a post-join filter over the broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "events_funnel",
    """WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS first_view,
             min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS first_purchase
      FROM events GROUP BY user_id)
    SELECT user_id, first_view, first_click, first_purchase,
           (first_view IS NOT NULL AND first_click IS NOT NULL
            AND first_purchase IS NOT NULL
            AND first_view <= first_click AND first_click <= first_purchase)
           AS completed_funnel
    FROM stages""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per-user first view -> click -> purchase ordering.
    One conditional aggregation — no joins, no self-union; the classic
    event-analytics shape at warehouse scale."""
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(
        F.when(F.col("event_type") == t, F.unix_millis("ts"))
    )
    stages = ev.groupBy("user_id").agg(
        first_of("view").alias("first_view"),
        first_of("click").alias("first_click"),
        first_of("purchase").alias("first_purchase"),
    )
    completed = (
        F.col("first_view").isNotNull()
        & F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_view") <= F.col("first_click"))
        & (F.col("first_click") <= F.col("first_purchase"))
    )
    return stages.withColumn("completed_funnel", completed)


@register(
    "documents_topk_terms",
    """WITH toks AS (
      SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> t <> '')) AS term
      FROM documents),
    counts AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
      FROM toks GROUP BY lang, term),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rnk
      FROM counts)
    SELECT lang, term, n, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5""",
)
def documents_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language: explode -> two-level aggregation -> windowed
    top-k. The (lang, term) count is map-side partial, so the shuffle carries
    distinct terms, not token instances."""
    from .functions.text import tokens as tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokens_expr(F.col("text"))).alias("term"))
    counts = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
    )


@register("dedup_minhash_clusters", _sql_minhash_clusters())
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters over the MinHash near-dup pairs:
    connected components via min-label propagation, run to convergence, so the
    labels equal the component minima — which the oracle computes in closed
    form as MIN over a recursive reachability closure."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    return dd.dup_clusters(pairs)


@register(
    "tpch_q22_sales_opportunity",
    """WITH avg_bal AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0),
    eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer, avg_bal
      WHERE c_acctbal > ab)
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM eligible e
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey)
    GROUP BY c_nationkey""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join.

    The average is a 1-row broadcast (cross join of a scalar); the NOT EXISTS
    becomes a left-anti hash join on the customer key. Note the threshold
    itself is a float average — safe here because it only GATES rows and the
    closest balance sits far from the cutoff relative to 1e-15 noise, while
    every OUTPUT aggregate stays exact decimal.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    eligible = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    return (
        eligible.join(
            o.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy(F.col("c_nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "cdc_crd_routing",
    """WITH typed AS (
      SELECT event_id, event_type,
             CASE WHEN event_type = 'signup' THEN 'CustomResourceDefinition'
                  ELSE 'Deployment' END AS kind,
             CASE WHEN event_type = 'signup' THEN 'apiextensions.k8s.io/v1'
                  ELSE 'apps/v1' END AS api_version,
             CASE WHEN event_type = 'error' THEN 'UPDATE' ELSE 'ADD' END AS op
      FROM events),
    routed AS (
      SELECT *, (kind = 'CustomResourceDefinition'
                 AND starts_with(api_version, 'apiextensions.k8s.io/')) AS is_crd
      FROM typed)
    SELECT 'instance' AS route, CAST(COUNT(*) AS BIGINT) AS n
    FROM routed WHERE NOT is_crd
    UNION ALL
    SELECT 'crd' AS route, CAST(COUNT(*) AS BIGINT) AS n
    FROM routed WHERE is_crd AND op <> 'UPDATE'""",
)
def cdc_crd_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRD routing predicate + stream split (watcher.go:209-228; CRD UPDATEs
    dropped, watcher.go:241-243) over synthesized kind/apiVersion columns —
    exercises operators.filters.split_crd_stream with an oracle."""
    from .operators.filters import split_crd_stream

    ev = load_table(spark, sf_dir, "events")
    typed = ev.select(
        "event_id",
        F.when(F.col("event_type") == "signup", "CustomResourceDefinition")
        .otherwise("Deployment")
        .alias("kind"),
        F.when(F.col("event_type") == "signup", "apiextensions.k8s.io/v1")
        .otherwise("apps/v1")
        .alias("api_version"),
        F.when(F.col("event_type") == "error", "UPDATE")
        .otherwise("ADD")
        .alias("event_type"),
    )
    instances, crds = split_crd_stream(typed)
    return instances.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("instance").alias("route"), "n"
    ).unionByName(
        crds.agg(F.count(F.lit(1)).alias("n")).select(F.lit("crd").alias("route"), "n")
    )


# ---------------------------------------------------------------------------
# TPC-H shape completion (round 2): the remaining 9 of the 22 classic shapes,
# adapted to this star schema (no partsupp/comment/commitdate columns — the
# same adaptation discipline as q4/q9/q22 above). All output aggregates are
# exact DECIMAL (order-independent) cast to double at the edge.
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    f"""WITH costs AS (
      SELECT l_partkey, l_suppkey, MIN({_DP.format(x='l_extendedprice')}) AS cost
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey)
    SELECT c.l_partkey AS p_partkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal,
           n_name, CAST(cost AS DOUBLE) AS supply_cost
    FROM costs c
      JOIN supplier ON c.l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    QUALIFY cost = MIN(cost) OVER (PARTITION BY c.l_partkey)""",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min supplier selection. The classic
    correlated subquery (cheapest supplier per part) becomes a window MIN over
    the per-(part, supplier) cost aggregate — one shuffle on the group key,
    window reuses the same partitioning. MIN over decimals is exact, so the
    equality join against the minimum is engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p_f = p.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    ).select("p_partkey")
    eu_sup = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    costs = (
        li.join(F.broadcast(p_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(12,2)")).alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("best", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("best")
    )
    return (
        best.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "n_name",
            F.col("cost").cast("double").alias("supply_cost"),
        )
    )


@register(
    "tpch_q8_market_share",
    f"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      CAST(CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
                    THEN {_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS VARCHAR) AS DOUBLE)
         AS DOUBLE) AS mkt_share
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN part ON l_partkey = p_partkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    GROUP BY year(o_orderdate)""",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share by year. The nested volume/total
    division is a single conditional aggregation — no second pass over
    lineitem. Both sums are exact decimals; the final division of two exact
    doubles is IEEE-deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    vol = decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount"))
    asia_cust = (
        c.join(F.broadcast(n.withColumnRenamed("n_name", "c_nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    sup_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("s_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "s_nation")
    return (
        li.join(F.broadcast(p.filter(F.col("p_type") == "ECONOMY").select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("s_nation") == "NATION_7", vol).otherwise(
                        F.lit(0).cast("decimal(12,2)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "tpch_q11_important_parts",
    f"""WITH vals AS (
      SELECT l_partkey, SUM({_DP.format(x='l_extendedprice')}) AS value
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT SUM(value) AS total FROM vals)
    SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
    FROM vals, tot
    WHERE CAST(value AS DOUBLE) > CAST(total AS DOUBLE) * 0.0007""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups exceeding a fraction of the global total. The
    global total is a second aggregation over the (already tiny) per-part
    frame, broadcast back as a 1-row cross join — lineitem is scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("value")
    )
    total = vals.agg(F.sum("value").alias("total"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(
            F.col("value").cast("double") > F.col("total").cast("double") * F.lit(0.0007)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value").cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q13_order_distribution",
    """WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. Left outer join
    keeps zero-order customers (COUNT of a null column is 0 in both engines);
    the priority filter stands in for the original comment NOT LIKE."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("bigint").alias("c_count")).agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "tpch_q15_top_supplier",
    f"""WITH rev AS (
      SELECT l_suppkey, SUM({_DP.format(x='l_extendedprice')} * {_DF.format(x='1 - l_discount')}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    QUALIFY total_rev = MAX(total_rev) OVER ()""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue — the view
    + scalar-max subquery becomes a global window MAX over the 100-row
    per-supplier aggregate (empty partitionBy is safe: the frame is tiny by
    construction after the group-by). Decimal equality against the max is
    exact."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    decp = lambda col: col.cast("decimal(12,2)")
    decf = lambda col: col.cast("decimal(4,2)")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(decp(F.col("l_extendedprice")) * decf(F.lit(1) - F.col("l_discount"))).alias("total_rev")
        )
    )
    w = Window.partitionBy()
    return (
        rev.withColumn("mx", F.max("total_rev").over(w))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@register(
    "tpch_q16_supplier_variety",
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) AND s_acctbal >= 0
    GROUP BY p_brand, p_type, p_size""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute group;
    the negative-balance supplier exclusion stands in for the complaints
    NOT IN subquery (a broadcast semi-join either way)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    p_f = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    good_sup = s.filter(F.col("s_acctbal") >= 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(good_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    f"""WITH th AS (
      SELECT l_partkey AS pk,
             0.2 * (CAST(CAST(SUM({_DP.format(x='l_quantity')}) AS VARCHAR) AS DOUBLE) / COUNT(*)) AS threshold
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(CAST(CAST(SUM({_DP.format(x='l_extendedprice')}) AS VARCHAR) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN th ON l_partkey = pk
    WHERE p_brand = 'Brand#3' AND p_type = 'MEDIUM' AND l_quantity < threshold""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below 20%% of their group's mean quantity. The
    correlated AVG subquery becomes a per-part aggregate joined back to
    lineitem (shuffle on the part key both sides). The threshold is computed
    as exact-decimal-sum / count in double — identical operand values and
    operation order in both engines, so the float gate is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    th = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("threshold")
    )
    return (
        li.join(
            F.broadcast(
                p.filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM"))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(th, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q20_heavy_supply",
    f"""WITH qty AS (
      SELECT l_suppkey, l_partkey, SUM({_DP.format(x='l_quantity')}) AS q
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'SMALL' GROUP BY l_suppkey, l_partkey)
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM qty
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE CAST(q AS DOUBLE) > 100.0""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped quantity of a part class
    exceeds a threshold — the nested IN subqueries become an aggregate +
    semi-join (distinct) against broadcast dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    qty = (
        li.join(
            F.broadcast(p.filter(F.col("p_type") == "SMALL").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"))
        .filter(F.col("q").cast("double") > 100.0)
    )
    return (
        qty.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@register(
    "tpch_q21_waiting_suppliers",
    """WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS ns,
             COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R') AS nr,
             MIN(l_suppkey) FILTER (WHERE l_returnflag = 'R') AS r_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON r_supp = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND ns >= 2 AND nr = 1
      AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    GROUP BY s_name""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS (another supplier in the order) + NOT
    EXISTS (no OTHER supplier failed) pair collapses into one per-order
    aggregate — distinct-supplier count >= 2 and exactly one distinct
    'failed' (returnflag R) supplier — instead of two correlated self-joins
    over lineitem. The distinct counts are computed as a TWO-LEVEL aggregate
    (per (order, supplier), then per order): a direct multi-count_distinct
    would plan an Expand that triples the lineitem shuffle volume, while here
    the first partial aggregate collapses rows map-side and the second
    operates on the already-tiny (order, supplier) frame. Broadcast dims."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("has_r").alias("nr"),
        F.min(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("r_supp"),
    )
    return (
        per_order.filter((F.col("ns") >= 2) & (F.col("nr") == 1))
        .join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(s), F.col("r_supp") == F.col("s_suppkey"))
        .join(
            F.broadcast(n.filter(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Training-data curation surface (round 2): deterministic sampling, PII
# scrubbing, vocabulary/n-gram statistics, and composed cleaning pipelines.
# All per-row transforms are codegen'd column expressions; the sampling
# predicate and dedup survivors reuse the md5-prefix hash discipline so the
# DuckDB oracles reproduce the EXACT row sets, not just counts.
# ---------------------------------------------------------------------------

# training-mix rates per source; unlisted sources fall to the default
_SAMPLE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_SAMPLE_DEFAULT = 0.05


def _sql_sample_threshold() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {round(r * 10000)}" for s, r in _SAMPLE_RATES.items()
    )
    return f"CASE source {cases} ELSE {round(_SAMPLE_DEFAULT * 10000)} END"


@register(
    "documents_sample_stratified",
    f"""SELECT doc_id, source, lang FROM documents
    WHERE CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
          < {_sql_sample_threshold()}""",
)
def documents_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (training-data mix weighting): keep
    each row of stratum s with rate rates[s], decided by a stable hash of the
    row key — reproducible across engines and runs, zero shuffle (pure scan
    predicate inside WholeStageCodegen)."""
    from .operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, _SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT
    ).select("doc_id", "source", "lang")


def _sql_pii_chain(col: str) -> str:
    # DuckDB single-quoted literals keep backslashes VERBATIM (no escape
    # processing), so the pattern goes through untouched — doubling the
    # backslashes here would make RE2 see literal-backslash atoms and match
    # nothing. Only the quote needs escaping.
    out = col
    for pat, repl in T.PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{repl}', 'g')"
    return out


@register(
    "text_pii_scrub",
    f"SELECT doc_id, {_sql_pii_chain('text')} AS scrubbed FROM documents",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails, NNN-NNN-NNNN phones, IPv4s, SSNs replaced with
    typed placeholders. RE2-compatible patterns evaluated in the same chain
    order in both engines (functions.text.scrub_pii docstring has the
    ordering argument); crafted-PII behavior is pinned by
    tests/test_curation.py, this query pins engine parity on the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.scrub_pii(F.col("text")).alias("scrubbed"))


@register(
    "documents_vocab",
    f"""WITH toks AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents),
    per_doc AS (
      SELECT term, doc_id, COUNT(*) AS n FROM toks GROUP BY 1, 2)
    SELECT term, CAST(SUM(n) AS BIGINT) AS tf, CAST(COUNT(*) AS BIGINT) AS df
    FROM per_doc GROUP BY term HAVING CAST(SUM(n) AS BIGINT) >= 5""",
)
def documents_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build: term frequency + document frequency with a min-count
    floor. Two-level aggregate — per (term, doc) first, so the distinct doc
    count needs no count_distinct (no Expand) and both shuffles carry
    already-combined rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    per_doc = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("n").cast("bigint").alias("tf"),
            F.count(F.lit(1)).cast("bigint").alias("df"),
        )
        .filter(F.col("tf") >= 5)
    )


@register(
    "documents_bigram_counts",
    f"""WITH base AS (
      SELECT source, {SQL_TOKS} AS tk FROM documents),
    bgs AS (
      SELECT source, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM base),
    counts AS (
      SELECT source, bigram, CAST(COUNT(*) AS BIGINT) AS n FROM bgs GROUP BY 1, 2),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, bigram) AS rnk
      FROM counts)
    SELECT source, bigram, n, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5""",
)
def documents_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 bigrams per source: adjacent-pair construction stays an array
    transform (no explode until counting), then the same two-level
    partial-agg + window top-k shape as documents_topk_terms."""
    docs = load_table(spark, sf_dir, "documents")
    bgs = docs.select(
        "source", F.explode(T.bigrams(F.col("text"))).alias("bigram")
    )
    counts = bgs.groupBy("source", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("bigram"))
    return counts.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rnk") <= 5)


@register(
    "documents_dedup_survivors",
    f"""WITH RECURSIVE {_sql_minhash_ctes(0.5)},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id),
    comp AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id)
    SELECT d.doc_id, d.source FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)""",
)
def documents_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup REMOVAL (the operation a pipeline actually runs): every doc
    survives except non-representative members of a near-dup cluster (the
    representative is the min doc_id — same rule as the reference's dedup
    ratio test, integration_test.go:257-312). Anti-join against the small
    clusters frame; the corpus itself is never shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = dd.dup_clusters(dd.minhash_lsh_pairs(docs, threshold=0.5))
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(dropped, "doc_id", "left_anti").select("doc_id", "source")


@register(
    "pipeline_corpus_clean",
    f"""WITH base AS (
      SELECT doc_id, source, text, {SQL_TOKS} AS toks,
             regexp_replace(text, '\\s+', '', 'g') AS nospace
      FROM documents),
    m AS (
      SELECT doc_id, source, toks, text,
        CASE WHEN len(toks) > 0
             THEN len(list_filter(toks, t -> t IN ({_SQL_STOPS}))) / len(toks)
             ELSE 0.0 END AS stop_ratio,
        CASE WHEN length(nospace) > 0
             THEN length(regexp_replace(nospace, '[a-zA-Z0-9]', '', 'g')) / length(nospace)
             ELSE 0.0 END AS punct_ratio,
        length(text) AS n_chars_text,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['en']}))) AS s_en,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['de']}))) AS s_de,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['es']}))) AS s_es,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['fr']}))) AS s_fr,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['zh']}))) AS s_zh
      FROM base),
    scored AS (
      SELECT doc_id, source, toks, text,
             (least(n_chars_text / 500.0, 1.0)
              + (1.0 - least(punct_ratio * 4.0, 1.0))
              + least(stop_ratio * 5.0, 1.0)) / 3.0 AS q,
             (s_en > 0 AND s_en > s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh) AS is_en
      FROM m),
    kept AS (
      SELECT doc_id, source, len(toks) AS ntok, {SQL_H15.format(x=SQL_NORM)} AS fp
      FROM scored WHERE q >= 0.55 AND is_en),
    reps AS (SELECT fp, MIN(doc_id) AS keep_id FROM kept GROUP BY fp)
    SELECT k.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(k.ntok) AS BIGINT) AS n_tokens
    FROM kept k JOIN reps r ON k.doc_id = r.keep_id
    GROUP BY k.source""",
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning: quality gate (composite score >= 0.55) ->
    language filter (detected English) -> exact dedup keeping the min-doc_id
    representative -> per-source kept-docs / kept-tokens stats.

    Shape notes: the token array is MATERIALIZED once per row (a non-cheap
    alias referenced many times survives CollapseProject), so the quality
    ratios and the five language scores filter an in-memory array instead of
    re-running the tokenizing regex per expression; the representative
    selection is a min-window over the fingerprint partition rather than a
    groupBy + self-join (one shuffle, single evaluation of the scored frame).
    """
    kept = _corpus_clean_kept(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("fp")
    return (
        kept.withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
        )
    )


def _corpus_scored(docs: DataFrame) -> DataFrame:
    """Shared corpus-clean scoring frame: (doc_id, source, ntok, fp, q,
    is_en) — one materialized token array feeding the quality ratios and
    language scores (see pipeline_corpus_clean docstring for the plan
    rationale). Used by the end-to-end clean and its funnel report."""
    tk = F.col("tk")
    base = docs.select(
        "doc_id", "source", "text", T.tokens(F.col("text")).alias("tk")
    )
    ntok = F.size(tk)
    stop_ratio = F.when(
        ntok > 0,
        F.size(F.filter(tk, lambda t: t.isin(*T.STOPWORDS))) / ntok,
    ).otherwise(F.lit(0.0))
    nospace = F.regexp_replace(F.col("text"), "\\s+", "")
    punct_ratio = F.when(
        F.length(nospace) > 0,
        F.length(F.regexp_replace(nospace, "[a-zA-Z0-9]", "")) / F.length(nospace),
    ).otherwise(F.lit(0.0))
    q = (
        F.least(F.length("text") / F.lit(500.0), F.lit(1.0))
        + (F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0)))
        + F.least(stop_ratio * 5.0, F.lit(1.0))
    ) / F.lit(3.0)
    scores = {
        lang: F.size(F.filter(tk, lambda t: t.isin(*markers)))
        for lang, markers in T.LANG_MARKERS.items()
    }
    langs = sorted(T.LANG_MARKERS)
    is_en = (scores["en"] > 0) & F.lit(True)
    for o in langs:
        if o < "en":
            is_en = is_en & (scores["en"] > scores[o])
        elif o > "en":
            is_en = is_en & (scores["en"] >= scores[o])
    return base.select(
        "doc_id",
        "source",
        ntok.alias("ntok"),
        T.fingerprint(F.col("text")).alias("fp"),
        q.alias("q"),
        is_en.alias("is_en"),
    )


def _corpus_clean_kept(docs: DataFrame) -> DataFrame:
    """Rows surviving the quality + language gates, with dedup fingerprint."""
    s = _corpus_scored(docs)
    return s.filter((F.col("q") >= 0.55) & F.col("is_en")).select(
        "doc_id", "source", "ntok", "fp"
    )


@register(
    "ann_recall_lsh",
    f"""WITH bf_q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID}),
    bf_base AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v FROM embeddings),
    bf_scored AS (
      SELECT query_id, neighbor_id, {SQL_COS.format(a='qv', b='v')} AS score
      FROM bf_q CROSS JOIN bf_base),
    bf AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM bf_scored QUALIFY rank <= {ANN_K}),
    planes(p, w) AS (VALUES {_sql_planes_values()}),
    l_base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    l_bk AS (
      SELECT vec_id, CAST(SUM(CASE WHEN list_dot_product(v, w) > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      FROM l_base CROSS JOIN planes GROUP BY vec_id),
    l_b2 AS (SELECT b.vec_id, b.v, k.bucket FROM l_base b JOIN l_bk k ON b.vec_id = k.vec_id),
    l_q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM l_b2 WHERE vec_id < {ANN_QUERY_MAX_ID}),
    l_scored AS (
      SELECT l_q.query_id, l_b2.vec_id AS neighbor_id, {SQL_COS.format(a='l_q.qv', b='l_b2.v')} AS score
      FROM l_q JOIN l_b2 ON l_q.bucket = l_b2.bucket),
    lsh AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM l_scored QUALIFY rank <= {ANN_K}),
    hits AS (
      SELECT bf.query_id, CAST(COUNT(lsh.neighbor_id) AS BIGINT) AS hits
      FROM bf LEFT JOIN lsh
        ON bf.query_id = lsh.query_id AND bf.neighbor_id = lsh.neighbor_id
      GROUP BY bf.query_id)
    SELECT query_id, hits, {sql_exact_ratio("hits", str(ANN_K), 4)} AS recall FROM hits""",
)
def ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@k of the LSH index against the exact
    brute-force top-k, per query. The hit count is a semi-join of two small
    top-k frames (both already partitioned by query_id), so the evaluation
    adds no full-corpus work beyond the two searches it measures — the query
    a pipeline runs to decide whether an approximate index is good enough to
    replace the exact scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = _queries_df(spark, sf_dir)
    bf = sim.brute_force_topk(emb, qdf, k=ANN_K).select("query_id", "neighbor_id")
    lsh = sim.lsh_topk(emb, qdf, k=ANN_K).select(
        F.col("query_id").alias("l_qid"), F.col("neighbor_id").alias("l_nid")
    )
    hits = (
        bf.join(
            lsh,
            (F.col("query_id") == F.col("l_qid"))
            & (F.col("neighbor_id") == F.col("l_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("l_nid").cast("bigint").alias("hits"))
    )
    return hits.select(
        "query_id",
        "hits",
        exact_ratio("hits", str(ANN_K), 4).alias("recall"),
    )


@register(
    "documents_tfidf_topk",
    f"""WITH toks AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS n FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n_docs AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.n * ln(CAST(n_docs.n AS DOUBLE) / df.df) AS score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n_docs),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
      FROM scored)
    SELECT doc_id, term, round(score, 6) AS score, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3""",
)
def documents_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by tf-idf. The document-frequency side is a
    tiny per-term aggregate joined back (broadcast at any vocabulary that
    fits; the corpus itself shuffles once on (doc, term)); the corpus size is
    a 1-row scalar broadcast. Scores are products of identically-computed
    doubles, so ranking (score desc, term) is engine-independent."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs.select(F.col("n").alias("corpus_n"))))
        .select(
            "doc_id",
            "term",
            (F.col("n") * F.log(F.col("corpus_n").cast("double") / F.col("df"))).alias("score"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", F.round("score", 6).alias("score"), "rnk")
    )


@register(
    "text_langid_eval",
    f"""WITH base AS (SELECT doc_id, lang, {SQL_TOKS} AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang,
             len(list_filter(toks, t -> t IN ({_SQL_MARK['en']}))) AS s_en,
             len(list_filter(toks, t -> t IN ({_SQL_MARK['de']}))) AS s_de,
             len(list_filter(toks, t -> t IN ({_SQL_MARK['es']}))) AS s_es,
             len(list_filter(toks, t -> t IN ({_SQL_MARK['fr']}))) AS s_fr,
             len(list_filter(toks, t -> t IN ({_SQL_MARK['zh']}))) AS s_zh
      FROM base),
    det AS (
      SELECT doc_id, lang AS actual_lang,
        CASE WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_en > 0 AND s_en > s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_es > 0 AND s_es > s_de AND s_es > s_en AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr > 0 AND s_fr > s_de AND s_fr > s_en AND s_fr > s_es AND s_fr >= s_zh THEN 'fr'
             WHEN s_zh > 0 AND s_zh > s_de AND s_zh > s_en AND s_zh > s_es AND s_zh > s_fr THEN 'zh'
             ELSE 'und' END AS detected_lang
      FROM scored)
    SELECT actual_lang, detected_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM det GROUP BY 1, 2""",
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality evaluation: confusion counts of detected vs stored
    language — the coverage metric a pipeline inspects before trusting the
    heuristic as a filter. One pass + a tiny aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("actual_lang"),
            T.detect_language(F.col("text")).alias("detected_lang"),
        )
        .groupBy("actual_lang", "detected_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _sql_ivf_recall() -> str:
    parts = _sql_ivf_parts()
    parts.append(
        f"ivf AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= {ANN_K})"
    )
    parts.append(f"""bf_scored AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             {SQL_COS.format(a='q.v', b='b.v')} AS score
      FROM (SELECT vec_id, v FROM base WHERE vec_id < {ANN_QUERY_MAX_ID}) q
      CROSS JOIN base b)""")
    parts.append(f"""bf AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM bf_scored QUALIFY rank <= {ANN_K})""")
    parts.append("""hits AS (
      SELECT bf.query_id, CAST(COUNT(ivf.neighbor_id) AS BIGINT) AS hits
      FROM bf LEFT JOIN ivf
        ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
      GROUP BY bf.query_id)""")
    body = ",\n    ".join(parts)
    return f"""WITH {body}
    SELECT query_id, hits, {sql_exact_ratio("hits", str(ANN_K), 4)} AS recall FROM hits"""


@register("ann_recall_ivf", _sql_ivf_recall())
def ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index (8 clusters, 2 probes) against the exact
    brute-force top-k — the companion evaluation to ann_recall_lsh, closing
    the loop on both approximate indexes."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = _queries_df(spark, sf_dir)
    bf = sim.brute_force_topk(emb, qdf, k=ANN_K).select("query_id", "neighbor_id")
    ivf = sim.ivf_topk(
        emb, qdf, k=ANN_K, n_clusters=8, n_probe=2, sample_hex=_TRAIN_SAMPLE_HEX
    ).select(
        F.col("query_id").alias("i_qid"), F.col("neighbor_id").alias("i_nid")
    )
    hits = (
        bf.join(
            ivf,
            (F.col("query_id") == F.col("i_qid"))
            & (F.col("neighbor_id") == F.col("i_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("i_nid").cast("bigint").alias("hits"))
    )
    return hits.select(
        "query_id",
        "hits",
        exact_ratio("hits", str(ANN_K), 4).alias("recall"),
    )


@register(
    "events_value_percentiles",
    """SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type""",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (Spark `percentile` ==
    DuckDB `quantile_cont`, same linear-interpolation definition, so values
    match bit-for-bit before rounding). Exact percentiles aggregate a
    per-value count map — memory scales with DISTINCT values per group, not
    rows; at 100 TB with high-cardinality doubles, switch to
    `percentile_approx` (t-digest, bounded memory) and accept ±accuracy —
    registered exact here because the oracle gate demands engine-identical
    output."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


# Degenerate-bucket cap for the composed pipeline's LSH stage: a
# boilerplate-heavy corpus puts thousands of near-identical docs in one
# (band, bucket) and the pair expansion goes quadratic. 64 is far above any
# legitimate near-dup group in the testdata (parity unaffected) while
# bounding the worst bucket's expansion to 64^2 pairs. Mirrored in the
# oracle via _sql_minhash_ctes(threshold, max_bucket_size).
_PIPELINE_LSH_CAP = 64


def _sql_training_mix() -> str:
    """The capstone composition: the `documents` CTE SHADOWS the raw view
    with the sampled + quality-gated + language-gated + exact-deduped subset,
    so the shared MinHash CTE chain (and the recursive connected-components
    closure) runs over exactly the rows the Spark pipeline feeds it."""
    return f"""WITH RECURSIVE documents AS (
      SELECT doc_id, text, lang, source FROM (
        SELECT d.*,
               {SQL_H15.format(x=SQL_NORM)} AS fp,
               MIN(doc_id) OVER (PARTITION BY {SQL_H15.format(x=SQL_NORM)}) AS keep_id
        FROM (
          SELECT * FROM (SELECT d0.*, {SQL_TOKS} AS toks,
                regexp_replace(text, '\\s+', '', 'g') AS nospace
           FROM (SELECT * FROM documents_raw) d0) d1
          WHERE CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
                < {_sql_sample_threshold()}
            AND (least(length(text) / 500.0, 1.0)
                 + (1.0 - least(CASE WHEN length(nospace) > 0
                       THEN length(regexp_replace(nospace, '[a-zA-Z0-9]', '', 'g')) / length(nospace)
                       ELSE 0.0 END * 4.0, 1.0))
                 + least(CASE WHEN len(toks) > 0
                       THEN len(list_filter(toks, t -> t IN ({_SQL_STOPS}))) / len(toks)
                       ELSE 0.0 END * 5.0, 1.0)) / 3.0 >= 0.55
        ) d
      ) dd WHERE doc_id = keep_id),
    {_sql_minhash_ctes(0.5, _PIPELINE_LSH_CAP)},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id),
    comp AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    survivors AS (
      SELECT d.doc_id, d.source, len({SQL_TOKS}) AS ntok FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id))
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens
    FROM survivors GROUP BY source"""


@register(
    "pipeline_training_mix",
    # the CTE shadows the table name, so the one raw reference must be
    # schema-qualified (DuckDB registers the parquet views in `main`)
    _sql_training_mix().replace("documents_raw", "main.documents", 1),
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data prep pipeline, composed from the engine's own
    operators: stratified sampling (training mix) -> quality gate -> exact
    dedup (min-doc_id representative) -> MinHash near-dup removal ->
    per-source kept-docs/kept-tokens. Every stage is the same operator the
    standalone queries register, demonstrating the library composes: the
    sample predicate stays in the scan, the exact dedup is one window, the
    near-dup stage inherits the banded-LSH plan, and only per-source counts
    leave the cluster."""
    from .operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(docs, _SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT)
    scored = sampled.select(
        "doc_id", "text", "lang", "source", T.quality_score(F.col("text")).alias("q")
    ).filter(F.col("q") >= 0.55)
    w = Window.partitionBy(T.fingerprint(F.col("text")))
    cleaned = (
        scored.withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "text", "lang", "source")
        # two consumers read this frame (the MinHash pair chain and the
        # survivor anti-join); persist so the sample+quality+dedup-window
        # prefix runs once. At cluster scale the equivalent move is writing
        # the cleaned corpus to a staging table between pipeline stages —
        # which a real multi-day curation run wants anyway for restarts.
        .persist()
    )
    clusters = dd.dup_clusters(
        dd.minhash_lsh_pairs(cleaned, threshold=0.5, max_bucket_size=_PIPELINE_LSH_CAP)
    )
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    survivors = cleaned.join(dropped, "doc_id", "left_anti")
    return (
        survivors.select("source", T.token_count_ws(F.col("text")).alias("ntok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Training-prep surface (round 2, cont.): chunking, sequence packing,
# decontamination, repetition scoring, semantic dedup — the post-cleaning
# stages of an LLM data pipeline. Same parity discipline: BIGINT counts,
# round-4 ratios, md5-prefix hashes, epoch-ms timestamps.
# ---------------------------------------------------------------------------

_CHUNK, _OVL, _STRIDE = 64, 16, 48


@register(
    "documents_chunked",
    f"""WITH base AS (
      SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    nz AS (SELECT * FROM base WHERE len(tk) > 0),
    st AS (
      SELECT doc_id, tk,
             unnest(range(0, CAST(greatest(ceil((len(tk) - {_CHUNK}) / {_STRIDE}.0), 0) AS BIGINT) * {_STRIDE} + 1, {_STRIDE})) AS start
      FROM nz)
    SELECT doc_id, CAST(start // {_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(list_slice(tk, start + 1, start + {_CHUNK})) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(tk, start + 1, start + {_CHUNK}), ' ') AS chunk_text
    FROM st""",
)
def documents_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, 16 overlap) — the
    unit an embedding indexer or context-window packer consumes. Map-side
    only: tokenize once, explode a sequence of starts, slice — no shuffle,
    no UDF (operators/chunking.py docstring has the scale argument)."""
    from .operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=_CHUNK, overlap=_OVL)


_PACK_CAP, _PACK_SHARDS = 256, 8


@register(
    "documents_pack_sequences",
    f"""WITH base AS (
      SELECT source AS stratum, CAST(doc_id % {_PACK_SHARDS} AS BIGINT) AS shard,
             doc_id, CAST(len({SQL_TOKS}) AS BIGINT) AS ntok
      FROM documents),
    cum AS (
      SELECT *, COALESCE(SUM(ntok) OVER (PARTITION BY stratum, shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ce
      FROM base)
    SELECT stratum, shard, CAST(ce // {_PACK_CAP} AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc, CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM cum GROUP BY 1, 2, 3""",
)
def documents_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous greedy packing of documents into 256-token training bins,
    sharded by doc_id % 8 within each source so no window partition owns a
    whole source at scale (operators/chunking.py::pack_sequences)."""
    from .operators.chunking import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, capacity=_PACK_CAP, n_shards=_PACK_SHARDS)


_CONTAM_K = 5


@register(
    "documents_contamination",
    f"""WITH tk AS (SELECT doc_id, {SQL_NTOKS} AS toks FROM documents),
    gr AS (SELECT doc_id, {_sql_shingles('toks', _CONTAM_K)} AS grams FROM tk),
    ev AS (SELECT DISTINCT {SQL_H15.format(x='g')} AS gh
           FROM (SELECT unnest(grams) AS g FROM gr WHERE doc_id % 20 = 0)),
    tr AS (SELECT doc_id, grams FROM gr WHERE doc_id % 20 <> 0),
    tg AS (SELECT doc_id, {SQL_H15.format(x='g')} AS gh
           FROM (SELECT doc_id, unnest(grams) AS g FROM tr)),
    hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM tg JOIN ev USING (gh) GROUP BY doc_id)
    SELECT t.doc_id, CAST(COALESCE(len(t.grams), 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CASE WHEN COALESCE(len(t.grams), 0) > 0
                THEN {sql_exact_ratio("COALESCE(h.n_hits, 0)", "len(t.grams)", 4)}
                ELSE 0.0 END AS contamination
    FROM tr t LEFT JOIN hits h USING (doc_id)""",
)
def documents_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination report: 5-gram overlap of every training
    document (doc_id % 20 != 0) against the eval split (doc_id % 20 == 0).
    Eval grams broadcast; corpus grams hashed to 60 bits before the join
    (operators/contamination.py has the scale argument)."""
    from .operators.contamination import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 20 != 0)
    eval_set = docs.filter(F.col("doc_id") % 20 == 0)
    return ngram_contamination(train, eval_set, k=_CONTAM_K)


@register(
    "documents_repetition",
    f"""WITH base AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    stats AS (
      SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct
      FROM base),
    bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS b
           FROM base),
    bc AS (SELECT doc_id, b, COUNT(*) AS n FROM bg GROUP BY 1, 2),
    tops AS (SELECT doc_id, MAX(n) AS top_n, SUM(n) AS total FROM bc GROUP BY doc_id)
    SELECT s.doc_id, s.n_tokens,
           CASE WHEN s.n_tokens > 0
                THEN {sql_exact_ratio("s.n_tokens - s.n_distinct", "s.n_tokens", 4)}
                ELSE 0.0 END AS dup_token_ratio,
           COALESCE({sql_exact_ratio("t.top_n", "t.total", 4)}, 0.0) AS top_bigram_ratio
    FROM stats s LEFT JOIN tops t USING (doc_id)""",
)
def documents_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token fraction
    (1 - distinct/total) and most-frequent-bigram share. Token stats are one
    array expression per row; the bigram mode is a two-level aggregate
    (per-(doc, bigram) partial counts -> per-doc max/sum) joined back on
    doc_id — both shuffles carry pre-combined rows, no per-doc O(n^2)
    higher-order scan."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", T.tokens(F.col("text")).alias("tk"))
    n = F.size("tk")
    # 1 - distinct/total == (total - distinct)/total with both operands
    # exact counts, so dup_token_ratio and top_bigram_ratio ride the
    # exact-integer rounding discipline (functions/exact.py)
    stats = base.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("tk")).cast("bigint").alias("n_distinct"),
    )
    bg = docs.select("doc_id", F.explode(T.bigrams(F.col("text"))).alias("b"))
    bc = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("n"))
    tops = bc.groupBy("doc_id").agg(
        F.max("n").alias("top_n"), F.sum("n").alias("total")
    )
    return stats.join(tops, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            exact_ratio("n_tokens - n_distinct", "n_tokens", 4),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_ratio"),
        F.coalesce(exact_ratio("top_n", "total", 4), F.lit(0.0)).alias(
            "top_bigram_ratio"
        ),
    )


_SEMANTIC_THRESHOLD = 0.4


def _sql_semantic(threshold: float = _SEMANTIC_THRESHOLD) -> str:
    """Within-kmeans-cluster cosine pairs — shares the unrolled Lloyd CTEs
    with the IVF oracle up to the final assignment `af`."""
    parts = _sql_ivf_parts(n_clusters=8, iterations=5)[:-3]  # ... through af
    body = ",\n    ".join(parts)
    cos = SQL_COS.format(a="a.v", b="b.v")
    return f"""WITH {body}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(a.cluster AS BIGINT) AS cluster, round({cos}, 4) AS cosine
    FROM af a JOIN af b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE {cos} >= {threshold}"""


@register("dedup_semantic", _sql_semantic())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: k-means clusters as blocking
    keys, cosine compared only within a cluster
    (operators/similarity.py::semantic_dedup_pairs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup_pairs(
        emb, threshold=_SEMANTIC_THRESHOLD, n_clusters=8, iterations=5,
        sample_hex=_TRAIN_SAMPLE_HEX,
    )


# The static cap IS the registered posture, deliberately (VERDICT r10 item
# 6). Two reasons it is not derived from choose_semantic_cap at
# registration: (1) the DuckDB oracle embeds the cap as a SQL literal, so
# the registered query must use one deterministic, scale-independent value
# or oracle parity breaks across SFs; (2) the value must BIND on the test
# corpora (cluster sizes run 35-94 on the 500-row embeddings table) so the
# capped query demonstrably drops mega-clusters rather than degenerating to
# the uncapped result — whereas the sizing rule on the sf0.1 bench corpus
# picks 140 (committed readout: every natural cluster exceeds all swept
# caps; `python -m k8s_vectordb_sync_spark tune semantic-cap --sf-dir
# .../sf0.1` → chosen_cap 140, all 2000 rows overflow-routed at any swept
# cap). A production deployment derives its cap per-corpus from that CLI /
# operators.similarity.choose_semantic_cap; the registry pins the
# demonstration value. test_semantic_cap_posture pins both facts.
_SEMANTIC_MAX_CLUSTER = 70


def _sql_semantic_capped(
    threshold: float = _SEMANTIC_THRESHOLD, cap: int = _SEMANTIC_MAX_CLUSTER
) -> str:
    """dedup_semantic plus the mega-cluster guard: clusters over ``cap``
    members are excluded from pair generation (HAVING on the assignment
    CTE — the same predicate semantic_dedup_pairs' broadcast filter applies).
    """
    parts = _sql_ivf_parts(n_clusters=8, iterations=5)[:-3]  # ... through af
    parts.append(
        f"ok AS (SELECT cluster FROM af GROUP BY cluster HAVING COUNT(*) <= {cap})"
    )
    body = ",\n    ".join(parts)
    cos = SQL_COS.format(a="a.v", b="b.v")
    return f"""WITH {body}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(a.cluster AS BIGINT) AS cluster, round({cos}, 4) AS cosine
    FROM af a JOIN af b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    JOIN ok ON ok.cluster = a.cluster
    WHERE {cos} >= {threshold}"""


@register("dedup_semantic_capped", _sql_semantic_capped())
def dedup_semantic_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the skewed-cluster guard: clusters larger than
    max_cluster_size are dropped before the in-cluster self-join, so one
    mega-cluster of near-identical embeddings can never go quadratic — the
    SemDeDup analog of the LSH max_bucket_size cap
    (operators/similarity.py::semantic_dedup_pairs). Pipeline posture:
    mega-cluster members are near-identical by construction and belong to
    exact/fingerprint dedup instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup_pairs(
        emb, threshold=_SEMANTIC_THRESHOLD, n_clusters=8, iterations=5,
        sample_hex=_TRAIN_SAMPLE_HEX, max_cluster_size=_SEMANTIC_MAX_CLUSTER,
    )


_RANGE_JOIN_WINDOW_MS = 3_600_000


@register(
    "events_range_join",
    f"""WITH s AS (SELECT user_id, event_id AS signup_event_id, epoch_ms(ts) AS ts_ms
               FROM events WHERE event_type = 'signup'),
    e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events WHERE event_type = 'error')
    SELECT s.user_id, s.signup_event_id, CAST(COUNT(e.ts_ms) AS BIGINT) AS n_errors
    FROM s LEFT JOIN e ON e.user_id = s.user_id
      AND e.ts_ms > s.ts_ms AND e.ts_ms <= s.ts_ms + {_RANGE_JOIN_WINDOW_MS}
    GROUP BY 1, 2""",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: errors within the hour after each signup, per
    user. The equi key (user_id) carries the shuffle; the range predicate is
    evaluated inside the join — no cartesian. At scale both sides are
    pre-filtered scans (pushed predicates) and the error side can be
    bucketed by user_id for a shuffle-free sort-merge."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_event_id"),
        F.unix_millis("ts").alias("s_ms"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.unix_millis("ts").alias("e_ms")
    )
    j = s.join(
        e,
        (s["user_id"] == e["e_user"])
        & (e["e_ms"] > s["s_ms"])
        & (e["e_ms"] <= s["s_ms"] + _RANGE_JOIN_WINDOW_MS),
        "left",
    )
    return j.groupBy("user_id", "signup_event_id").agg(
        F.count("e_ms").cast("bigint").alias("n_errors")
    )


@register(
    "events_cube",
    """WITH ev AS (SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hr, value
               FROM events)
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           CAST(COALESCE(hr, -1) AS BIGINT) AS hr,
           CAST(2 * GROUPING(event_type) + GROUPING(hr) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM ev GROUP BY CUBE (event_type, hr)""",
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all grouping-set combinations of event_type x
    hour-of-day) with an explicit grouping-id bitmask. Hour comes from epoch
    arithmetic, not calendar functions, so both engines agree regardless of
    session timezone; value sums go through DECIMAL for order-independence.
    Empty input yields the SQL-standard grand row (grouping set ()), which
    Spark's cube() omits — emitted explicitly, see events_rollup."""
    if load_table(spark, sf_dir, "events").isEmpty():
        return spark.createDataFrame(
            [("ALL", -1, 3, 0, None)],
            "event_type string, hr bigint, gid bigint, n bigint, sum_value double",
        )
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.floor(F.unix_millis("ts") / F.lit(3_600_000)) % 24).alias("hr"),
        "value",
    )
    out = ev.cube("event_type", "hr").agg(
        (F.grouping("event_type") * 2 + F.grouping("hr")).cast("bigint").alias("gid"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )
    return out.select(
        F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("hr"), F.lit(-1)).cast("bigint").alias("hr"),
        "gid",
        "n",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# Training-mix accounting, outlier handling, dimensionality reduction, text
# cleaning (round 2, cont.)
# ---------------------------------------------------------------------------

_MIX_ALPHA, _MIX_BUDGET = 0.5, 1_000_000


@register(
    "documents_mixture_weights",
    f"""WITH per AS (
      SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len({SQL_TOKS})) AS BIGINT) AS n_tokens,
             CAST(round(sqrt(CAST(SUM(len({SQL_TOKS})) AS DOUBLE)), 6) AS DECIMAL(28,6)) AS scaled
      FROM documents GROUP BY source),
    tot AS (SELECT SUM(scaled) AS total_scaled FROM per)
    SELECT stratum, n_docs, n_tokens,
           CASE WHEN total_scaled > 0
                THEN {sql_exact_ratio("scaled * 1000000", "total_scaled * 1000000", 6)}
                ELSE 0.0 END AS weight,
           CASE WHEN n_tokens > 0 AND total_scaled > 0
                THEN {sql_exact_ratio(f"CAST(scaled * 1000000 AS HUGEINT) * {_MIX_BUDGET}",
                                      "CAST(total_scaled * 1000000 AS HUGEINT) * n_tokens", 6)}
                ELSE 0.0 END AS epochs
    FROM per CROSS JOIN tot""",
)
def documents_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) source mixture weights and effective
    epochs at a 1M-token budget — the knob that decides how often each source
    repeats in a training run (operators/sampling.py::mixture_weights has the
    scale + FP-determinism argument: scaled counts round to DECIMAL before
    the order-sensitive total)."""
    from .operators.sampling import mixture_weights

    docs = load_table(spark, sf_dir, "documents")
    return mixture_weights(
        docs,
        F.size(T.tokens(F.col("text"))),
        alpha=_MIX_ALPHA,
        token_budget=_MIX_BUDGET,
    )


@register(
    "events_winsorized",
    f"""WITH b AS (
      SELECT event_type, round(quantile_cont(value, 0.05), 6) AS lo,
             round(quantile_cont(value, 0.95), 6) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           {sql_exact_mean_units("CAST(SUM(CAST(round(least(greatest(e.value, b.lo), b.hi), 4) AS DECIMAL(14,4))) * 10000 AS BIGINT)", "COUNT(*)", 4)} AS winsorized_mean,
           CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
           round(MIN(b.lo), 6) AS p05, round(MAX(b.hi), 6) AS p95
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type""",
)
def events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value stats: clip at the exact p05/p95 (Spark
    `percentile` ~ DuckDB `quantile_cont`, 6-dp-rounded), report the clipped mean and how
    many rows hit each bound. Two passes over the fact table — inherent to
    exact percentiles (the bound must exist before clipping) — but the
    percentile frame is O(#event_types) and broadcast back onto the second
    scan, so there is no fact-side shuffle beyond the final tiny aggregate.
    Clipped values round to DECIMAL(14,4) before summing so the mean is
    order-independent across engines."""
    ev = load_table(spark, sf_dir, "events")
    # Boundaries round to 6 dp BEFORE any comparison: Spark's percentile
    # and DuckDB's quantile_cont interpolate up to 1 ulp apart, and a tie
    # mass sitting exactly on the boundary flips `value < lo` for the
    # whole mass (first seen at sf1, round 11 — cross-engine bug class #6).
    # The data has 2-dp granularity, so 6-dp rounding collapses both
    # engines' boundary doubles to the identical value.
    b = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi"),
    )
    j = ev.join(F.broadcast(b), "event_type")
    # clip -> round to DECIMAL(14,4) -> sum (order-independent), then the
    # exact-integer mean (functions/exact.py) so no engine rounds a double
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        exact_mean_units(
            "CAST(sum(CAST(round(least(greatest(value, lo), hi), 4)"
            " AS DECIMAL(14,4))) * 10000 AS BIGINT)",
            "count(1)",
            4,
        ).alias("winsorized_mean"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.round(F.min("lo"), 6).alias("p05"),
        F.round(F.max("hi"), 6).alias("p95"),
    )


def _sql_projection_terms() -> str:
    terms = []
    for plane in HYPERPLANES:
        lits = ", ".join(repr(v) for v in plane)
        terms.append(
            f"round(list_dot_product(embedding::DOUBLE[], [{lits}]::DOUBLE[]), 6)"
        )
    return ", ".join(terms)


@register(
    "embeddings_project_rp",
    f"""SELECT vec_id, [{_sql_projection_terms()}] AS proj FROM embeddings""",
)
def embeddings_project_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random projection of the 64-dim embeddings onto the 8 deterministic
    LSH hyperplanes — Johnson-Lindenstrauss reduction for cheap pre-ranking
    (functions/vectors.py::project). Pure per-row codegen expression: the
    planes are plan literals, no join, no shuffle, no UDF; at 100 TB this
    runs entirely inside the scan stage."""
    from .functions.vectors import project

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", project(F.col("embedding"), HYPERPLANES).alias("proj"))


@register(
    "text_normalize",
    r"""SELECT doc_id,
           trim(regexp_replace(regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
                               '\s+', ' ', 'g')) AS clean_text,
           CAST(length(text) AS BIGINT) AS n_chars_raw,
           CAST(length(trim(regexp_replace(regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
                               '\s+', ' ', 'g'))) AS BIGINT) AS n_chars_clean
    FROM documents""",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning normalization: strip control characters (keep \\t \\n \\r as
    collapsible whitespace), collapse whitespace runs, trim — the first
    transform a crawled corpus goes through. Case is preserved (this is
    cleaning, not fingerprinting — fingerprint() lowercases separately).
    Chained regexp_replace, fully codegen; patterns are RE2-compatible so
    Java regex (Spark) and RE2 (oracle) agree byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = T.clean_text(F.col("text"))
    return docs.select(
        "doc_id",
        cleaned.alias("clean_text"),
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.length(cleaned).cast("bigint").alias("n_chars_clean"),
    )


_WEEK_MS = 7 * 86_400_000
_SAMPLE_N = 20


@register(
    "events_retention_cohorts",
    f"""WITH b AS (SELECT user_id, epoch_ms(ts) // {_WEEK_MS} AS wk FROM events),
    c AS (SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk FROM b)
    SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
           CAST(wk - cohort_wk AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c GROUP BY 1, 2""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by their first-activity week,
    counted in each later week they return — the standard retention triangle.
    The cohort week comes from a min-window over the user partition (one
    user-keyed shuffle, shared with nothing else), then a distinct-count per
    (cohort, offset) cell. Weeks are integer epoch-ms division (`div` /
    `//`), exact in both engines — no doubles, no calendar functions, no
    session-timezone sensitivity."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", F.expr(f"unix_millis(ts) div {_WEEK_MS}").alias("wk")
    )
    w = Window.partitionBy("user_id")
    c = base.withColumn("cohort_wk", F.min("wk").over(w))
    return c.groupBy(
        F.col("cohort_wk").cast("bigint").alias("cohort_wk"),
        (F.col("wk") - F.col("cohort_wk")).cast("bigint").alias("week_offset"),
    ).agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))


@register(
    "documents_sample_fixed_n",
    f"""WITH rk AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000,
                        doc_id) AS rk
      FROM documents)
    SELECT doc_id, source FROM rk WHERE rk <= {_SAMPLE_N}""",
)
def documents_sample_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-source deterministic sample (N=20): hash-ranked
    row_number inside each source (operators/sampling.py::fixed_size_sample
    has the skew note — pre-thin with stratified_sample when one stratum
    dominates)."""
    from .operators.sampling import fixed_size_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return fixed_size_sample(docs, _SAMPLE_N)


def _sql_pq_cte_parts(
    m: int = 4, k: int = 4, iterations: int = 3, dim: int = 64,
    sample_hex: str = _TRAIN_SAMPLE_HEX,
    train_extra: str = "",
) -> list:
    """Unrolled product-quantization oracle CTEs: one min-id-seeded Lloyd
    chain per subspace (the _sql_ivf_parts pattern, prefixed s{s}_ and run on
    list_slice of the vector), ending in per-subspace assignment CTEs
    s{s}_af(vec_id, code{s}). Shares the 6-dp centroid rounding documented
    on _sql_ivf_parts (pins both engines' FP-order-sensitive means) and the
    hash-sampled training CTE pattern ({p}t; encode stays full-corpus)."""
    sub = dim // m
    d2 = (
        "list_sum(list_transform(range(1, len(b.v) + 1),"
        " i -> (b.v[i] - c.c[i]) * (b.v[i] - c.c[i])))"
    )
    parts = []
    for s in range(m):
        p = f"s{s}_"
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(
            f"{p}b AS (SELECT vec_id, list_slice(embedding::DOUBLE[], {lo}, {hi}) AS v FROM embeddings)"
        )
        parts.append(f"{p}t AS ({_sql_train_cte(p + 'b', sample_hex, train_extra)})")
        parts.append(f"""{p}c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
          FROM (SELECT vec_id, v FROM {p}t ORDER BY vec_id LIMIT {k}))""")
        for it in range(1, iterations + 1):
            prev = f"{p}c{it - 1}"
            parts.append(f"""{p}a{it} AS (
              SELECT vec_id, v, cluster FROM (
                SELECT b.vec_id, b.v, c.cluster,
                       row_number() OVER (PARTITION BY b.vec_id
                                          ORDER BY {d2} ASC, c.cluster ASC) AS rn
                FROM {p}t b CROSS JOIN {prev} c) t WHERE rn = 1)""")
            parts.append(f"""{p}u{it} AS (
              SELECT cluster, list(mn ORDER BY idx) AS c FROM (
                SELECT cluster, idx, round(AVG(val), 6) AS mn FROM (
                  SELECT cluster, unnest(v) AS val,
                         unnest(range(1, len(v) + 1)) AS idx
                  FROM {p}a{it}) z
                GROUP BY cluster, idx) g GROUP BY cluster)""")
            parts.append(f"""{p}c{it} AS (
              SELECT pr.cluster, COALESCE(u.c, pr.c) AS c
              FROM {prev} pr LEFT JOIN {p}u{it} u ON pr.cluster = u.cluster)""")
        parts.append(f"""{p}af AS (
          SELECT vec_id, cluster AS code{s} FROM (
            SELECT b.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY b.vec_id
                                      ORDER BY {d2} ASC, c.cluster ASC) AS rn
            FROM {p}b b CROSS JOIN {p}c{iterations} c) t WHERE rn = 1)""")
    return parts


def _sql_pq_parts(m: int = 4, k: int = 4, iterations: int = 3, dim: int = 64) -> str:
    body = ",\n    ".join(_sql_pq_cte_parts(m, k, iterations, dim))
    joins = " ".join(f"JOIN s{s}_af USING (vec_id)" for s in range(1, m))
    cols = ", ".join(f"CAST(code{s} AS BIGINT) AS code{s}" for s in range(m))
    return f"""WITH {body}
    SELECT vec_id, {cols} FROM s0_af {joins}"""


def _sql_pq_topk(m: int = 4, k: int = 4, iterations: int = 3, dim: int = 64) -> str:
    """Asymmetric-distance PQ search oracle: reconstruct every base vector
    from its per-subspace codebook centroid (list concat over the final
    codebook CTEs), score exact queries against the reconstructions, rank."""
    parts = _sql_pq_cte_parts(m, k, iterations, dim)
    code_joins = " ".join(f"JOIN s{s}_af USING (vec_id)" for s in range(1, m))
    parts.append(
        f"codes AS (SELECT * FROM s0_af {code_joins})"
    )
    cat = " || ".join(f"cb{s}.c" for s in range(m))
    book_joins = " ".join(
        f"JOIN s{s}_c{iterations} cb{s} ON cb{s}.cluster = cd.code{s}"
        for s in range(m)
    )
    parts.append(f"recon AS (SELECT cd.vec_id, {cat} AS rv FROM codes cd {book_joins})")
    parts.append(
        f"""q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID})"""
    )
    parts.append(f"""scored AS (
      SELECT q.query_id, r.vec_id AS neighbor_id,
             {SQL_COS.format(a='q.qv', b='r.rv')} AS score
      FROM q CROSS JOIN recon r)""")
    parts.append("""ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored)""")
    body = ",\n    ".join(parts)
    return f"""WITH {body}
    SELECT query_id, neighbor_id, round(score, 4) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {ANN_K}"""


@register("ann_pq_topk", _sql_pq_topk())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k over PQ-compressed vectors (asymmetric distance:
    exact query vs quantized base). At 100 TB the base side is stored as m
    small ints per row — the scan that makes exhaustive scoring of billions
    of vectors affordable (operators/similarity.py::pq_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.pq_topk(
        emb, _queries_df(spark, sf_dir), k=ANN_K, sample_hex=_TRAIN_SAMPLE_HEX
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register("embeddings_pq_codes", _sql_pq_parts())
def embeddings_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code words (m=4 subspaces, k=4 codebook entries,
    3 Lloyd iterations): the IVF-PQ compression layout for billion-vector
    ANN. Codebooks train on m small driver-coordinated k-means loops;
    encoding is one shuffle-free select of argmin-over-literal-centroid
    expressions (operators/similarity.py::pq_codes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.pq_codes(emb, sample_hex=_TRAIN_SAMPLE_HEX)


# ---------------------------------------------------------------------------
# Round 3: rule-based quality gate + statistical LM curation signals
# ---------------------------------------------------------------------------

from .operators import quality as Q  # noqa: E402


@register(
    "documents_quality_rules",
    f"""WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    st AS (
      SELECT doc_id, len(tk) AS n,
        CASE WHEN len(tk) > 0
             THEN CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk)
             ELSE 0.0 END AS mwl,
        CASE WHEN len(tk) > 0
             THEN len(list_filter(tk, t -> t IN ({_SQL_STOPS}))) / len(tk)
             ELSE 0.0 END AS sr,
        CASE WHEN len(tk) > 0
             THEN 1.0 - len(list_distinct(tk)) / len(tk)
             ELSE 0.0 END AS dr
      FROM tk)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           (n >= {Q.MIN_TOKENS} AND n <= {Q.MAX_TOKENS}) AS r_len,
           (mwl >= {Q.MIN_MEAN_WORD_LEN} AND mwl <= {Q.MAX_MEAN_WORD_LEN}) AS r_wordlen,
           (sr >= {Q.MIN_STOPWORD_RATIO}) AS r_stop,
           (dr <= {Q.MAX_DUP_TOKEN_RATIO}) AS r_dup,
           ((n >= {Q.MIN_TOKENS} AND n <= {Q.MAX_TOKENS})
            AND (mwl >= {Q.MIN_MEAN_WORD_LEN} AND mwl <= {Q.MAX_MEAN_WORD_LEN})
            AND (sr >= {Q.MIN_STOPWORD_RATIO})
            AND (dr <= {Q.MAX_DUP_TOKEN_RATIO})) AS keep
    FROM st""",
)
def documents_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style hard quality gate: per-rule boolean flags (length,
    mean word length, stopword presence, token repetition) plus the combined
    keep verdict — the auditable first-pass drop stage of a corpus pipeline.
    Pure per-row codegen, scan-bound at any scale
    (operators/quality.py::quality_rules)."""
    docs = load_table(spark, sf_dir, "documents")
    return Q.quality_rules(docs)


@register(
    "documents_lm_logprob",
    f"""WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    occ AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
    vocab AS (
      SELECT tok, COUNT(*) AS cnt FROM occ GROUP BY tok),
    vl AS (
      SELECT tok, CAST(round(ln(cnt / (SELECT SUM(cnt) FROM vocab)), 4)
                       AS DECIMAL(28,4)) AS lp
      FROM vocab),
    per AS (
      SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, SUM(v.lp) AS lp_sum
      FROM occ o JOIN vl v USING (tok) GROUP BY o.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CASE WHEN COALESCE(p.n_tokens, 0) > 0
                THEN (CASE WHEN CAST(p.lp_sum * 10000 AS BIGINT) < 0 THEN -1 ELSE 1 END
                      * ((2 * abs(CAST(p.lp_sum * 10000 AS BIGINT)) + p.n_tokens)
                         // (2 * p.n_tokens))) / 10000.0
                ELSE 0.0 END AS mean_logprob
    FROM documents d LEFT JOIN per p USING (doc_id)""",
)
def documents_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-lite quality signal: mean per-token log-probability of each
    document under the corpus's own unigram LM (CCNet-style LM filtering).
    Vocab is a broadcast lookup; log terms round to 4 dp and sum as DECIMAL
    so both engines agree regardless of summation order
    (operators/lm.py::unigram_logprob)."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.lm import unigram_logprob

    return unigram_logprob(docs)


@register(
    "documents_dsir_weights",
    f"""WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    occ AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
    cc AS (SELECT tok, COUNT(*) AS ccnt FROM occ GROUP BY tok),
    tc AS (SELECT tok, COUNT(*) AS tcnt FROM occ WHERE doc_id % 20 = 0 GROUP BY tok),
    st AS (
      SELECT c.tok, c.ccnt, COALESCE(t.tcnt, 0) AS tcnt,
             (SELECT SUM(ccnt) FROM cc) AS ctot,
             (SELECT SUM(COALESCE(t2.tcnt, 0)) FROM cc c2 LEFT JOIN tc t2 USING (tok)) AS ttot,
             (SELECT COUNT(*) FROM cc) AS vsize
      FROM cc c LEFT JOIN tc t USING (tok)),
    lr AS (
      SELECT tok, CAST(round(ln((tcnt + 1) / (ttot + vsize))
                             - ln((ccnt + 1) / (ctot + vsize)), 4)
                       AS DECIMAL(28,4)) AS lr
      FROM st),
    per AS (
      SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, SUM(l.lr) AS lr_sum
      FROM occ o JOIN lr l USING (tok) GROUP BY o.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CASE WHEN COALESCE(p.n_tokens, 0) > 0
                THEN round(CAST(p.lr_sum AS DOUBLE), 4)
                ELSE 0.0 END AS dsir_logratio
    FROM documents d LEFT JOIN per p USING (doc_id)""",
)
def documents_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per-document log-likelihood ratio between a
    target-domain unigram LM (docs with doc_id % 20 == 0 — the same held-out
    split the contamination query uses) and the corpus LM, add-one smoothed
    over the corpus vocabulary. Resampling the corpus by these weights is
    the published recipe for shifting a 100 TB crawl toward a target domain
    without training a model (operators/lm.py::dsir_weights)."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.lm import dsir_weights

    target = docs.filter(F.col("doc_id") % 20 == 0)
    return dsir_weights(docs, target)


_SEG_WIN, _SEG_HOP = 64, 48


@register(
    "multimodal_segments",
    f"""WITH media AS (
      SELECT doc_id, text, strlen(text) AS byte_len FROM documents),
    segs AS (
      SELECT doc_id, byte_len, text,
             unnest(generate_series(0, greatest(byte_len - {_SEG_WIN}, 0), {_SEG_HOP})) AS seg_start
      FROM media)
    SELECT doc_id,
           CAST(seg_start // {_SEG_HOP} AS BIGINT) AS seg_idx,
           CAST(seg_start AS BIGINT) AS seg_start,
           CAST(least({_SEG_WIN}, byte_len - seg_start) AS BIGINT) AS seg_len,
           md5(substring(text, CAST(seg_start + 1 AS INT), {_SEG_WIN})) AS seg_md5
    FROM segs""",
)
def multimodal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size byte windows over binary media payloads (the
    audio-chunking / frame-embedding prep shape): offsets via
    sequence+posexplode, byte-addressed substring on the BINARY column, md5
    fingerprint per segment (operators/multimodal.py::segment_media). The
    oracle slices the VARCHAR source — byte- and char-addressing agree
    because the synthetic corpus is ASCII, an assumption the parity harness
    now asserts loudly (test_documents_corpus_is_ascii; parity_sweep.py warns
    too) since this DuckDB build has no BLOB substring to byte-address."""
    docs = load_table(spark, sf_dir, "documents")
    media = mm.to_media_table(docs)
    return mm.segment_media(media, window=_SEG_WIN, hop=_SEG_HOP)


_OOV_VOCAB = 25


@register(
    "documents_oov_rate",
    f"""WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    occ AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
    counts AS (SELECT tok, COUNT(*) AS cnt FROM occ GROUP BY tok),
    vocab AS (
      SELECT tok FROM counts
      ORDER BY cnt DESC, tok ASC LIMIT {_OOV_VOCAB}),
    per AS (
      SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM occ o LEFT JOIN vocab v USING (tok) GROUP BY o.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
           CASE WHEN COALESCE(p.n_tokens, 0) > 0
                THEN {sql_exact_ratio("p.n_oov", "p.n_tokens", 4)} ELSE 0.0 END AS oov_rate
    FROM documents d LEFT JOIN per p USING (doc_id)""",
)
def documents_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage check: per-document out-of-vocabulary rate against
    the corpus's top-25 frequency vocabulary (ties broken by token string so
    the cut is reproducible). Broadcast vocab membership + one pre-combined
    per-doc aggregate (operators/lm.py::oov_rate)."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.lm import oov_rate

    return oov_rate(docs, vocab_size=_OOV_VOCAB)


_SLIDE_SIZE_MS, _SLIDE_HOP_MS = 3_600_000, 900_000


@register(
    "events_sliding_windows",
    f"""WITH e AS (SELECT epoch_ms(ts) AS t, event_type, value FROM events),
    k AS (SELECT unnest(generate_series(0, {_SLIDE_SIZE_MS // _SLIDE_HOP_MS - 1})) AS k),
    wins AS (
      SELECT ((t // {_SLIDE_HOP_MS}) - k) * {_SLIDE_HOP_MS} AS win_start_ms,
             event_type, value
      FROM e CROSS JOIN k)
    SELECT win_start_ms, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(round(value, 4) AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM wins GROUP BY win_start_ms, event_type""",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregation: 1-hour windows every 15 minutes
    — each event lands in size/hop = 4 windows. Uses Spark's native
    F.window(size, slide) (epoch-aligned, same closed form the oracle
    expands via generate_series); values round to DECIMAL before summing so
    both engines agree regardless of order. The streaming variant is this
    exact expression under a watermark."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)")).alias("__sv"),
        )
        .select(
            F.unix_millis(F.col("win.start")).alias("win_start_ms"),
            "event_type",
            "n",
            F.round(F.col("__sv").cast("double"), 4).alias("sum_value"),
        )
    )


@register(
    "dedup_minhash_estimate",
    f"""WITH {_sql_minhash_ctes(0.5)},
    est AS (
      SELECT c.doc_a, c.doc_b,
             len(list_filter(range(1, {NUM_MINHASHES} + 1),
                             i -> sa.sig[i] = sb.sig[i])) AS m,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
      FROM cand c
      JOIN sigs sa ON c.doc_a = sa.doc_id
      JOIN sigs sb ON c.doc_b = sb.doc_id
      JOIN sh a ON c.doc_a = a.doc_id
      JOIN sh b ON c.doc_b = b.doc_id)
    SELECT doc_a, doc_b, {sql_exact_ratio("m", str(NUM_MINHASHES), 4)} AS est_jaccard,
           {sql_exact_ratio("i", "u", 4)} AS jaccard,
           {sql_exact_ratio(f"abs(m * u - {NUM_MINHASHES} * i)", f"{NUM_MINHASHES} * u", 4)} AS abs_err
    FROM est""",
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration readout: signature-agreement Jaccard estimate vs
    exact shingle Jaccard (plus absolute error) for every LSH candidate pair
    — the check that the NUM_MINHASHES/BAND_SIZE choice is trustworthy
    before running estimate-only dedup on a corpus too large to verify
    (operators/dedup.py::minhash_estimate_eval)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_estimate_eval(docs)


@register(
    "events_value_deciles",
    """WITH r AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events)
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(MIN(value), 4) AS lo, round(MAX(value), 4) AS hi
    FROM r GROUP BY event_type, decile""",
)
def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value deciles via ntile(10) (deterministic total order:
    value then event_id) with per-bucket count and bounds — the
    equal-frequency binning used for score normalization. One window + one
    pre-combined aggregate; the window partitions by event_type so no
    global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", F.col("decile").cast("bigint").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


_HIST_WIDTH = 25.0


@register(
    "events_value_histogram",
    f"""SELECT event_type,
           CAST(floor(value / {_HIST_WIDTH}) AS BIGINT) AS bin,
           round(CAST(floor(value / {_HIST_WIDTH}) AS BIGINT) * {_HIST_WIDTH}, 2) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, bin""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (width 25): bin index is a
    pure scalar floor, so the whole operator is one partial-aggregated
    groupBy — the shuffle carries (type, bin) partial counts only. The
    equal-frequency companion is events_value_deciles."""
    ev = load_table(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / F.lit(_HIST_WIDTH)).cast("bigint")
    return (
        ev.groupBy("event_type", bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "event_type",
            "bin",
            F.round(F.col("bin") * _HIST_WIDTH, 2).alias("bin_lo"),
            "n",
        )
    )


@register(
    "documents_bigram_logprob",
    f"""WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    occ AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg
      FROM tk),
    bgc AS (SELECT bg, COUNT(*) AS cbg FROM occ GROUP BY bg),
    ctx AS (SELECT string_split(bg, ' ')[1] AS w1, SUM(cbg) AS cctx
            FROM bgc GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT tok) AS vsize
          FROM (SELECT unnest(tk) AS tok FROM tk)),
    lookup AS (
      SELECT bg, CAST(round(ln((cbg + 1) / (cctx + vsize)), 4)
                      AS DECIMAL(28,4)) AS lp
      FROM bgc JOIN ctx ON string_split(bgc.bg, ' ')[1] = ctx.w1
      CROSS JOIN v),
    per AS (
      SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, SUM(l.lp) AS lp_sum
      FROM occ o JOIN lookup l USING (bg) GROUP BY o.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN COALESCE(p.n_bigrams, 0) > 0
                THEN (CASE WHEN CAST(p.lp_sum * 10000 AS BIGINT) < 0 THEN -1 ELSE 1 END
                      * ((2 * abs(CAST(p.lp_sum * 10000 AS BIGINT)) + p.n_bigrams)
                         // (2 * p.n_bigrams))) / 10000.0
                ELSE 0.0 END AS mean_bigram_logprob
    FROM documents d LEFT JOIN per p USING (doc_id)""",
)
def documents_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-lite: mean bigram conditional log-probability per document,
    add-one smoothed over the unigram vocabulary — catches word-order
    scrambling that unigram LM scoring cannot (operators/lm.py::
    bigram_logprob; same broadcast-lookup + decimal-sum plan shape)."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.lm import bigram_logprob

    return bigram_logprob(docs)


_MATRYOSHKA_DIM = 16


@register(
    "embeddings_matryoshka",
    f"""WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_slice(embedding::DOUBLE[], 1, {_MATRYOSHKA_DIM}) AS h
      FROM embeddings)
    SELECT vec_id,
           round(sqrt(list_dot_product(v, v)), 4) AS norm_full,
           round(sqrt(list_dot_product(h, h)), 4) AS norm_head,
           CASE WHEN sqrt(list_dot_product(v, v)) > 0
                THEN round(sqrt(list_dot_product(h, h)) / sqrt(list_dot_product(v, v)), 4)
                ELSE 0.0 END AS retained
    FROM base""",
)
def embeddings_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: per-vector norm of the leading
    16-dim prefix vs the full 64-dim embedding, and the retained-norm
    fraction — the readout that says whether prefix-truncated vectors (the
    cheap storage/serving tier) preserve enough signal. Pure per-row
    codegen (slice + sequential-fold dot), scan-bound at any scale; the
    fold order matches DuckDB's list_dot_product so values agree exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    h = F.slice(v, 1, _MATRYOSHKA_DIM)
    nf = vnorm(v)
    nh = vnorm(h)
    return emb.select(
        "vec_id",
        F.round(nf, 4).alias("norm_full"),
        F.round(nh, 4).alias("norm_head"),
        F.when(nf > 0, F.round(nh / nf, 4)).otherwise(F.lit(0.0)).alias("retained"),
    )


@register(
    "dedup_incremental",
    f"""WITH fp AS (
      SELECT doc_id, md5({SQL_NORM}) AS fp FROM documents),
    hist AS (
      SELECT fp, MIN(doc_id) AS matched_doc FROM fp
      WHERE doc_id % 4 <> 0 GROUP BY fp),
    new AS (SELECT doc_id, fp FROM fp WHERE doc_id % 4 = 0)
    SELECT n.doc_id, h.fp IS NOT NULL AS is_dup,
           CAST(h.matched_doc AS BIGINT) AS matched_doc
    FROM new n LEFT JOIN hist h USING (fp)""",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup: each NEW document (doc_id % 4 == 0) is checked
    against the HISTORICAL corpus (the rest) by exact normalized-text
    fingerprint; dupes report the surviving historical representative.
    At scale the history side is a bucketed fingerprint table, so this is a
    bucket-local hash join keyed on the fingerprint — the per-increment cost
    is O(|new| + touched buckets), never a rescan of history's text. The
    streaming analogue is dropDuplicatesWithinWatermark on the same key."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
    hist = (
        fp.filter(F.col("doc_id") % 4 != 0)
        .groupBy("fp")
        .agg(F.min("doc_id").cast("bigint").alias("matched_doc"))
    )
    new = fp.filter(F.col("doc_id") % 4 == 0)
    return new.join(hist, "fp", "left").select(
        "doc_id",
        F.col("matched_doc").isNotNull().alias("is_dup"),
        "matched_doc",
    )


_GLOBAL_TOPK = 20


@register(
    "documents_global_topk_quality",
    f"""WITH base AS (
      SELECT doc_id, {_SQL_QCOUNTS}
      FROM documents),
    m AS (
      SELECT doc_id, {SQL_QUALITY_4DP} AS quality
      FROM base)
    SELECT doc_id, quality,
           CAST(row_number() OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS rnk
    FROM m ORDER BY quality DESC, doc_id LIMIT {_GLOBAL_TOPK}""",
)
def documents_global_topk_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 documents by composite quality score. orderBy+limit
    compiles to TakeOrderedAndProject — per-partition top-k then a k-sized
    driver merge, NOT a global sort and NOT a single-partition window: the
    shape that survives a 100 TB corpus. Rank is attached after the take on
    the k surviving rows (deterministic tie-break on doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = T.with_quality_4dp(docs.select("doc_id", "text")).select(
        "doc_id", "quality"
    )
    topk = scored.orderBy(F.col("quality").desc(), F.col("doc_id")).limit(
        _GLOBAL_TOPK
    )
    w = Window.orderBy(F.col("quality").desc(), F.col("doc_id"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("bigint"))


_RERANK_FACTOR = 4


def _sql_pq_rerank(
    m: int = 4, k: int = 4, iterations: int = 3, dim: int = 64
) -> str:
    """Two-stage oracle: the PQ coarse ranking (shared CTEs) cut at
    ANN_K * factor, then exact-cosine re-scoring of only those candidates."""
    parts = _sql_pq_cte_parts(m, k, iterations, dim)
    code_joins = " ".join(f"JOIN s{s}_af USING (vec_id)" for s in range(1, m))
    parts.append(f"codes AS (SELECT * FROM s0_af {code_joins})")
    cat = " || ".join(f"cb{s}.c" for s in range(m))
    book_joins = " ".join(
        f"JOIN s{s}_c{iterations} cb{s} ON cb{s}.cluster = cd.code{s}"
        for s in range(m)
    )
    parts.append(f"recon AS (SELECT cd.vec_id, {cat} AS rv FROM codes cd {book_joins})")
    parts.append(
        f"""q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID})"""
    )
    parts.append(f"""coarse AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, r.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {SQL_COS.format(a='q.qv', b='r.rv')} DESC,
                                           r.vec_id) AS crank
        FROM q CROSS JOIN recon r) t
      WHERE crank <= {ANN_K * _RERANK_FACTOR})""")
    parts.append("bx AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)")
    parts.append(f"""rescored AS (
      SELECT c.query_id, c.neighbor_id,
             {SQL_COS.format(a='q.qv', b='b.v')} AS score
      FROM coarse c
      JOIN bx b ON c.neighbor_id = b.vec_id
      JOIN q ON c.query_id = q.query_id)""")
    body = ",\n    ".join(parts)
    return f"""WITH {body}
    SELECT query_id, neighbor_id, round(score, 4) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id) AS rank
          FROM rescored) t
    WHERE rank <= {ANN_K}"""


@register("ann_pq_rerank", _sql_pq_rerank())
def ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN serving shape: PQ coarse search keeps top
    ANN_K * 4 candidates per query (quantized scan over everything), then
    exact cosine re-ranks ONLY those rows to the final top-k. Candidate ids
    broadcast onto the embedding table, so the exact-vector fetch is a
    broadcast join, never a corpus shuffle
    (operators/similarity.py::pq_rerank_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.pq_rerank_topk(
        emb, _queries_df(spark, sf_dir), k=ANN_K, rerank_factor=_RERANK_FACTOR,
        sample_hex=_TRAIN_SAMPLE_HEX,
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# Round 4: entropy quality signal, MAD outliers, composed IVF-PQ search
# ---------------------------------------------------------------------------


@register(
    "documents_token_entropy",
    f"""WITH tk AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    occ AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
    cc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM occ GROUP BY doc_id, tok),
    per AS (
      SELECT doc_id, SUM(cnt) AS n,
             SUM(CAST(round(cnt * ln(cnt), 6) AS DECIMAL(28,6))) AS s
      FROM cc GROUP BY doc_id)
    SELECT d.doc_id, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_tokens,
           CASE WHEN COALESCE(p.n, 0) > 0
                THEN round(ln(p.n) - CAST(p.s AS DOUBLE) / p.n, 4)
                ELSE 0.0 END AS token_entropy
    FROM documents d LEFT JOIN per p USING (doc_id)""",
)
def documents_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) — the
    information-theoretic repetition/diversity signal
    (operators/lm.py::token_entropy). Two map-side-combined shuffles, no
    corpus join-back; per-type log terms decimal-summed for engine parity."""
    from .operators.lm import token_entropy

    docs = load_table(spark, sf_dir, "documents")
    return token_entropy(docs)


_MAD_K = 4.4478  # 3 * 1.4826 (the normal-consistency MAD-to-sigma factor)


@register(
    "events_anomaly_mad",
    f"""WITH m AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median
      FROM events GROUP BY event_type),
    d AS (
      SELECT e.event_type, m.median,
             round(abs(e.value - m.median), 6) AS adev
      FROM events e JOIN m USING (event_type)),
    md AS (
      SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
      FROM d GROUP BY event_type)
    SELECT d.event_type, MIN(d.median) AS median, MIN(md.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > {_MAD_K} * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN md USING (event_type)
    GROUP BY d.event_type""",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median + MAD (median absolute
    deviation), flagging values beyond 3 sigma-equivalents (MAD * 1.4826 * 3)
    — the standard robust alternative to mean/stddev z-scores, immune to the
    outliers it hunts. Exact MAD is inherently two-pass (the median must
    exist before deviations do); the plan is two grouped percentile
    aggregates plus one counting aggregate, with the O(#event_types) median
    and MAD frames broadcast back — the corpus never shuffles. Medians and
    deviations round to 6 dp in BOTH engines before the threshold compare,
    so interpolated-percentile last-ulp differences cannot flip a boundary
    row."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("median")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "median",
        F.round(F.abs(F.col("value") - F.col("median")), 6).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("median").alias("median"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("adev") > F.lit(_MAD_K) * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def _sql_ivf_pq(
    n_clusters: int = 8,
    iterations: int = 5,
    n_probe: int = 2,
    m: int = 4,
    pq_k: int = 4,
    pq_iterations: int = 3,
    dim: int = 64,
    train_extra: str = "",
    sized_target: int | None = None,
) -> str:
    """Composed IVF-PQ oracle: the IVF CTE chain up through `probes` (which
    clusters each query scans) + the PQ CTE chain through the per-subspace
    codebooks (how each row is reconstructed), joined on vec_id for the
    asymmetric-distance scoring of only the probed partitions.

    ``train_extra`` further restricts BOTH training CTE chains (coarse
    centroids + codebooks) — used by the incremental-index query, whose
    index trains only on the initially-built half of the corpus."""
    body = ",\n    ".join(
        _sql_ivf_pq_parts(
            n_clusters, iterations, n_probe, m, pq_k, pq_iterations, dim,
            train_extra, sized_target,
        )
    )
    return f"""WITH {body}
    SELECT query_id, neighbor_id, round(score, 4) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {ANN_K}"""


def _sql_ivf_pq_parts(
    n_clusters: int = 8,
    iterations: int = 5,
    n_probe: int = 2,
    m: int = 4,
    pq_k: int = 4,
    pq_iterations: int = 3,
    dim: int = 64,
    train_extra: str = "",
    sized_target: int | None = None,
) -> list:
    """The IVF-PQ CTE chain ending in `ranked` — shared by the top-k oracle
    and the indexed-hybrid oracle."""
    ivf = _sql_ivf_parts(
        n_clusters, iterations, n_probe, train_extra=train_extra,
        sized_target=sized_target,
    )[:-2]  # ... probes
    pq = _sql_pq_cte_parts(m, pq_k, pq_iterations, dim, train_extra=train_extra)
    parts = ivf + pq
    code_joins = " ".join(f"JOIN s{s}_af USING (vec_id)" for s in range(1, m))
    parts.append(f"codes AS (SELECT * FROM s0_af {code_joins})")
    cat = " || ".join(f"cb{s}.c" for s in range(m))
    book_joins = " ".join(
        f"JOIN s{s}_c{pq_iterations} cb{s} ON cb{s}.cluster = cd.code{s}"
        for s in range(m)
    )
    parts.append(f"recon AS (SELECT cd.vec_id, {cat} AS rv FROM codes cd {book_joins})")
    parts.append(f"""scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {SQL_COS.format(a='p.qv', b='r.rv')} AS score
      FROM probes p JOIN af a ON p.cluster = a.cluster
                    JOIN recon r ON a.vec_id = r.vec_id)""")
    parts.append("""ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored)""")
    return parts


@register("ann_ivf_pq_topk", _sql_ivf_pq())
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical billion-vector serving composition: IVF partition
    pruning picks WHICH rows each query scores (n_probe nearest centroid
    partitions), PQ asymmetric distance decides HOW (exact query vs
    quantized reconstruction) — the two reductions compose multiplicatively
    (operators/similarity.py::ivf_pq_topk). Both trainings hash-sampled."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.ivf_pq_topk(
        emb, _queries_df(spark, sf_dir), k=ANN_K, n_clusters=8, n_probe=2,
        sample_hex=_TRAIN_SAMPLE_HEX,
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


def _ivf_pq_index_dir(sf_dir: str, variant: str = "") -> str:
    """Repo-local cache path for the persisted IVF-PQ index over a given
    corpus: keyed on the corpus identity (absolute path + parquet file
    size/mtime, so a regenerated corpus invalidates the index) and every
    build parameter (``variant`` carries non-default parameterizations,
    e.g. the autosized build). In a deployment this would be a warehouse
    path the serving fleet shares; locally it lives under
    <repo>/.ann_index."""
    import hashlib

    emb = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb)
    key = hashlib.md5(
        "|".join(
            [
                os.path.abspath(sf_dir), str(st.st_size), str(int(st.st_mtime)),
                "ivfpq", "8", "5", str(sim.PQ_M), str(sim.PQ_K),
                str(sim.PQ_ITERATIONS), _TRAIN_SAMPLE_HEX, variant,
            ]
        ).encode()
    ).hexdigest()[:16]
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ann_index"
    )
    return os.path.join(root, key)


@register("ann_ivf_pq_topk_indexed", _sql_ivf_pq())
def ann_ivf_pq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ served from a PERSISTED index (operators/ann_index.py): the
    first invocation builds centroid/codebook artifacts plus the
    cluster-partitioned codes table; every later invocation only loads the
    few-KB artifacts and scans the n_probe probed partitions of the codes
    parquet — no training, no corpus vector read. This is the build-once /
    probe-many lifecycle a serving system actually runs (the reference
    delegates it to the downstream vector store, README.md:3-9); results are
    bit-identical to ann_ivf_pq_topk because training is deterministic, so
    the same oracle covers both."""
    from .operators import ann_index as ai

    path = _ivf_pq_index_dir(sf_dir)
    if not ai.index_is_built(path):
        emb = load_table(spark, sf_dir, "embeddings")
        ai.build_ivf_pq_index(
            emb, path, n_clusters=8, sample_hex=_TRAIN_SAMPLE_HEX
        )
    out = ai.ivf_pq_probe(
        spark, path, _queries_df(spark, sf_dir), k=ANN_K, n_probe=2
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# Occupancy target for the AUTOSIZED serving index: ~2500 rows per cluster
# keeps each probe's candidate volume (n_probe x rows-per-cluster) flat as
# the corpus grows — at sf1 (20k vectors) the rule derives exactly the
# hand-set 8; at sf10 (200k) it derives 80; at 100 TB it derives
# corpus/2500 capped at MAX_DERIVED_CLUSTERS. The floor of 8 keeps small
# corpora at the calibrated baseline the other ANN queries use.
_ANN_TARGET_ROWS_PER_CLUSTER = 2500


@register(
    "ann_ivf_pq_topk_autosized",
    _sql_ivf_pq(sized_target=_ANN_TARGET_ROWS_PER_CLUSTER),
)
def ann_ivf_pq_topk_autosized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SELF-SIZING serving form of the persisted IVF-PQ probe (VERDICT
    r8 item 4): the index is built — and every rebuild retrained — with
    ``target_rows_per_cluster`` instead of a frozen cluster count, so
    n_clusters grows with the corpus and per-probe candidate volume
    (n_probe x rows-per-cluster) stays FLAT across corpus decades. This
    retires ann_ivf_pq_topk_indexed's measured alpha=1.07 (fixed 8 clusters
    => every probe scans 1/4 of any corpus); that query stays registered as
    the fixed-count reference. The oracle derives the same cluster count
    from COUNT(*) (see _sql_ivf_parts sized_target), so one static SQL
    string is correct at every scale factor."""
    from .operators import ann_index as ai

    path = _ivf_pq_index_dir(sf_dir, variant=f"rpc{_ANN_TARGET_ROWS_PER_CLUSTER}")
    if not ai.index_is_built(path):
        emb = load_table(spark, sf_dir, "embeddings")
        ai.build_ivf_pq_index(
            emb, path, n_clusters=8, sample_hex=_TRAIN_SAMPLE_HEX,
            target_rows_per_cluster=_ANN_TARGET_ROWS_PER_CLUSTER,
        )
    out = ai.ivf_pq_probe(
        spark, path, _queries_df(spark, sf_dir), k=ANN_K, n_probe=2
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register("ann_ivf_pq_incremental", _sql_ivf_pq(train_extra="vec_id % 2 = 0"))
def ann_ivf_pq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE: build the IVF-PQ index over half the corpus (even
    vec_ids), then ``add()`` the other half against the STORED artifacts —
    assignment + encoding with the already-trained centroids/codebooks, one
    partitioned append, no retraining and no rewrite of existing rows
    (operators/ann_index.py::ivf_pq_index_add) — then probe the whole index.
    This is the append-only serving lifecycle (a crawl corpus grows daily;
    the index retrains weekly at most). The oracle trains its CTE chains on
    the same even-id half (train_extra) and assigns the full corpus, which
    is exactly what build+add produce."""
    from .operators import ann_index as ai

    path = _ivf_pq_index_dir(sf_dir) + "-incr"
    incr_marker = os.path.join(path, "_INCR_OK")
    if not os.path.exists(incr_marker):
        emb = load_table(spark, sf_dir, "embeddings")
        ai.build_ivf_pq_index(
            emb.filter(F.col("vec_id") % 2 == 0), path, n_clusters=8,
            sample_hex=_TRAIN_SAMPLE_HEX,
        )
        ai.ivf_pq_index_add(emb.filter(F.col("vec_id") % 2 == 1), path)
        with open(incr_marker, "w") as fh:
            fh.write("ok\n")
    out = ai.ivf_pq_probe(
        spark, path, _queries_df(spark, sf_dir), k=ANN_K, n_probe=2
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register(
    "cdc_key_churn",
    f"""WITH {SQL_CH}
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN op_type = 'UPSERT' THEN 1 ELSE 0 END) AS BIGINT) AS n_upserts,
           CAST(SUM(CASE WHEN op_type = 'DELETE' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
           CAST(MIN(ts_ms) AS BIGINT) AS first_ts_ms,
           CAST(MAX(ts_ms) AS BIGINT) AS last_ts_ms,
           CAST(MAX(ts_ms) - MIN(ts_ms) AS BIGINT) AS active_ms
    FROM ch GROUP BY id""",
)
def cdc_key_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key churn profile: event counts by op, first/last activity, active
    span — the ops readout behind the reference's debounce-effectiveness
    guarantees (integration_test.go's N-events -> 1-upsert dedup ratio is
    n_events vs the 1 row last-state-wins emits). ONE hash aggregate with
    map-side partials; the shuffle carries one row per key per task."""
    ch = _ch(spark, sf_dir)
    ts_ms = F.unix_millis("event_ts")
    return ch.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("op_type") == "UPSERT", 1).otherwise(0))
        .cast("bigint")
        .alias("n_upserts"),
        F.sum(F.when(F.col("op_type") == "DELETE", 1).otherwise(0))
        .cast("bigint")
        .alias("n_deletes"),
        F.min(ts_ms).cast("bigint").alias("first_ts_ms"),
        F.max(ts_ms).cast("bigint").alias("last_ts_ms"),
        (F.max(ts_ms) - F.min(ts_ms)).cast("bigint").alias("active_ms"),
    )


_SPAN_K, _SPAN_MIN_DOCS = 8, 3


@register(
    "documents_duplicate_spans",
    f"""WITH sp AS (
      SELECT doc_id, unnest({_sql_shingles(SQL_NTOKS, _SPAN_K)}) AS span
      FROM documents),
    cnt AS (
      SELECT doc_id, COUNT(*) OVER (PARTITION BY span) AS ndocs FROM sp),
    per AS (
      SELECT doc_id, COUNT(*) AS n_spans,
             SUM(CASE WHEN ndocs >= {_SPAN_MIN_DOCS} THEN 1 ELSE 0 END) AS n_common
      FROM cnt GROUP BY doc_id)
    SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_common AS BIGINT) AS n_common_spans,
           {sql_exact_ratio("n_common", "n_spans", 4)} AS common_ratio
    FROM per""",
)
def documents_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage detector (the RefinedWeb/C4 boilerplate signal):
    per document, how many of its distinct 8-token spans also appear in >= 3
    documents — a high common_ratio marks template/boilerplate text that
    survives whole-document dedup because the surrounding words differ.

    Plan: ONE span explode, a span-partitioned count window (the span shuffle
    carries each row once — no aggregate-then-join-back, which would
    recompute the tokenize+explode lineage a second time; measured 7.6s ->
    3.9s at sf0.1), then the per-doc aggregate. Spans are the
    distinct-shingle arrays the MinHash family already uses, so the oracle
    shares _sql_shingles (per-doc-distinct makes the window count a
    document count). Documents shorter than 8 tokens contribute their whole
    text as one span (the shingle fallback, mirrored in both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    sp = docs.select(
        "doc_id", F.explode(T.shingles(F.col("text"), _SPAN_K)).alias("span")
    )
    cnt = sp.select(
        "doc_id", F.count(F.lit(1)).over(Window.partitionBy("span")).alias("ndocs")
    )
    per = cnt.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.when(F.col("ndocs") >= _SPAN_MIN_DOCS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_common_spans"),
    )
    return per.select(
        "doc_id",
        "n_spans",
        "n_common_spans",
        exact_ratio("n_common_spans", "n_spans", 4).alias("common_ratio"),
    )


def _sql_pq_adc(m: int = 4, k: int = 4, iterations: int = 3, dim: int = 64) -> str:
    """ADC lookup-table PQ oracle: per (query, subspace, code) the dot table
    and centroid norm-squared come straight from the final codebook CTEs
    (6-dp rounded, mirroring the driver-side tables); scoring is per-subspace
    table joins summed s=0..m-1 — the same association order the Spark
    expression uses."""
    sub = dim // m
    parts = _sql_pq_cte_parts(m, k, iterations, dim)
    code_joins = " ".join(f"JOIN s{s}_af USING (vec_id)" for s in range(1, m))
    parts.append(f"codes AS (SELECT * FROM s0_af {code_joins})")
    parts.append(
        f"""q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
          round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS qnorm
          FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID})"""
    )
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(f"""dt{s} AS (
          SELECT q.query_id, cb.cluster,
                 round(list_sum(list_transform(range(1, {sub} + 1),
                       i -> list_slice(q.qv, {lo}, {hi})[i] * cb.c[i])), 6) AS dt,
                 round(list_sum(list_transform(cb.c, x -> x * x)), 6) AS n2
          FROM q CROSS JOIN s{s}_c{iterations} cb)""")
    dot_sum = " + ".join(f"t{s}.dt" for s in range(m))
    n2_sum = " + ".join(f"t{s}.n2" for s in range(m))
    tbl_joins = " ".join(
        f"JOIN dt{s} t{s} ON t{s}.query_id = q.query_id AND t{s}.cluster = cd.code{s}"
        for s in range(m)
    )
    parts.append(f"""scored AS (
      SELECT q.query_id, cd.vec_id AS neighbor_id,
             CASE WHEN q.qnorm * sqrt({n2_sum}) > 0
                  THEN ({dot_sum}) / (q.qnorm * sqrt({n2_sum}))
                  ELSE 0.0 END AS score
      FROM codes cd CROSS JOIN q {tbl_joins})""")
    parts.append("""ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored)""")
    body = ",\n    ".join(parts)
    return f"""WITH {body}
    SELECT query_id, neighbor_id, round(score, 4) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {ANN_K}"""


@register("ann_pq_adc_topk", _sql_pq_adc())
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search via ADC lookup tables — the FAISS serving shape: per query
    an m x k dot table is built once driver-side, and every base row is
    scored by m array lookups on its code word, no per-row vector math
    (operators/similarity.py::pq_topk_adc). This is what pq_topk's scan
    becomes at scale: m small ints read per row, m+m element_at calls."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.pq_topk_adc(
        emb, _queries_df(spark, sf_dir), k=ANN_K, sample_hex=_TRAIN_SAMPLE_HEX
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register(
    "dedup_rate_by_source",
    f"""WITH {_sql_minhash_ctes(0.5)},
    da AS (SELECT p.doc_a, p.doc_b, d.source FROM pairs p
           JOIN documents d ON p.doc_a = d.doc_id),
    xp AS (
      SELECT da.source AS source, COUNT(*) AS n_pairs,
             SUM(CASE WHEN sb.source = da.source THEN 1 ELSE 0 END) AS n_same_source
      FROM da JOIN documents sb ON da.doc_b = sb.doc_id
      GROUP BY da.source),
    docs AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    SELECT d.source, CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(x.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(x.n_same_source, 0) AS BIGINT) AS n_same_source,
           {sql_exact_ratio("COALESCE(x.n_pairs, 0)", "d.n_docs", 4)} AS pair_rate
    FROM docs d LEFT JOIN xp x USING (source)""",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-health readout per source: MinHash near-dup pairs attributed to
    the doc_a side's source, split into same-source vs cross-source, rated
    against the source's doc count — the monitoring view that tells a
    curation run WHERE its duplication lives (same-source = crawl revisits /
    templates; cross-source = syndication). Reuses the bucketed LSH pair
    miner; the attribution joins are pair-cardinality (tiny), the per-source
    rollup is a map-side-combined aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    src = docs.select("doc_id", "source")
    da = pairs.join(
        src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source")),
        "doc_a",
    ).join(
        src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")),
        "doc_b",
    )
    xp = da.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("src_b") == F.col("source"), 1).otherwise(0)).alias(
            "n_same_source"
        ),
    )
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return per_source.join(xp, "source", "left").select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.col("n_same_source"), F.lit(0))
        .cast("bigint")
        .alias("n_same_source"),
        exact_ratio("coalesce(n_pairs, 0)", "n_docs", 4).alias("pair_rate"),
    )


def _sql_minhash_sig_pairs(threshold: float = 0.5) -> str:
    """Signature-agreement pair oracle: same shingle/sig/bucket CTEs as the
    exact-verify chain, but the gate is matching signature positions /
    NUM_MINHASHES — the zero-shingle-state verify mode of minhash_lsh_pairs
    (verify="signature")."""
    base = _sql_minhash_ctes(threshold)
    # keep the chain through `cand`; replace the exact-Jaccard verify
    cut = base.index("verified AS")
    head = base[:cut].rstrip().rstrip(",")
    return f"""WITH {head},
    est AS (
      SELECT c.doc_a, c.doc_b,
             len(list_filter(range(1, {NUM_MINHASHES} + 1),
                             i -> a.sig[i] = b.sig[i])) AS m
      FROM cand c JOIN sigs a ON c.doc_a = a.doc_id
                  JOIN sigs b ON c.doc_b = b.doc_id)
    SELECT doc_a, doc_b, {sql_exact_ratio("m", str(NUM_MINHASHES), 4)} AS jaccard
    FROM est WHERE m::DOUBLE / {NUM_MINHASHES} >= {threshold}"""


@register("dedup_minhash_sig_pairs", _sql_minhash_sig_pairs())
def dedup_minhash_sig_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup pairs gated by the SIGNATURE-AGREEMENT estimate
    (minhash_lsh_pairs verify="signature") — the 100 TB verify mode: nothing
    above 16 longs per doc is cached or joined, so the shingle arrays never
    exist past the signature aggregation. The estimate's quality vs exact
    Jaccard is what dedup_minhash_estimate calibrates."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, threshold=0.5, verify="signature")


def _sql_simhash_clusters(max_hamming: int = 3) -> str:
    """Connected components over the banded SimHash pair graph — the
    recursive-reachability closed form of dup_clusters, sharing the simhash
    signature CTEs (mirror of _sql_minhash_clusters)."""
    base = _sql_simhash().replace("WITH ", "WITH RECURSIVE ", 1)
    return base + f""",
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sigs a JOIN sigs b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id)
    SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id"""


@register("dedup_simhash_clusters", _sql_simhash_clusters())
def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters over the SimHash near-dup graph — the
    same pointer-jumping label propagation dedup_minhash_clusters uses
    (operators/dedup.py::dup_clusters), fed by the chunk-banded hamming<=3
    pair miner. Together the two cluster queries cover both similarity
    families' graph closures."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.simhash_pairs(docs, max_hamming=3).select("doc_a", "doc_b")
    return dd.dup_clusters(pairs)


_SPAN_CLEAN_MAX_RATIO = 0.5


@register(
    "documents_despan_clean",
    f"""WITH sp AS (
      SELECT doc_id, unnest({_sql_shingles(SQL_NTOKS, _SPAN_K)}) AS span
      FROM documents),
    cnt AS (
      SELECT doc_id, COUNT(*) OVER (PARTITION BY span) AS ndocs FROM sp),
    per AS (
      SELECT doc_id,
             SUM(CASE WHEN ndocs >= {_SPAN_MIN_DOCS} THEN 1 ELSE 0 END)::DOUBLE
               / COUNT(*) AS ratio
      FROM cnt GROUP BY doc_id)
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN p.ratio > {_SPAN_CLEAN_MAX_RATIO} THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
           {sql_exact_ratio(f"SUM(CASE WHEN p.ratio > {_SPAN_CLEAN_MAX_RATIO} THEN 0 ELSE 1 END)", "COUNT(*)", 4)} AS keep_rate
    FROM documents d JOIN per p USING (doc_id)
    GROUP BY d.source""",
)
def documents_despan_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION half of duplicate-span detection: drop documents whose
    common-span ratio exceeds 0.5 (majority-boilerplate pages) and report
    keep rates per source — the detector (documents_duplicate_spans)
    composed with the removal policy a curation run applies. Same
    single-pass span-window plan plus one broadcast-scale join to source and
    a per-source rollup."""
    docs = load_table(spark, sf_dir, "documents")
    sp = docs.select(
        "doc_id", F.explode(T.shingles(F.col("text"), _SPAN_K)).alias("span")
    )
    cnt = sp.select(
        "doc_id", F.count(F.lit(1)).over(Window.partitionBy("span")).alias("ndocs")
    )
    per = cnt.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("ndocs") >= _SPAN_MIN_DOCS, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("ratio")
    )
    keep = F.when(F.col("ratio") > _SPAN_CLEAN_MAX_RATIO, 0).otherwise(1)
    return (
        docs.select("doc_id", "source")
        .join(per, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(keep).cast("bigint").alias("n_kept"),
            exact_ratio(
                f"sum(CASE WHEN ratio > {_SPAN_CLEAN_MAX_RATIO} THEN 0 ELSE 1 END)",
                "count(1)",
                4,
            ).alias("keep_rate"),
        )
    )


@register(
    "embeddings_standardize",
    """WITH ex AS (
      SELECT vec_id, unnest(embedding::DOUBLE[]) AS val,
             unnest(range(1, len(embedding) + 1)) AS idx
      FROM embeddings),
    st AS (
      SELECT idx, round(AVG(val), 6) AS mu,
             round(stddev_samp(val), 6) AS sigma
      FROM ex GROUP BY idx),
    z AS (
      SELECT e.vec_id, e.idx,
             CASE WHEN s.sigma > 0
                  THEN round((e.val - s.mu) / s.sigma, 4) ELSE 0.0 END AS zv
      FROM ex e JOIN st s USING (idx))
    SELECT vec_id, list(zv ORDER BY idx) AS z
    FROM z GROUP BY vec_id""",
)
def embeddings_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization (whitening-lite): z-score every
    coordinate against the corpus's per-dimension mean/stddev — the
    preprocessing that stops high-variance dimensions from dominating
    cosine/L2 retrieval. Plan: one posexplode -> per-dimension aggregate
    (dim rows — broadcast back), then the z-projection and per-vector
    array reassembly (array_sort over (idx, z) structs, the kmeans-means
    trick). Means/stddevs round to 6 dp in both engines before the divide;
    zero-variance dimensions map to 0.0."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("idx0", "val"),
    ).select("vec_id", (F.col("idx0") + 1).alias("idx"), "val")
    st = ex.groupBy("idx").agg(
        F.round(F.avg("val"), 6).alias("mu"),
        F.round(F.stddev_samp("val"), 6).alias("sigma"),
    )
    z = ex.join(F.broadcast(st), "idx").select(
        "vec_id",
        "idx",
        F.when(
            F.col("sigma") > 0, F.round((F.col("val") - F.col("mu")) / F.col("sigma"), 4)
        )
        .otherwise(F.lit(0.0))
        .alias("zv"),
    )
    return z.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "zv"))), lambda s: s["zv"]
        ).alias("z")
    )


_SESSION_WINDOW_GAP_MS = 30 * 60 * 1000  # 30 min, the events_sessionization gap


@register(
    "events_session_windows",
    f"""WITH ev AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
    marks AS (
      SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
                       OR ts_ms - lag(ts_ms) OVER w > {_SESSION_WINDOW_GAP_MS}
                THEN 1 ELSE 0 END AS ns
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
    sess AS (
      SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marks)
    SELECT user_id, CAST(MIN(ts_ms) AS BIGINT) AS session_start_ms,
           CAST(MAX(ts_ms) + {_SESSION_WINDOW_GAP_MS} AS BIGINT) AS session_end_ms,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid""",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE session_window operator — the
    built-in form of the reference's debounce quiet-period grouping
    (debounce.go:32-149), and the operator the streaming pipeline can run
    stateful with a watermark (merging session state across micro-batches).
    The oracle is the classic lag/cumsum closed form (shared idiom with
    cdc_debounce_sessions); session_window's [min_ts, max_ts + gap) bounds
    are reproduced exactly. One user-keyed exchange; the session merge is
    Spark-internal state, not a window sort at scale."""
    ev = load_table(spark, sf_dir, "events")
    gap = f"{_SESSION_WINDOW_GAP_MS // 1000} seconds"
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
        )
    )


@register(
    "cdc_last_state_wins_salted",
    # SAME oracle as cdc_last_state_wins: salting is a shuffle-shape change,
    # not a semantic one (max_by over a total order is associative), and the
    # driver gate proving that equality is the point of registering it.
    f"""WITH {SQL_CH},
    r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts_us DESC, event_id DESC) rn FROM ch)
    SELECT id, event_id AS last_event_id, value AS last_value,
           ts_ms AS last_ts_ms, op_type AS last_op
    FROM r WHERE rn = 1""",
)
def cdc_last_state_wins_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant last-state-wins (operators/debounce.py::
    salted_last_state_wins): two-phase max_by through 16 salt buckets — the
    aggregation-skew mitigation for a single hot key at 100 TB (AQE splits
    skewed JOINS, but aggregation skew needs salting). Hash-identical to
    cdc_last_state_wins by construction; the gate proves it."""
    ch = _ch(spark, sf_dir)
    latest = dbn.salted_last_state_wins(ch, key_cols=["id"], tiebreak_cols=["event_id"])
    return latest.select(
        "id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
        F.unix_millis("event_ts").alias("last_ts_ms"),
        F.col("op_type").alias("last_op"),
    )


def _sql_cluster_sizes() -> str:
    """Cluster-occupancy oracle: the IVF CTE chain through the full
    assignment `af`, then one aggregate + share-of-corpus."""
    parts = _sql_ivf_parts(n_clusters=8, iterations=5)[:-3]  # ... through af
    body = ",\n    ".join(parts)
    return f"""WITH {body},
    tot AS (SELECT COUNT(*) AS n FROM af)
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           {sql_exact_ratio("COUNT(*)", "(SELECT n FROM tot)", 4)} AS share
    FROM af GROUP BY cluster"""


@register("embeddings_cluster_sizes", _sql_cluster_sizes())
def embeddings_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF/SemDeDup cluster-balance audit: vectors per cluster and share of
    corpus — the readout behind both scale knobs (a dominant cluster means
    IVF probes read too much and SemDeDup's within-cluster pair join goes
    quadratic; the fix is raising n_clusters until shares flatten). Same
    hash-sampled training + one full assignment pass as ann_ivf_topk, then
    a single map-side-combined aggregate with the corpus total as an
    O(#clusters) broadcast."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = sim.kmeans_centroids(
        emb, n_clusters=8, sample_hex=_TRAIN_SAMPLE_HEX
    )
    return _cluster_sizes_body(emb, [c for _, c in centroids])


def _cluster_sizes_body(emb: DataFrame, centroids: list) -> DataFrame:
    """Assignment-only half of the cluster-balance audit (shared by the
    inline-training and persisted-index forms)."""
    assigned = sim.assign_clusters(emb, centroids)
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    total = sizes.agg(F.sum("n_vectors").alias("n"))
    return sizes.crossJoin(F.broadcast(total)).select(
        F.col("cluster").cast("bigint").alias("cluster"),
        "n_vectors",
        exact_ratio("n_vectors", "n", 4).alias("share"),
    )


# ---------------------------------------------------------------------------
# Lexical retrieval, hybrid search, substring dedup, sketches (round 5)
# ---------------------------------------------------------------------------

from .operators import retrieval as ret  # noqa: E402
from .operators import sketches as sk  # noqa: E402

RETRIEVAL_N_QUERIES = 4
RETRIEVAL_TERMS_PER_QUERY = 5
BM25_TOPK = 10
HYBRID_POOL_K = 20
HYBRID_TOPK = 10


def _sql_bm25_parts(n_queries: int, terms: int) -> list[str]:
    """BM25 CTE chain (DuckDB): posting stats -> idf -> derived query terms
    -> DECIMAL(28,6)-summed scores, mirroring operators/retrieval.py term
    for term. Arithmetic that Spark does in double is CAST to DOUBLE here so
    DuckDB's decimal literals never switch the expression to decimal math."""
    return [
        f"tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM "
        f"(SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents) GROUP BY doc_id, term)",
        "dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id)",
        "stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dl)",
        "dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)",
        "idf AS (SELECT term, round(ln(1.0 + CAST(n_docs - df + 0.5 AS DOUBLE) / "
        "CAST(df + 0.5 AS DOUBLE)), 6) AS idf FROM dfreq CROSS JOIN stats)",
        f"qterms AS (SELECT query_id, term FROM ("
        f"SELECT doc_id AS query_id, term, "
        f"row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS r "
        f"FROM tf WHERE doc_id < {n_queries}) WHERE r <= {terms})",
        "contrib AS (SELECT q.query_id, t.doc_id AS neighbor_id, "
        "CAST(round(i.idf * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)), 6) "
        "AS DECIMAL(28,6)) AS c "
        "FROM qterms q JOIN tf t ON q.term = t.term "
        "JOIN idf i ON t.term = i.term JOIN dl d ON t.doc_id = d.doc_id CROSS JOIN stats s)",
        "bm25 AS (SELECT query_id, neighbor_id, CAST(SUM(c) AS DOUBLE) AS score "
        "FROM contrib GROUP BY query_id, neighbor_id)",
        "bm25_ranked AS (SELECT *, row_number() OVER "
        "(PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank FROM bm25)",
    ]


def _sql_bm25_topk() -> str:
    body = ",\n    ".join(
        _sql_bm25_parts(RETRIEVAL_N_QUERIES, RETRIEVAL_TERMS_PER_QUERY)
    )
    return f"""WITH {body}
    SELECT query_id, neighbor_id, round(score, 4) AS score, CAST(rank AS BIGINT) AS rank
    FROM bm25_ranked WHERE rank <= {BM25_TOPK}"""


@register("documents_bm25_topk", _sql_bm25_topk())
def documents_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 'more-like-this' retrieval: query term sets are the top-5 terms
    of the first 4 documents; scores are Lucene-style BM25 over the corpus
    posting frame (operators/retrieval.py — one corpus scan, broadcast
    idf/query joins, DECIMAL-exact score combine, two-phase top-k)."""
    docs = load_table(spark, sf_dir, "documents")
    postings = ret.build_postings(docs)
    qterms = ret.derive_query_terms(
        postings, RETRIEVAL_N_QUERIES, RETRIEVAL_TERMS_PER_QUERY
    )
    out = ret.bm25_topk(postings, qterms, k=BM25_TOPK)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register(
    "documents_inverted_index",
    f"""WITH tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM
      (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents) GROUP BY doc_id, term),
    stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
              FROM tf GROUP BY term),
    posts AS (SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term ORDER BY doc_id) AS r FROM tf),
    capped AS (SELECT term, list_sort(list(doc_id)) AS postings
               FROM posts WHERE r <= 100 GROUP BY term)
    SELECT s.term, s.df, s.cf, c.postings
    FROM stats s JOIN capped c ON s.term = c.term""",
)
def documents_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index with df/cf term statistics and posting lists capped at
    100 doc ids BEFORE collection (windowed rank), so a stopword's posting
    list at 100 TB never materializes on one reducer."""
    docs = load_table(spark, sf_dir, "documents")
    return ret.inverted_index(ret.build_postings(docs), max_postings=100)


def _sql_hybrid_rrf() -> str:
    bm25 = ",\n    ".join(
        _sql_bm25_parts(RETRIEVAL_N_QUERIES, RETRIEVAL_TERMS_PER_QUERY)
    )
    return f"""WITH {bm25},
    ltop AS (SELECT query_id, neighbor_id, rank FROM bm25_ranked WHERE rank <= {HYBRID_POOL_K}),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < {RETRIEVAL_N_QUERIES}),
    base AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v FROM embeddings),
    vscored AS (SELECT query_id, neighbor_id, {SQL_COS.format(a='qv', b='v')} AS score
                FROM q CROSS JOIN base),
    vtop AS (SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        FROM vscored) WHERE rank <= {HYBRID_POOL_K}),
    fused AS (SELECT COALESCE(l.query_id, v.query_id) AS query_id,
                     COALESCE(l.neighbor_id, v.neighbor_id) AS neighbor_id,
                     l.rank AS lex_rank, v.rank AS vec_rank,
                     COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.rank), 0.0)
                     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.rank), 0.0) AS rrf
              FROM ltop l FULL OUTER JOIN vtop v
              ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id),
    ranked AS (SELECT *, row_number() OVER
               (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rank FROM fused)
    SELECT query_id, neighbor_id, round(rrf, 6) AS rrf_score,
           CAST(lex_rank AS BIGINT) AS lex_rank, CAST(vec_rank AS BIGINT) AS vec_rank,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {HYBRID_TOPK}"""


@register("hybrid_search_rrf", _sql_hybrid_rrf())
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 fused with embedding-cosine top-20 by
    reciprocal-rank fusion (1/(60+rank), Cormack et al. SIGIR'09). The
    doc_id<->vec_id alignment links the two modalities; both inputs are
    k-bounded per query so the fusion join is tiny at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    postings = ret.build_postings(docs)
    qterms = ret.derive_query_terms(
        postings, RETRIEVAL_N_QUERIES, RETRIEVAL_TERMS_PER_QUERY
    )
    lex = ret.bm25_topk(postings, qterms, k=HYBRID_POOL_K)
    vqueries = emb.filter(F.col("vec_id") < RETRIEVAL_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    vec = sim.brute_force_topk(emb, vqueries, k=HYBRID_POOL_K)
    return ret.rrf_fuse(lex, vec, k=HYBRID_TOPK)


@register(
    "dedup_substring_spans",
    f"""WITH toks AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    occ AS (SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS span
            FROM toks, unnest(range(1, len(ts) - 6)) AS u(i)
            WHERE len(ts) >= 8)
    SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM occ GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2""",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup report (Lee et al., ACL'22): 8-token sliding
    windows shared by >= 2 documents, with document and occurrence counts —
    the interpretable face of cross-document copied text."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.substring_spans(docs, n=8, min_docs=2)


@register(
    "dedup_substring_doc_rate",
    f"""WITH toks AS (SELECT doc_id, {SQL_TOKS} AS ts FROM documents),
    occ AS (SELECT doc_id,
                   CAST(('0x' || substring(md5(array_to_string(ts[i:i+7], ' ')), 1, 15)) AS BIGINT) AS h
            FROM toks, unnest(range(1, len(ts) - 6)) AS u(i)
            WHERE len(ts) >= 8),
    sdf AS (SELECT h, COUNT(DISTINCT doc_id) AS span_docs FROM occ GROUP BY h),
    rates AS (SELECT o.doc_id, COUNT(*) AS n_spans,
                     SUM(CASE WHEN s.span_docs >= 2 THEN 1 ELSE 0 END) AS dup_spans
              FROM occ o JOIN sdf s ON o.h = s.h GROUP BY o.doc_id)
    SELECT d.doc_id, CAST(COALESCE(r.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(r.dup_spans, 0) AS BIGINT) AS dup_spans,
           {sql_exact_ratio("COALESCE(r.dup_spans, 0)", "COALESCE(r.n_spans, 1)", 6)} AS dup_rate
    FROM documents d LEFT JOIN rates r ON d.doc_id = r.doc_id""",
)
def dedup_substring_doc_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span fraction over 8-token windows — the
    'partially copied document' signal. Spans travel as 60-bit md5 hashes
    through both corpus-sized shuffles; every document is emitted (zero-span
    docs rate 0.0) without a join-back onto the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.substring_dup_rate(docs, n=8)


def _sql_hll_distinct() -> str:
    cap = sk.HLL_RHO_CAP
    wb1 = sk.HLL_W_BITS + 1
    return f"""WITH h AS (SELECT event_type,
        CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events),
    b AS (SELECT event_type, h % {sk.HLL_M} AS bucket,
                 CASE WHEN (h >> {sk.HLL_P}) > 0
                      THEN least({wb1} - length(bin(h >> {sk.HLL_P})), {cap})
                      ELSE {cap} END AS rho
          FROM h),
    mx AS (SELECT event_type, bucket, MAX(rho) AS maxrho FROM b GROUP BY event_type, bucket),
    agg AS (SELECT event_type,
                   SUM(1::BIGINT << ({cap} - maxrho)) AS s_present,
                   COUNT(*) AS present
            FROM mx GROUP BY event_type),
    agg2 AS (SELECT event_type,
                    s_present + ({sk.HLL_M} - present) * (1::BIGINT << {cap}) AS s,
                    {sk.HLL_M} - present AS v
             FROM agg),
    est AS (SELECT event_type,
                   CASE WHEN CAST({sk.HLL_NUMERATOR!r} AS DOUBLE) / s <= {sk.HLL_SMALL_RANGE!r}
                             AND v > 0
                        THEN CAST({sk.HLL_M} AS DOUBLE) * ln(CAST({sk.HLL_M} AS DOUBLE) / v)
                        ELSE CAST({sk.HLL_NUMERATOR!r} AS DOUBLE) / s END AS e
            FROM agg2),
    exact AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
              FROM events GROUP BY event_type)
    SELECT x.event_type, x.n_exact, round(e.e, 2) AS n_hll,
           round(abs(e.e - x.n_exact) / x.n_exact, 6) AS rel_err
    FROM exact x JOIN est e ON x.event_type = e.event_type"""


@register("events_hll_distinct", _sql_hll_distinct())
def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event type next to the exact count
    (operators/sketches.py): md5-hashed, 256 integer buckets, exact-BIGINT
    harmonic sum — the 100 TB answer to COUNT(DISTINCT) with 2 KB of
    map-side-combinable state per group, here hash-audited against the
    exact expand so the oracle verifies the ESTIMATE, not just row counts."""
    ev = load_table(spark, sf_dir, "events")
    return sk.hll_distinct(ev, key_col="user_id", group_cols=["event_type"])


@register(
    "text_countmin_heavyhitters",
    f"""WITH tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf FROM
      (SELECT unnest({SQL_TOKS}) AS term FROM documents) GROUP BY term),
    jb AS (SELECT term, cf, j,
                  CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || term), 1, 15)) AS BIGINT)
                  % {sk.CMS_WIDTH} AS b
           FROM tf, unnest(range(0, {sk.CMS_DEPTH})) AS u(j)),
    sketch AS (SELECT j, b, SUM(cf) AS bucket_n FROM jb GROUP BY j, b),
    top AS (SELECT term, cf AS exact_n FROM (
        SELECT term, cf, row_number() OVER (ORDER BY cf DESC, term) AS r FROM tf)
        WHERE r <= 20),
    probe AS (SELECT t.term, t.exact_n, j2.j,
                     CAST(('0x' || substring(md5(CAST(j2.j AS VARCHAR) || ':' || t.term), 1, 15)) AS BIGINT)
                     % {sk.CMS_WIDTH} AS b
              FROM top t, unnest(range(0, {sk.CMS_DEPTH})) AS j2(j))
    SELECT p.term, p.exact_n, CAST(MIN(s.bucket_n) AS BIGINT) AS cms_n,
           CAST(MIN(s.bucket_n) - p.exact_n AS BIGINT) AS overestimate
    FROM probe p JOIN sketch s ON p.j = s.j AND p.b = s.b
    GROUP BY p.term, p.exact_n""",
)
def text_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates vs exact counts for the top-20
    corpus terms (operators/sketches.py): 4x64 integer buckets built off the
    vocabulary-sized cf frame, broadcast back to the heavy hitters; the
    overestimate column is the realized one-sided collision error."""
    docs = load_table(spark, sf_dir, "documents")
    return sk.cms_heavy_hitters(docs, top_n=20)


# ---------------------------------------------------------------------------
# Runtime-filter pattern (bloom pre-join) + tokenizer statistics (round 5)
# ---------------------------------------------------------------------------

from .operators import bloom as bl  # noqa: E402

BLOOM_PRICE_THRESHOLD = 480000.0


def _sql_bloom_prejoin() -> str:
    """DuckDB mirror of operators/bloom.py: identical md5 bit positions,
    BIGINT-word bit_or build, AND-of-K probe.

    Oracle shape note (round 11): the hit predicate is a function of the
    KEY alone, so probes run once per DISTINCT fact key (multiplicity
    rejoined via a per-key count) and each probe position joins only ITS
    word of the filter. The earlier form cross-joined the full
    2048-long word array onto every fact row, which DuckDB
    materializes per row — >78 GB of spill at sf1's 6M rows before dying
    on disk. Spark never had this problem (the array rides one broadcast),
    but the oracle must fit co-resident."""
    k, bits = bl.BLOOM_K, bl.BLOOM_BITS
    pos_build = ", ".join(
        f"CAST(('0x' || substring(md5('{j}:' || CAST(__k AS VARCHAR)), 1, 15)) AS BIGINT) % {bits}"
        for j in range(k)
    )
    pos_probe = ", ".join(
        f"CAST(('0x' || substring(md5('{j}:' || CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % {bits}"
        for j in range(k)
    )
    return f"""WITH keys AS (
      SELECT DISTINCT o_orderkey AS __k FROM orders WHERE o_totalprice > {BLOOM_PRICE_THRESHOLD}),
    pos AS (SELECT unnest([{pos_build}]) AS p FROM keys),
    bloom AS (SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
              FROM pos GROUP BY p // 32),
    lk AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS mult
           FROM lineitem GROUP BY l_orderkey),
    pr AS (SELECT l_orderkey, unnest([{pos_probe}]) AS p FROM lk),
    hitk AS (SELECT pr.l_orderkey,
                    bool_and((COALESCE(b.bits, 0)
                              & (1::BIGINT << CAST(pr.p % 32 AS INT))) <> 0) AS hit
             FROM pr LEFT JOIN bloom b ON b.word = pr.p // 32
             GROUP BY pr.l_orderkey),
    probed AS (SELECT lk.mult, h.hit, (k.__k IS NOT NULL) AS is_member
               FROM lk JOIN hitk h ON lk.l_orderkey = h.l_orderkey
               LEFT JOIN keys k ON lk.l_orderkey = k.__k)
    SELECT CAST(COALESCE(SUM(mult), 0) AS BIGINT) AS n_fact,
           CAST(SUM(CASE WHEN hit THEN mult ELSE 0 END) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN is_member THEN mult ELSE 0 END) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN hit AND NOT is_member THEN mult ELSE 0 END) AS BIGINT) AS n_false_pos,
           {sql_exact_ratio(
               "SUM(CASE WHEN hit AND NOT is_member THEN mult ELSE 0 END)",
               "SUM(mult) - SUM(CASE WHEN is_member THEN mult ELSE 0 END)",
               6,
           )} AS fp_rate
    FROM probed"""


@register("lineitem_bloom_prejoin", _sql_bloom_prejoin())
def lineitem_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit runtime-filter audit (operators/bloom.py): an 8 KB md5-bit
    bloom built from high-value orders pre-filters the lineitem scan; the
    single-row readout counts candidates, true semi-join matches, and the
    realized non-member false-positive rate. The portable twin of Spark's
    runtime bloom filter (SPARK-32268), with the filter itself
    oracle-verified."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    keys = o.filter(F.col("o_totalprice") > BLOOM_PRICE_THRESHOLD).select(
        "o_orderkey"
    )
    return bl.bloom_prejoin_audit(l, keys, "l_orderkey", "o_orderkey")


@register(
    "text_bpe_pair_counts",
    f"""WITH vocab AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM
      (SELECT unnest({SQL_TOKS}) AS term FROM documents) GROUP BY term),
    pairs AS (
      SELECT substring(term, i, 2) AS pair, cnt
      FROM vocab, unnest(range(1, length(term))) AS u(i)),
    agg AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n FROM pairs GROUP BY pair),
    ranked AS (SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rnk FROM agg)
    SELECT pair, n, CAST(rnk AS BIGINT) AS rnk FROM ranked WHERE rnk <= 20""",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-iteration BPE merge statistics: adjacent character-pair counts
    weighted by word frequency — the top pair is the first merge a BPE
    tokenizer trained on this corpus would learn (Sennrich et al., ACL'16).

    Scale shape: the corpus collapses to the vocabulary ONCE (map-side
    combined); pair explosion happens on the vocab frame (distinct words),
    not on token occurrences — at 100 TB that is millions of rows, not
    trillions. The top-20 cut is a global window over the tiny pair-count
    frame."""
    docs = load_table(spark, sf_dir, "documents")
    from .functions.text import tokens as tokens_expr

    vocab = (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Guard single-char words: sequence(1, 0) would generate DESCENDING in
    # Spark; CaseWhen evaluates lazily so the bad branch never runs.
    pair_arr = F.when(
        F.length("term") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("term") - F.lit(1)),
            lambda i: F.col("term").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = vocab.select(F.explode(pair_arr).alias("pair"), "cnt")
    agg = pairs.groupBy("pair").agg(F.sum("cnt").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 20)
    )


# ---------------------------------------------------------------------------
# Iterative graph analytics (round 5): PageRank over the near-dup graph
# ---------------------------------------------------------------------------

from .operators import graph as gr  # noqa: E402


def _sql_pagerank(iterations: int, damping: float) -> str:
    """Unrolled PageRank CTE chain over the minhash near-dup pairs. The
    damping constants are the SAME Python floats the Spark operator uses
    (1 - 0.85 != 0.15 in IEEE double)."""
    base = 1.0 - damping
    ctes = [
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "UNION SELECT doc_b AS src, doc_a AS dst FROM pairs)",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src)",
        "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg)",
        "pr0 AS (SELECT src AS doc_id, deg, CAST(1.0 AS DOUBLE)/n AS pr "
        "FROM deg CROSS JOIN nt)",
    ]
    for t in range(1, iterations + 1):
        ctes.append(
            f"c{t} AS (SELECT e.dst AS doc_id, "
            f"CAST(round(p.pr/p.deg, 9) AS DECIMAL(28,9)) AS c "
            f"FROM edges e JOIN pr{t-1} p ON e.src = p.doc_id)"
        )
        ctes.append(
            f"s{t} AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS csum "
            f"FROM c{t} GROUP BY doc_id)"
        )
        ctes.append(
            f"pr{t} AS (SELECT d.src AS doc_id, d.deg, "
            f"CAST({base!r} AS DOUBLE)/n + CAST({damping!r} AS DOUBLE) * COALESCE(s.csum, 0.0) AS pr "
            f"FROM deg d CROSS JOIN nt LEFT JOIN s{t} s ON d.src = s.doc_id)"
        )
    body = ",\n    ".join(ctes)
    return f"""WITH {_sql_minhash_ctes(0.5)},
    {body}
    SELECT doc_id, deg AS degree, round(pr, 6) AS pagerank FROM pr{iterations}"""


@register(
    "dedup_graph_pagerank",
    _sql_pagerank(gr.PAGERANK_ITERATIONS, gr.PAGERANK_DAMPING),
)
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the MinHash near-duplicate graph
    (operators/graph.py): the canonical-copy selection signal inside
    duplicate clusters — the hub of a boilerplate template family outranks
    its variations. 3 unrolled damped iterations, DECIMAL-summed neighbor
    contributions, every constant shared with the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    return gr.pagerank(pairs)


# ---------------------------------------------------------------------------
# Split assignment + weighted sampling (round 5)
# ---------------------------------------------------------------------------

from .operators import sampling as smp  # noqa: E402


@register(
    "documents_train_split",
    """SELECT doc_id, lang, source,
           CASE WHEN (CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 80 THEN 'train'
                WHEN (CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents""",
)
def documents_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment
    (operators/sampling.py::train_split): a salted per-row hash predicate —
    zero shuffle, engine/run/partitioning independent, so val/test
    membership never drifts on a growing 100 TB corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return smp.train_split(docs).select("doc_id", "lang", "source", "split")


@register(
    "documents_weighted_sample",
    f"""WITH pri AS (
      SELECT doc_id, n_chars,
             CASE WHEN CAST(n_chars AS DOUBLE) > 0
                  THEN round(ln((CAST(('0x' || substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
                                / CAST({float(1 << 60)!r} AS DOUBLE))
                             / CAST(n_chars AS DOUBLE), 9)
                  ELSE CAST('-infinity' AS DOUBLE) END AS priority
      FROM documents)
    SELECT doc_id, n_chars, priority
    FROM pri ORDER BY priority DESC, doc_id LIMIT 50""",
)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement (Efraimidis-Spirakis priorities,
    length-weighted): deterministic hashed uniforms, log-form keys rounded
    to 9 decimals, global top-50 via TakeOrderedAndProject — the
    size-proportional document picker for mixture assembly."""
    docs = load_table(spark, sf_dir, "documents")
    out = smp.weighted_sample(docs, weight_col="n_chars", n=50)
    return out.select("doc_id", "n_chars", "priority")


# ---------------------------------------------------------------------------
# Pivot + cumulative time-series shapes (round 5)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_pivot_hourly",
    f"""SELECT CAST((epoch_ms(ts) // 3600000) % 24 AS BIGINT) AS hour,
           {', '.join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
    FROM events GROUP BY 1""",
)
def events_pivot_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x event-type contingency table via pivot with an EXPLICIT
    value list — without it Spark runs a blocking distinct scan to discover
    columns AND the output schema becomes data-dependent, both wrong at
    100 TB. With the list the plan is one map-side-combined aggregate.
    Epoch-ms arithmetic avoids session-timezone coupling (the repo-wide
    timestamp discipline)."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.pmod(F.floor(F.unix_millis("ts") / F.lit(3600000)), F.lit(24))
    out = (
        ev.select(hour.cast("bigint").alias("hour"), "event_type")
        .groupBy("hour")
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    # pivot leaves null for empty cells; the oracle's SUM(CASE) yields 0
    return out.select(
        "hour",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


@register(
    "events_cumulative_new_users",
    """WITH first_seen AS (
      SELECT user_id, CAST(min(epoch_ms(ts)) // 86400000 AS BIGINT) AS day
      FROM events GROUP BY user_id),
    daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY day)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM daily""",
)
def events_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts with a running total — the classic growth
    readout. The distinct-users-to-date problem is reduced to first-seen
    date per user (one map-side-combined min) + a cumulative window over the
    O(#days) daily frame, NEVER a distinct-over-expanding-window on the raw
    stream (quadratic at 100 TB). The unpartitioned window runs on the tiny
    pre-aggregated frame — the audited scan-free pattern."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.floor(F.min(F.unix_millis("ts")) / F.lit(86400000))
        .cast("bigint")
        .alias("day")
    )
    daily = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


# ---------------------------------------------------------------------------
# Z-order clustering key (round 5)
# ---------------------------------------------------------------------------

from .sources.writers import zorder_key, zorder_key_sql  # noqa: E402

_ZX_SQL = "CAST(user_id % 65536 AS BIGINT)"
_ZY_SQL = "CAST(LEAST(GREATEST(CAST(floor(value * 100) AS BIGINT), 0), 65535) AS BIGINT)"


@register(
    "events_zorder_key",
    f"""SELECT event_id, {_ZX_SQL} AS zx, {_ZY_SQL} AS zy,
           {zorder_key_sql(_ZX_SQL, _ZY_SQL)} AS zkey
    FROM events""",
)
def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, value) — the layout
    key for multi-dimensional data skipping (sources/writers.py::zorder_key;
    test_writers proves the file-pruning win over a linear sort). Pure
    integer bit-interleave, zero shuffle; range-partitioning a 100 TB table
    by this key is what makes BOX predicates on both columns prune files."""
    ev = load_table(spark, sf_dir, "events")
    zx = F.pmod(F.col("user_id"), F.lit(65536)).cast("bigint")
    zy = (
        F.least(
            F.greatest(F.floor(F.col("value") * 100).cast("bigint"), F.lit(0)),
            F.lit(65535),
        )
    ).cast("bigint")
    return ev.select(
        "event_id",
        zx.alias("zx"),
        zy.alias("zy"),
        zorder_key(zx, zy).alias("zkey"),
    )


# ---------------------------------------------------------------------------
# Quantile sketch + HLL merge (round 5)
# ---------------------------------------------------------------------------

QSK_QUANTILES = [0.5, 0.95, 0.99]
HLL_UNION_TYPES = ["click", "view"]


def _sql_quantile_sketch() -> str:
    w = sk.QSK_WIDTH
    nb = sk.QSK_BINS
    qs = ", ".join(f"CAST({q!r} AS DOUBLE)" for q in QSK_QUANTILES)
    case = " ".join(
        f"WHEN CAST({q!r} AS DOUBLE) THEN p{i}"
        for i, q in enumerate(QSK_QUANTILES[:-1])
    )
    exacts = ", ".join(
        f"quantile_cont(value, {q!r}) AS p{i}" for i, q in enumerate(QSK_QUANTILES)
    )
    return f"""WITH hist AS (
      SELECT event_type,
             CAST(LEAST(GREATEST(CAST(floor((value - CAST({sk.QSK_LO!r} AS DOUBLE)) / CAST({w!r} AS DOUBLE)) AS BIGINT), 0), {nb - 1}) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM hist),
    qs AS (SELECT unnest([{qs}]) AS q),
    targeted AS (SELECT c.*, q.q, q.q * c.n AS target FROM cum c CROSS JOIN qs q),
    hit AS (
      SELECT event_type, q,
             round(CAST({sk.QSK_LO!r} AS DOUBLE) + bin * CAST({w!r} AS DOUBLE)
                   + CAST({w!r} AS DOUBLE) * (target - (cum - cnt)) / cnt, 6) AS est
      FROM targeted WHERE cum >= target AND (cum - cnt) < target),
    exact AS (SELECT event_type, {exacts} FROM events GROUP BY event_type),
    exact_l AS (
      SELECT event_type, qq.q,
             CASE qq.q {case} ELSE p{len(QSK_QUANTILES) - 1} END AS exact
      FROM exact CROSS JOIN (SELECT unnest([{qs}]) AS q) qq)
    SELECT h.event_type, h.q, h.est, round(e.exact, 6) AS exact,
           round(abs(h.est - round(e.exact, 6)), 6) AS abs_err
    FROM hit h JOIN exact_l e ON h.event_type = e.event_type AND h.q = e.q"""


@register("events_quantile_sketch", _sql_quantile_sketch())
def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass mergeable quantile estimation (operators/sketches.py):
    fixed-domain 256-bin histogram inverted by in-bin linear interpolation,
    with the exact percentile as the audit column. The 100 TB shape: exact
    per-group percentiles need a sort; the sketch is one map-side-combined
    aggregation whose state merges across partitions and days."""
    ev = load_table(spark, sf_dir, "events")
    out = sk.quantile_sketch_estimates(
        ev, "value", ["event_type"], QSK_QUANTILES
    )
    return out.select(
        "event_type",
        "q",
        "est",
        F.round("exact", 6).alias("exact"),
        F.round(F.abs(F.col("est") - F.round("exact", 6)), 6).alias("abs_err"),
    )


def _sql_hll_union() -> str:
    cap = sk.HLL_RHO_CAP
    wb1 = sk.HLL_W_BITS + 1
    types = ", ".join(f"'{t}'" for t in HLL_UNION_TYPES)
    return f"""WITH h AS (SELECT
        CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events WHERE event_type IN ({types})),
    b AS (SELECT h % {sk.HLL_M} AS bucket,
                 CASE WHEN (h >> {sk.HLL_P}) > 0
                      THEN least({wb1} - length(bin(h >> {sk.HLL_P})), {cap})
                      ELSE {cap} END AS rho
          FROM h),
    mx AS (SELECT bucket, MAX(rho) AS maxrho FROM b GROUP BY bucket),
    agg AS (SELECT SUM(1::BIGINT << ({cap} - maxrho)) AS s_present, COUNT(*) AS present FROM mx),
    agg2 AS (SELECT s_present + ({sk.HLL_M} - present) * (1::BIGINT << {cap}) AS s,
                    {sk.HLL_M} - present AS v FROM agg),
    est AS (SELECT CASE WHEN CAST({sk.HLL_NUMERATOR!r} AS DOUBLE) / s <= {sk.HLL_SMALL_RANGE!r}
                             AND v > 0
                        THEN CAST({sk.HLL_M} AS DOUBLE) * ln(CAST({sk.HLL_M} AS DOUBLE) / v)
                        ELSE CAST({sk.HLL_NUMERATOR!r} AS DOUBLE) / s END AS e
            FROM agg2),
    exact AS (SELECT 'union' AS g, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
              FROM events WHERE event_type IN ({types}) GROUP BY 1)
    SELECT x.n_exact, round(e.e, 2) AS n_hll,
           round(abs(e.e - x.n_exact) / x.n_exact, 6) AS rel_err
    FROM exact x CROSS JOIN est e"""


@register("events_hll_union", _sql_hll_union())
def events_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union cardinality from MERGED HLL states (per-bucket MAX across
    groups) — the mergeability that makes the sketch distributed: union two
    populations without revisiting raw data. Estimate hash-verified against
    the oracle's replay; exact union distinct as the audit column. Both
    engines GROUP their exact side (Spark's tag groupBy, the oracle's GROUP
    BY a constant) so a corpus with no qualifying rows yields ZERO rows —
    not a grand row with a 0/0 rel_err."""
    ev = load_table(spark, sf_dir, "events")
    return sk.hll_union(ev, "user_id", "event_type", HLL_UNION_TYPES)


# ---------------------------------------------------------------------------
# Triangle census + key-skew audit (round 5)
# ---------------------------------------------------------------------------


@register(
    "dedup_graph_triangles",
    f"""WITH {_sql_minhash_ctes(0.5)},
    und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY a),
    oriented AS (
      SELECT u.a, u.b FROM und u
      JOIN deg da ON u.a = da.a JOIN deg db ON u.b = db.a
      WHERE da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)),
    wedges2 AS (
      SELECT o1.a AS u, o1.b AS v, o2.b AS w
      FROM oriented o1 JOIN oriented o2 ON o1.a = o2.a WHERE o1.b < o2.b),
    canon AS (SELECT DISTINCT LEAST(doc_a, doc_b) AS x, GREATEST(doc_a, doc_b) AS y FROM pairs),
    tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM wedges2 JOIN canon ON v = x AND w = y),
    totals AS (SELECT CAST(SUM(deg) / 2 AS BIGINT) AS n_edges,
                      CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
               FROM deg)
    SELECT n_edges, n_wedges, n_triangles,
           round(CASE WHEN n_wedges > 0
                      THEN CAST(3.0 AS DOUBLE) * n_triangles / n_wedges
                      ELSE CAST(0.0 AS DOUBLE) END, 6) AS clustering
    FROM totals CROSS JOIN tri""",
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global transitivity of the near-dup graph
    (operators/graph.py::triangle_stats, degree-ordered orientation): high
    clustering = duplicates arrive as dense template families (dedup by
    cluster representative); low = chains of pairwise drift (dedup needs
    the transitive closure). Complements dedup_minhash_clusters."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    return gr.triangle_stats(pairs)


@register(
    "events_key_skew_audit",
    f"""WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(n) AS BIGINT) AS max_n FROM per_key),
    ranked AS (SELECT user_id, n, row_number() OVER (ORDER BY n DESC, user_id) AS rnk
               FROM per_key)
    SELECT r.user_id, r.n, CAST(r.rnk AS BIGINT) AS rnk,
           {sql_exact_ratio("r.n", "t.total", 6)} AS share,
           {sql_exact_ratio("t.max_n * t.n_keys", "t.total", 6)} AS skew_factor
    FROM ranked r CROSS JOIN tot t WHERE r.rnk <= 10""",
)
def events_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew readout: the 10 heaviest keys with their share of the
    stream and the global skew factor (max key frequency over the mean) —
    the metric that decides whether a keyed aggregation needs salting
    (debounce.salted_last_state_wins) or AQE skew-join handling. One
    map-side-combined aggregate + a rank over the per-key frame; the
    global stats ride a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = per_key.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
    )
    w = Window.orderBy(F.col("n").desc(), F.col("user_id").asc())
    ranked = per_key.withColumn("rnk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rnk") <= 10
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "n",
        "rnk",
        exact_ratio("n", "total", 6).alias("share"),
        # max/(total/n_keys) == max*n_keys/total with every operand an
        # exact count, so the whole expression rides the integer form
        exact_ratio("max_n * n_keys", "total", 6).alias("skew_factor"),
    )


# ---------------------------------------------------------------------------
# Containment dedup (round 5)
# ---------------------------------------------------------------------------


@register(
    "dedup_containment_pairs",
    f"""WITH {_sql_minhash_ctes(0.5)},
    cont AS (
      SELECT c.doc_a, c.doc_b,
             {sql_exact_ratio("len(list_intersect(a.s, b.s))", "len(a.s)", 4)} AS containment_a,
             {sql_exact_ratio("len(list_intersect(a.s, b.s))", "len(b.s)", 4)} AS containment_b
      FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id)
    SELECT doc_a, doc_b, containment_a, containment_b
    FROM cont WHERE containment_a >= 0.7 OR containment_b >= 0.7""",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (Broder SEQUENCES'97): catches
    subset-duplicates — a doc pasted whole into a larger host — that
    Jaccard dilutes below threshold. Same LSH band blocking as the MinHash
    miner (operators/dedup.py::containment_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.containment_pairs(docs, threshold=0.7)


# ---------------------------------------------------------------------------
# PMI collocations (round 5)
# ---------------------------------------------------------------------------

PMI_MIN_CO = 5
PMI_TOPK = 20


@register(
    "documents_term_pmi",
    f"""WITH dt AS (
      SELECT DISTINCT doc_id, term FROM
      (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents)),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY term),
    co AS (
      SELECT a.term AS term_a, b.term AS term_b, CAST(COUNT(*) AS BIGINT) AS n_co
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term),
    pmi AS (
      SELECT c.term_a, c.term_b, c.n_co,
             round(ln(CAST(c.n_co AS DOUBLE) * n.n_docs / (CAST(da.df AS DOUBLE) * db.df)), 6) AS pmi
      FROM co c JOIN dfreq da ON c.term_a = da.term
                JOIN dfreq db ON c.term_b = db.term CROSS JOIN n
      WHERE c.n_co >= {PMI_MIN_CO}),
    ranked AS (SELECT *, row_number() OVER
               (ORDER BY pmi DESC, term_a, term_b) AS rnk FROM pmi)
    SELECT term_a, term_b, n_co, pmi, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {PMI_TOPK}""",
)
def documents_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information over doc-level
    co-occurrence: PMI = ln(co*N / (df_a*df_b)) on exact integer counts
    (deterministic ln, rounded). The within-doc pair join is bounded by
    per-doc DISTINCT vocabulary — at 100 TB you prune to the broadcast
    top-V vocabulary first; document frequencies ride broadcast joins; the
    top-20 cut is a window over the collocation frame."""
    from .functions.text import tokens as tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id", F.explode(tokens_expr(F.col("text"))).alias("term")
        )
        .distinct()
        .persist()
    )
    n = dt.agg(F.countDistinct("doc_id").alias("n_docs"))
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    a = dt.select(F.col("doc_id"), F.col("term").alias("term_a"))
    b = dt.select(F.col("doc_id"), F.col("term").alias("term_b"))
    co = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= PMI_MIN_CO)
    )
    da = dfreq.select(F.col("term").alias("term_a"), F.col("df").alias("da"))
    db = dfreq.select(F.col("term").alias("term_b"), F.col("df").alias("db"))
    pmi = (
        co.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            "n_co",
            F.round(
                F.log(
                    F.col("n_co").cast("double")
                    * F.col("n_docs")
                    # double product: BIGINT df_a*df_b would overflow at
                    # web-scale corpus sizes (10^10 docs) in BOTH engines
                    / (F.col("da").cast("double") * F.col("db"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc())
    return (
        pmi.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= PMI_TOPK)
        .select("term_a", "term_b", "n_co", "pmi", "rnk")
    )


# ---------------------------------------------------------------------------
# Round-5 batch 2: binary-quantized ANN, domain quotas, quality calibration,
# n-gram novelty, EWMA smoothing, fuzzy decontamination
# ---------------------------------------------------------------------------


def _sql_sign_codes(dim: int = 64) -> str:
    """Sign-quantized code words: one BIGINT per 32 dims, bit j of word w set
    iff v[w*32 + j] >= 0 — mirror of operators.similarity.sign_codes (32-bit
    words keep every shifted literal inside signed-64 on both engines)."""
    n_words = (dim + 31) // 32
    words = ", ".join(
        f"CAST(list_sum(list_transform(range(0, 32), "
        f"j -> CASE WHEN v[{w * 32} + j + 1] >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END)) "
        f"AS BIGINT) AS w{w}"
        for w in range(n_words)
    )
    return f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    codes AS (SELECT vec_id, {words} FROM e)"""


def _sql_hamming_topk(dim: int = 64) -> str:
    n_words = (dim + 31) // 32
    ham = " + ".join(f"bit_count(xor(q.w{w}, c.w{w}))" for w in range(n_words))
    return f"""WITH {_sql_sign_codes(dim)},
    q AS (SELECT vec_id AS query_id, * EXCLUDE (vec_id) FROM codes
          WHERE vec_id < {ANN_QUERY_MAX_ID}),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST({ham} AS BIGINT) AS hamming
      FROM q CROSS JOIN codes c),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY hamming, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, hamming, CAST(rnk AS BIGINT) AS rank
    FROM ranked WHERE rnk <= {ANN_K}"""


@register("ann_hamming_topk", _sql_hamming_topk())
def ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN tier (operators.similarity.hamming_topk): sign
    bits packed into 32-bit words, distance = XOR+POPCNT — the 1-bit/dim
    first-pass candidate cut vector stores serve before an exact re-rank. The
    corpus scan side carries 16 B/vector instead of 256 B and zero floating
    point; the tail is the shared two-phase per-query top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.hamming_topk(emb, _queries_df(spark, sf_dir), k=ANN_K)


# quality-scored documents CTE (rounded to 4 so rank ties are identical on
# both engines) — shared by the domain-cap and percentile-calibration queries
_SQL_QDOCS = f"""qc AS (
  SELECT doc_id, source, {_SQL_QCOUNTS}
  FROM documents),
qdocs AS (
  SELECT doc_id, source, {SQL_QUALITY_4DP} AS quality
  FROM qc)"""

_DOMAIN_CAP = 40


@register(
    "documents_domain_cap",
    f"""WITH {_SQL_QDOCS},
    ranked AS (
      SELECT source, doc_id, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rnk
      FROM qdocs)
    SELECT source, doc_id, quality, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_DOMAIN_CAP}""",
)
def documents_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document quota (operators.sampling.group_cap): keep the top
    40 documents per source by quality — the C4/RefinedWeb-style guard
    against one crawler-friendly domain dominating the training mixture.
    Two-phase rank: a mega-domain's candidates are pruned per input
    partition before any single reducer sees the group, so the plan survives
    a domain holding 1% of a 100 TB corpus."""
    docs = load_table(spark, sf_dir, "documents")
    scored = T.with_quality_4dp(docs.select("source", "doc_id", "text")).select(
        "source", "doc_id", "quality"
    )
    return smp.group_cap(scored, "source", "quality", "doc_id", _DOMAIN_CAP).select(
        "source", "doc_id", "quality", "rnk"
    )


@register(
    "documents_quality_percentile",
    f"""WITH {_SQL_QDOCS},
    rk AS (
      SELECT doc_id, source, quality,
             rank() OVER (PARTITION BY source ORDER BY quality) AS r,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM qdocs)
    SELECT doc_id, source, quality,
           CASE WHEN n > 1 THEN {sql_exact_ratio("r - 1", "n - 1", 4)}
                ELSE 0.0 END AS pct
    FROM rk""",
)
def documents_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source quality percentile (quantile normalization): maps each
    document's composite quality score to its percent_rank inside its source,
    so thresholds compare fairly ACROSS sources with different score
    distributions (the CCNet trick: per-bucket calibration, not one global
    cutoff). percent_rank gives tied scores tied percentiles — identical in
    both engines by definition (rank-1)/(n-1). Scale note: one window sort
    per source; at 100 TB you swap in the approx-quantile boundary table
    (events_value_percentiles shows that shape) — this is the exact form."""
    docs = load_table(spark, sf_dir, "documents")
    scored = T.with_quality_4dp(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", "quality"
    )
    # percent_rank's (rank-1)/(n-1) is an integer ratio: round it on the
    # exact-integer discipline (rank + count over the SAME window
    # partitioning — no extra exchange, verified by the plan-lint budget)
    w = Window.partitionBy("source").orderBy("quality")
    wp = Window.partitionBy("source")
    return (
        scored.withColumn("r", F.rank().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .select(
            "doc_id", "source", "quality",
            F.when(F.col("n") > 1, exact_ratio("r - 1", "n - 1", 4))
            .otherwise(F.lit(0.0))
            .alias("pct"),
        )
    )


@register(
    "documents_ngram_novelty",
    f"""WITH sh AS (
      SELECT doc_id, unnest({_sql_shingles(SQL_NTOKS)}) AS s FROM documents),
    dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           {sql_exact_ratio("SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END)", "COUNT(*)", 4)} AS novelty
    FROM sh JOIN dfreq USING (s)
    GROUP BY sh.doc_id""",
)
def documents_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level novelty score (operators.dedup.ngram_novelty): fraction
    of each doc's distinct 3-shingles appearing in no other document — the
    aggregate-overlap curation signal pairwise dedup misses. One explode,
    one combinable df aggregate, one shingle equi-join, one per-doc
    aggregate; no pair expansion anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_novelty(docs)


_EWMA_W = 0.7  # decay: s_t weights the current value 0.3, the history 0.7
_EWMA_SPAN = 20  # truncation horizon: weights below 0.7^20 ~ 8e-4 are dropped


@register(
    "events_ewma",
    f"""WITH e AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, epoch_us(ts) AS ts_us, value
      FROM events),
    fr AS (
      SELECT event_id, user_id, ts_ms, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING
                                        AND CURRENT ROW) AS vals
      FROM e)
    SELECT event_id, user_id, ts_ms, value,
           round(list_sum(list_transform(vals,
                     (v, i) -> v * pow({_EWMA_W}, len(vals) - i)))
                 / ((1 - pow({_EWMA_W}, len(vals))) / {1 - _EWMA_W}), 4) AS ewma
    FROM fr""",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of `value` per user, truncated
    to the trailing 20 events and renormalized (a windowed EWMA): the
    smoothing signal behind rate/latency trend monitors. True EWMA is a
    recursion Spark can't express as a window aggregate; the truncated form
    is a BOUNDED-frame weighted mean — weights below 0.7^20 (~1e-3 of the
    mass) are dropped and the remaining weights renormalize, so the result
    is exact over its horizon, deterministic, and oracle-checkable. The
    collect_list frame is capped at 20 rows per output row regardless of
    user history length (the per-key unbounded-state trap this avoids);
    weight products and the final divide round to 4 dp on both engines.
    Ordering ties broken by event_id (repo-wide discipline)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    fr = ev.select("event_id", "user_id", "ts_ms", "value", vals.alias("vals"))
    num = F.aggregate(
        F.transform(
            F.col("vals"),
            lambda v, i: v * F.pow(F.lit(_EWMA_W), F.size(F.col("vals")) - 1 - i),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = (F.lit(1.0) - F.pow(F.lit(_EWMA_W), F.size(F.col("vals")))) / F.lit(
        1 - _EWMA_W
    )
    return fr.select(
        "event_id", "user_id", "ts_ms", "value", F.round(num / den, 4).alias("ewma")
    )


from .operators import contamination as ctm  # noqa: E402


def _sql_minhash_contamination(threshold: float = 0.5) -> str:
    """Oracle for the fuzzy-decontamination report: the shared minhash CTE
    head (sh/hx/sigs/buckets — cut before candidate pairing, the
    _sql_minhash_sig_pairs technique) split into eval (doc_id % 20 = 0, the
    documents_contamination convention) and train sides."""
    base = _sql_minhash_ctes(threshold)
    head = base[: base.index("cand AS")].rstrip().rstrip(",")
    return f"""WITH {head},
    ev AS (SELECT doc_id AS eval_id, band, bucket FROM buckets WHERE doc_id % 20 = 0),
    tb AS (SELECT doc_id, band, bucket FROM buckets WHERE doc_id % 20 <> 0),
    cand AS (SELECT DISTINCT tb.doc_id, ev.eval_id
             FROM tb JOIN ev USING (band, bucket)),
    est AS (
      SELECT c.doc_id, c.eval_id,
             len(list_filter(range(1, {NUM_MINHASHES} + 1),
                             i -> a.sig[i] = b.sig[i]))::DOUBLE / {NUM_MINHASHES} AS est
      FROM cand c JOIN sigs a ON c.doc_id = a.doc_id
                  JOIN sigs b ON c.eval_id = b.doc_id)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_matches,
           round(MAX(est), 4) AS max_est
    FROM est WHERE est >= {threshold} GROUP BY doc_id"""


@register("documents_minhash_contamination", _sql_minhash_contamination())
def documents_minhash_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination (operators.contamination.minhash_contamination):
    train docs near-duplicating an eval doc via shared LSH band buckets +
    signature-agreement >= 0.5 — catches the paraphrased benchmark leakage
    exact-gram contamination misses. Eval side (doc_id % 20 = 0, the
    documents_contamination split) is broadcast end-to-end; the corpus side
    never joins anything bigger than 16 longs/doc."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    return ctm.minhash_contamination(tr, ev, threshold=0.5)


_HAMMING_RERANK_FACTOR = 4


def _sql_hamming_rerank(dim: int = 64) -> str:
    n_words = (dim + 31) // 32
    ham = " + ".join(f"bit_count(xor(q.w{w}, c.w{w}))" for w in range(n_words))
    cut = ANN_K * _HAMMING_RERANK_FACTOR
    return f"""WITH {_sql_sign_codes(dim)},
    qc AS (SELECT vec_id AS query_id, * EXCLUDE (vec_id) FROM codes
           WHERE vec_id < {ANN_QUERY_MAX_ID}),
    coarse AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {ham}, c.vec_id) AS crank
        FROM qc q CROSS JOIN codes c) t
      WHERE crank <= {cut}),
    qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID}),
    ev AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v FROM embeddings),
    rer AS (
      SELECT co.query_id, co.neighbor_id,
             {SQL_COS.format(a='q.v', b='e.v')} AS score
      FROM coarse co JOIN ev e USING (neighbor_id)
                     JOIN qv q USING (query_id)),
    ranked AS (
      SELECT query_id, neighbor_id, round(score, 4) AS score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rnk
      FROM rer)
    SELECT query_id, neighbor_id, score, CAST(rnk AS BIGINT) AS rank
    FROM ranked WHERE rnk <= {ANN_K}"""


@register("ann_hamming_rerank", _sql_hamming_rerank())
def ann_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-coarse + exact-rerank serving pattern
    (operators.similarity.hamming_rerank_topk): the XOR+POPCNT pass over
    16 B/vector sign codes cuts the corpus to k*4 candidates per query; only
    those candidates' full-precision vectors are fetched (broadcast semi-join
    on the candidate-id set) and reranked by exact cosine. The full float
    column is read for a vanishing fraction of a 100 TB corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = sim.hamming_rerank_topk(
        emb, _queries_df(spark, sf_dir), k=ANN_K, factor=_HAMMING_RERANK_FACTOR
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


def _sql_recall_hamming(dim: int = 64) -> str:
    """Recall@k of the binary-rerank pipeline vs the exact scan: the rerank
    CTE chain spliced in at top level (its CTE names don't collide with the
    bf_* chain), its final ranked frame cut to (query_id, neighbor_id),
    semi-joined against the brute-force top-k."""
    rer = _sql_hamming_rerank(dim)
    marker = "\n    SELECT query_id, neighbor_id, score, CAST(rnk AS BIGINT) AS rank"
    rer_ctes = rer[len("WITH ") : rer.index(marker)]
    return f"""WITH bf_q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {ANN_QUERY_MAX_ID}),
    bf_base AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v FROM embeddings),
    bf_scored AS (
      SELECT query_id, neighbor_id, {SQL_COS.format(a='qv', b='v')} AS score
      FROM bf_q CROSS JOIN bf_base),
    bf AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM bf_scored QUALIFY rank <= {ANN_K}),
    {rer_ctes},
    hm AS (SELECT query_id, neighbor_id FROM ranked WHERE rnk <= {ANN_K}),
    hits AS (
      SELECT bf.query_id, CAST(COUNT(hm.neighbor_id) AS BIGINT) AS hits
      FROM bf LEFT JOIN hm
        ON bf.query_id = hm.query_id AND bf.neighbor_id = hm.neighbor_id
      GROUP BY bf.query_id)
    SELECT query_id, hits, {sql_exact_ratio("hits", str(ANN_K), 4)} AS recall FROM hits"""


@register("ann_recall_hamming", _sql_recall_hamming())
def ann_recall_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the binary-quantization rerank pipeline against the exact
    brute-force top-k — the acceptance gate before swapping the cheap tier
    in (binary codes lose the most information of any tier here, so this is
    the readout that decides whether k*factor coarse candidates are
    enough). Same evaluation shape as ann_recall_lsh/ivf: two small top-k
    frames, one semi-join, no extra corpus work."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = _queries_df(spark, sf_dir)
    bf = sim.brute_force_topk(emb, qdf, k=ANN_K).select("query_id", "neighbor_id")
    hm = sim.hamming_rerank_topk(
        emb, qdf, k=ANN_K, factor=_HAMMING_RERANK_FACTOR
    ).select(F.col("query_id").alias("h_qid"), F.col("neighbor_id").alias("h_nid"))
    hits = (
        bf.join(
            hm,
            (F.col("query_id") == F.col("h_qid"))
            & (F.col("neighbor_id") == F.col("h_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("h_nid").cast("bigint").alias("hits"))
    )
    return hits.select(
        "query_id", "hits", exact_ratio("hits", str(ANN_K), 4).alias("recall")
    )


def _sql_incremental_bloom() -> str:
    """Oracle for the bloom-gated incremental dedup: the dedup_incremental
    chain with the portable bloom (same md5 bit positions as
    _sql_bloom_prejoin) replayed over the history fingerprints, exposing
    the candidate bit so the CORRECTNESS hash verifies the filter
    arithmetic itself, not just the dedup outcome."""
    k, bits, words = bl.BLOOM_K, bl.BLOOM_BITS, bl.BLOOM_WORDS
    pos_build = ", ".join(
        f"CAST(('0x' || substring(md5('{j}:' || CAST(__k AS VARCHAR)), 1, 15)) AS BIGINT) % {bits}"
        for j in range(k)
    )
    checks = []
    for j in range(k):
        pos = (
            f"(CAST(('0x' || substring(md5('{j}:' || CAST(n.fp AS VARCHAR)), 1, 15)) AS BIGINT)"
            f" % {bits})"
        )
        checks.append(
            f"((w.words[({pos} // 32) + 1] & (1::BIGINT << CAST({pos} % 32 AS INT))) <> 0)"
        )
    hit = " AND ".join(checks)
    # fp must be the SAME value Spark hashes into the bloom: fingerprint()
    # is the 60-bit BIGINT md5-prefix, and the bloom positions hash its
    # DECIMAL string ('j:405898258478784026'), not the 32-hex digest. With
    # the hex form here, true members still hit (no false negatives either
    # way) but FALSE POSITIVES land on different keys — invisible at
    # sf<=0.01 where both sides realize zero FPs, caught by the round-9
    # sf0.1 full-registry sweep (17 asymmetric candidates).
    return f"""WITH fp AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5({SQL_NORM}), 1, 15)) AS BIGINT) AS fp
      FROM documents),
    hist AS (
      SELECT fp, MIN(doc_id) AS matched_doc FROM fp
      WHERE doc_id % 4 <> 0 GROUP BY fp),
    new AS (SELECT doc_id, fp FROM fp WHERE doc_id % 4 = 0),
    keys AS (SELECT fp AS __k FROM hist),
    pos AS (SELECT unnest([{pos_build}]) AS p FROM keys),
    bloom AS (SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
              FROM pos GROUP BY p // 32),
    warr AS (SELECT list(COALESCE(b.bits, 0) ORDER BY g.w) AS words
             FROM (SELECT unnest(range(0, {words})) AS w) g
             LEFT JOIN bloom b ON b.word = g.w)
    SELECT n.doc_id, ({hit}) AS bloom_candidate,
           h.fp IS NOT NULL AS is_dup,
           CAST(h.matched_doc AS BIGINT) AS matched_doc
    FROM new n CROSS JOIN warr w LEFT JOIN hist h USING (fp)"""


@register("dedup_incremental_bloom", _sql_incremental_bloom())
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_incremental behind a runtime bloom filter: an 8 KB portable
    bloom of the HISTORY fingerprints is broadcast into the new-batch scan,
    and only bloom candidates reach the fingerprint equi-join — the rest are
    definitively fresh (no false negatives) and skip the shuffle entirely.
    The per-increment join cost drops from O(|new|) rows shuffled to
    O(|new| * fp_rate + true dups); at a realistic duplicate rate of a few
    percent that is a ~20x shuffle cut. bloom_candidate is exposed so the
    oracle verifies the filter bits exactly; production sizing is ~10
    bits/history-key (the 8 KB here is the testdata size class — the
    BloomFilterAggregate runtime filter Spark builds automatically is the
    same pattern with xxhash64)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
    hist = (
        fp.filter(F.col("doc_id") % 4 != 0)
        .groupBy("fp")
        .agg(F.min("doc_id").cast("bigint").alias("matched_doc"))
    )
    new = fp.filter(F.col("doc_id") % 4 == 0)
    bloom = bl.build_bloom(hist.select(F.col("fp").alias("__k")), "__k")
    probed = new.crossJoin(F.broadcast(bloom)).select(
        "doc_id", "fp", F.expr(bl.might_contain_sql("fp")).alias("bloom_candidate")
    )
    cand = probed.filter(F.col("bloom_candidate")).join(hist, "fp", "left")
    fresh = probed.filter(~F.col("bloom_candidate")).withColumn(
        "matched_doc", F.lit(None).cast("bigint")
    )
    return cand.unionByName(fresh).select(
        "doc_id",
        "bloom_candidate",
        F.col("matched_doc").isNotNull().alias("is_dup"),
        "matched_doc",
    )


_OOO_JITTER = 50  # simulated delivery delay: up to 50 sequence positions
_OOO_SHARDS = 8  # "ingest partitions" — the per-partition watermark model


@register(
    "events_out_of_order_audit",
    f"""WITH e AS (
      SELECT event_id, user_id % {_OOO_SHARDS} AS shard, epoch_ms(ts) AS ts_ms,
             event_id + (CAST(('0x' || substring(md5('arr:' || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
                         % {_OOO_JITTER}) AS arrival_key
      FROM events),
    lag_ms AS (
      SELECT shard,
             GREATEST(MAX(ts_ms) OVER (PARTITION BY shard ORDER BY arrival_key, event_id
                                       ROWS UNBOUNDED PRECEDING) - ts_ms, 0) AS late_ms
      FROM e)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           {sql_exact_ratio("SUM(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END)", "COUNT(*)", 4)} AS late_ratio,
           CAST(round(quantile_cont(late_ms, 0.95), 0) AS BIGINT) AS p95_late_ms,
           CAST(MAX(late_ms) AS BIGINT) AS max_late_ms
    FROM lag_ms GROUP BY shard""",
)
def events_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit, per ingest partition: how far event time lags
    the running event-time maximum in ARRIVAL order — the p95/max lateness
    per shard is exactly what `withWatermark` (streaming/pipeline.py) must
    cover; too small drops these rows, too large holds state. Streams track
    watermarks PER SOURCE PARTITION, so the running max is per-shard
    (user_id % 8 here) — never a global total order, which is the
    single-partition trap at 100 TB. The testdata ships perfectly ordered
    (verified: zero inversions in event_id order), so arrival is simulated
    with a deterministic bounded delivery delay (md5 jitter of up to 50
    sequence positions — the network-reorder model); on real ingest you
    order by the source offset instead. One per-shard ordered window + one
    grouped percentile aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(_OOO_SHARDS)).alias("shard"),
        F.unix_millis("ts").alias("ts_ms"),
        (
            F.col("event_id")
            + F.pmod(
                T.md5_prefix_long(F.concat(F.lit("arr:"), F.col("event_id").cast("string"))),
                F.lit(_OOO_JITTER),
            )
        ).alias("arrival_key"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("arrival_key", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select(
        "shard",
        F.greatest(
            F.max("ts_ms").over(w) - F.col("ts_ms"), F.lit(0).cast("bigint")
        ).alias("late_ms"),
    )
    return late.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_ms") > 0, 1).otherwise(0)).cast("bigint").alias("n_late"),
        exact_ratio(
            "sum(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END)", "count(1)", 4
        ).alias("late_ratio"),
        F.round(F.percentile(F.col("late_ms").cast("double"), F.lit(0.95)), 0)
        .cast("bigint")
        .alias("p95_late_ms"),
        F.max("late_ms").cast("bigint").alias("max_late_ms"),
    ).select(
        F.col("shard").cast("bigint").alias("shard"),
        "n_events", "n_late", "late_ratio", "p95_late_ms", "max_late_ms",
    )


@register(
    "documents_tokenizer_fertility",
    f"""WITH t AS (
      SELECT lang, {SQL_TOKS} AS toks, length(text) AS nc FROM documents),
    m AS (
      SELECT lang, len(toks) AS nw,
             CASE WHEN len(toks) > 0 THEN CAST(nc AS DOUBLE) / len(toks) ELSE 0.0 END AS cpw,
             CASE WHEN len(toks) > 0
                  THEN CAST({sql_exact_ratio("nc", "len(toks)", 6)} AS DECIMAL(18,6))
                  ELSE CAST(0.0 AS DECIMAL(18,6)) END AS cpw6
      FROM t)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS n_words,
           {sql_exact_mean_units("CAST(SUM(cpw6) * 1000000 AS BIGINT)", "COUNT(*)", 4)} AS mean_chars_per_word,
           round(quantile_cont(cpw, 0.5), 4) AS p50_chars_per_word,
           round(quantile_cont(cpw, 0.95), 4) AS p95_chars_per_word
    FROM m GROUP BY lang""",
)
def documents_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility statistics per language: characters per
    whitespace word (the upper bound on BPE fertility — how many bytes a
    token must carry). The per-language p50/p95 drives tokenizer vocabulary
    budgeting and flags languages whose scripts blow up the token count
    (the multilingual-tokenizer sizing readout; pairs with
    text_bpe_pair_counts). One scan, one grouped percentile aggregate over
    O(#languages) groups — all map-side combinable."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.size(T.tokens(F.col("text"))).alias("nw"),
        F.length("text").alias("nc"),
    )
    m = t.select(
        "lang",
        "nw",
        F.when(
            F.col("nw") > 0, F.col("nc").cast("double") / F.col("nw")
        ).otherwise(F.lit(0.0)).alias("cpw"),
        # mean rides an exact DECIMAL sum of per-row 6-dp exact ratios:
        # AVG over raw doubles is float-sum-order dependent, which neither
        # engine (nor two Spark runs with different partitionings) is
        # obliged to reproduce; percentiles keep the raw double (identical
        # interpolation arithmetic on identical values in both engines)
        F.when(
            F.col("nw") > 0, exact_ratio("nc", "nw", 6).cast("decimal(18,6)")
        ).otherwise(F.lit(0.0).cast("decimal(18,6)")).alias("cpw6"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nw").cast("bigint").alias("n_words"),
        exact_mean_units(
            "CAST(sum(cpw6) * 1000000 AS BIGINT)", "count(1)", 4
        ).alias("mean_chars_per_word"),
        F.round(F.percentile("cpw", F.lit(0.5)), 4).alias("p50_chars_per_word"),
        F.round(F.percentile("cpw", F.lit(0.95)), 4).alias("p95_chars_per_word"),
    )


@register(
    "embeddings_norm_audit",
    """WITH n AS (
      SELECT vec_id, label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings)
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           round(MIN(nrm), 4) AS min_norm,
           round(MAX(nrm), 4) AS max_norm,
           round(AVG(nrm), 4) AS mean_norm,
           CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
    FROM n GROUP BY label""",
)
def embeddings_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding data-quality audit per label: vector-norm min/max/mean and
    the zero-vector count — the pre-flight check before any ANN build
    (zero vectors poison cosine with 0-denominators; wildly varying norms
    mean the encoder isn't normalized and dot != cosine). Pure map-side
    arithmetic + one tiny grouped aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select(
        "label", vnorm(F.col("embedding")).alias("nrm")
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.round(F.avg("nrm"), 4).alias("mean_norm"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0)).cast("bigint").alias("n_zero"),
    ).select(
        F.col("label").cast("bigint").alias("label"),
        "n_vectors", "min_norm", "max_norm", "mean_norm", "n_zero",
    )


_PATH_LEN = 5
_PATH_TOPK = 20


@register(
    "events_session_paths",
    f"""WITH marks AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                    OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
             THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    sessioned AS (
      SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
      FROM marks),
    rn AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                                   ORDER BY ts_us, event_id) AS r
      FROM sessioned),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY r) AS path
      FROM rn WHERE r <= {_PATH_LEN} GROUP BY user_id, session_id),
    freq AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
             FROM paths GROUP BY path)
    SELECT path, n_sessions, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rnk FROM freq)
    WHERE rnk <= {_PATH_TOPK}""",
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: the top-20 most common event-type sequences
    (first 5 events per session) — the behavioral readout product teams run
    on every clickstream. Path assembly is bounded BEFORE aggregation (the
    rank <= 5 cut), so no session ever materializes an unbounded event list;
    path frequencies combine map-side; the top-20 is
    TakeOrderedAndProject + rank-after-take on 20 rows (the
    documents_global_topk_quality shape), never a global sort."""
    ev = load_table(spark, sf_dir, "events").withColumnRenamed("ts", "event_ts")
    sessioned = dbn.assign_sessions(
        ev, key_cols=["user_id"], gap_ms=SESSION_GAP_MS, tiebreak_cols=["event_id"]
    ).withColumn("ts_us", F.unix_micros("event_ts"))
    wr = Window.partitionBy("user_id", "session_id").orderBy("ts_us", "event_id")
    rn = sessioned.withColumn("r", F.row_number().over(wr)).filter(
        F.col("r") <= _PATH_LEN
    )
    paths = (
        rn.groupBy("user_id", "session_id")
        .agg(F.array_sort(F.collect_list(F.struct("r", "event_type"))).alias("seq"))
        .select(
            F.array_join(
                F.transform(F.col("seq"), lambda s: s["event_type"]), ">"
            ).alias("path")
        )
    )
    freq = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    topk = freq.orderBy(F.col("n_sessions").desc(), F.col("path")).limit(_PATH_TOPK)
    w = Window.orderBy(F.col("n_sessions").desc(), F.col("path"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("bigint"))


@register(
    "events_markov_transitions",
    f"""WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS next_type
      FROM events),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT from_type, SUM(n) AS t FROM pairs GROUP BY from_type)
    SELECT p.from_type, p.to_type, p.n,
           {sql_exact_ratio("p.n", "t.t", 4)} AS p
    FROM pairs p JOIN tot t USING (from_type)""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) — the behavioral model behind churn
    prediction and anomalous-flow detection. One per-user lead window (the
    partitioning every sessionization query already pays), one
    map-side-combined pair count, and the row normalization is a broadcast
    join against the O(#types) totals frame — the corpus never shuffles
    twice."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("t"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        exact_ratio("n", "t", 4).alias("p"),
    )


def _sign_index_dir(sf_dir: str) -> str:
    """Repo-local cache path for the persisted sign-code table (same keying
    discipline as _ivf_pq_index_dir: corpus identity + tier tag)."""
    import hashlib

    emb = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb)
    key = hashlib.md5(
        "|".join(
            [
                os.path.abspath(sf_dir), str(st.st_size), str(int(st.st_mtime)),
                "sign32",
            ]
        ).encode()
    ).hexdigest()[:16]
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ann_index"
    )
    return os.path.join(root, key)


@register("ann_hamming_topk_indexed", _sql_hamming_topk())
def ann_hamming_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hamming tier served from a PERSISTED sign-code table
    (operators/ann_index.py::build_sign_index): the first invocation writes
    the 16 B/vector codes parquet; every later probe scans ONLY that table —
    the float embedding column is never read again. Sign encoding is
    parameter-free and deterministic, so results are bit-identical to
    ann_hamming_topk and the same oracle covers both. This is the cheapest
    end of the serving spectrum: at 100 TB of embeddings the code table is
    ~6 TB, and a probe is a single flat integer scan of it."""
    from .operators import ann_index as ai

    path = _sign_index_dir(sf_dir)
    if not ai.index_is_built(path):
        emb = load_table(spark, sf_dir, "embeddings")
        ai.build_sign_index(emb, path)
    return ai.sign_index_probe(spark, path, _queries_df(spark, sf_dir), k=ANN_K)


_ROLLUP_CUTOFF = "1997-01-01"


@register(
    "lineitem_rollup_incremental",
    f"""SELECT l_returnflag, CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS ship_month,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY 1, 2""",
)
def lineitem_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the (returnflag, month) rollup is
    computed as HISTORY PARTIAL (shipdate < {cut}) merged with DELTA PARTIAL
    (>= {cut}) — re-aggregating two partial-state frames, never rescanning
    history. The oracle computes the rollup directly over everything, so the
    hash gate PROVES the merge is lossless: sums/counts are mergeable state
    (the same algebra every map-side combine relies on, applied across
    jobs). This is how a daily 100 TB fact rollup actually updates: history
    partials live as a table keyed by group, each day's delta partial is
    one partition scan, and the merge touches only affected groups.
    DECIMAL(18,2) money sums keep the merge bit-exact in any order.""".replace(
        "{cut}", _ROLLUP_CUTOFF
    )
    li = load_table(spark, sf_dir, "lineitem")
    month = F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")

    def partial(df):
        return df.groupBy("l_returnflag", month).agg(
            F.sum("l_quantity").alias("p_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("p_rev"),
            F.count(F.lit(1)).alias("p_n"),
        )

    hist = partial(li.filter(F.col("l_shipdate") < F.lit(_ROLLUP_CUTOFF)))
    delta = partial(li.filter(F.col("l_shipdate") >= F.lit(_ROLLUP_CUTOFF)))
    merged = hist.unionByName(delta).groupBy("l_returnflag", "ship_month").agg(
        F.sum("p_qty").cast("bigint").alias("sum_qty"),
        F.sum("p_rev").cast("double").alias("revenue"),
        F.sum("p_n").cast("bigint").alias("n_items"),
    )
    return merged


_EDIT_MAX_DIST = 3
_EDIT_BLOCK_TOKENS = 2
_EDIT_SNIPPET = 60
_EDIT_BLOCK_CAP = 100


@register(
    "dedup_edit_distance_pairs",
    f"""WITH base AS (
      SELECT doc_id,
             md5(array_to_string(list_slice({SQL_NTOKS}, 1, {_EDIT_BLOCK_TOKENS}), ' ')) AS block,
             substring({SQL_NORM}, 1, {_EDIT_SNIPPET}) AS snip
      FROM documents),
    capped AS (
      SELECT doc_id, block, snip FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY block) AS bn FROM base) t
      WHERE bn <= {_EDIT_BLOCK_CAP})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.snip, b.snip) AS BIGINT) AS dist
    FROM capped a JOIN capped b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE levenshtein(a.snip, b.snip) <= {_EDIT_MAX_DIST}""",
)
def dedup_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance dedup (operators.dedup.edit_distance_pairs): Levenshtein
    over 60-char normalized snippets within leading-2-token prefix blocks —
    the record-linkage family for short/near-identical texts where shingle
    measures miss single-character edits. Blocks over 100 docs are dropped
    before the self-join (the bucket-cap guard), so the DP never goes
    quadratic on a boilerplate opening."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.edit_distance_pairs(
        docs,
        max_dist=_EDIT_MAX_DIST,
        block_tokens=_EDIT_BLOCK_TOKENS,
        snippet_len=_EDIT_SNIPPET,
        max_block_size=_EDIT_BLOCK_CAP,
    )


# CCNet-style bucket keep rates: head keeps all, middle half, tail a tenth
_CCNET_RATES = {0: 1.0, 1: 0.5, 2: 0.1}  # 0 = head (best third)


@register(
    "documents_ccnet_buckets",
    f"""WITH {_SQL_QDOCS},
    pct AS (
      SELECT doc_id, source, quality,
             percent_rank() OVER (PARTITION BY source ORDER BY quality DESC) AS pr
      FROM qdocs),
    bucketed AS (
      SELECT doc_id, source, quality,
             CAST(LEAST(CAST(floor(pr * 3) AS BIGINT), 2) AS BIGINT) AS bucket
      FROM pct)
    SELECT doc_id, source, quality, bucket,
           (CAST(('0x' || substring(md5('ccnet' || CAST(bucket AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000)
             < CAST(CASE bucket WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.1 END * 10000 AS BIGINT) AS kept
    FROM bucketed""",
)
def documents_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality-bucketed reweighting: rank documents within each
    source by quality, split into head/middle/tail thirds (percent_rank on
    quality DESC -> bucket 0/1/2), and keep each bucket at a different
    deterministic rate (head 100%, middle 50%, tail 10%) via the salted-hash
    coin flip (operators.sampling.sample_hash). This is the canonical
    perplexity-bucket curation recipe re-expressed over the composite
    quality score: per-source calibration (no single global cutoff), exact
    reproducibility (no rand()), and the keep decision is a pure per-row
    predicate once the percentile window has run."""
    docs = load_table(spark, sf_dir, "documents")
    scored = T.with_quality_4dp(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", "quality"
    )
    w = Window.partitionBy("source").orderBy(F.col("quality").desc())
    bucketed = scored.withColumn(
        "bucket",
        F.least(F.floor(F.percent_rank().over(w) * 3).cast("bigint"), F.lit(2)),
    )
    rate = (
        F.when(F.col("bucket") == 0, F.lit(_CCNET_RATES[0]))
        .when(F.col("bucket") == 1, F.lit(_CCNET_RATES[1]))
        .otherwise(F.lit(_CCNET_RATES[2]))
    )
    kept = smp.sample_hash(
        F.concat(F.lit("ccnet"), F.col("bucket").cast("string")), F.col("doc_id")
    ) < (rate * smp.GRAIN).cast("bigint")
    return bucketed.withColumn("kept", kept)


@register(
    "pipeline_funnel_report",
    f"""WITH base AS (
      SELECT doc_id, source, text, {SQL_TOKS} AS toks,
             regexp_replace(text, '\\s+', '', 'g') AS nospace
      FROM documents),
    m AS (
      SELECT doc_id, source, toks, text,
        CASE WHEN len(toks) > 0
             THEN len(list_filter(toks, t -> t IN ({_SQL_STOPS}))) / len(toks)
             ELSE 0.0 END AS stop_ratio,
        CASE WHEN length(nospace) > 0
             THEN length(regexp_replace(nospace, '[a-zA-Z0-9]', '', 'g')) / length(nospace)
             ELSE 0.0 END AS punct_ratio,
        length(text) AS n_chars_text,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['en']}))) AS s_en,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['de']}))) AS s_de,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['es']}))) AS s_es,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['fr']}))) AS s_fr,
        len(list_filter(toks, t -> t IN ({_SQL_MARK['zh']}))) AS s_zh
      FROM base),
    scored AS (
      SELECT doc_id, source, toks, text,
             (least(n_chars_text / 500.0, 1.0)
              + (1.0 - least(punct_ratio * 4.0, 1.0))
              + least(stop_ratio * 5.0, 1.0)) / 3.0 AS q,
             (s_en > 0 AND s_en > s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh) AS is_en
      FROM m),
    kept AS (
      SELECT doc_id, source, {SQL_H15.format(x=SQL_NORM)} AS fp
      FROM scored WHERE q >= 0.55 AND is_en),
    reps AS (SELECT fp, MIN(doc_id) AS keep_id FROM kept GROUP BY fp),
    dedup_counts AS (
      SELECT k.source, CAST(COUNT(*) AS BIGINT) AS n_dedup
      FROM kept k JOIN reps r ON k.doc_id = r.keep_id GROUP BY k.source),
    stage12 AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(CASE WHEN q >= 0.55 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
             CAST(SUM(CASE WHEN q >= 0.55 AND is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_lang
      FROM scored GROUP BY source)
    SELECT s.source, s.n_total, s.n_quality, s.n_lang,
           COALESCE(d.n_dedup, 0) AS n_dedup
    FROM stage12 s LEFT JOIN dedup_counts d USING (source)""",
)
def pipeline_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel observability: per source, survivor counts through
    every stage of the cleaning pipeline — total -> quality gate -> language
    gate -> exact dedup. This is the report every data team keeps on a
    dashboard: WHERE documents die decides which knob to tune (a source
    losing 80% at the quality gate needs a different fix than one losing
    it to dedup). Shares the scored frame with pipeline_corpus_clean
    (_corpus_scored), so the funnel can never drift from the pipeline it
    reports on; the stage counts are conditional sums over ONE scan plus
    the dedup representative count."""
    scored = _corpus_scored(load_table(spark, sf_dir, "documents"))
    kept = scored.filter((F.col("q") >= 0.55) & F.col("is_en"))
    w = Window.partitionBy("fp")
    dedup_counts = (
        kept.withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dedup"))
    )
    stage12 = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("q") >= 0.55, 1).otherwise(0)).cast("bigint").alias("n_quality"),
        F.sum(F.when((F.col("q") >= 0.55) & F.col("is_en"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lang"),
    )
    return stage12.join(F.broadcast(dedup_counts), "source", "left").select(
        "source",
        "n_total",
        "n_quality",
        "n_lang",
        F.coalesce(F.col("n_dedup"), F.lit(0).cast("bigint")).alias("n_dedup"),
    )


def _sql_kmeans_inertia() -> str:
    """Per-cluster compactness oracle: the IVF chain through `af`, joined
    back to the final centroids for the within-cluster squared distances.
    The SUM over per-row d2 is order-sensitive FP in principle, but the
    accumulated error (~n*eps*total ~ 1e-8 here) sits far below the 4 dp
    rounding, so the hash compare is stable."""
    parts = _sql_ivf_parts(n_clusters=8, iterations=5)[:-3]  # through af
    body = ",\n    ".join(parts)
    d2 = (
        "list_sum(list_transform(range(1, len(a.v) + 1),"
        " i -> (a.v[i] - c.c[i]) * (a.v[i] - c.c[i])))"
    )
    return f"""WITH {body}
    SELECT CAST(a.cluster AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           round(SUM({d2}), 4) AS sse,
           round(AVG({d2}), 6) AS mean_d2
    FROM af a JOIN c5 c ON a.cluster = c.cluster
    GROUP BY a.cluster"""


@register("embeddings_kmeans_inertia", _sql_kmeans_inertia())
def embeddings_kmeans_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means compactness diagnostics: per-cluster SSE (inertia) and mean
    squared distance to the assigned centroid — the convergence/quality
    readout next to embeddings_cluster_sizes' balance audit (rising mean_d2
    with flat shares says the cluster count is too low; one dominant
    high-SSE cluster says the space has an unmodeled mode). Same sampled
    training + one assignment pass; the distance fold runs map-side against
    broadcast centroid literals and the aggregate combines map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = sim.kmeans_centroids(
        emb, n_clusters=8, sample_hex=_TRAIN_SAMPLE_HEX
    )
    return _kmeans_inertia_body(emb, [c for _, c in centroids])


def _kmeans_inertia_body(emb: DataFrame, centroids: list) -> DataFrame:
    """Assignment + distance-fold half of the inertia diagnostic (shared by
    the inline-training and persisted-index forms). No centroids (an empty
    corpus trains none) -> no clusters to diagnose: typed empty frame
    (F.array() of zero centroid literals cannot even be analyzed)."""
    if not centroids:
        return emb.sparkSession.createDataFrame(
            [], "cluster bigint, n_vectors bigint, sse double, mean_d2 double"
        )
    cent_mat = sim.arr_lit(centroids)
    assigned = sim.assign_clusters(emb, centroids)
    cvec = F.element_at(cent_mat, F.col("cluster").cast("int") + 1)
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"), cvec, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        assigned.withColumn("d2", d2)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(F.sum("d2"), 4).alias("sse"),
            F.round(F.avg("d2"), 6).alias("mean_d2"),
        )
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            "n_vectors", "sse", "mean_d2",
        )
    )


_ZIPF_TOP = 500


@register(
    "documents_zipf_fit",
    f"""WITH toks AS (
      SELECT unnest({SQL_TOKS}) AS term FROM documents),
    cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY term),
    top AS (SELECT term, n FROM cf ORDER BY n DESC, term LIMIT {_ZIPF_TOP}),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rnk FROM top)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 4) AS zipf_slope,
           round(regr_intercept(ln(CAST(n AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 4) AS zipf_intercept
    FROM ranked""",
)
def documents_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-500 terms: the log-log regression slope of
    frequency vs rank — the corpus-health canary (natural language sits near
    -1; template/spam/boilerplate-heavy corpora flatten or steepen it, and a
    drift between crawl snapshots flags a pipeline change). Token counts
    combine map-side to the vocab frame; the top-500 cut is
    TakeOrderedAndProject; the rank window and the regression aggregates run
    over 500 rows — the audited scan-free unpartitioned-window pattern."""
    from .functions.text import tokens as tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    cf = (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    top = cf.orderBy(F.col("n").desc(), F.col("term")).limit(_ZIPF_TOP)
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    ranked = top.withColumn("rnk", F.row_number().over(w))
    ln_n = F.log(F.col("n").cast("double"))
    ln_r = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(F.regr_slope(ln_n, ln_r), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_n, ln_r), 4).alias("zipf_intercept"),
    )


def _quintile_score_sql(v: str, b: str) -> str:
    """SQL: 1 (best = above the 0.8 boundary) .. 5, by boundary comparison."""
    return (
        f"CAST(1 + (CASE WHEN {v} < {b}80 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {v} < {b}60 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {v} < {b}40 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {v} < {b}20 THEN 1 ELSE 0 END) AS BIGINT)"
    )


def _quintile_score_col(v, b_prefix: str):
    """Spark: 1 (best) .. 5 via broadcast boundary comparisons — no window."""
    score = F.lit(1)
    for cut in ("80", "60", "40", "20"):
        score = score + F.when(v < F.col(f"{b_prefix}{cut}"), 1).otherwise(0)
    return score.cast("bigint")


@register(
    "customer_rfm_segments",
    f"""WITH rfm AS (
      SELECT o_custkey AS custkey,
             CAST(MAX(epoch_ms(o_orderdate)) AS DOUBLE) AS last_order_ms,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey),
    b AS (
      SELECT quantile_cont(last_order_ms, 0.2) AS r20, quantile_cont(last_order_ms, 0.4) AS r40,
             quantile_cont(last_order_ms, 0.6) AS r60, quantile_cont(last_order_ms, 0.8) AS r80,
             quantile_cont(CAST(frequency AS DOUBLE), 0.2) AS f20, quantile_cont(CAST(frequency AS DOUBLE), 0.4) AS f40,
             quantile_cont(CAST(frequency AS DOUBLE), 0.6) AS f60, quantile_cont(CAST(frequency AS DOUBLE), 0.8) AS f80,
             quantile_cont(monetary, 0.2) AS m20, quantile_cont(monetary, 0.4) AS m40,
             quantile_cont(monetary, 0.6) AS m60, quantile_cont(monetary, 0.8) AS m80
      FROM rfm),
    scored AS (
      SELECT custkey, frequency, monetary,
             {_quintile_score_sql("last_order_ms", "r")} AS r_score,
             {_quintile_score_sql("CAST(frequency AS DOUBLE)", "f")} AS f_score,
             {_quintile_score_sql("monetary", "m")} AS m_score
      FROM rfm CROSS JOIN b)
    SELECT custkey, frequency, monetary, r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
    FROM scored""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary quintiles
    (1 = best) concatenated into the classic 3-digit segment code — the
    standard CRM cohort cut. One grouped aggregate to the O(#customers)
    frame, then the 12 exact quintile boundaries reduce to a broadcast
    1-row frame and each score is a pure comparison chain — no global
    window, so the customer frame never single-partitions (the scale shape
    the ntile form lacks; boundary semantics assign all ties to one bucket
    instead of ntile's equal split, and the oracle uses the same rule).
    Boundary floats are safe cross-engine: adjacent order statistics differ
    by >= one cent / one day, dwarfing interpolation ulp noise, and both
    engines return the tied value exactly when the quantile lands in a
    tie run."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        # o_orderdate arrives TIMESTAMP_NTZ; cast to the (UTC-pinned) session
        # timestamp so unix_millis matches DuckDB's naive-as-UTC epoch_ms
        F.max(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
        .cast("double")
        .alias("last_order_ms"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("monetary"),
    )
    cuts = [0.2, 0.4, 0.6, 0.8]
    bounds = rfm.agg(
        *[F.percentile("last_order_ms", F.lit(c)).alias(f"r{int(c * 100)}") for c in cuts],
        *[
            F.percentile(F.col("frequency").cast("double"), F.lit(c)).alias(f"f{int(c * 100)}")
            for c in cuts
        ],
        *[F.percentile("monetary", F.lit(c)).alias(f"m{int(c * 100)}") for c in cuts],
    )
    scored = rfm.crossJoin(F.broadcast(bounds)).select(
        "custkey",
        "frequency",
        "monetary",
        _quintile_score_col(F.col("last_order_ms"), "r").alias("r_score"),
        _quintile_score_col(F.col("frequency").cast("double"), "f").alias("f_score"),
        _quintile_score_col(F.col("monetary"), "m").alias("m_score"),
    )
    return scored.select(
        "custkey",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


@register(
    "events_autocorr_lag1",
    """WITH seq AS (
      SELECT user_id, CAST(value AS DECIMAL(18,6)) AS x,
             CAST(lag(value) OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS DECIMAL(18,6)) AS y
      FROM events),
    sums AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
      FROM seq WHERE y IS NOT NULL)
    SELECT n_users, n_pairs,
           CASE WHEN (n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy) > 0 THEN
             round((n_pairs * sxy - sx * sy)
                   / sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)), 4)
           END AS autocorr
    FROM sums""",
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of per-user event values: Pearson corr between
    each value and its predecessor — the quick serial-dependence test that
    decides whether the EWMA/anomaly models need a trend term or i.i.d.
    assumptions hold. One per-user lag window (the shared sessionization
    partitioning) + one aggregate of the five exact-DECIMAL sufficient
    statistics; the closed-form ratio is computed from them in double on
    both engines (bit-identical — exact sums pin the summation order), with
    the zero-variance denominator guarded to NULL instead of an ANSI
    DIVIDE_BY_ZERO (a constant-valued series has no defined autocorrelation
    — the round-7 degenerate-input gate's class)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("x"),
        F.lag(F.col("value").cast("decimal(18,6)")).over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    sums = seq.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)")).cast("double").alias("syy"),
    )
    n = F.col("n_pairs")
    den2 = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        "n_users",
        "n_pairs",
        F.when(den2 > 0, F.round(num / F.sqrt(den2), 4)).alias("autocorr"),
    )


_JSD_TOP = 200


@register(
    "documents_source_jsd",
    f"""WITH toks AS (
      SELECT source, unnest({SQL_TOKS}) AS term FROM documents),
    top AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS n FROM toks GROUP BY term
        ORDER BY n DESC, term LIMIT {_JSD_TOP})),
    sc AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
      FROM toks JOIN top USING (term) GROUP BY source, term),
    stot AS (SELECT source, SUM(n) AS t FROM sc GROUP BY source),
    ctot AS (SELECT SUM(n) AS t FROM sc),
    cf AS (SELECT term, SUM(n) AS n FROM sc GROUP BY term),
    probs AS (
      SELECT s.source, s.term,
             CAST(s.n AS DOUBLE) / st.t AS p,
             CAST(c.n AS DOUBLE) / (SELECT t FROM ctot) AS q
      FROM sc s JOIN stot st USING (source) JOIN cf c USING (term)),
    terms AS (
      SELECT source, term, p, q, (p + q) / 2 AS m FROM probs)
    SELECT source,
           round(SUM(CASE WHEN p > 0 THEN p * ln(p / m) / 2 ELSE 0 END)
                 + SUM(CASE WHEN q > 0 THEN q * ln(q / m) / 2 ELSE 0 END), 4) AS jsd
    FROM terms GROUP BY source""",
)
def documents_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift audit: Jensen-Shannon divergence between each
    source's unigram distribution and the corpus-wide distribution, over the
    shared top-200 vocabulary — the mixture-rebalancing signal (a source
    drifting from the corpus either needs a weight change or is
    contaminated/templated). Restricting both distributions to the SAME
    top-V support keeps the sum finite and the frames vocab-sized: one
    token-count aggregate, broadcast totals, and an O(#sources * V)
    divergence sum. Note the per-source absent-term case: p=0 contributes 0
    to the p-side sum (lim x->0 x ln x = 0) while the q-side still pays —
    both engines write it as the same CASE."""
    from .functions.text import tokens as tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens_expr(F.col("text"))).alias("term"))
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(_JSD_TOP)
        .select("term")
    )
    sc = (
        toks.join(F.broadcast(top), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    stot = sc.groupBy("source").agg(F.sum("n").alias("t"))
    ctot = sc.agg(F.sum("n").alias("ct"))
    cf = sc.groupBy("term").agg(F.sum("n").alias("cn"))
    probs = (
        sc.join(F.broadcast(stot), "source")
        .join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            "term",
            (F.col("n").cast("double") / F.col("t")).alias("p"),
            (F.col("cn").cast("double") / F.col("ct")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    return probs.groupBy("source").agg(
        F.round(
            F.sum(F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m) / 2).otherwise(0.0))
            + F.sum(F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m) / 2).otherwise(0.0)),
            4,
        ).alias("jsd")
    )


@register(
    "orders_pareto_share",
    f"""WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey),
    b AS (
      SELECT quantile_cont(CAST(rev AS DOUBLE), 0.2) AS v20,
             quantile_cont(CAST(rev AS DOUBLE), 0.4) AS v40,
             quantile_cont(CAST(rev AS DOUBLE), 0.6) AS v60,
             quantile_cont(CAST(rev AS DOUBLE), 0.8) AS v80
      FROM cust),
    q AS (
      SELECT o_custkey, rev,
             {_quintile_score_sql("CAST(rev AS DOUBLE)", "v")} AS quintile
      FROM cust CROSS JOIN b)
    SELECT quintile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS revenue,
           {sql_exact_ratio("SUM(rev) * 100", "(SELECT SUM(rev) * 100 FROM cust)", 4)} AS share
    FROM q GROUP BY quintile""",
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / revenue-concentration readout: customer revenue quintiles
    (1 = top spenders) and each quintile's share of total — the 80/20 check
    behind both business prioritization and data-skew planning (the same
    heavy-key curve events_key_skew_audit measures on stream keys). DECIMAL
    customer sums make the ordering exact; the four exact quintile
    boundaries reduce to a broadcast 1-row frame and bucket assignment is a
    comparison chain — no global window anywhere, so the O(#customers)
    frame never single-partitions. Boundary semantics put revenue ties in
    one bucket (vs ntile's equal split); the oracle uses the same rule."""
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    cuts = [0.2, 0.4, 0.6, 0.8]
    bounds = cust.agg(
        *[
            F.percentile(F.col("rev").cast("double"), F.lit(c)).alias(f"v{int(c * 100)}")
            for c in cuts
        ]
    )
    q = cust.crossJoin(F.broadcast(bounds)).select(
        "rev",
        _quintile_score_col(F.col("rev").cast("double"), "v").alias("quintile"),
    )
    tot = cust.agg(F.sum("rev").alias("tot_dec"))
    return (
        q.groupBy("quintile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("rev").alias("rev_dec"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "quintile",
            "n_customers",
            F.col("rev_dec").cast("double").alias("revenue"),
            # DECIMAL(_,2) sums are exact in cents: share rides the
            # integer form on cent-scaled BIGINTs (functions/exact.py)
            exact_ratio("rev_dec * 100", "tot_dec * 100", 4).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 batch 5: market-basket affinity, time-series regularization,
# change-point detection, experiment analysis, trend regression
# ---------------------------------------------------------------------------


@register(
    "orders_brand_affinity",
    f"""WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM baskets),
    marg AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_b FROM baskets GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS pair_n
      FROM baskets a JOIN baskets b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand),
    scored AS (
      SELECT brand_a, brand_b, pair_n,
             {sql_exact_ratio("pair_n", "n_orders", 6)} AS support,
             {sql_exact_ratio("pair_n", "ma.n_b", 6)} AS confidence,
             {sql_exact_ratio("CAST(pair_n AS HUGEINT) * n_orders",
                              "CAST(ma.n_b AS HUGEINT) * mb.n_b", 6)} AS lift
      FROM pairs
      JOIN marg ma ON ma.brand = pairs.brand_a
      JOIN marg mb ON mb.brand = pairs.brand_b
      CROSS JOIN n)
    SELECT * FROM scored
    ORDER BY lift DESC, pair_n DESC, brand_a, brand_b
    LIMIT 20""",
)
def orders_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over order baskets: support / confidence /
    lift for brand co-occurrence, top-20 by lift. The curation analog of
    association-rule mining (Agrawal & Srikant, VLDB'94) restricted to
    pairs — the shape a recommendation or mixture-design pass runs over
    trillions of baskets.

    Scale shape: the part dim is broadcast into the lineitem scan (small
    dim at any scale); baskets reduce to DISTINCT (order, brand) map-side;
    the pair self-join keys on the order id, so per-order fan-out is
    bounded by basket size squared (TPC-H baskets are <=7 items), never
    corpus x corpus; marginals are brand-cardinality-sized and broadcast;
    the final top-20 compiles to TakeOrderedAndProject. All counts are
    exact integers until the final rounded divisions, so the oracle
    matches bit-for-bit.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders = baskets.agg(
        F.countDistinct("okey").cast("bigint").alias("n_orders")
    )
    marg = baskets.groupBy("brand").agg(F.count(F.lit(1)).cast("bigint").alias("n_b"))
    a = baskets.select(F.col("okey"), F.col("brand").alias("brand_a"))
    b = baskets.select(F.col("okey"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_n"))
    )
    ma = marg.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("na"))
    mb = marg.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("nb"))
    scored = (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "pair_n",
            exact_ratio("pair_n", "n_orders", 6).alias("support"),
            exact_ratio("pair_n", "na", 6).alias("confidence"),
            # exact-integer lift (r12, closing the class-2 int64-overflow
            # carve-out): the pre-cast DECIMAL(38,0)/HUGEINT product keeps
            # pair_n*n_orders*10^6*2 (~2e30 at the 100 TB target) exact on
            # both engines — no int64 stage ever materializes.
            exact_ratio(
                "CAST(pair_n AS DECIMAL(38,0)) * n_orders",
                "CAST(na AS DECIMAL(38,0)) * nb",
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("pair_n").desc(), "brand_a", "brand_b"
    ).limit(20)


@register(
    "events_hourly_gap_fill",
    """WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS sv
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events),
    spine AS (
      SELECT t.event_type, g.hr
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                  FROM bounds) g),
    joined AS (
      SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS n,
             CASE WHEN h.n IS NOT NULL
                  THEN CAST((CASE WHEN CAST(h.sv * 1000000 AS BIGINT) < 0 THEN -1 ELSE 1 END
                             * ((2 * abs(CAST(h.sv * 1000000 AS BIGINT)) + 100 * h.n)
                                // (200 * h.n))) / 10000.0 AS DOUBLE)
                  END AS avg_value
      FROM spine s LEFT JOIN hourly h
        ON s.event_type = h.event_type AND s.hr = h.hr)
    SELECT event_type, epoch_ms(hr) AS hour_ms, n,
           CASE WHEN n = 0 THEN 1 ELSE 0 END AS is_gap,
           last_value(avg_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
    FROM joined""",
)
def events_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: a dense (event_type, hour) spine over the
    observed range, observed hours carrying their exact count and mean
    value, missing hours emitted as explicit gap rows with the last
    observed mean carried forward. Regular grids are what every downstream
    forecaster/anomaly model consumes; at 100 TB the raw stream never ships
    to the driver — the grid is built FROM a 1-row bounds aggregate.

    Scale shape: the hourly pre-aggregate combines map-side (the only
    corpus-sized shuffle); the spine is sequence() over a broadcast 1-row
    frame cross-joined with the broadcast type dim (#types x #hours rows —
    thousands, not billions); the carry-forward window runs per type over
    that same tiny frame. The mean is DECIMAL-sum / count, so both engines
    derive the identical double.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    types = events.select("event_type").distinct()
    spine = F.broadcast(types).crossJoin(F.broadcast(hours))
    # exact-integer 4-dp mean (lm.exact_mean_4dp_expr discipline): the
    # DECIMAL(18,6) sum divided by a small n lands on .00005 boundaries,
    # where Spark's and DuckDB's round-on-double disagree — first seen on
    # the round-9 sf0.1 full-registry sweep
    avg4 = F.expr(
        "CAST(CASE WHEN CAST(sv * 1000000 AS BIGINT) < 0 THEN -1 ELSE 1 END"
        " * ((2 * abs(CAST(sv * 1000000 AS BIGINT)) + 100 * n)"
        " DIV (200 * n)) AS DOUBLE) / 10000.0"
    )
    joined = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n"),
        F.when(F.col("n").isNotNull(), avg4).alias("avg_value"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.unix_millis("hr").alias("hour_ms"),
        "n",
        F.when(F.col("n") == 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias("is_gap"),
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_avg"),
    )


@register(
    "events_cusum_changepoint",
    """WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS x
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(SUM(x) AS DOUBLE) AS t,
             CAST(COUNT(*) AS BIGINT) AS d
      FROM daily GROUP BY event_type),
    walked AS (
      SELECT daily.event_type, day,
             CAST(SUM(x) OVER (PARTITION BY daily.event_type ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               - (row_number() OVER (PARTITION BY daily.event_type ORDER BY day))
                 * (t / d) AS s,
             d
      FROM daily JOIN tot ON daily.event_type = tot.event_type)
    SELECT event_type, epoch_ms(day) AS change_day_ms,
           round(s, 4) AS cusum_peak, d AS n_days
    FROM (SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY abs(s) DESC, day) AS r
          FROM walked)
    WHERE r = 1""",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type (Page 1954): the
    cumulative sum of deviations of the daily total from the series mean,
    reporting the day where |CUSUM| peaks — where the level most plausibly
    shifted. The drift-monitoring primitive a 100 TB ingest runs per
    source/type to catch upstream behavior changes.

    Scale shape: one map-side-combined daily aggregate is the only
    corpus-sized shuffle; the walk, the per-type totals, and the peak rank
    all run on the O(#types x #days) frame. The cumulative sum is exact
    DECIMAL; the mean subtraction k*(T/D) is written as the identical
    double expression in both engines, so the peak selection is
    deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("x"))
    tot = daily.groupBy("event_type").agg(
        F.sum("x").cast("double").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    widx = Window.partitionBy("event_type").orderBy("day")
    walked = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        (
            F.sum("x").over(wcum).cast("double")
            - F.row_number().over(widx) * (F.col("t") / F.col("d"))
        ).alias("s"),
        "d",
    )
    wpeak = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.col("day")
    )
    return (
        walked.withColumn("r", F.row_number().over(wpeak))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.unix_millis("day").alias("change_day_ms"),
            F.round("s", 4).alias("cusum_peak"),
            F.col("d").alias("n_days"),
        )
    )


@register(
    "events_ab_test",
    f"""WITH assigned AS (
      SELECT user_id,
             {SQL_H15.format(x="CAST(user_id AS VARCHAR)")} % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value > 200
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id),
    arms AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
      FROM assigned GROUP BY variant),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n_users END) AS n_a,
        MAX(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
        MAX(CASE WHEN variant = 1 THEN n_users END) AS n_b,
        MAX(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
      FROM arms)
    SELECT n_a, conv_a, {sql_exact_ratio("conv_a", "n_a", 6)} AS rate_a,
           n_b, conv_b, {sql_exact_ratio("conv_b", "n_b", 6)} AS rate_b,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
             round(
               (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
               / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b)), 4)
           END AS z_score
    FROM wide""",
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users are deterministically
    hash-bucketed into two arms (the md5 idiom every sampler in this repo
    uses — assignment is reproducible across runs and engines), conversion
    is 'made a high-value purchase' (value > 200 — 'ever purchased'
    saturates at 1.0 on this workload, which degenerates the pooled
    variance), and the pooled two-proportion z-score tests the rate
    difference. This is the analysis loop run over every A/B flag at
    production scale.

    Scale shape: per-user conversion reduces map-side (MAX of an
    indicator); the arm rollup is a 2-row aggregate; the z-score is pure
    scalar arithmetic on a 1-row frame. All counts exact integers; the
    z expression is written identically in both engines, and both emit
    NULL when the pooled rate is degenerate (0 or 1) instead of dividing
    by a zero variance.
    """
    from .functions.text import md5_prefix_long

    events = load_table(spark, sf_dir, "events")
    assigned = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("converted")
    ).select(
        (md5_prefix_long(F.col("user_id").cast("string")) % 2).alias("variant"),
        "converted",
    )
    arms = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rate_b - rate_a) / F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    total_conv = F.col("conv_a") + F.col("conv_b")
    total_n = F.col("n_a") + F.col("n_b")
    return wide.select(
        "n_a",
        "conv_a",
        exact_ratio("conv_a", "n_a", 6).alias("rate_a"),
        "n_b",
        "conv_b",
        exact_ratio("conv_b", "n_b", 6).alias("rate_b"),
        F.when((total_conv > 0) & (total_conv < total_n), F.round(z, 4)).alias(
            "z_score"
        ),
    )


@register(
    "events_daily_trend_ols",
    """WITH daily AS (
      SELECT event_type,
             CAST(epoch_ms(date_trunc('day', ts)) / 86400000 AS BIGINT) AS x,
             SUM(CAST(value AS DECIMAL(18,6))) AS y
      FROM events GROUP BY 1, 2),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(x * x) AS sxx,
             SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(CAST(y * y AS DECIMAL(38,6))) AS syy
      FROM daily GROUP BY event_type),
    d AS (
      SELECT event_type, n, sx, sxx, sy, sxy, syy,
             n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS den,
             n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
      FROM sums)
    SELECT event_type, n AS n_days,
           CASE WHEN den <> 0 THEN
             round((n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE)) / den, 6)
           END AS slope,
           CASE WHEN den <> 0 THEN
             round((CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
                   / den * sx) / n, 6)
           END AS intercept,
           CASE WHEN den <> 0 AND deny <> 0 THEN
             round(pow(n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE), 2)
                   / (den * deny), 6)
           END AS r2
    FROM d""",
)
def events_daily_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of daily total value: closed-form OLS slope /
    intercept / R^2 from the five sufficient statistics (n, Sx, Sxx, Sy,
    Sxy, Syy). The trend monitor behind capacity planning and drift
    alerts — and the canonical example of an 'iterative-looking' analysis
    that is really one aggregation pass.

    Scale shape: the daily rollup combines map-side; the sufficient
    statistics are a second tiny aggregate over O(#types x #days) rows;
    everything downstream is scalar math. x is an exact integer epoch-day,
    y an exact DECIMAL daily sum — so Sx/Sxx/Sy/Sxy/Syy are all exact and
    order-independent, and the final doubles match the oracle bit-for-bit.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        (F.unix_millis(F.date_trunc("day", "ts")) / 86400000)
        .cast("bigint")
        .alias("x"),
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("y"))
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,6)")).alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    denom = n * sxx - sx * F.col("sx")
    deny = n * syy - sy * sy
    num = n * sxy - F.col("sx") * sy
    slope = num / denom
    # Degenerate-series guard (ANSI mode raises DIVIDE_BY_ZERO otherwise):
    # a type with a single day has den == 0; zero y-variance zeroes deny.
    # Both engines emit NULL for those rows instead of crashing/diverging.
    ok = denom != F.lit(0.0)
    return sums.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.when(ok, F.round(slope, 6)).alias("slope"),
        F.when(ok, F.round((sy - slope * F.col("sx")) / n, 6)).alias("intercept"),
        F.when(
            ok & (deny != F.lit(0.0)),
            F.round(F.pow(num, F.lit(2)) / (denom * deny), 6),
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Round 6: persisted k-means lifecycle for the clustering consumers
# (build once via operators/ann_index.build_kmeans_index, assign-only probes)
# ---------------------------------------------------------------------------


def _kmeans_index_dir(sf_dir: str) -> str:
    """Repo-local cache path for the persisted k-means centroids over a
    corpus — keyed on corpus identity + every training parameter, same
    contract as _ivf_pq_index_dir."""
    import hashlib

    emb = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb)
    key = hashlib.md5(
        "|".join(
            [
                os.path.abspath(sf_dir), str(st.st_size), str(int(st.st_mtime)),
                "kmeans", "8", "5", _TRAIN_SAMPLE_HEX,
            ]
        ).encode()
    ).hexdigest()[:16]
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ann_index"
    )
    return os.path.join(root, key)


def _kmeans_centroids_cached(spark: SparkSession, sf_dir: str) -> list:
    """Centroids from the persisted index, building it on first use. Every
    later invocation is a pyarrow artifact load (no training jobs)."""
    from .operators import ann_index as ai

    path = _kmeans_index_dir(sf_dir)
    if not ai.index_is_built(path):
        ai.build_kmeans_index(
            load_table(spark, sf_dir, "embeddings"), path, n_clusters=8,
            iterations=5, sample_hex=_TRAIN_SAMPLE_HEX,
        )
    return ai.load_kmeans_centroids(path)


@register("dedup_semantic_indexed_diagnostic", _sql_semantic())
def dedup_semantic_indexed_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup pairs served from the PERSISTED centroid index: one
    assignment scan + the in-cluster pair join, zero Lloyd iterations.
    Training is deterministic, so this is bit-identical to dedup_semantic
    and shares its oracle — the lifecycle mirror of ann_ivf_pq_topk_indexed
    (a recurring curation pipeline reclusters weekly at most; every daily
    dedup pass probes the stored centroids).

    DIAGNOSTIC (round 9, VERDICT r8 item 5): this is the UNCAPPED recall
    reference — its in-cluster pair volume is sum(|c|^2), measured α=1.149
    across the sf1→sf10 decade, so it is deliberately NOT a serving posture
    and is named accordingly. The scale-safe registered form is
    dedup_semantic_indexed_capped (persisted centroids + mega-cluster cap +
    overflow routed through exact vector-value dedup, α=0.71); keep this one
    for recall-vs-capped calibration runs at sampled scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup_pairs(
        emb, threshold=_SEMANTIC_THRESHOLD,
        centroids=_kmeans_centroids_cached(spark, sf_dir),
    )


def _sql_semantic_indexed_capped(
    threshold: float = _SEMANTIC_THRESHOLD, cap: int = _SEMANTIC_MAX_CLUSTER
) -> str:
    """Oracle for the ROUTED capped SemDeDup: the capped cosine-pair branch
    (same HAVING predicate as _sql_semantic_capped) UNION ALL the overflow
    branch — mega-cluster members grouped by their exact (double-cast) vector
    value, star pairs against the min-id canonical, cosine 1.0 by identity
    (0.0 for a zero-norm vector). Float->double widening is exact in both
    engines, so the value-group fingerprint is bit-deterministic."""
    parts = _sql_ivf_parts(n_clusters=8, iterations=5)[:-3]  # ... through af
    parts.append("sz AS (SELECT cluster, COUNT(*) AS n FROM af GROUP BY cluster)")
    parts.append(f"ok AS (SELECT cluster FROM sz WHERE n <= {cap})")
    parts.append(
        f"big AS (SELECT af.* FROM af JOIN sz ON af.cluster = sz.cluster "
        f"WHERE sz.n > {cap})"
    )
    parts.append(
        "canon AS (SELECT cluster, v, MIN(vec_id) AS canon_id "
        "FROM big GROUP BY cluster, v)"
    )
    body = ",\n    ".join(parts)
    cos = SQL_COS.format(a="a.v", b="b.v")
    return f"""WITH {body}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(a.cluster AS BIGINT) AS cluster, round({cos}, 4) AS cosine,
           'cosine' AS method
    FROM af a JOIN af b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    JOIN ok ON ok.cluster = a.cluster
    WHERE {cos} >= {threshold}
    UNION ALL
    SELECT c.canon_id AS vec_a, m.vec_id AS vec_b,
           CAST(m.cluster AS BIGINT) AS cluster,
           CASE WHEN list_dot_product(m.v, m.v) > 0 THEN 1.0 ELSE 0.0 END AS cosine,
           'exact' AS method
    FROM big m JOIN canon c
      ON m.cluster = c.cluster AND m.v = c.v AND m.vec_id <> c.canon_id"""


@register("dedup_semantic_indexed_capped", _sql_semantic_indexed_capped())
def dedup_semantic_indexed_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE serving form of semantic dedup (VERDICT r7 item 1):
    persisted centroids (zero Lloyd iterations per run — the recurring-
    pipeline posture of the uncapped recall reference) COMPOSED with the
    mega-cluster guard, and the guarded overflow ROUTED through exact
    vector-value dedup rather than dropped — star pairs against the min-id
    canonical (operators/similarity.py::semantic_dedup_pairs_routed).

    This retires the one measured super-linear registry query: the cosine
    branch's pair volume is <= n * cap (linear for fixed cap) and the
    overflow branch is one hash agg + one equi-join emitting O(|cluster|)
    star rows — no shape in the plan grows faster than the corpus. The
    uncapped dedup_semantic_indexed_diagnostic stays registered as the oracle-parity
    recall reference."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup_pairs_routed(
        emb, threshold=_SEMANTIC_THRESHOLD,
        max_cluster_size=_SEMANTIC_MAX_CLUSTER,
        centroids=_kmeans_centroids_cached(spark, sf_dir),
    )


_SEMANTIC_CAP_SWEEP = (10, 35, 70, 140)


def _sql_semantic_cap_sweep(caps: tuple = _SEMANTIC_CAP_SWEEP) -> str:
    """Oracle for the cap-calibration sweep: one assignment -> cluster-size
    frame -> per-cap conditional aggregates (grouped by the cap literal, so
    an empty corpus yields zero rows — the grouped-constant contract)."""
    parts = _sql_ivf_parts(n_clusters=8, iterations=5)[:-3]  # ... through af
    parts.append("sz AS (SELECT cluster, COUNT(*) AS sz FROM af GROUP BY cluster)")
    body = ",\n    ".join(parts)
    selects = []
    for cap in caps:
        selects.append(f"""SELECT CAST({cap} AS BIGINT) AS cap,
           CAST(COALESCE(SUM(CASE WHEN sz <= {cap} THEN 1 END), 0) AS BIGINT) AS clusters_kept,
           CAST(COALESCE(SUM(CASE WHEN sz <= {cap} THEN sz END), 0) AS BIGINT) AS rows_kept,
           CAST(COALESCE(SUM(CASE WHEN sz <= {cap} THEN sz * (sz - 1) / 2 END), 0) AS BIGINT) AS candidate_pairs,
           CAST(COALESCE(SUM(CASE WHEN sz > {cap} THEN sz END), 0) AS BIGINT) AS overflow_rows
    FROM sz GROUP BY 1""")
        u = "\n    UNION ALL\n    ".join(selects)
    return f"WITH {body}\n    {u}"


@register("dedup_semantic_cap_sweep", _sql_semantic_cap_sweep())
def dedup_semantic_cap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mega-cluster-cap calibration sweep (round 8, companion to the
    dedup_semantic_indexed_capped posture flip): before picking
    max_cluster_size for a 100 TB SemDeDup run, read the tradeoff off the
    cluster-size distribution — per candidate cap: clusters kept, rows kept
    in the exact-cosine branch, the branch's candidate-pair volume
    (sum sz*(sz-1)/2 — the quantity the cap exists to bound), and the rows
    routed to exact fingerprint dedup instead.

    The whole sweep costs ONE assignment scan + ONE n_clusters-row
    aggregate; each cap is a conditional aggregate over that tiny frame —
    the lsh_band_sweep discipline (never re-assign, never a pair join) with
    a sizes-only analytic core. Serves from the persisted centroid index.
    The sweep body lives in similarity.semantic_cap_sweep, shared with the
    `tune semantic-cap` CLI; choose_semantic_cap turns the readout into a
    max_cluster_size default."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_cap_sweep(
        emb, _SEMANTIC_CAP_SWEEP,
        centroids=_kmeans_centroids_cached(spark, sf_dir),
    )


def _sql_semantic_delta(
    threshold: float = _SEMANTIC_THRESHOLD, cap: int = _SEMANTIC_MAX_CLUSTER
) -> str:
    """Oracle for incremental SemDeDup: pairs touching the odd-id 'today'
    delta — corpus x delta within (capped) clusters, canonicalized and
    DISTINCT-reduced (a delta-delta pair arrives from both directions)."""
    parts = _sql_ivf_parts(n_clusters=8, iterations=5)[:-3]  # ... through af
    parts.append(
        f"ok AS (SELECT cluster FROM af GROUP BY cluster HAVING COUNT(*) <= {cap})"
    )
    parts.append("d AS (SELECT * FROM af WHERE vec_id % 2 = 1)")
    body = ",\n    ".join(parts)
    cos = SQL_COS.format(a="a.v", b="d.v")
    return f"""WITH {body}
    SELECT DISTINCT LEAST(a.vec_id, d.vec_id) AS vec_a,
           GREATEST(a.vec_id, d.vec_id) AS vec_b,
           CAST(a.cluster AS BIGINT) AS cluster, round({cos}, 4) AS cosine
    FROM af a JOIN d ON a.cluster = d.cluster AND a.vec_id <> d.vec_id
    JOIN ok ON ok.cluster = a.cluster
    WHERE {cos} >= {threshold}"""


@register("dedup_semantic_incremental", _sql_semantic_delta())
def dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental semantic dedup (round 8): only pairs touching 'today's
    arrivals' (odd vec_ids stand in for the daily delta), joined
    delta-vs-corpus within persisted-centroid clusters under the
    mega-cluster cap — candidate volume |delta| x cluster occupancy, never
    the corpus self-join (operators/similarity.py::semantic_dedup_pairs_delta).
    The vector twin of dedup_incremental_bloom: a recurring pipeline dedups
    each ingest batch against the corpus, not the corpus against itself."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup_pairs_delta(
        emb,
        emb.filter(F.col("vec_id") % 2 == 1),
        threshold=_SEMANTIC_THRESHOLD,
        max_cluster_size=_SEMANTIC_MAX_CLUSTER,
        centroids=_kmeans_centroids_cached(spark, sf_dir),
    )


def _sql_semantic_delta_disjoint(
    threshold: float = _SEMANTIC_THRESHOLD, cap: int = _SEMANTIC_MAX_CLUSTER
) -> str:
    """Oracle for cold-start incremental SemDeDup: corpus and delta are
    DISJOINT halves (even/odd vec_ids), so the cap must be applied as an
    exclusion of clusters OVERSIZED on the corpus side — a cluster with
    zero corpus members has occupancy 0 <= cap and keeps its delta rows
    (the ADVICE r9 contract). Pairs = corpus x delta plus delta x delta,
    both within kept clusters, canonicalized and UNION-deduplicated."""
    parts = _sql_ivf_parts(n_clusters=8, iterations=5)[:-3]  # ... through af
    parts.append("c AS (SELECT * FROM af WHERE vec_id % 2 = 0)")
    parts.append("d AS (SELECT * FROM af WHERE vec_id % 2 = 1)")
    parts.append(
        f"big AS (SELECT cluster FROM c GROUP BY cluster HAVING COUNT(*) > {cap})"
    )
    parts.append(
        "cf AS (SELECT * FROM c WHERE cluster NOT IN (SELECT cluster FROM big))"
    )
    parts.append(
        "df AS (SELECT * FROM d WHERE cluster NOT IN (SELECT cluster FROM big))"
    )
    body = ",\n    ".join(parts)
    cos = SQL_COS.format(a="a.v", b="b.v")
    return f"""WITH {body}
    SELECT DISTINCT LEAST(a.vec_id, b.vec_id) AS vec_a,
           GREATEST(a.vec_id, b.vec_id) AS vec_b,
           CAST(a.cluster AS BIGINT) AS cluster, round({cos}, 4) AS cosine
    FROM cf a JOIN df b ON a.cluster = b.cluster
    WHERE {cos} >= {threshold}
    UNION
    SELECT LEAST(a.vec_id, b.vec_id) AS vec_a,
           GREATEST(a.vec_id, b.vec_id) AS vec_b,
           CAST(a.cluster AS BIGINT) AS cluster, round({cos}, 4) AS cosine
    FROM df a JOIN df b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE {cos} >= {threshold}"""


@register("dedup_semantic_delta_coldstart", _sql_semantic_delta_disjoint())
def dedup_semantic_delta_coldstart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start incremental semantic dedup (round 10): the delta is
    DISJOINT from the corpus — the first ingest day against a warehouse
    that has never seen these rows (even ids = corpus, odd ids = arrivals).
    Exercises both branches of semantic_dedup_pairs_delta end-to-end:
    corpus-vs-delta pairs AND duplicates among the arrivals themselves,
    under the mega-cluster cap applied as an anti-join against clusters
    oversized ON THE CORPUS SIDE — so arrivals landing in a cluster the
    corpus has never populated (occupancy 0 <= cap) are kept, the ADVICE r9
    contract (operators/similarity.py::semantic_dedup_pairs_delta).
    dedup_semantic_incremental covers the steady-state posture (delta
    already merged); this covers day zero."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup_pairs_delta(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        threshold=_SEMANTIC_THRESHOLD,
        max_cluster_size=_SEMANTIC_MAX_CLUSTER,
        centroids=_kmeans_centroids_cached(spark, sf_dir),
    )


@register("embeddings_cluster_sizes_indexed", _sql_cluster_sizes())
def embeddings_cluster_sizes_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balance audit probing the persisted centroids: assignment +
    one map-side-combined aggregate, no training. Same oracle as the inline
    form (bit-identical by training determinism)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _cluster_sizes_body(emb, _kmeans_centroids_cached(spark, sf_dir))


@register("embeddings_kmeans_inertia_indexed", _sql_kmeans_inertia())
def embeddings_kmeans_inertia_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inertia/compactness diagnostic probing the persisted centroids:
    assignment + map-side distance fold, no training. Same oracle as the
    inline form. The pair (cluster_sizes, inertia) over one stored index is
    the standing data-quality dashboard a 100 TB embedding corpus runs
    nightly — the 3-5 s/invocation Lloyd retrain amortizes to zero."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _kmeans_inertia_body(emb, _kmeans_centroids_cached(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round 6: time-series profiles (RANGE-frame rolling window, seasonality,
# grouped exact-quartile boxplot audit) — windows only on pre-aggregated
# O(#types x #days) frames, never on the raw stream
# ---------------------------------------------------------------------------


@register(
    "events_rolling_7d",
    """WITH daily AS (
      SELECT event_type,
             CAST(epoch_ms(date_trunc('day', ts)) / 86400000 AS BIGINT) AS day_num,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sv6
      FROM events GROUP BY 1, 2),
    win AS (
      SELECT event_type, day_num, n,
             CAST(SUM(n) OVER w AS BIGINT) AS n_7d,
             CAST(SUM(sv6) OVER w AS BIGINT) AS sv6_7d
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_num
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, day_num * 86400000 AS day_ms, n, n_7d,
           CAST((2 * sv6_7d * 10000 + n_7d * 1000000)
                // (2 * n_7d * 1000000) AS DOUBLE) / 10000 AS avg_value_7d
    FROM win""",
)
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling volume and mean value per event type — the
    smoothing every ops dashboard and drift monitor applies before eyeballing
    a daily series. The frame is RANGE over an integer epoch-day (not ROWS):
    a day missing from the series correctly falls out of the trailing window
    instead of silently stretching it — the distinction that matters on
    sparse/gappy types.

    Scale shape: the daily rollup combines map-side (the only corpus-sized
    shuffle); the RANGE window is partitioned per type over the
    O(#types x #days) frame.

    The rolling mean rounds at 4 dp IN EXACT INTEGER ARITHMETIC — micro-unit
    daily sums (value is positive, <= 6 dp) windowed as bigints, then
    round-half-up as (2a + b) div (2b) — because a sum of 6-dp decimals
    divided by a count lands exactly on .00005 boundaries often enough that
    float round() diverges between engines (Spark rounds the shortest
    decimal repr, DuckDB rounds the binary double; observed on this corpus).
    int64 headroom: 2 * sv6 * 1e4 needs the 7-day micro-unit sum below
    ~4.6e14 (~4.6e8 in value units); a deployment beyond that widens the
    same expressions to DECIMAL(38,0)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        (F.unix_millis(F.date_trunc("day", "ts")) / 86400000)
        .cast("bigint")
        .alias("day_num"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
        .cast("bigint")
        .alias("sv6"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    win = daily.select(
        "event_type",
        "day_num",
        "n",
        F.sum("n").over(w).cast("bigint").alias("n_7d"),
        F.sum("sv6").over(w).cast("bigint").alias("sv6_7d"),
    )
    return win.select(
        "event_type",
        (F.col("day_num") * 86400000).alias("day_ms"),
        "n",
        "n_7d",
        (
            F.expr(
                "(2 * sv6_7d * 10000 + n_7d * 1000000) div (2 * n_7d * 1000000)"
            ).cast("double")
            / 10000
        ).alias("avg_value_7d"),
    )


@register(
    "events_dow_seasonality",
    f"""WITH base AS (
      SELECT event_type, dayofweek(ts) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS sv
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, SUM(sv) AS sv_all, CAST(SUM(n) AS BIGINT) AS n_all
      FROM base GROUP BY event_type)
    SELECT b.event_type, CAST(b.dow AS BIGINT) AS dow, b.n,
           {sql_exact_ratio("b.sv * 1000000", "CAST(b.n AS HUGEINT) * 1000000", 4)} AS mean_value,
           {sql_exact_ratio("CAST(b.sv * 1000000 AS HUGEINT) * t.n_all",
                            "CAST(t.sv_all * 1000000 AS HUGEINT) * b.n", 4)} AS seasonal_index
    FROM base b JOIN tot t ON b.event_type = t.event_type""",
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: volume, mean value,
    and the seasonal index (dow mean / overall mean — 1.0 = flat) — the
    profile a forecaster or anomaly model conditions on, and the quick
    'is weekend traffic different' audit. Sunday = 0 in both engines
    (DuckDB dayofweek; Spark dayofweek()-1).

    Scale shape: one map-side-combined aggregate to O(#types x 7) rows; the
    per-type overall mean is derived FROM those partials (no second corpus
    scan) and broadcast back."""
    events = load_table(spark, sf_dir, "events")
    base = events.groupBy(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    )
    tot = base.groupBy("event_type").agg(
        F.sum("sv").alias("sv_all"),
        F.sum("n").cast("bigint").alias("n_all"),
    )
    # both emissions ride the exact-integer discipline (functions/exact.py):
    # mean_value as the 1e-6-grain DECIMAL-sum / count mean at 4 dp, and
    # seasonal_index (r12, the last class-2 carve-out) as the exact rational
    # (sv_dow * n_all) / (sv_all * n). Headroom (ADVICE r12): the binding
    # term is the helper's internal 2*10^dp*|num|, so at dp=4 the raw
    # numerator sv_units * n_all must stay under ~1.7e38 / 2e4 ≈ 8.5e33.
    # At the tested scales it is tiny (sf10: sv_units ~1e13, n_all ~1e7 per
    # type → ~1e20); at a pathological 100 TB single-type corpus it could
    # reach ~1e36 and the widened arithmetic would then fail LOUDLY
    # (Spark DECIMAL overflow / DuckDB HUGEINT conversion error), never
    # silently — the mitigation at that scale is a coarser value grain
    # (1e-3 units shave 3 orders) since the grain cancels in the ratio.
    # The helper's den<>0 guard reproduces the old "mean_all == 0 ->
    # NULL" degenerate behavior (round-7 gate) with the sign well-defined
    # for negative-sum types.
    return base.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        "n",
        exact_ratio(
            "sv * 1000000", "CAST(n AS DECIMAL(38,0)) * 1000000", 4
        ).alias("mean_value"),
        exact_ratio(
            "CAST(sv * 1000000 AS DECIMAL(38,0)) * n_all",
            "CAST(sv_all * 1000000 AS DECIMAL(38,0)) * n",
            4,
        ).alias("seasonal_index"),
    )


@register(
    "events_type_value_iqr",
    """WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.5) AS median,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type),
    fences AS (
      SELECT event_type, n, q1, median, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
      FROM stats)
    SELECT f.event_type, f.n,
           round(f.q1, 4) AS q1, round(f.median, 4) AS median,
           round(f.q3, 4) AS q3, round(f.q3 - f.q1, 4) AS iqr,
           CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN fences f ON e.event_type = f.event_type
    GROUP BY f.event_type, f.n, f.q1, f.median, f.q3""",
)
def events_type_value_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boxplot/Tukey-fence audit per event type: exact quartiles, IQR, and
    the count of values outside the 1.5-IQR fences — the robust-outlier
    readout next to events_anomaly_mad (quartile-based where MAD is
    median-based; both survive heavy tails where z-scores saturate).

    Scale shape: the exact-percentile aggregate reduces per type (Spark's
    percentile is a typed-aggregate; one pass), the O(#types) fence frame is
    broadcast back, and the outlier count is a map-side conditional sum over
    one more scan — two scans total, no window, no sort of the raw stream.
    Quartile floats are safe cross-engine: (n-1)/4 fractional parts are
    quarters, so interpolated cuts sit >= 0.25 * neighbor-gap inside the
    interval, dwarfing formula-order ulp noise."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.5)).alias("median"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    fences = stats.select(
        "event_type", "n", "q1", "median", "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        events.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "n", "q1", "median", "q3")
        .agg(
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.round("q1", 4).alias("q1"),
            F.round("median", 4).alias("median"),
            F.round("q3", 4).alias("q3"),
            F.round(F.col("q3") - F.col("q1"), 4).alias("iqr"),
            "n_outliers",
        )
    )


def _bm25_index_dir(sf_dir: str) -> str:
    """Repo-local cache path for the persisted BM25 impact index — keyed on
    the documents corpus identity + scoring parameters, same contract as
    _ivf_pq_index_dir."""
    import hashlib

    doc = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc)
    key = hashlib.md5(
        "|".join(
            [
                os.path.abspath(sf_dir), str(st.st_size), str(int(st.st_mtime)),
                "bm25", str(ret.BM25_K1), str(ret.BM25_B), "32",
            ]
        ).encode()
    ).hexdigest()[:16]
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ann_index"
    )
    return os.path.join(root, key)


@register("documents_bm25_topk_indexed", _sql_bm25_topk())
def documents_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 'more-like-this' served from the PERSISTED impact index
    (operators/lexical_index.py): query terms derive from the stored
    postings, the probe scans only the query terms' md5-bucket partitions,
    and scoring is one broadcast join + DECIMAL impact sum — no tokenize,
    no lengths/idf/statistics jobs. Impacts share the inline scorer's exact
    expression, so the inline oracle covers this bit-for-bit — the lexical
    mirror of ann_ivf_pq_topk_indexed."""
    from .operators import lexical_index as lx

    path = _bm25_index_dir(sf_dir)
    if not lx.index_is_built(path):
        lx.build_bm25_index(load_table(spark, sf_dir, "documents"), path)
    qterms = lx.derive_query_terms_from_index(
        spark, path, RETRIEVAL_N_QUERIES, RETRIEVAL_TERMS_PER_QUERY
    )
    out = lx.bm25_index_probe(spark, path, qterms, k=BM25_TOPK)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


def _sql_hybrid_rrf_indexed() -> str:
    """Fully index-served hybrid oracle: the BM25 CTE chain fused with the
    IVF-PQ CTE chain (both replayed exactly — training determinism), RRF
    identical to _sql_hybrid_rrf. The vector pool restricts to the hybrid's
    query set (query_id < RETRIEVAL_N_QUERIES; the IVF-PQ probes CTE spans
    ANN_QUERY_MAX_ID queries)."""
    parts = _sql_bm25_parts(RETRIEVAL_N_QUERIES, RETRIEVAL_TERMS_PER_QUERY)
    parts += _sql_ivf_pq_parts()
    body = ",\n    ".join(parts)
    return f"""WITH {body},
    ltop AS (SELECT query_id, neighbor_id, rank FROM bm25_ranked WHERE rank <= {HYBRID_POOL_K}),
    vtop AS (SELECT query_id, neighbor_id, rank FROM ranked
             WHERE rank <= {HYBRID_POOL_K} AND query_id < {RETRIEVAL_N_QUERIES}),
    fused AS (SELECT COALESCE(l.query_id, v.query_id) AS query_id,
                     COALESCE(l.neighbor_id, v.neighbor_id) AS neighbor_id,
                     l.rank AS lex_rank, v.rank AS vec_rank,
                     COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.rank), 0.0)
                     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.rank), 0.0) AS rrf
              FROM ltop l FULL OUTER JOIN vtop v
              ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id),
    hranked AS (SELECT *, row_number() OVER
                (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rank FROM fused)
    SELECT query_id, neighbor_id, round(rrf, 6) AS rrf_score,
           CAST(lex_rank AS BIGINT) AS lex_rank, CAST(vec_rank AS BIGINT) AS vec_rank,
           CAST(rank AS BIGINT) AS rank
    FROM hranked WHERE rank <= {HYBRID_TOPK}"""


@register("hybrid_search_rrf_indexed", _sql_hybrid_rrf_indexed())
def hybrid_search_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving capstone: hybrid retrieval where BOTH rankers probe
    persisted indexes — BM25 from the impact index (term-bucket-pruned
    scan, precomputed contributions) and the vector side from the IVF-PQ
    index (cluster-pruned codes, ADC scoring) — fused by reciprocal rank.
    Zero training jobs, zero corpus statistics jobs, no corpus text or
    float-vector reads: this is the standing query a deployed search
    service answers from. Both probes are bit-identical to their inline
    trainers, so the composed oracle replays both chains exactly."""
    from .operators import ann_index as ai
    from .operators import lexical_index as lx

    bm25_path = _bm25_index_dir(sf_dir)
    if not lx.index_is_built(bm25_path):
        lx.build_bm25_index(load_table(spark, sf_dir, "documents"), bm25_path)
    ivf_path = _ivf_pq_index_dir(sf_dir)
    if not ai.index_is_built(ivf_path):
        ai.build_ivf_pq_index(
            load_table(spark, sf_dir, "embeddings"), ivf_path, n_clusters=8,
            sample_hex=_TRAIN_SAMPLE_HEX,
        )
    qterms = lx.derive_query_terms_from_index(
        spark, bm25_path, RETRIEVAL_N_QUERIES, RETRIEVAL_TERMS_PER_QUERY
    )
    lex = lx.bm25_index_probe(spark, bm25_path, qterms, k=HYBRID_POOL_K)
    emb = load_table(spark, sf_dir, "embeddings")
    vq = emb.filter(F.col("vec_id") < RETRIEVAL_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    vec = ai.ivf_pq_probe(spark, ivf_path, vq, k=HYBRID_POOL_K, n_probe=2)
    return ret.rrf_fuse(lex, vec, k=HYBRID_TOPK)


def _sql_ivfpq_recall() -> str:
    """Recall@k oracle for the composed IVF-PQ tier: the full ivf-pq CTE
    chain (coarse pruning x ADC reconstruction) vs the exact brute-force
    top-k."""
    parts = _sql_ivf_pq_parts()
    parts.append(
        f"ivfpq AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= {ANN_K})"
    )
    parts.append(f"""bf_scored AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             {SQL_COS.format(a='q.v', b='b.v')} AS score
      FROM (SELECT vec_id, v FROM base WHERE vec_id < {ANN_QUERY_MAX_ID}) q
      CROSS JOIN base b)""")
    parts.append(f"""bf AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM bf_scored QUALIFY rank <= {ANN_K})""")
    parts.append("""hits AS (
      SELECT bf.query_id, CAST(COUNT(ivfpq.neighbor_id) AS BIGINT) AS hits
      FROM bf LEFT JOIN ivfpq
        ON bf.query_id = ivfpq.query_id AND bf.neighbor_id = ivfpq.neighbor_id
      GROUP BY bf.query_id)""")
    body = ",\n    ".join(parts)
    return f"""WITH {body}
    SELECT query_id, hits, {sql_exact_ratio("hits", str(ANN_K), 4)} AS recall FROM hits"""


@register("ann_recall_ivfpq", _sql_ivfpq_recall())
def ann_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the composed IVF-PQ tier (coarse pruning AND quantized
    reconstruction — BOTH loss sources) against exact brute force, served
    from the persisted index. Completes the recall family
    (lsh/ivf/hamming/ivfpq): the number a deployment watches when turning
    the n_probe / codebook-size knobs, since PQ distortion compounds with
    coarse-probe misses in ways neither per-tier gate shows alone."""
    from .operators import ann_index as ai

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = _queries_df(spark, sf_dir)
    bf = sim.brute_force_topk(emb, qdf, k=ANN_K).select("query_id", "neighbor_id")
    path = _ivf_pq_index_dir(sf_dir)
    if not ai.index_is_built(path):
        ai.build_ivf_pq_index(emb, path, n_clusters=8, sample_hex=_TRAIN_SAMPLE_HEX)
    pq = ai.ivf_pq_probe(spark, path, qdf, k=ANN_K, n_probe=2).select(
        F.col("query_id").alias("i_qid"), F.col("neighbor_id").alias("i_nid")
    )
    hits = (
        bf.join(
            pq,
            (F.col("query_id") == F.col("i_qid"))
            & (F.col("neighbor_id") == F.col("i_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("i_nid").cast("bigint").alias("hits"))
    )
    return hits.select(
        "query_id",
        "hits",
        exact_ratio("hits", str(ANN_K), 4).alias("recall"),
    )


_BUDGET_TOKENS = 20000
_BUDGET_ALPHA_SQL = "sqrt"  # temperature 0.5 == square root


@register(
    "documents_token_budget_mix",
    f"""WITH toks AS (
      SELECT doc_id, source, CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
             {SQL_H15.format(x="'budget:' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents),
    tot AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS t,
             CAST(round(sqrt(CAST(SUM(n_tokens) AS DOUBLE)), 6) AS DECIMAL(28,6)) AS sq
      FROM toks GROUP BY source),
    den AS (SELECT SUM(sq) AS sqt FROM tot),
    budgets AS (
      SELECT source, t,
             {_BUDGET_TOKENS} * (CAST(sq AS DOUBLE) / CAST(sqt AS DOUBLE)) AS budget
      FROM tot CROSS JOIN den),
    walked AS (
      SELECT k.doc_id, k.source, k.n_tokens,
             CAST(SUM(k.n_tokens) OVER (PARTITION BY k.source
                  ORDER BY k.h, k.doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
             b.budget
      FROM toks k JOIN budgets b ON k.source = b.source)
    SELECT doc_id, source, n_tokens, cum_tokens,
           cum_tokens <= budget AS kept
    FROM walked""",
)
def documents_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture allocation: split a global token budget across
    sources by temperature-0.5 multinomial weights (sqrt of source token
    mass, the standard upsample-the-tail mixing rule), then fill each
    source's budget in deterministic salted-hash order — the allocator that
    turns 'mixture weights' into an actual reproducible document manifest
    (weights alone don't say WHICH documents ship).

    Scale shape: one token-count scan; per-source totals are an O(#sources)
    broadcast; the fill order is a per-source partitioned cumsum window over
    the doc-level frame (the domain-cap posture — a pathologically dominant
    source would use group_cap's two-phase prune first). Cross-engine
    determinism: sqrt is IEEE-exact, each sqrt rounds to 6 dp DECIMAL before
    the (order-sensitive) sum, the budget double derives from identical
    expressions, and the fill order ties break on doc_id."""
    from .functions.text import md5_prefix_long, tokens as tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(tokens_expr(F.col("text"))).cast("bigint").alias("n_tokens"),
        md5_prefix_long(
            F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    tot = toks.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("t"),
        F.round(F.sqrt(F.sum("n_tokens").cast("double")), 6)
        .cast("decimal(28,6)")
        .alias("sq"),
    )
    den = tot.agg(F.sum("sq").alias("sqt"))
    budgets = tot.crossJoin(F.broadcast(den)).select(
        "source",
        (
            F.lit(_BUDGET_TOKENS)
            * (F.col("sq").cast("double") / F.col("sqt").cast("double"))
        ).alias("budget"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = toks.join(F.broadcast(budgets), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
        "budget",
    )
    return walked.select(
        "doc_id",
        "source",
        "n_tokens",
        "cum_tokens",
        (F.col("cum_tokens") <= F.col("budget")).alias("kept"),
    )


@register(
    "orders_priority_revenue_salted",
    """SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority""",
)
def orders_priority_revenue_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through a SALTED fact-dim join
    (operators/skew.py::salted_join): the manual hot-key mitigation when a
    dimension is too big to broadcast and AQE's skew splitting can't help a
    hash join. The oracle is the PLAIN join — the hash gate proves salting
    is lossless (same proof pattern as cdc_last_state_wins_salted on the
    aggregation side; together they cover both halves of the skew toolkit).
    DECIMAL revenue keeps the rollup order-independent."""
    from .operators.skew import salted_join

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(lineitem, orders, on=["l_orderkey"])
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
        )
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Round 6, late batch: burst detection, cross-source overlap matrix,
# embedding-dimension health
# ---------------------------------------------------------------------------


@register(
    "events_burst_hours",
    """WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
             sqrt(CAST(SUM(n * n) AS DOUBLE) / COUNT(*)
                  - (CAST(SUM(n) AS DOUBLE) / COUNT(*))
                    * (CAST(SUM(n) AS DOUBLE) / COUNT(*))) AS sigma
      FROM hourly GROUP BY event_type)
    SELECT h.event_type, epoch_ms(h.hr) AS hour_ms, h.n,
           round(s.mu, 4) AS mean_hourly,
           round((h.n - s.mu) / s.sigma, 4) AS z
    FROM hourly h JOIN stats s ON h.event_type = s.event_type
    WHERE s.sigma > 0 AND h.n > s.mu + 3 * s.sigma""",
)
def events_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst/spike detection per event type: hours whose count exceeds the
    type's mean by 3 population sigmas — the alerting complement to
    events_cusum_changepoint (CUSUM finds sustained level SHIFTS; this
    finds transient SPIKES — a crawler burst, a retry storm, an ingest
    replay). Zero-variance types are excluded rather than divided by.

    Scale shape: the hourly rollup combines map-side (only corpus-sized
    shuffle); mean and sigma derive from exact integer sums over the
    O(#types x #hours) frame (sqrt of identical doubles is IEEE-exact in
    both engines), broadcast back as an O(#types) frame."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cnt = F.count(F.lit(1))
    mu = F.sum("n").cast("double") / cnt
    stats = hourly.groupBy("event_type").agg(
        cnt.cast("bigint").alias("n_hours"),
        mu.alias("mu"),
        F.sqrt(F.sum(F.col("n") * F.col("n")).cast("double") / cnt - mu * mu).alias(
            "sigma"
        ),
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.col("n") > F.col("mu") + 3 * F.col("sigma")))
        .select(
            "event_type",
            F.unix_millis("hr").alias("hour_ms"),
            "n",
            F.round("mu", 4).alias("mean_hourly"),
            F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
        )
    )


@register(
    "documents_source_overlap",
    f"""WITH toks AS (SELECT doc_id, source, {SQL_TOKS} AS ts FROM documents),
    occ AS (SELECT DISTINCT source,
                   {SQL_H15.format(x="array_to_string(ts[i:i+7], ' ')")} AS h
            FROM toks, unnest(range(1, len(ts) - 6)) AS u(i)
            WHERE len(ts) >= 8),
    marg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_spans
             FROM occ GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM occ a JOIN occ b ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT p.source_a, p.source_b, p.shared,
           ma.n_spans AS spans_a, mb.n_spans AS spans_b,
           {sql_exact_ratio("p.shared", "ma.n_spans + mb.n_spans - p.shared", 6)} AS jaccard
    FROM pairs p
    JOIN marg ma ON ma.source = p.source_a
    JOIN marg mb ON mb.source = p.source_b""",
)
def documents_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: Jaccard overlap of distinct 8-token
    span sets between every source pair — the mixture-design diagnostic
    that says which sources are copying each other (inter-source overlap
    inflates a source's effective weight; the fix is dedup before mixing,
    and this matrix says where). Same span definition as the Lee-et-al.
    substring family.

    Scale shape: spans hash to 8-byte keys BEFORE the distinct (the shuffle
    carries (source, int64), never span text); the span-keyed equi-join's
    fan-out per span is bounded by #sources; marginals and the pair matrix
    are O(#sources^2) and broadcast."""
    from .functions.text import md5_prefix_long
    from .operators.dedup import _span_arrays

    docs = load_table(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "source", F.explode(_span_arrays(F.col("text"), 8)).alias("span")
        )
        .select("source", md5_prefix_long(F.col("span")).alias("h"))
        .distinct()
    )
    marg = occ.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_spans"))
    a = occ.select(F.col("source").alias("source_a"), "h")
    b = occ.select(F.col("source").alias("source_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    ma = marg.select(F.col("source").alias("source_a"), F.col("n_spans").alias("spans_a"))
    mb = marg.select(F.col("source").alias("source_b"), F.col("n_spans").alias("spans_b"))
    return (
        pairs.join(F.broadcast(ma), "source_a")
        .join(F.broadcast(mb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared",
            "spans_a",
            "spans_b",
            exact_ratio("shared", "spans_a + spans_b - shared", 6).alias(
                "jaccard"
            ),
        )
    )


@register(
    "embeddings_dim_stats",
    """WITH vals AS (
      SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings,
           unnest(range(1, len(embedding) + 1)) AS u(i)),
    iv AS (
      SELECT dim,
             CAST(CAST(v AS DECIMAL(28,12)) * 1000000000000 AS BIGINT) AS v12
      FROM vals),
    agg AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v12) AS HUGEINT) AS si,
             SUM(CAST(v12 AS HUGEINT) * v12) AS s2i
      FROM iv GROUP BY dim)
    SELECT CAST(dim AS BIGINT) AS dim, n,
           CAST(CASE WHEN si >= 0
             THEN (2*si*1000000 + n*1000000000000) // (2*n*1000000000000)
             ELSE -((-2*si*1000000 + n*1000000000000) // (2*n*1000000000000))
           END AS DOUBLE) / 1000000 AS mean,
           CAST((2*(n*s2i - si*si)*1000000
                 + n*n*CAST(1000000000000 AS HUGEINT)*1000000000000)
                // (2*n*n*CAST(1000000000000 AS HUGEINT)*1000000000000)
                AS DOUBLE) / 1000000 AS variance
    FROM agg""",
)
def embeddings_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding space — the vector-
    health audit next to embeddings_norm_audit: a dimension with ~zero
    variance is dead capacity (and breaks whitening/standardization), a
    mean far from 0 says the encoder output is uncentered, and a variance
    outlier dominates every L2-based index. The moments round at 6 dp IN
    EXACT INTEGER ARITHMETIC (values quantized to 12-dp micro-units, the
    variance as (n*s2 - s^2)/(n^2 * 1e24), half-away-from-zero via the
    (2a+b) div (2b) idiom on DECIMAL(38,0)) — the float form s2/n - mean^2
    cancels catastrophically and its 6-dp round diverged between engines on
    this corpus. One posexplode scan, one map-side-combined aggregate to
    O(dim) rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    iv = vals.select(
        "dim",
        (F.col("v").cast("decimal(28,12)") * 1000000000000)
        .cast("bigint")
        .alias("v12"),
    )
    agg = iv.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v12").cast("decimal(38,0)").alias("si"),
        F.sum(F.col("v12").cast("decimal(20,0)") * F.col("v12").cast("decimal(20,0)"))
        .cast("decimal(38,0)")
        .alias("s2i"),
    )
    e12 = "CAST(1000000000000 AS DECIMAL(38,0))"
    mean6 = (
        f"CASE WHEN si >= 0 THEN (2*si*1000000 + n*{e12}) div (2*n*{e12}) "
        f"ELSE -((-2*si*1000000 + n*{e12}) div (2*n*{e12})) END"
    )
    var6 = (
        f"(2*(n*s2i - si*si)*1000000 + n*n*{e12}*{e12}) div (2*n*n*{e12}*{e12})"
    )
    return agg.select(
        F.col("dim").cast("bigint").alias("dim"),
        "n",
        (F.expr(mean6).cast("double") / 1000000).alias("mean"),
        (F.expr(var6).cast("double") / 1000000).alias("variance"),
    )


# ---------------------------------------------------------------------------
# Round 7: analytics additions (Welch t-test, hourly entropy, ship latency)
# ---------------------------------------------------------------------------

_TT_A, _TT_B = "purchase", "click"


@register(
    "events_welch_ttest",
    f"""WITH s AS (
      SELECT
        CAST(COUNT(CASE WHEN event_type = '{_TT_A}' THEN 1 END) AS BIGINT) AS n_a,
        CAST(COUNT(CASE WHEN event_type = '{_TT_B}' THEN 1 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN event_type = '{_TT_A}' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sa,
        CAST(SUM(CASE WHEN event_type = '{_TT_B}' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sb,
        CAST(SUM(CASE WHEN event_type = '{_TT_A}' THEN CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12)) END) AS DOUBLE) AS sxxa,
        CAST(SUM(CASE WHEN event_type = '{_TT_B}' THEN CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,12)) END) AS DOUBLE) AS sxxb
      FROM events),
    m AS (
      SELECT n_a, n_b,
             CASE WHEN n_a > 0 THEN sa / n_a END AS ma,
             CASE WHEN n_b > 0 THEN sb / n_b END AS mb,
             CASE WHEN n_a >= 2 THEN (n_a * sxxa - sa * sa) / (n_a * (n_a - 1)) END AS va,
             CASE WHEN n_b >= 2 THEN (n_b * sxxb - sb * sb) / (n_b * (n_b - 1)) END AS vb
      FROM s),
    d AS (
      SELECT n_a, n_b, ma, mb, va, vb,
             CASE WHEN va IS NOT NULL AND vb IS NOT NULL
                  THEN va / n_a + vb / n_b END AS se2
      FROM m)
    SELECT n_a, n_b,
           round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
           CASE WHEN se2 > 0 THEN round((ma - mb) / sqrt(se2), 4) END AS t_stat,
           CASE WHEN se2 > 0 AND ((va/n_a)*(va/n_a)/(n_a-1) + (vb/n_b)*(vb/n_b)/(n_b-1)) > 0
                THEN round(se2 * se2 /
                     ((va/n_a)*(va/n_a)/(n_a-1) + (vb/n_b)*(vb/n_b)/(n_b-1)), 2)
           END AS welch_df
    FROM d""",
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between the purchase and
    click value populations — the experiment readout when arms have
    different spreads (complements events_ab_test's pooled z). One global
    aggregate of six exact-DECIMAL sufficient statistics (conditional sums
    combine map-side; nothing but one row crosses the exchange); the
    t statistic and Welch-Satterthwaite df are scalar double math computed
    by the IDENTICAL expression chain in both engines. Every denominator is
    guarded (n < 2 arms, zero-variance arms -> NULL, never ANSI
    DIVIDE_BY_ZERO) — written degenerate-gate-first."""
    ev = load_table(spark, sf_dir, "events")
    da = F.when(
        F.col("event_type") == _TT_A, F.col("value").cast("decimal(18,6)")
    )
    db = F.when(
        F.col("event_type") == _TT_B, F.col("value").cast("decimal(18,6)")
    )
    s = ev.agg(
        F.count(da).cast("bigint").alias("n_a"),
        F.count(db).cast("bigint").alias("n_b"),
        F.sum(da).cast("double").alias("sa"),
        F.sum(db).cast("double").alias("sb"),
        F.sum((da * da).cast("decimal(38,12)")).cast("double").alias("sxxa"),
        F.sum((db * db).cast("decimal(38,12)")).cast("double").alias("sxxb"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    m = s.select(
        "n_a", "n_b",
        F.when(na > 0, F.col("sa") / na).alias("ma"),
        F.when(nb > 0, F.col("sb") / nb).alias("mb"),
        F.when(
            na >= 2, (na * F.col("sxxa") - F.col("sa") * F.col("sa")) / (na * (na - 1))
        ).alias("va"),
        F.when(
            nb >= 2, (nb * F.col("sxxb") - F.col("sb") * F.col("sb")) / (nb * (nb - 1))
        ).alias("vb"),
    )
    d = m.select(
        "n_a", "n_b", "ma", "mb", "va", "vb",
        F.when(
            F.col("va").isNotNull() & F.col("vb").isNotNull(),
            F.col("va") / na + F.col("vb") / nb,
        ).alias("se2"),
    )
    se2 = F.col("se2")
    dfden = (
        (F.col("va") / na) * (F.col("va") / na) / (na - 1)
        + (F.col("vb") / nb) * (F.col("vb") / nb) / (nb - 1)
    )
    return d.select(
        "n_a", "n_b",
        F.round("ma", 6).alias("mean_a"),
        F.round("mb", 6).alias("mean_b"),
        F.when(se2 > 0, F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 4)).alias(
            "t_stat"
        ),
        F.when((se2 > 0) & (dfden > 0), F.round(se2 * se2 / dfden, 2)).alias(
            "welch_df"
        ),
    )


@register(
    "events_hourly_entropy",
    """WITH h AS (
      SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hr,
             CAST(COUNT(*) AS BIGINT) AS nh
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type, CAST(SUM(nh) AS BIGINT) AS n,
             SUM(CAST(round(nh * ln(nh), 6) AS DECIMAL(28,6))) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_hours
      FROM h GROUP BY event_type)
    SELECT event_type, n, n_hours,
           round(ln(n) - CAST(s AS DOUBLE) / n, 4) AS entropy_nats
    FROM t""",
)
def events_hourly_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each type's hour-of-day distribution — the
    traffic-shape audit behind burst detection and cache sizing (entropy
    ln(24) = uniform around the clock; 0 = a single hot hour, exactly the
    degenerate fixture's shape). Identity H = ln(n) - sum(nh*ln(nh))/n
    turns the per-bucket p*ln(p) sum into ONE aggregate over exact integer
    counts; each nh*ln(nh) term is rounded to 6 dp and summed as DECIMAL so
    the (order-sensitive) float summation never differs between engines.
    Two map-side-combined aggregates to O(#types x 24) rows; no divide
    hazards (nh >= 1, n >= 1 whenever a group exists)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        (F.floor(F.unix_millis("ts") / F.lit(3_600_000)) % 24).alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nh"))
    t = h.groupBy("event_type").agg(
        F.sum("nh").cast("bigint").alias("n"),
        F.sum(
            F.round(F.col("nh") * F.log(F.col("nh").cast("double")), 6).cast(
                "decimal(28,6)"
            )
        ).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    )
    return t.select(
        "event_type", "n", "n_hours",
        F.round(
            F.log(F.col("n").cast("double")) - F.col("s").cast("double") / F.col("n"),
            4,
        ).alias("entropy_nats"),
    )


@register(
    "orders_ship_latency_percentiles",
    """WITH lat AS (
      SELECT o_orderpriority,
             CAST((epoch_ms(l_shipdate) - epoch_ms(o_orderdate)) // 86400000 AS BIGINT) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           round(quantile_cont(days, 0.5), 4) AS p50_days,
           round(quantile_cont(days, 0.9), 4) AS p90_days,
           round(quantile_cont(days, 0.99), 4) AS p99_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM lat GROUP BY o_orderpriority""",
)
def orders_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority: the SLA
    readout (does 1-URGENT actually ship faster, and what does the p99 tail
    look like?). Latency is an exact integer epoch-day difference, so the
    interpolated percentiles agree bit-for-bit with the oracle
    (quantile_cont == F.percentile on integers). Plan shape: the lineitem
    JOIN orders equi-join shuffles both sides on l_orderkey/o_orderkey —
    the canonical TPC-H co-partition join (bucketed layouts make it
    shuffle-free at 100 TB) — followed by one exact-percentile aggregate to
    O(#priorities) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lat = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        # explicit TIMESTAMP casts: a no-op on the driver testdata, and the
        # session-is-UTC reinterpretation on TIMESTAMP_NTZ parquet (the
        # degenerate fixtures; same normalization load_table applies to
        # events.ts)
        F.expr(
            "CAST((unix_millis(CAST(l_shipdate AS TIMESTAMP)) - "
            "unix_millis(CAST(o_orderdate AS TIMESTAMP))) div 86400000 AS BIGINT)"
        ).alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.percentile("days", F.lit(0.5)), 4).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.9)), 4).alias("p90_days"),
        F.round(F.percentile("days", F.lit(0.99)), 4).alias("p99_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# Round 7 additions: LSH tuning sweep, split-leakage audit, HLL intersection
# ---------------------------------------------------------------------------

_SWEEP_ROWS = (1, 2, 4, 8)
_SWEEP_THRESHOLD = 0.5


def _sql_lsh_band_sweep(rows_opts=_SWEEP_ROWS, threshold=_SWEEP_THRESHOLD) -> str:
    """Banding-sweep oracle: the sig CTEs shared with the MinHash family,
    then per rows-per-band r a (bucket, candidate, estimate, scalar-agg)
    chain UNION ALL'd — one row per configuration, replaying the Spark
    sweep's md5 buckets and signature-agreement counts exactly."""
    base = _sql_minhash_ctes(threshold)
    head = base[: base.index("buckets AS")].rstrip().rstrip(",")
    parts = [head]
    selects = []
    for r in rows_opts:
        nb = NUM_MINHASHES // r
        parts.append(
            f"""b{r} AS (
      SELECT doc_id, b.band,
             md5(array_to_string(list_transform(
                 list_slice(sig, b.band * {r} + 1, b.band * {r} + {r}),
                 v -> CAST(v AS VARCHAR)), '-')) AS bucket
      FROM sigs, (SELECT unnest(range(0, {nb})) AS band) b)"""
        )
        parts.append(
            f"""c{r} AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM b{r} l JOIN b{r} r ON l.band = r.band AND l.bucket = r.bucket
                             AND l.doc_id < r.doc_id)"""
        )
        parts.append(
            f"""e{r} AS (
      SELECT len(list_filter(range(1, {NUM_MINHASHES} + 1),
                             i -> a.sig[i] = b.sig[i]))::DOUBLE / {NUM_MINHASHES} AS jacc
      FROM c{r} c JOIN sigs a ON c.doc_a = a.doc_id
                  JOIN sigs b ON c.doc_b = b.doc_id)"""
        )
        t50 = round((1.0 / nb) ** (1.0 / r), 4)
        selects.append(
            f"""SELECT CAST({r} AS BIGINT) AS rows_per_band,
           CAST({nb} AS BIGINT) AS n_bands,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(COALESCE(SUM(CASE WHEN jacc >= {threshold} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_true_pairs,
           CASE WHEN COUNT(*) > 0
                THEN {sql_exact_ratio(f"COALESCE(SUM(CASE WHEN jacc >= {threshold} THEN 1 ELSE 0 END), 0)", "COUNT(*)", 4)}
                ELSE CAST(0.0 AS DOUBLE) END AS "precision",
           CAST({t50!r} AS DOUBLE) AS t50 FROM e{r}"""
        )
    return "WITH " + ",\n    ".join(parts) + "\n    " + "\n    UNION ALL\n    ".join(selects)


@register("dedup_lsh_band_sweep", _sql_lsh_band_sweep())
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding parameter sweep (operators/dedup.py::lsh_band_sweep):
    candidate volume, signature-verified true-pair yield, precision, and
    the analytic S-curve 50%-capture threshold (1/b)^(1/r) for each
    rows-per-band choice over the SAME 16-hash signature frame — the
    tuning readout a 100 TB dedup run consults before committing to a
    banding. One signature computation, one single-row aggregate per
    configuration; precision is 0.0 (not null) when a configuration yields
    no candidates, mirrored in the oracle's CASE."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.lsh_band_sweep(
        docs, rows_per_band_options=_SWEEP_ROWS, threshold=_SWEEP_THRESHOLD
    )


_SQL_SPLIT_PCT = (
    "(CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100)"
)


@register(
    "documents_split_leakage",
    f"""WITH assigned AS (
      SELECT doc_id, text,
             CASE WHEN {_SQL_SPLIT_PCT} < 80 THEN 'train'
                  WHEN {_SQL_SPLIT_PCT} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    sp AS (
      SELECT doc_id, split, unnest({_sql_shingles(SQL_NTOKS, _SPAN_K)}) AS span
      FROM assigned),
    hs AS (SELECT doc_id, split, {SQL_H15.format(x='span')} AS sh FROM sp),
    tr AS (SELECT DISTINCT sh FROM hs WHERE split = 'train'),
    ev AS (SELECT doc_id, split, sh FROM hs WHERE split IN ('val', 'test')),
    leaked AS (SELECT DISTINCT e.doc_id, e.split FROM ev e JOIN tr t USING (sh)),
    lc AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_leaked FROM leaked GROUP BY split),
    tot AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM assigned WHERE split IN ('val', 'test') GROUP BY split)
    SELECT t.split, t.n_docs,
           CAST(COALESCE(l.n_leaked, 0) AS BIGINT) AS n_leaked,
           {sql_exact_ratio("COALESCE(l.n_leaked, 0)", "t.n_docs", 4)} AS leak_rate
    FROM tot t LEFT JOIN lc l USING (split)""",
)
def documents_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination audit of the engine's OWN split
    (operators/sampling.py::train_split): a val/test document is "leaked"
    if any of its 8-token spans also occurs in any train document — the
    GPT-3/Pile-style overlap check, run with the substring family's span
    machinery (distinct shingles hashed to 15-hex BIGINTs, so the shuffle
    carries (int64, split) only, never span text).

    Plan shape at 100 TB: split assignment is a zero-shuffle hash
    predicate; ONE span explode feeds both sides; the train span set is
    distinct-reduced before the semi-join, and the semi-join carries no
    payload. Output is O(#splits)."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = smp.train_split(docs)
    sp = assigned.select(
        "doc_id", "split", F.explode(T.shingles(F.col("text"), _SPAN_K)).alias("span")
    )
    hs = sp.select("doc_id", "split", T.md5_prefix_long(F.col("span")).alias("sh"))
    tr = hs.filter(F.col("split") == "train").select("sh").distinct()
    ev = hs.filter(F.col("split").isin(["val", "test"]))
    leaked = (
        ev.join(tr, "sh", "left_semi").select("doc_id", "split").distinct()
    )
    lc = leaked.groupBy("split").agg(F.count(F.lit(1)).cast("bigint").alias("n_leaked"))
    tot = (
        assigned.filter(F.col("split").isin(["val", "test"]))
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return tot.join(lc, "split", "left").select(
        "split",
        "n_docs",
        F.coalesce(F.col("n_leaked"), F.lit(0)).cast("bigint").alias("n_leaked"),
        exact_ratio("coalesce(n_leaked, 0)", "n_docs", 4).alias("leak_rate"),
    )


HLL_INTER_TYPES = ("click", "purchase")


def _sql_hll_intersection() -> str:
    cap = sk.HLL_RHO_CAP
    wb1 = sk.HLL_W_BITS + 1
    ta, tb = HLL_INTER_TYPES
    est_ctes = []
    for tag, pred in (("u", "TRUE"), ("a", f"g = '{ta}'"), ("b", f"g = '{tb}'")):
        est_ctes.append(
            f"""mx{tag} AS (SELECT bucket, MAX(rho) AS maxrho FROM br WHERE {pred} GROUP BY bucket),
    agg{tag} AS (SELECT SUM(1::BIGINT << ({cap} - maxrho)) AS s_present, COUNT(*) AS present FROM mx{tag}),
    agg2{tag} AS (SELECT s_present + ({sk.HLL_M} - present) * (1::BIGINT << {cap}) AS s,
                        {sk.HLL_M} - present AS v FROM agg{tag}),
    est{tag} AS (SELECT CASE WHEN CAST({sk.HLL_NUMERATOR!r} AS DOUBLE) / s <= {sk.HLL_SMALL_RANGE!r}
                             AND v > 0
                        THEN CAST({sk.HLL_M} AS DOUBLE) * ln(CAST({sk.HLL_M} AS DOUBLE) / v)
                        ELSE CAST({sk.HLL_NUMERATOR!r} AS DOUBLE) / s END AS e
               FROM agg2{tag})"""
        )
    ests = ",\n    ".join(est_ctes)
    return f"""WITH sub AS (
      SELECT event_type AS g, user_id FROM events
      WHERE event_type IN ('{ta}', '{tb}')),
    h AS (SELECT g,
        CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM sub),
    br AS (SELECT g, h % {sk.HLL_M} AS bucket,
                 CASE WHEN (h >> {sk.HLL_P}) > 0
                      THEN least({wb1} - length(bin(h >> {sk.HLL_P})), {cap})
                      ELSE {cap} END AS rho
          FROM h),
    {ests},
    inter AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_inter FROM
        (SELECT user_id FROM sub WHERE g = '{ta}'
         INTERSECT SELECT user_id FROM sub WHERE g = '{tb}')),
    gate AS (SELECT COUNT(*) AS n FROM sub)
    SELECT '{ta}' AS type_a, '{tb}' AS type_b,
           round(COALESCE(ea.e, 0.0), 2) AS n_hll_a,
           round(COALESCE(eb.e, 0.0), 2) AS n_hll_b,
           round(eu.e, 2) AS n_hll_union,
           round(GREATEST((COALESCE(ea.e, 0.0) + COALESCE(eb.e, 0.0)) - eu.e, 0.0), 2) AS n_hll_inter,
           i.n_exact_inter
    FROM estu eu CROSS JOIN esta ea CROSS JOIN estb eb
         CROSS JOIN inter i CROSS JOIN gate WHERE gate.n > 0"""


@register("events_hll_intersection", _sql_hll_intersection())
def events_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from sketches
    (operators/sketches.py::hll_intersection): |A ∩ B| by
    inclusion-exclusion over three HLL states (A, B, A∪B share one
    bucket-max pass each; states merge with MAX, never revisiting raw
    data), clamped at 0, with the exact overlap as the audit column — the
    "users who did BOTH click and purchase" question answered from KB-sized
    mergeable state instead of a key-level join."""
    ev = load_table(spark, sf_dir, "events")
    return sk.hll_intersection(ev, "user_id", "event_type", *HLL_INTER_TYPES)


_NPROBE_SWEEP = (1, 2, 4, 8)


def _sql_ivf_nprobe_sweep(
    n_clusters: int = 8, iterations: int = 5, nprobes=_NPROBE_SWEEP
) -> str:
    """nprobe-sweep oracle: the shared k-means chain through `af`, a probe
    ranking that KEEPS the rank, the exact brute-force top-k once, then per
    probe count a (filter, score, rank, hits, scalar-agg) chain UNION ALL'd."""
    parts = _sql_ivf_parts(n_clusters, iterations, n_probe=n_clusters)[:-3]
    fin = f"c{iterations}"
    qd2 = (
        "list_sum(list_transform(range(1, len(q.qv) + 1),"
        " i -> (q.qv[i] - c.c[i]) * (q.qv[i] - c.c[i])))"
    )
    parts.append(f"""probes_all AS (
      SELECT query_id, qv, cluster, pr FROM (
        SELECT q.query_id, q.qv, c.cluster,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {qd2} ASC, c.cluster ASC) AS pr
        FROM (SELECT vec_id AS query_id, v AS qv FROM base
              WHERE vec_id < {ANN_QUERY_MAX_ID}) q
        CROSS JOIN {fin} c) t)""")
    parts.append(f"""bf_scored AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             {SQL_COS.format(a='q.v', b='b.v')} AS score
      FROM (SELECT vec_id, v FROM base WHERE vec_id < {ANN_QUERY_MAX_ID}) q
      CROSS JOIN base b)""")
    parts.append(f"""bf AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM bf_scored QUALIFY rank <= {ANN_K})""")
    selects = []
    for p in sorted(nprobes):
        parts.append(f"""sc{p} AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {SQL_COS.format(a='p.qv', b='a.v')} AS score
      FROM (SELECT query_id, qv, cluster FROM probes_all WHERE pr <= {p}) p
      JOIN af a ON p.cluster = a.cluster)""")
        parts.append(f"""iv{p} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS rank
        FROM sc{p}) t WHERE rank <= {ANN_K})""")
        parts.append(f"""h{p} AS (
      SELECT bf.query_id, COUNT(iv{p}.neighbor_id) AS hits
      FROM bf LEFT JOIN iv{p}
        ON bf.query_id = iv{p}.query_id AND bf.neighbor_id = iv{p}.neighbor_id
      GROUP BY bf.query_id)""")
        scan = round(p / n_clusters, 4)
        selects.append(
            f"""SELECT CAST({p} AS BIGINT) AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST((2 * SUM(hits) * 10000 + COUNT(*) * {ANN_K})
                // (2 * COUNT(*) * {ANN_K}) AS DOUBLE) / 10000.0 AS mean_recall,
           CAST({scan!r} AS DOUBLE) AS scan_frac
    FROM h{p} GROUP BY 1"""
        )
    body = ",\n    ".join(parts)
    return f"WITH {body}\n    " + "\n    UNION ALL\n    ".join(selects)


@register("ann_recall_nprobe_sweep", _sql_ivf_nprobe_sweep())
def ann_recall_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe/recall tuning sweep
    (operators/similarity.py::ivf_nprobe_sweep): mean recall@k and scan
    fraction per probe count, from ONE k-means training run, one persisted
    assignment, one exact top-k, and one probe ranking — the curve an
    operator reads before fixing nprobe on a 100 TB serving index. The
    nprobe = n_clusters row scans everything and anchors recall at 1.0;
    mean recall is the exact integer ratio sum(hits)/(n_queries*k) rounded
    once in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_nprobe_sweep(
        emb,
        _queries_df(spark, sf_dir),
        k=ANN_K,
        n_clusters=8,
        nprobe_options=_NPROBE_SWEEP,
        sample_hex=_TRAIN_SAMPLE_HEX,
    )


def _sql_family_agreement() -> str:
    """Two candidate-family chains in one statement: the MinHash CTEs keep
    their names (ending in `pairs`); the SimHash chain is renamed with an
    sm-prefix to avoid the hx/sigs collisions."""
    sim_sql = (
        _sql_simhash()
        .replace("WITH ", "", 1)
        .replace("toks", "smtoks")
        .replace("hx", "smhx")
        .replace("votes", "smvotes")
        .replace("sigs", "smsigs")
    )
    return f"""WITH {_sql_minhash_ctes(0.5)},
    {sim_sql},
    sp AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM smsigs a JOIN smsigs b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
    mp AS (SELECT doc_a, doc_b FROM pairs),
    j AS (
      SELECT CASE WHEN m.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_m,
             CASE WHEN s.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_s
      FROM mp m FULL OUTER JOIN sp s
        ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b)
    SELECT CAST(COALESCE(SUM(in_m), 0) AS BIGINT) AS n_minhash,
           CAST(COALESCE(SUM(in_s), 0) AS BIGINT) AS n_simhash,
           CAST(COALESCE(SUM(in_m * in_s), 0) AS BIGINT) AS n_both,
           CAST(COUNT(*) AS BIGINT) AS n_either,
           CASE WHEN COUNT(*) > 0
                THEN {sql_exact_ratio("COALESCE(SUM(in_m * in_s), 0)", "COUNT(*)", 4)}
                ELSE CAST(0.0 AS DOUBLE) END AS agreement
    FROM j"""


@register("dedup_family_agreement", _sql_family_agreement())
def dedup_family_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family dedup calibration: how much do the MinHash (Jaccard ≥
    0.5, global LSH buckets) and SimHash (hamming ≤ 3, source-blocked) pair
    miners agree? Low agreement flags threshold drift between the families
    before a pipeline assembly swaps one for the other; the known scope
    difference (SimHash candidates are blocked within source) is part of
    what the readout surfaces. One full-outer join of two candidate-scale
    pair frames reduced to a single global-aggregate row — always exactly
    one row, zeros on an empty corpus, agreement 0.0 when no pairs."""
    docs = load_table(spark, sf_dir, "documents")
    mp = (
        dd.minhash_lsh_pairs(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .withColumn("in_m", F.lit(1))
    )
    sp = (
        dd.simhash_pairs(docs, max_hamming=3)
        .select("doc_a", "doc_b")
        .withColumn("in_s", F.lit(1))
    )
    j = mp.join(sp, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce(F.col("in_m"), F.lit(0)).alias("in_m"),
        F.coalesce(F.col("in_s"), F.lit(0)).alias("in_s"),
    )
    return j.agg(
        F.coalesce(F.sum("in_m"), F.lit(0)).cast("bigint").alias("n_minhash"),
        F.coalesce(F.sum("in_s"), F.lit(0)).cast("bigint").alias("n_simhash"),
        F.coalesce(F.sum(F.col("in_m") * F.col("in_s")), F.lit(0))
        .cast("bigint")
        .alias("n_both"),
        F.count(F.lit(1)).cast("bigint").alias("n_either"),
        F.when(
            F.count(F.lit(1)) > 0,
            exact_ratio("coalesce(sum(in_m * in_s), 0)", "count(1)", 4),
        )
        .otherwise(F.lit(0.0))
        .alias("agreement"),
    )


@register(
    "dedup_cluster_pareto",
    f"""WITH RECURSIVE {_sql_minhash_ctes(0.5)},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.doc_id),
    cl AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    szs AS (SELECT cluster_id, COUNT(*) AS sz FROM cl GROUP BY cluster_id),
    dist AS (SELECT sz, COUNT(*) AS n_clusters FROM szs GROUP BY sz),
    tot AS (SELECT SUM(sz * n_clusters) AS t FROM dist)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(n_clusters AS BIGINT) AS n_clusters,
           CAST(sz * n_clusters AS BIGINT) AS n_docs,
           {sql_exact_ratio("sz * n_clusters", "t.t", 4)} AS doc_share
    FROM dist CROSS JOIN tot t""",
)
def dedup_cluster_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the Pareto readout that tells
    a curation run whether its duplication lives in a few giant template
    families (dedup by cluster representative, biggest wins) or a long
    tail of pairs (pair-level removal suffices). Composes the registered
    pair miner and pointer-jumped closure, then reduces to O(#distinct
    sizes) rows; the total is a 1-row aggregate broadcast back (no
    unpartitioned window). Rows exist only when clusters exist, so the
    share denominator is never 0."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    cl = dd.dup_clusters(pairs.select("doc_a", "doc_b"))
    szs = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    dist = szs.groupBy("sz").agg(F.count(F.lit(1)).alias("n_clusters"))
    tot = dist.agg(F.sum(F.col("sz") * F.col("n_clusters")).alias("t"))
    return dist.crossJoin(F.broadcast(tot)).select(
        F.col("sz").cast("bigint").alias("cluster_size"),
        F.col("n_clusters").cast("bigint").alias("n_clusters"),
        (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        exact_ratio("sz * n_clusters", "t", 4).alias("doc_share"),
    )


def _sql_top_component(dim: int = 64, iterations: int = 3) -> str:
    """Unrolled power-iteration oracle (the kmeans-CTE discipline): per-dim
    mean / per-dim sums / normalized iterate all rounded to 6 dp at the
    same points the Spark operator rounds, fold orders fixed at 1..dim."""
    d1 = dim + 1
    v0 = "[" + ", ".join(["0.125"] * dim) + "]"
    parts = [
        "pbase AS (SELECT embedding::DOUBLE[] AS x FROM embeddings)",
        f"""mup AS (
      SELECT idx, round(AVG(x[idx]), 6) AS m
      FROM pbase CROSS JOIN (SELECT unnest(range(1, {d1})) AS idx) i
      GROUP BY idx)""",
        "mu AS (SELECT list(m ORDER BY idx) AS m FROM mup)",
        f"""bc AS (
      SELECT list_transform(range(1, {d1}), i -> x[i] - m[i]) AS x
      FROM pbase CROSS JOIN mu)""",
    ]
    prev = f"(SELECT {v0}::DOUBLE[] AS v)"
    for t in range(1, iterations + 1):
        parts.append(f"""sp{t} AS (
      SELECT b.x, list_sum(list_transform(range(1, {d1}), i -> b.x[i] * p.v[i])) AS s
      FROM bc b CROSS JOIN {prev} p)""")
        parts.append(f"""wp{t} AS (
      SELECT idx, round(SUM(s * x[idx]), 6) AS w
      FROM sp{t} CROSS JOIN (SELECT unnest(range(1, {d1})) AS idx) i
      GROUP BY idx)""")
        parts.append(f"w{t} AS (SELECT list(w ORDER BY idx) AS w FROM wp{t})")
        parts.append(f"""v{t} AS (
      SELECT CASE WHEN sqrt(list_sum(list_transform(w, e -> e * e))) > 0
                  THEN list_transform(w, e ->
                       round(e / sqrt(list_sum(list_transform(w, e2 -> e2 * e2))), 6))
                  ELSE list_transform(w, e -> 0.0) END AS v
      FROM w{t})""")
        prev = f"v{t}"
    parts.append(f"""sf AS (
      SELECT list_sum(list_transform(range(1, {d1}), i -> b.x[i] * p.v[i])) AS s,
             list_sum(list_transform(b.x, e -> e * e)) AS t2
      FROM bc b CROSS JOIN {prev} p)""")
    parts.append(
        "fin AS (SELECT round(SUM(s * s), 6) AS se, round(SUM(t2), 6) AS st FROM sf)"
    )
    body = ",\n    ".join(parts)
    return f"""WITH {body}
    SELECT CAST(d.idx AS BIGINT) AS dim, p.v[d.idx] AS loading,
           CASE WHEN f.st > 0 THEN round(f.se / f.st, 6)
                ELSE CAST(0.0 AS DOUBLE) END AS explained_ratio
    FROM (SELECT DISTINCT idx FROM mup) d
    CROSS JOIN {prev} p CROSS JOIN fin f"""


@register("embeddings_top_component", _sql_top_component())
def embeddings_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding matrix via distributed power
    iteration (operators/similarity.py::power_iteration_top_component) —
    PCA's scale form: one map-side-combined aggregate per iteration
    (v ∝ Xᵀ(Xv)), nothing wider than 64 doubles ever crosses an exchange,
    and the covariance matrix is never materialized. The kmeans rounding
    discipline (6 dp at every reduction point, Spark-side HALF_UP) makes
    the unrolled DuckDB CTE chain replay the iterations bit-for-bit. The
    readout a drift monitor / whitening step consumes: per-dim loadings +
    the fraction of variance the component explains."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.power_iteration_top_component(emb, iterations=3, dim=64)


@register(
    "documents_quality_by_split",
    f"""WITH base AS (
      SELECT doc_id,
        CASE WHEN ({_SQL_SPLIT_PCT}) < 80 THEN 'train'
             WHEN ({_SQL_SPLIT_PCT}) < 90 THEN 'val'
             ELSE 'test' END AS split,
        {_SQL_QCOUNTS}
      FROM documents),
    q AS (
      SELECT split, {SQL_QUALITY_4DP} AS q
      FROM base)
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           {sql_exact_mean_units("CAST(SUM(CAST(q AS DECIMAL(18,4))) * 10000 AS BIGINT)", "COUNT(*)", 4)} AS mean_quality,
           MIN(q) AS min_quality, MAX(q) AS max_quality
    FROM q GROUP BY split""",
)
def documents_quality_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-balance audit: quality-score distribution per train/val/test
    assignment — the check that the salted hash split did not correlate with
    quality (an eval set biased toward short/punctuation-heavy documents
    invalidates every ablation run on it). Zero-shuffle split predicate +
    one map-side-combined aggregate to O(#splits) rows; the mean is an
    exact DECIMAL sum of per-doc 4-dp scores divided once, so parity never
    rests on float summation order."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = smp.train_split(docs)
    scored = T.with_quality_4dp(assigned.select("split", "text"), out_col="q")
    return (
        scored.select("split", "q")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            exact_mean_units(
                "CAST(sum(CAST(q AS DECIMAL(18,4))) * 10000 AS BIGINT)",
                "count(1)",
                4,
            ).alias("mean_quality"),
            F.min("q").alias("min_quality"),
            F.max("q").alias("max_quality"),
        )
    )


def _sql_pq_recon_error(m: int = 4, k: int = 4, iterations: int = 3, dim: int = 64) -> str:
    """PQ reconstruction-error oracle: the codebook CTEs through recon (the
    _sql_pq_topk decode), cosine of each original vector against its own
    reconstruction, a 0.05-bin histogram, and an exact-DECIMAL corpus mean."""
    parts = _sql_pq_cte_parts(m, k, iterations, dim)
    code_joins = " ".join(f"JOIN s{s}_af USING (vec_id)" for s in range(1, m))
    parts.append(f"codes AS (SELECT * FROM s0_af {code_joins})")
    cat = " || ".join(f"cb{s}.c" for s in range(m))
    book_joins = " ".join(
        f"JOIN s{s}_c{iterations} cb{s} ON cb{s}.cluster = cd.code{s}"
        for s in range(m)
    )
    parts.append(f"recon AS (SELECT cd.vec_id, {cat} AS rv FROM codes cd {book_joins})")
    parts.append("orig AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)")
    parts.append(f"""cb AS (
      SELECT o.vec_id, round({SQL_COS.format(a='o.v', b='r.rv')}, 6) AS c
      FROM orig o JOIN recon r USING (vec_id))""")
    parts.append("""dist AS (
      SELECT CAST(LEAST(floor(c / 0.05), 19) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_vectors
      FROM cb GROUP BY 1)""")
    parts.append("""mn AS (
      SELECT CAST(CASE WHEN (CAST(SUM(CAST(c AS DECIMAL(18,6))) * 1000000 AS BIGINT)) < 0 THEN -1 ELSE 1 END * ((2 * abs(CAST(SUM(CAST(c AS DECIMAL(18,6))) * 1000000 AS BIGINT)) + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) AS DOUBLE) / 1000000.0 AS mean_cos
      FROM cb)""")
    body = ",\n    ".join(parts)
    return f"""WITH {body}
    SELECT d.bin, round(CAST(d.bin AS DOUBLE) * 0.05, 2) AS bin_lo,
           d.n_vectors, mn.mean_cos
    FROM dist d CROSS JOIN mn"""


@register("embeddings_pq_recon_error", _sql_pq_recon_error())
def embeddings_pq_recon_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quantization-quality audit: cosine of every vector against its own
    codebook reconstruction, as a 0.05-bin histogram plus the exact-DECIMAL
    corpus mean — the calibration an operator reads before trusting PQ/ADC
    scores at a given (m, k): a long low-cosine tail means the codebooks
    are too coarse for the corpus. One encode pass (the same inline-argmin
    decode expression ann_pq_topk scans with) and one aggregate; at scale
    this runs as a side readout of the index build."""
    emb = load_table(spark, sf_dir, "embeddings")
    if sim._probe_dim(emb, "embedding") is None:
        return spark.createDataFrame(
            [], "bin bigint, bin_lo double, n_vectors bigint, mean_cos double"
        )
    codebooks = sim.pq_codebooks(
        emb, sim.PQ_M, sim.PQ_K, sim.PQ_ITERATIONS, "embedding", "vec_id",
        dim=64, sample_hex=_TRAIN_SAMPLE_HEX,
    )
    sub = 64 // sim.PQ_M
    # materialize x and rv as attributes BEFORE cosine: cosine(a, b)
    # references each argument several times (dot + both norms + the
    # zero-denominator guard), and an expression argument is re-evaluated
    # per reference — for rv that meant ~6 full PQ argmin+reconstruct
    # passes per row. Two projections pin them to one evaluation each;
    # values are bit-identical.
    x = F.transform(F.col("embedding"), lambda e: e.cast("double"))
    pre = emb.select(x.alias("__x")).select(
        "__x", sim.pq_reconstruct_expr(F.col("__x"), codebooks, sub).alias("__rv")
    )
    c = F.round(cosine(F.col("__x"), F.col("__rv")), 6)
    cb = pre.select(c.alias("c"))
    dist = cb.groupBy(
        F.least(F.floor(F.col("c") / F.lit(0.05)), F.lit(19)).cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
    mn = cb.agg(
        exact_mean_units(
            "CAST(sum(CAST(c AS DECIMAL(18,6))) * 1000000 AS BIGINT)",
            "count(1)",
            6,
        ).alias("mean_cos")
    )
    return dist.crossJoin(F.broadcast(mn)).select(
        "bin",
        F.round(F.col("bin") * F.lit(0.05), 2).alias("bin_lo"),
        "n_vectors",
        "mean_cos",
    )


# ---------------------------------------------------------------------------
# Round 13: TF-IDF near-dup ranking + budget-constrained hybrid sampler
# ---------------------------------------------------------------------------

from .operators import sampling as smp13  # noqa: E402

BUDGET_SAMPLE_N = 137  # deliberately non-round: exercises the remainder seats

# Shared hash fragment (operators/sampling.py::sample_hash mirror)
_SQL_SAMPLE_HASH = (
    "CAST(('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 10000"
)


def _sql_budget_alloc_parts(total_n: int) -> list[str]:
    """Hamilton largest-remainder allocation CTE chain (DuckDB), mirroring
    operators/sampling.py::budget_allocation: HUGEINT product/floor-div/mod
    (the DECIMAL(38,0) twin), leftover seats to the largest remainders."""
    return [
        "counts AS (SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_rows "
        "FROM documents GROUP BY 1)",
        "tot AS (SELECT stratum, n_rows, SUM(n_rows) OVER () AS n FROM counts)",
        f"based AS (SELECT stratum, n_rows, "
        f"CAST(CAST(n_rows AS HUGEINT) * {total_n} // n AS BIGINT) AS base, "
        f"CAST(CAST(n_rows AS HUGEINT) * {total_n} % n AS BIGINT) AS rem FROM tot)",
        f"staged AS (SELECT *, CAST({total_n} AS BIGINT) - SUM(base) OVER () AS leftover, "
        "row_number() OVER (ORDER BY rem DESC, stratum ASC) AS pr FROM based)",
        "alloc AS (SELECT stratum, n_rows, base, rem, "
        "CAST(LEAST(base + CASE WHEN pr <= leftover THEN 1 ELSE 0 END, n_rows) "
        "AS BIGINT) AS alloc FROM staged)",
    ]


def _sql_budget_alloc() -> str:
    body = ",\n    ".join(_sql_budget_alloc_parts(BUDGET_SAMPLE_N))
    return f"""WITH {body}
    SELECT stratum, n_rows, base, rem, alloc FROM alloc"""


@register("documents_budget_alloc", _sql_budget_alloc())
def documents_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocation audit for the budget sampler: per-stratum population, floor
    share, remainder, and final seat count under Hamilton largest-remainder
    apportionment of a 137-row budget (operators/sampling.py::
    budget_allocation — exact DECIMAL(38,0)/HUGEINT integer arithmetic on
    both engines; the audit a curation run reviews before committing to a
    sampled mix)."""
    docs = load_table(spark, sf_dir, "documents")
    return smp13.budget_allocation(docs, BUDGET_SAMPLE_N)


def _sql_budget_sample() -> str:
    body = ",\n    ".join(_sql_budget_alloc_parts(BUDGET_SAMPLE_N))
    return f"""WITH {body},
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_SQL_SAMPLE_HASH}, doc_id) AS rk
      FROM documents)
    SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk, a.alloc
    FROM ranked r JOIN alloc a ON r.source = a.stratum
    WHERE r.rk <= a.alloc"""


@register("documents_budget_sample", _sql_budget_sample())
def documents_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified/reservoir hybrid sample with a hard 137-row total budget
    (operators/sampling.py::budget_sample): Hamilton apportionment decides
    each stratum's reservoir size, a deterministic hash-rank top-alloc
    draws it (the mergeable 'rank by uniform tag' form of reservoir
    sampling, hashed so the DuckDB oracle reproduces the exact row set).
    Emits exactly min(137, corpus) rows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = smp13.budget_sample(docs, BUDGET_SAMPLE_N)
    return out.select("doc_id", "source", "rk", "alloc")


def _sql_tfidf_neardup() -> str:
    return f"""WITH tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM
      (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents) GROUP BY doc_id, term),
    ndocs AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    idf AS (SELECT term, df, round(ln(1.0 + CAST(n_docs - df + 0.5 AS DOUBLE) /
                                   CAST(df + 0.5 AS DOUBLE)), 6) AS idf
            FROM dfreq CROSS JOIN ndocs),
    w AS (SELECT t.doc_id, t.term, i.df, round(t.tf * i.idf, 6) AS w
          FROM tf t JOIN idf i ON t.term = i.term),
    norms AS (SELECT doc_id, SUM(CAST(round(w * w, 6) AS DECIMAL(28,6))) AS norm_sq
              FROM w GROUP BY doc_id),
    shs AS (SELECT doc_id, unnest({_sql_shingles(SQL_NTOKS)}) AS s FROM documents),
    sh AS (SELECT doc_id, {SQL_H15.format(x='s')} AS sh FROM shs),
    sdf AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS sdf FROM sh GROUP BY sh),
    rare AS (SELECT sh.doc_id, sh.sh FROM sh JOIN sdf ON sh.sh = sdf.sh
             WHERE sdf.sdf BETWEEN 2 AND {ret.NEARDUP_SHINGLE_DF_MAX}),
    cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
             FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id),
    dots AS (
      SELECT c.doc1, c.doc2,
             CAST(SUM(CAST(round(w1.w * w2.w, 6) AS DECIMAL(28,6))) AS DOUBLE) AS dot,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM cand c
      JOIN w w1 ON w1.doc_id = c.doc1
      JOIN w w2 ON w2.doc_id = c.doc2 AND w2.term = w1.term
      GROUP BY c.doc1, c.doc2),
    scored AS (
      SELECT d.doc1, d.doc2, d.n_shared,
             CASE WHEN n1.norm_sq > 0 AND n2.norm_sq > 0
                  THEN round(d.dot / sqrt(CAST(n1.norm_sq AS DOUBLE) *
                                          CAST(n2.norm_sq AS DOUBLE)), 6)
                  ELSE 0.0 END AS score
      FROM dots d
      JOIN norms n1 ON n1.doc_id = d.doc1
      JOIN norms n2 ON n2.doc_id = d.doc2)
    SELECT doc1, doc2, n_shared, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc1, doc2) AS BIGINT) AS rank
    FROM scored ORDER BY score DESC, doc1, doc2 LIMIT {ret.NEARDUP_TOPK}"""


@register("documents_tfidf_neardup_topk", _sql_tfidf_neardup())
def documents_tfidf_neardup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-weighted near-duplicate ranking (operators/retrieval.py::
    tfidf_neardup_topk): top-50 document pairs by full TF-IDF cosine over
    the inverted-index posting frame, candidates blocked through rare
    shared shingles (2 <= shingle-df <= 10) — the graded complement to the
    threshold dedup miners, used to choose a cutoff or audit near-miss
    pairs. Global top-k rides TakeOrderedAndProject; the rank window runs
    over the 50-row survivor frame (whitelisted bounded shape)."""
    docs = load_table(spark, sf_dir, "documents")
    postings = ret.build_postings(docs)
    return ret.tfidf_neardup_topk(docs, postings)
