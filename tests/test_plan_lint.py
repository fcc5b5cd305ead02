"""Registry-wide physical-plan lint: every registered query's plan is built
at sf0.001 and checked for the scale smells the VERDICT audits hunt by
hand — this freezes those audits into a regression gate.

1. No CartesianProduct anywhere (BroadcastNestedLoopJoin over a 1-row build
   side is the sanctioned cross-join shape; a real Cartesian is a bug).
2. No BatchEvalPython anywhere (zero row-at-a-time Python UDFs in the
   package; Python only via Arrow batches).
3. Unpartitioned windows ONLY on the whitelisted queries, each of which
   runs the window over a bounded pre-aggregated frame and documents it:
     - cdc_payload_batches: payload chunking of a flushed micro-batch
       (debounce.assign_batches docstring: bounded by flush interval; the
       scale path passes partition_cols)
     - documents_global_topk_quality: global top-k demonstrator over the
       two-phase-pruned survivor frame
     - documents_term_pmi / text_bpe_pair_counts / documents_zipf_fit:
       rank windows over TakeOrderedAndProject-capped top-N frames
     - events_cumulative_new_users: running total over the O(#days) frame
     - events_key_skew_audit: rank over the O(#keys-sample) audit frame
     - events_session_paths: rank over capped path aggregates

Round 8 adds two more gates (VERDICT r7 item 5):

4. Broadcast discipline for sub-threshold dimensions: any FileScan of
   nation/region whose NEAREST join ancestor is a SortMergeJoin or
   ShuffledHashJoin fails — a dimension of a few KB must ride a broadcast,
   never a shuffle. (supplier/part/customer scale with SF, so their join
   strategy is rightly size-dependent and left to Catalyst/AQE.)
5. Per-query shuffle-exchange budget: the static plan's Exchange count is
   snapshotted in tests/plan_exchange_budget.json (regenerate with
   scripts/update_plan_budget.py); growth fails. A refactor that silently
   adds a shuffle to a 100 TB query is a regression even when results stay
   correct — this makes it visible at review time.

Planning only (executedPlan is forced, nothing runs), so the whole registry
lints in under a minute. A new query with a global window over an unbounded
frame fails here before any reviewer sees it.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from k8s_vectordb_sync_spark.queries import QUERIES

UNPARTITIONED_WINDOW_WHITELIST = {
    # round 13: budget sampler's leftover-seat rank runs over the O(#strata)
    # post-aggregate allocation frame (the mixture_weights shape); the
    # neardup rank runs over the 50-row TakeOrderedAndProject survivor frame
    # (the documents_global_topk_quality shape)
    "documents_budget_alloc",
    "documents_budget_sample",
    "documents_tfidf_neardup_topk",
    "cdc_payload_batches",
    "documents_global_topk_quality",
    "documents_term_pmi",
    "documents_zipf_fit",
    "events_cumulative_new_users",
    "events_key_skew_audit",
    "events_session_paths",
    "text_bpe_pair_counts",
}


def _unpartitioned_windows(plan: str) -> int:
    # windowspecdefinition(part1, ..., ord ASC/DESC ..., frame): if the FIRST
    # argument is already an ordering spec, the window has no partition spec
    firsts = re.findall(r"windowspecdefinition\(([^,)]+)", plan)
    return sum(1 for f in firsts if " ASC" in f or " DESC" in f)


BROADCAST_ONLY_DIMS = ("nation.parquet", "region.parquet")


def _tree_nodes(plan: str):
    """Yield (depth, name) for each node of Spark's tree-art plan string.
    The art prefix is 3-char units ('   ', ':  ', '+- ', ':- '); depth is
    the unit count. Codegen stage markers ('*(2) ') are stripped from the
    name. Non-tree lines (section headers) parse as depth-0 noise and are
    harmless — they never match a Join/FileScan name."""
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-")
        if not stripped:
            continue
        depth = (len(line) - len(stripped)) // 3
        yield depth, re.sub(r"^\*\(\d+\) ", "", stripped)


def _shuffled_dim_scans(plan: str) -> list[str]:
    """FileScan lines of the broadcast-only dimensions whose NEAREST join
    ancestor shuffles (SortMergeJoin / ShuffledHashJoin). Nearest matters:
    a nation scan under a BroadcastHashJoin nested inside a big SMJ is
    fine — the dimension itself still rides the broadcast."""
    bad: list[str] = []
    stack: list[tuple[int, str]] = []  # (depth, node name) ancestor path
    for depth, name in _tree_nodes(plan):
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if name.startswith("FileScan") and any(
            d in name for d in BROADCAST_ONLY_DIMS
        ):
            for _, anc in reversed(stack):
                if "Join" in anc:
                    if anc.startswith(("SortMergeJoin", "ShuffledHashJoin")):
                        bad.append(f"{anc.split(' ')[0]} <- {name[:80]}")
                    break
        stack.append((depth, name))
    return bad


_SCAN_RE = re.compile(
    r"FileScan parquet \[([^\]]*)\].*?Location: \w+\(\d+ paths?\)\[([^\],]*)"
)


def _scan_footprints(plan: str) -> list[str]:
    """Every FileScan's (table, pruned column set) as sorted
    'table[col1,col2,...]' strings — the scan footprint the ReadSchema /
    column-pruning audit checks by hand ('a scan that reads all columns for
    a 2-column projection is wrong'). Table names come from the scan path
    with hash-named cache components (persisted-index dirs keyed on corpus
    identity) normalized away, so the snapshot survives testdata and index
    regeneration; expression IDs (#123L) are stripped from columns."""
    out = []
    for line in plan.splitlines():
        m = _SCAN_RE.search(line)
        if not m:
            continue
        # build_spark pins spark.sql.debug.maxToStringFields high; if a
        # session without that pin (or a scan wider than the pin) produced
        # this plan, the column list is truncated and freezing it would
        # silently hide columns added beyond the cutoff. Fail loudly.
        if "more fields" in m.group(1):
            raise AssertionError(
                "truncated FileScan column list (maxToStringFields too low "
                f"for this scan): {line.strip()[:200]}"
            )
        cols = sorted(
            re.sub(r"#\d+[A-Z]?", "", c.strip())
            for c in m.group(1).split(",")
            if c.strip()
        )
        parts = [
            p
            for p in m.group(2).replace("file:", "").split("/")
            if p and not re.fullmatch(r"[0-9a-f]{12,}(-[a-z0-9]+)?", p)
        ]
        table = (parts[-1] if parts else "unknown").removesuffix(".parquet")
        out.append(f"{table}[{','.join(cols)}]")
    return sorted(out)


def _shuffle_exchanges(plan: str) -> int:
    """Count shuffle Exchange nodes (BroadcastExchange excluded — broadcasts
    are the cheap strategy the other gate pushes toward; ReusedExchange
    excluded — it is a reference, not a second shuffle)."""
    return sum(
        1 for _, name in _tree_nodes(plan) if name.startswith("Exchange ")
    )


_BUDGET_PATH = os.path.join(os.path.dirname(__file__), "plan_exchange_budget.json")
try:
    with open(_BUDGET_PATH) as _fh:
        EXCHANGE_BUDGET = json.load(_fh)
except FileNotFoundError:  # pre-baseline checkout: every query fails loudly
    EXCHANGE_BUDGET = {}

_FOOTPRINT_PATH = os.path.join(os.path.dirname(__file__), "plan_scan_footprint.json")
try:
    with open(_FOOTPRINT_PATH) as _fh:
        SCAN_FOOTPRINT = json.load(_fh)
except FileNotFoundError:
    SCAN_FOOTPRINT = {}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_is_scale_shaped(spark, sf_dir, name):
    # Plans must be judged in a CLEAN cache state: queries persist() shared
    # frames (callers own the lifecycle), and a frame left persist-marked by
    # an earlier test substitutes InMemoryRelation for the scan subtree —
    # shifting exchange counts and hiding FileScans from the dimension gate.
    # The budget baseline (scripts/update_plan_budget.py) clears the same
    # way, so counts compare fresh-vs-fresh regardless of suite order.
    spark.catalog.clearCache()
    plan = (
        QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: real cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    shuffled_dims = _shuffled_dim_scans(plan)
    assert not shuffled_dims, (
        f"{name}: broadcast-only dimension rides a shuffle join: "
        f"{shuffled_dims} — a few-KB nation/region table must be the build "
        "side of a BroadcastHashJoin"
    )
    n_ex = _shuffle_exchanges(plan)
    budget = EXCHANGE_BUDGET.get(name)
    assert budget is not None, (
        f"{name}: no shuffle-exchange budget recorded — run "
        "scripts/update_plan_budget.py and review the new query's count"
    )
    assert n_ex <= budget, (
        f"{name}: {n_ex} shuffle exchanges vs budget {budget} — a shuffle "
        "was added to this plan; if intentional, re-baseline with "
        "scripts/update_plan_budget.py and justify in the commit"
    )
    # The gate is two-sided (round 9, ADVICE r8): a refactor that REMOVES a
    # shuffle must re-baseline too, else the stale budget would silently let
    # the plan regress all the way back up to the old count later.
    assert n_ex >= budget, (
        f"{name}: {n_ex} shuffle exchanges vs budget {budget} — the plan "
        "IMPROVED; lock in the win by re-baselining with "
        "scripts/update_plan_budget.py so it can't silently regress"
    )
    # Gate 6 (round 10): frozen scan column footprint. Column pruning is
    # what keeps a 100 TB scan reading MB instead of TB; a refactor that
    # widens any scan's pruned column set (or scans a new table) must
    # re-baseline and justify it. Two-sided like the exchange budget: a
    # NARROWED footprint is a win to lock in.
    feet = _scan_footprints(plan)
    baseline = SCAN_FOOTPRINT.get(name)
    assert baseline is not None, (
        f"{name}: no scan-footprint baseline recorded — run "
        "scripts/update_plan_budget.py and review the new query's scans"
    )
    assert feet == baseline, (
        f"{name}: scan footprint changed.\n  now:      {feet}\n"
        f"  baseline: {baseline}\n— a scan reads different columns (or a "
        "different table set); if intentional, re-baseline with "
        "scripts/update_plan_budget.py and justify in the commit"
    )
    n_unpart = _unpartitioned_windows(plan)
    if name in UNPARTITIONED_WINDOW_WHITELIST:
        return  # documented bounded-frame windows
    assert n_unpart == 0, (
        f"{name}: {n_unpart} unpartitioned window(s) outside the documented "
        "whitelist — either partition it, replace it with broadcast "
        "boundaries (the customer_rfm_segments shape), or document why the "
        "frame is bounded and whitelist it"
    )
