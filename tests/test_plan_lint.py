"""Registry-wide physical-plan lint: every registered query's plan is built
at sf0.001 and checked for the three scale smells the VERDICT audits hunt by
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

Planning only (executedPlan is forced, nothing runs), so the whole registry
lints in under a minute. A new query with a global window over an unbounded
frame fails here before any reviewer sees it.
"""

from __future__ import annotations

import re

import pytest

from k8s_vectordb_sync_spark.queries import QUERIES

UNPARTITIONED_WINDOW_WHITELIST = {
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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_is_scale_shaped(spark, sf_dir, name):
    plan = (
        QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: real cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    n_unpart = _unpartitioned_windows(plan)
    if name in UNPARTITIONED_WINDOW_WHITELIST:
        return  # documented bounded-frame windows
    assert n_unpart == 0, (
        f"{name}: {n_unpart} unpartitioned window(s) outside the documented "
        "whitelist — either partition it, replace it with broadcast "
        "boundaries (the customer_rfm_segments shape), or document why the "
        "frame is bounded and whitelist it"
    )
