"""Snapshot every registered query's static shuffle-exchange count into
tests/plan_exchange_budget.json — the baseline test_plan_lint.py enforces
(VERDICT r7 item 5: a refactor that silently adds a shuffle to a 100 TB
query should fail review even when results stay correct).

Run after intentionally changing a plan shape; the diff of the json IS the
review artifact. Plans are built at sf0.001, planning only.

Usage: python scripts/update_plan_budget.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from k8s_vectordb_sync_spark.queries import QUERIES
    from k8s_vectordb_sync_spark.session import build_spark
    from test_plan_lint import _scan_footprints, _shuffle_exchanges

    spark = build_spark(app_name="plan-budget", master="local[4]",
                        shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    budget = {}
    footprint = {}
    for name in sorted(QUERIES):
        spark.catalog.clearCache()  # match the lint's clean-cache state
        plan = (
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString()
        )
        budget[name] = _shuffle_exchanges(plan)
        footprint[name] = _scan_footprints(plan)
        print(f"{name}: {budget[name]} | {footprint[name]}", flush=True)
    out = os.path.join(REPO, "tests", "plan_exchange_budget.json")
    with open(out, "w") as fh:
        json.dump(budget, fh, indent=1, sort_keys=True)
    print(f"wrote {out} ({len(budget)} queries)")
    out2 = os.path.join(REPO, "tests", "plan_scan_footprint.json")
    with open(out2, "w") as fh:
        json.dump(footprint, fh, indent=1, sort_keys=True)
    print(f"wrote {out2} ({len(footprint)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
