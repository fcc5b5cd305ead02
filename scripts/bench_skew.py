"""Skew-toolkit engagement evidence (VERDICT r7 item 3).

`salted_join` is proven LOSSLESS by the oracle gate
(orders_priority_revenue_salted hashes identically to the plain join);
this script proves it WINS where it is supposed to: a Zipf-keyed corpus
where one join key carries ~30% of the fact rows.

Corpus (bench_data/skew, generated in-process, deterministic):
  lineitem-like fact: N_FACT rows, orderkey 1 holds SKEW_FRAC of them;
  orders-like dim: N_DIM rows.

The measured joins run with autoBroadcastJoinThreshold=-1: at local scale
a 2M-row dimension column-prunes under 10 MB and Catalyst broadcasts it,
vaporizing the scenario — but salted_join's own contract (skew.py) is
"small side too big to broadcast outright"; at 100 TB that dimension is
tens of GB and broadcast is simply unavailable. Disabling the threshold
is how local[32] emulates the regime being designed for, the same way the
plan lint reasons about 100 TB shapes from sf0.001 plans.

Measured grid (best-of-3 each, one warm session):
  {plain shuffle join, salted_join} x {AQE skew-join ON, OFF}

Expectation (the honest story, not a strawman): with AQE's runtime skew
splitting ON, the plain sort-merge join is already handled and salting
should roughly TIE (both pay the dim replication / split overhead); with
it OFF (static planning, or an engine pinned to hash joins — skew.py's
(b)/(c) cases), the plain join serializes the hot key's rows on one
reducer and salting wins by spreading them across n_salts reducers.

Writes bench_logs/bench_skew_<tag>.json.
Usage: python scripts/bench_skew.py [tag] [n_fact] [n_dim]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FACT = 40_000_000
N_DIM = 2_000_000
SKEW_FRAC = 0.50  # one key = half the fact table: the extreme-known-skew case
HOT_KEY = 1
N_SALTS = 8  # replication = 8 x 2M dim rows << the 20M-row hot partition
RUNS = 3


def make_corpus(spark, root: str, n_fact: int, n_dim: int) -> None:
    from pyspark.sql import functions as F

    fact_path = os.path.join(root, "fact.parquet")
    dim_path = os.path.join(root, "dim.parquet")
    stamp = os.path.join(root, "_DONE")
    want = f"{n_fact}:{n_dim}:{SKEW_FRAC}\n"
    if os.path.exists(stamp) and open(stamp).read() == want:
        return
    n_hot = int(n_fact * SKEW_FRAC)
    fact = spark.range(n_fact).select(
        F.when(F.col("id") < n_hot, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(n_dim)) + 1)
        .alias("l_orderkey"),
        (F.pmod(F.col("id") * 17, F.lit(900)) + 100).cast("double").alias("l_extendedprice"),
        (F.pmod(F.col("id"), F.lit(10)) / 100.0).alias("l_discount"),
    )
    fact.write.mode("overwrite").parquet(fact_path)
    dim = spark.range(1, n_dim + 1).select(
        F.col("id").alias("l_orderkey"),
        F.concat(F.lit("P"), F.pmod(F.col("id"), F.lit(5)).cast("string")).alias(
            "o_orderpriority"
        ),
    )
    dim.write.mode("overwrite").parquet(dim_path)
    with open(stamp, "w") as fh:
        fh.write(want)


def agg(joined):
    from pyspark.sql import functions as F

    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
        ).cast("double").alias("revenue"),
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r8"
    n_fact = int(sys.argv[2]) if len(sys.argv) > 2 else N_FACT
    n_dim = int(sys.argv[3]) if len(sys.argv) > 3 else N_DIM

    from k8s_vectordb_sync_spark.operators.skew import salted_join
    from k8s_vectordb_sync_spark.session import build_spark

    spark = build_spark(app_name="bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(REPO, "bench_data", "skew")
    os.makedirs(root, exist_ok=True)
    make_corpus(spark, root, n_fact, n_dim)
    fact = spark.read.parquet(os.path.join(root, "fact.parquet"))
    dim = spark.read.parquet(os.path.join(root, "dim.parquet"))
    # emulate the not-broadcastable dimension (see module docstring)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    shapes = {
        "plain": lambda: agg(fact.join(dim, "l_orderkey")),
        "salted": lambda: agg(
            salted_join(fact, dim, on=["l_orderkey"], n_salts=N_SALTS)
        ),
    }
    plan = shapes["plain"]()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, "plain shape must shuffle"
    results: dict[str, dict] = {}
    baseline = None
    for aqe_skew in (True, False):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        for shape, build in shapes.items():
            key = f"{shape}_aqe_skew_{'on' if aqe_skew else 'off'}"
            best, rows = float("inf"), None
            for _ in range(RUNS):
                t0 = time.monotonic()
                rows = sorted(map(tuple, build().collect()))
                best = min(best, time.monotonic() - t0)
            if baseline is None:
                baseline = rows
            assert rows == baseline, f"{key}: results diverged from plain/AQE-on"
            results[key] = {"best_sec": round(best, 2)}
            print(f"{key:28s} {best:7.2f}s", flush=True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out = {
        "n_fact": n_fact, "n_dim": n_dim, "skew_frac": SKEW_FRAC,
        "runs": RUNS, "results": results,
        "salted_speedup_aqe_off": round(
            results["plain_aqe_skew_off"]["best_sec"]
            / results["salted_aqe_skew_off"]["best_sec"], 2,
        ),
    }
    path = os.path.join(REPO, "bench_logs", f"bench_skew_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
