"""Empirically bound the class-3 float-statistic parity risk (VERDICT r11
item 3).

PLANS.md's round-on-double class 3 (avg/stddev over raw double columns,
sums of squared distances) keeps the double form by design — migrating
would redefine the statistic — with the argument that float summation
order perturbs the statistic by ~1e-13 relative, at least two decimal
orders below the 4-6 dp rounding granularity. This probe replaces the
argument with a measurement:

1. **Raw sensitivity**: for each class-3 base statistic (stddev_samp and
   avg over the raw double `events.value`, global and grouped; the PQ-style
   sum of squared distances over embeddings), compute the UNROUNDED double
   under K different physical partitionings (shuffle-partition counts x
   input-split sizes x AQE on/off) and record the max relative delta
   across configs. This is the number the class-3 argument asserts is
   ~1e-13.
2. **Emission stability**: run the registered class-3 queries end-to-end
   under the same K configs and require the ROUNDED emissions to be
   bit-identical across all configs (max delta == 0) — i.e. the rounding
   granularity absorbs the summation-order noise in practice.

All perturbation knobs are runtime-settable session confs, so one
SparkSession serves every config; partitionings genuinely change because
spark.sql.shuffle.partitions moves every exchange and
spark.sql.files.maxPartitionBytes moves the scan splits (map-side combine
order), and AQE coalescing reshapes post-shuffle partitions.

Writes one JSON line; committed readout: bench_logs/probe_float_stability_r12.json.
Fails loudly (non-zero exit) if any rounded emission moves at all, or if
the raw sensitivity is within two decimal orders of the tightest rounding
granularity (1e-6).

Usage: python scripts/probe_float_stability.py [sf_dir]
Defaults to bench_data/sf1 (the scale the class-3 argument is written for).
"""

from __future__ import annotations

import json
import math
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import functions as F  # noqa: E402

# The registered class-3 emission queries (PLANS.md round-11 class 3):
# stddev/avg over raw doubles and squared-distance sums reach the output
# through a 4-6 dp round in each of these.
EMISSION_QUERIES = [
    "events_user_zscore",        # avg/stddev_samp(value) over user windows
    "embeddings_standardize",    # per-dim mean/stddev_samp over doubles
    "events_autocorr_lag1",      # centered cross/auto products of doubles
    "events_daily_trend_ols",    # OLS normal equations over double sums
    "events_burst_hours",        # per-type hourly mean/stddev gate
    "embeddings_pq_recon_error", # squared-distance reconstruction sums
]

# (name, runtime conf overrides, reorder) — K = len(CONFIGS) partitionings.
# The first entry is the repo's standard posture and serves as the
# reference. `reorder` is (seed, n_partitions) or None: the raw statistics
# additionally run over a seeded hash-REPARTITIONED frame, because conf
# perturbation alone only moves partial-sum *boundaries* (measured: Spark's
# 10-vs-20-split double sums over this corpus came back bit-identical) —
# a genuinely different row-to-partition assignment is what changes
# summation order the way a different cluster size does.
CONFIGS = [
    ("baseline_32", {"spark.sql.shuffle.partitions": "32",
                     "spark.sql.files.maxPartitionBytes": "134217728",
                     "spark.sql.adaptive.enabled": "true"}, None),
    ("shuffle_7_reorder1", {"spark.sql.shuffle.partitions": "7",
                            "spark.sql.files.maxPartitionBytes": "134217728",
                            "spark.sql.adaptive.enabled": "true"}, (1, 37)),
    ("shuffle_61_reorder2", {"spark.sql.shuffle.partitions": "61",
                             "spark.sql.files.maxPartitionBytes": "134217728",
                             "spark.sql.adaptive.enabled": "true"}, (2, 64)),
    ("shuffle_128_noaqe_reorder3", {"spark.sql.shuffle.partitions": "128",
                                    "spark.sql.files.maxPartitionBytes": "134217728",
                                    "spark.sql.adaptive.enabled": "false"}, (3, 13)),
    ("splits_1mb_reorder4", {"spark.sql.shuffle.partitions": "32",
                             "spark.sql.files.maxPartitionBytes": "1048576",
                             "spark.sql.adaptive.enabled": "true"}, (4, 101)),
    ("splits_8mb_noaqe_reorder5", {"spark.sql.shuffle.partitions": "13",
                                   "spark.sql.files.maxPartitionBytes": "8388608",
                                   "spark.sql.adaptive.enabled": "false"}, (5, 53)),
]

ROUNDING_GRANULARITY = 1e-6  # the tightest emission rounding (6 dp)
RAW_BOUND = ROUNDING_GRANULARITY * 1e-2  # "two decimal orders below"


def _raw_stats(spark, sf_dir, reorder=None):
    """Unrounded class-3 base statistics under the CURRENT session confs.

    Returns {stat_name: float}. Each is a genuinely order-sensitive float
    reduction: global and per-type stddev/avg over events.value, and the
    corpus sum of squared per-element distances between each embedding and
    the global mean vector (the PQ/SSE shape). With ``reorder=(seed, n)``
    the frames are hash-repartitioned first, so the partial-aggregation
    row-to-partition assignment — hence float summation order — genuinely
    differs, the way it would on a different cluster size.
    """
    from k8s_vectordb_sync_spark.sources.tables import load_table

    def _shuffled(df, key_col):
        if reorder is None:
            return df
        seed, nparts = reorder
        return df.repartition(
            nparts, F.pmod(F.hash(F.col(key_col) + seed), F.lit(997))
        )

    ev = _shuffled(load_table(spark, sf_dir, "events"), "event_id")
    out = {}
    row = ev.agg(
        F.avg("value").alias("avg"),
        F.stddev_samp("value").alias("sd"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    ).collect()[0]
    out["events_value_avg"] = row["avg"]
    out["events_value_stddev"] = row["sd"]
    out["events_value_sumsq"] = row["ss"]
    for r in (
        ev.groupBy("event_type")
        .agg(F.stddev_samp("value").alias("sd"), F.avg("value").alias("avg"))
        .collect()
    ):
        out[f"stddev[{r['event_type']}]"] = r["sd"]
        out[f"avg[{r['event_type']}]"] = r["avg"]

    emb = _shuffled(load_table(spark, sf_dir, "embeddings"), "vec_id")
    dim = len(emb.select("embedding").first()["embedding"])
    mean_vec = emb.agg(
        *[F.avg(F.element_at("embedding", i + 1)).alias(f"m{i}") for i in range(dim)]
    ).collect()[0]
    sse_expr = None
    for i in range(dim):
        d = F.element_at("embedding", i + 1) - F.lit(float(mean_vec[f"m{i}"]))
        sse_expr = d * d if sse_expr is None else sse_expr + d * d
    out["embeddings_sse_vs_mean"] = emb.agg(F.sum(sse_expr)).collect()[0][0]
    return out


def _emission_rows(spark, sf_dir, name, queries):
    df = queries[name](spark, sf_dir)
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, rows


def _max_emission_delta(ref_rows, rows):
    """Max abs delta over float cells; inf on any structural mismatch."""
    if len(ref_rows) != len(rows):
        return float("inf")
    worst = 0.0
    for a, b in zip(ref_rows, rows):
        if len(a) != len(b):
            return float("inf")
        for x, y in zip(a, b):
            if isinstance(x, float) or isinstance(y, float):
                if x is None or y is None:
                    if x is not y:
                        return float("inf")
                    continue
                if math.isnan(x) and math.isnan(y):
                    continue
                worst = max(worst, abs(x - y))
            elif x != y:
                return float("inf")
    return worst


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "bench_data", "sf1"
    )
    from k8s_vectordb_sync_spark.session import build_spark
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    spark = build_spark(app_name="float-stability-probe")

    raw_by_config: dict[str, dict[str, float]] = {}
    emissions_ref: dict[str, tuple] = {}
    emission_worst: dict[str, float] = {q: 0.0 for q in EMISSION_QUERIES}

    for cfg_name, confs, reorder in CONFIGS:
        for k, v in confs.items():
            spark.conf.set(k, v)
        raw_by_config[cfg_name] = _raw_stats(spark, sf_dir, reorder)
        for q in EMISSION_QUERIES:
            cols, rows = _emission_rows(spark, sf_dir, q, queries)
            if q not in emissions_ref:
                emissions_ref[q] = (cols, rows)
            else:
                ref_cols, ref_rows = emissions_ref[q]
                if cols != ref_cols:
                    raise AssertionError(f"{q}: schema moved under {cfg_name}")
                emission_worst[q] = max(
                    emission_worst[q], _max_emission_delta(ref_rows, rows)
                )
        print(f"[probe] config {cfg_name} done", file=sys.stderr)

    # raw sensitivity: max relative delta across configs, per statistic
    ref_cfg = CONFIGS[0][0]
    raw_sensitivity = {}
    for stat, ref_val in raw_by_config[ref_cfg].items():
        worst = 0.0
        for cfg_name, _, _ in CONFIGS[1:]:
            v = raw_by_config[cfg_name][stat]
            if ref_val is None or v is None:
                worst = float("inf") if (v is not ref_val) else worst
                continue
            denom = max(abs(ref_val), 1e-300)
            worst = max(worst, abs(v - ref_val) / denom)
        raw_sensitivity[stat] = worst

    max_raw = max(raw_sensitivity.values())
    max_emission = max(emission_worst.values())
    report = {
        "sf_dir": sf_dir,
        "n_configs": len(CONFIGS),
        "configs": [c for c, _, _ in CONFIGS],
        "raw_max_relative_delta": max_raw,
        "raw_sensitivity": {k: v for k, v in sorted(raw_sensitivity.items())},
        "emission_max_abs_delta": max_emission,
        "emission_worst": emission_worst,
        "raw_bound_asserted": RAW_BOUND,
        "rounding_granularity": ROUNDING_GRANULARITY,
    }
    print(json.dumps(report))
    spark.stop()
    if max_emission != 0.0:
        print(
            f"FAIL: rounded class-3 emissions moved under repartitioning "
            f"(max abs delta {max_emission})",
            file=sys.stderr,
        )
        return 1
    if max_raw >= RAW_BOUND:
        print(
            f"FAIL: raw float-statistic sensitivity {max_raw:.3e} is within "
            f"two decimal orders of the {ROUNDING_GRANULARITY} rounding "
            f"granularity",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
