"""Deterministic sampling operators for training-data curation.

Sampling for a 100 TB corpus must be (a) reproducible across runs/engines —
so no ``rand()`` — and (b) a pure per-row predicate — so it pushes into the
scan stage with zero shuffle. Both come from hashing a stable row key: a row
is kept iff ``md5_60bit(strata ':' key) mod GRAIN < rate * GRAIN``. The md5
prefix hash matches DuckDB bit-for-bit (functions.text.md5_prefix_long), so
the oracle reproduces the exact sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import md5_prefix_long
from ..functions.exact import exact_ratio

# per-ten-thousand rate grain: rates are exact multiples of 0.01%
GRAIN = 10_000


def sample_hash(strata: Column, key: Column) -> Column:
    """Uniform [0, GRAIN) hash of (strata, key) — the sampling coin flip."""
    return F.pmod(
        md5_prefix_long(F.concat(strata, F.lit(":"), key.cast("string"))),
        F.lit(GRAIN),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "doc_id",
    strata_col: str = "source",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability ``rates[s]`` (deterministic
    in the row key). Up/down-weighting sources is the standard knob for
    training-data mixes; the hash predicate makes every engine and every run
    agree on the exact surviving row set.

    Scale: a literal-map lookup + hash compare per row — no shuffle, no join,
    and Catalyst keeps it inside the scan's WholeStageCodegen; a stratum
    whose rate is 0 still scans (predicate, not partition pruning) — lay the
    table out partitioned by ``strata_col`` if dropped strata must not be
    read at all.
    """
    # thresholds become integer literals at plan-build time (same Python
    # round() the SQL-oracle generator uses — a Column-side F.round would
    # HALF_UP where Python banker's-rounds, silently diverging on tie rates)
    default_threshold = round(float(default_rate) * GRAIN)
    if rates:
        mapping = F.create_map(
            *[
                F.lit(x)
                for s, r in rates.items()
                for x in (s, round(float(r) * GRAIN))
            ]
        )
        threshold = F.coalesce(
            mapping[F.col(strata_col)], F.lit(default_threshold)
        ).cast("bigint")
    else:
        threshold = F.lit(default_threshold).cast("bigint")
    return df.filter(
        sample_hash(F.col(strata_col), F.col(key_col)) < threshold
    )


def fixed_size_sample(
    df: DataFrame,
    n_per_stratum: int,
    key_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Exactly min(N, |stratum|) rows per stratum, deterministically: rank
    rows inside each stratum by (sampling hash, key) and keep the first N.
    The hash order is uniform and engine-reproducible, so this is a
    reproducible uniform sample with a hard size guarantee — what
    rate-based sampling can't give when a downstream stage needs exactly-N
    examples per source.

    Scale: one hash-partitioned window per stratum. A dominant stratum puts
    its whole population through one task's sort; for pathological skew,
    pre-filter with ``stratified_sample`` at a rate that overshoots N by a
    safety factor, then rank the survivors — the window then sorts
    O(N * factor) rows regardless of stratum size.
    """
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(F.col(strata_col), F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def mixture_weights(
    df: DataFrame,
    token_count: Column,
    strata_col: str = "source",
    alpha: float = 0.5,
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source mixture for a training run: weight each
    stratum s by n_s^alpha / sum_j n_j^alpha (alpha<1 upsamples the tail —
    the standard multi-source LM mixing rule), and report the effective
    epochs each stratum sustains at ``token_budget`` total training tokens
    (epochs > 1 means the source repeats).

    Scale: one partial-aggregated groupBy over the corpus (map-side combine
    carries (count, sum) pairs), then a scalar total and a broadcast of a
    handful of stratum rows — the corpus is read once, everything after the
    first aggregate is O(#strata).

    Determinism: n_s^alpha is a per-group scalar (exact), but the total is a
    sum of doubles whose order Spark and DuckDB need not agree on — so the
    scaled counts are rounded to 6 places and summed as DECIMAL(28,6),
    which is exact and order-independent; both engines then divide the same
    decimals. alpha=0.5 uses sqrt() (IEEE-exact in both engines) rather
    than pow().
    """
    if alpha == 0.5:
        scaled = F.sqrt(F.sum(token_count).cast("double"))
    else:
        scaled = F.pow(F.sum(token_count).cast("double"), F.lit(float(alpha)))
    per = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count).cast("bigint").alias("n_tokens"),
        F.round(scaled, 6).cast("decimal(28,6)").alias("scaled"),
    )
    # total via an unpartitioned window over the per-stratum aggregate: the
    # frame is O(#strata) rows at this point, so one partition is fine — and
    # unlike a separate agg + crossJoin it does NOT fork the plan into two
    # full corpus scans (Spark recomputes unpersisted branches)
    out = per.withColumn(
        "total_scaled", F.sum("scaled").over(Window.partitionBy())
    )
    # divide as doubles: the decimal inputs are already exact and identical
    # across engines, IEEE division keeps them identical
    # zero-guards: a stratum with zero tokens would divide 0/0 (NULL in
    # Spark, NaN in DuckDB); emit 0.0 explicitly in both engines
    weight = F.when(
        F.col("total_scaled") > 0,
        F.col("scaled").cast("double") / F.col("total_scaled").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "stratum",
        "n_docs",
        "n_tokens",
        # the decimals are exact 1e-6-unit integers, so both rounded
        # emissions ride the exact-integer discipline (functions/exact.py);
        # epochs migrated off round-on-double in r12 — the DECIMAL(38,0)/
        # HUGEINT-widened helper keeps budget * scaled_units * 10^6 (~1e21
        # at the 100 TB target) exact, where int64 overflowed
        F.when(
            F.col("total_scaled") > 0,
            exact_ratio("scaled * 1000000", "total_scaled * 1000000", 6),
        )
        .otherwise(F.lit(0.0))
        .alias("weight"),
        F.when(
            (F.col("n_tokens") > 0) & (F.col("total_scaled") > 0),
            exact_ratio(
                f"CAST(scaled * 1000000 AS DECIMAL(38,0)) * {int(token_budget)}",
                "CAST(total_scaled * 1000000 AS DECIMAL(38,0)) * n_tokens",
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("epochs"),
    )


SPLIT_SALT = "split"
SPLIT_BOUNDS = (80, 90)  # train < 80, val < 90, test otherwise (percent)


def train_split(
    df: DataFrame,
    key_col: str = "doc_id",
    bounds: tuple[int, int] = SPLIT_BOUNDS,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Deterministic train/val/test assignment: a pure per-row hash predicate
    (zero shuffle, pushes into the scan), reproducible across engines, runs
    and cluster sizes — the property a 100 TB split MUST have so val/test
    membership never drifts when the corpus is re-partitioned or appended.
    Salting the hash decorrelates the split from every sampling operator
    that hashes the same key."""
    pct = F.pmod(
        md5_prefix_long(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))),
        F.lit(100),
    )
    split = (
        F.when(pct < bounds[0], F.lit("train"))
        .when(pct < bounds[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis, IPL'06):
    each row draws a deterministic uniform u from its hashed key and gets
    priority ln(u)/w — the top-n priorities are an exact weighted sample.
    ln(u)/w is the monotone log form of the classic u^(1/w) key, avoiding
    pow()'s cross-platform wobble; priorities are rounded to 9 decimals
    before ranking so both engines order identically.

    Scale shape: the priority is per-row codegen; the top-n cut is a global
    TakeOrderedAndProject (no global sort). Zero-weight rows draw priority
    -inf and can never be selected ahead of a weighted row.
    """
    u = (
        md5_prefix_long(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
        + F.lit(1)
    ) / F.lit(float(1 << 60))  # u in (0, 1]
    w = F.col(weight_col).cast("double")
    priority = F.when(
        w > 0, F.round(F.log(u) / w, 9)
    ).otherwise(F.lit(float("-inf")))
    return (
        df.withColumn("priority", priority)
        .orderBy(F.col("priority").desc(), F.col(key_col).asc())
        .limit(n)
    )


def budget_allocation(
    df: DataFrame,
    total_n: int,
    strata_col: str = "source",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed sample budget
    across strata: stratum s gets base_s = floor(N * n_s / n) rows, and the
    N - sum(base) leftover seats go to the strata with the largest division
    remainders (ties by stratum name asc). Capped at the stratum population,
    so the realized total is exactly min(N, n). This is the allocation rule
    survey samplers use for proportional allocation with a hard total — the
    budget-constrained knob rate-based sampling can't give.

    Output: (stratum, n_rows, base, rem, alloc).

    Exactness: N * n_s runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB
    oracle) — at a 1e6-row budget over a 1e13-row stratum the product is
    ~1e19, past int64; the widened arithmetic keeps floor/mod exact on both
    engines with ~1e38 headroom. base/rem/alloc re-narrow to BIGINT (each is
    bounded by N or n).

    Scale shape: one map-side-combined count per stratum, then all windows
    run over the O(#strata) aggregate frame (the mixture_weights pattern) —
    the corpus is scanned once; the ordered leftover rank is a bounded-frame
    unpartitioned window, documented in the plan-lint whitelist.
    """
    n_lit = int(total_n)
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    tot = counts.withColumn("n", F.sum("n_rows").over(Window.partitionBy()))
    based = tot.select(
        "stratum",
        "n_rows",
        F.expr(
            f"CAST(CAST(n_rows AS DECIMAL(38,0)) * {n_lit} "
            f"DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("base"),
        F.expr(
            f"CAST(pmod(CAST(n_rows AS DECIMAL(38,0)) * {n_lit}, "
            f"CAST(n AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("rem"),
    )
    staged = based.withColumn(
        "leftover", F.lit(n_lit) - F.sum("base").over(Window.partitionBy())
    ).withColumn(
        "pr",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col("stratum").asc())
        ),
    )
    # a bonus seat always lands on a stratum with rem > 0 (the leftover count
    # is sum(rem)/n, strictly below the number of nonzero remainders), so
    # base + 1 <= n_rows whenever N <= n; least() also covers the N > n case
    # (keep the whole stratum).
    return staged.select(
        "stratum",
        "n_rows",
        "base",
        "rem",
        F.least(
            F.col("base")
            + F.when(F.col("pr") <= F.col("leftover"), F.lit(1)).otherwise(
                F.lit(0)
            ),
            F.col("n_rows"),
        )
        .cast("bigint")
        .alias("alloc"),
    )


def budget_sample(
    df: DataFrame,
    total_n: int,
    key_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Stratified/reservoir hybrid sampler with a hard total budget: allocate
    exactly N rows across strata proportionally (budget_allocation), then
    take each stratum's allocation as its reservoir — the top-alloc rows by
    a deterministic uniform hash tag. Ranking rows by a uniform random tag
    and keeping the smallest k IS reservoir sampling in its mergeable,
    distribution-friendly form (each partition keeps a partial top-k, merged
    by the shuffle) — with a hashed tag instead of rand() so every engine
    and every run draws the identical sample (the oracle reproduces it
    bit-for-bit).

    Scale shape: one count aggregate for the allocation (O(#strata) rows,
    broadcast back), one hash-partitioned window per stratum for the rank.
    A dominant stratum puts its population through one task's sort — same
    mitigation as fixed_size_sample: pre-thin with stratified_sample at a
    rate overshooting its allocation, then rank the survivors.
    """
    alloc = budget_allocation(df, total_n, strata_col)
    w = Window.partitionBy(strata_col).orderBy(
        sample_hash(F.col(strata_col), F.col(key_col)), F.col(key_col)
    )
    ranked = df.withColumn("rk", F.row_number().over(w).cast("bigint"))
    return ranked.join(
        F.broadcast(
            alloc.select(F.col("stratum").alias(strata_col), "alloc")
        ),
        strata_col,
    ).filter(F.col("rk") <= F.col("alloc"))


def group_cap(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    cap: int,
) -> DataFrame:
    """Per-group quota: keep the top ``cap`` rows of each group by
    (order_col desc, tiebreak_col asc), with a ``rnk`` column 1..cap.

    The pretraining-corpus shape: cap documents per domain/source so one
    crawler-friendly site cannot dominate the mixture (the C4/RefinedWeb
    per-domain quota), keeping the highest-quality documents within the
    budget.

    Two-phase rank (the topk_per_query pattern from operators.similarity):
    phase 1 ranks within (group, input-partition) and keeps cap, so the
    phase-2 exchange receives at most cap x #partitions rows per group —
    a mega-domain holding 1% of a 100 TB corpus never lands on one reducer.
    Identical results to the single-window form: both phases share one total
    order and each partition's local top-cap is a superset of its
    contribution to the group's global top-cap.
    """
    order = [F.col(order_col).desc(), F.col(tiebreak_col).asc()]
    wp = Window.partitionBy(group_col, "__part").orderBy(*order)
    pruned = (
        df.withColumn("__part", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(wp))
        .filter(F.col("__lr") <= cap)
        .drop("__part", "__lr")
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return pruned.withColumn("rnk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rnk") <= cap
    )
