"""Distributed mergeable sketches: HyperLogLog distinct counting and
Count-Min frequency estimation.

At 100 TB, exact COUNT(DISTINCT) is an expensive two-phase expand and exact
per-key counts over a heavy-tailed vocabulary shuffle the whole token
stream; sketches answer both with KB-sized, map-side-combinable state —
the canonical trade at scale (Flajolet et al., "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm", AofA'07; Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch and
its applications", J. Algorithms 2005).

Spark ships approx_count_distinct (HLL++) and CountMinSketch, but their
hash functions don't match any external oracle. These implementations make
the sketch itself *portable arithmetic*: md5-based hashing and pure
integer bucket state, so DuckDB replays the identical sketch and the
CORRECTNESS gate can hash-compare estimates, not just row counts.

Determinism discipline:
  * All hash/bucket/rho math is 64-bit integer — bit-identical anywhere.
  * The HLL harmonic sum is computed as an exact BIGINT (rho capped at
    RHO_CAP so 2^(CAP-rho) fits; the cap changes estimates by < 1e-6 ulp at
    any realistic cardinality and both engines apply it identically), so
    the only floats are a final constant/S division and ln() in the
    small-range correction — identical expression trees both sides.
  * The aggregation state is per-(group, bucket) MAX — associative and
    commutative, so Spark combines it map-side and a 1000-executor
    cluster shuffles 256 rows per group, not the key stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_prefix_long

# --- HyperLogLog -----------------------------------------------------------

HLL_P = 8  # 2^8 = 256 buckets -> ~6.5% standard error, 256 longs of state
HLL_M = 1 << HLL_P
HLL_HASH_BITS = 60  # md5_prefix_long yields a 60-bit non-negative hash
HLL_W_BITS = HLL_HASH_BITS - HLL_P  # bits left for the rho pattern
HLL_RHO_CAP = 40  # keeps 2^(CAP - rho) summable in BIGINT: 256 * 2^40 << 2^63
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # bias constant for m >= 128
# alpha * m^2 * 2^CAP, folded to ONE Python float so both engines divide the
# same literal by the same exact integer sum.
HLL_NUMERATOR = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_CAP)
HLL_SMALL_RANGE = 2.5 * HLL_M


def hll_rho(w: Column) -> Column:
    """Position of the first 1-bit (from the MSB of the W_BITS window) of a
    non-negative integer, capped at HLL_RHO_CAP. bin() renders the minimal
    binary string in both Spark and DuckDB, so rho = W_BITS - bitlen + 1."""
    bitlen = F.length(F.bin(w))
    rho = F.when(w > 0, F.lit(HLL_W_BITS + 1) - bitlen).otherwise(
        F.lit(HLL_W_BITS + 1)
    )
    return F.least(rho, F.lit(HLL_RHO_CAP))


def hll_bucket_maxes(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """The sketch STATE: per-(group, bucket) max rho. This is the mergeable
    part — a plain MAX aggregation, so it runs map-side-combined in batch
    AND as an incremental stateful aggregation under Structured Streaming
    (the streaming form of distinct counting: 256 state rows per group
    instead of one row per key)."""
    h = md5_prefix_long(F.col(key_col).cast("string"))
    return (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(HLL_M)).alias("__bucket"),
            hll_rho(F.shiftright(h, HLL_P)).alias("__rho"),
        )
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__rho").alias("__maxrho"))
    )


def hll_estimate(buckets: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finalize bucket-max state into (group_cols..., __est)."""
    # Exact BIGINT harmonic sum: present buckets contribute 2^(CAP - maxrho),
    # each absent bucket contributes 2^CAP (rho = 0).
    per_group = buckets.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - __maxrho)")
        ).alias("__s_present"),
        F.count(F.lit(1)).alias("__present"),
    )
    v = F.lit(HLL_M) - F.col("__present")  # empty buckets
    s = F.col("__s_present") + v * F.lit(1 << HLL_RHO_CAP)
    e_raw = F.lit(HLL_NUMERATOR) / s
    # Linear-counting small-range correction (the standard HLL recipe).
    estimate = F.when(
        (e_raw <= F.lit(HLL_SMALL_RANGE)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(e_raw)
    return per_group.select(*group_cols, estimate.alias("__est"))


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate next to the exact count.

    Returns (group_cols..., n_exact, n_hll, rel_err). The exact side is the
    audit column (feasible at test scale; the point of the sketch is that
    at 100 TB you'd keep only the 256-long state). rel_err is the realized
    |estimate - exact| / exact.
    """
    est = hll_estimate(hll_bucket_maxes(df, key_col, group_cols), group_cols)

    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    return exact.join(est, group_cols).select(
        *group_cols,
        "n_exact",
        F.round("__est", 2).alias("n_hll"),
        F.round(
            F.abs(F.col("__est") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
    )


# --- Count-Min sketch ------------------------------------------------------

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 64  # buckets per row


def cms_bucket(term: Column, row: int) -> Column:
    """Row-salted md5 bucket, identical to the oracle's
    ('0x' || substr(md5(row || ':' || term), 1, 15))::BIGINT % WIDTH."""
    return F.pmod(
        md5_prefix_long(F.concat(F.lit(f"{row}:"), term)), F.lit(CMS_WIDTH)
    )


def cms_heavy_hitters(
    documents: DataFrame,
    top_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Count-Min estimates vs exact counts for the top-N corpus terms.

    Scale shape: the corpus collapses to a vocabulary-sized (term, cf)
    frame in ONE map-side-combined shuffle; the sketch is then built from
    that frame (equivalent to streaming every occurrence, since the sketch
    adds are linear) as DEPTH x WIDTH = 256 rows of exact integer state.
    The heavy-hitter probe joins the (tiny, broadcast) sketch back to the
    top-N terms; cms_n >= exact_n always (one-sided error), and the gap is
    the realized collision overestimate.
    """
    from ..functions import text as T

    cf = (
        documents.select(F.explode(T.tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"))
    )
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), cms_bucket(F.col("term"), j).alias("b"))
            for j in range(CMS_DEPTH)
        ]
    )
    sketch = (
        cf.select(F.col("cf"), F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.j").alias("j"), F.col("rb.b").alias("b"))
        .agg(F.sum("cf").alias("bucket_n"))
    )
    top = (
        cf.orderBy(F.col("cf").desc(), F.col("term").asc())
        .limit(top_n)
        .select("term", F.col("cf").alias("exact_n"))
    )
    probes = top.select(
        "term", "exact_n", F.explode(rows).alias("rb")
    ).select("term", "exact_n", F.col("rb.j").alias("j"), F.col("rb.b").alias("b"))
    return (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("term", "exact_n")
        .agg(F.min("bucket_n").alias("cms_n"))
        .select(
            "term",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
        )
    )


# --- histogram quantile sketch ---------------------------------------------

QSK_BINS = 256
QSK_LO = 0.0
QSK_HI = 512.0  # fixed domain -> mergeable without re-binning
QSK_WIDTH = (QSK_HI - QSK_LO) / QSK_BINS


def quantile_sketch_estimates(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[float],
) -> DataFrame:
    """Single-pass mergeable quantile estimation: a fixed-domain equi-width
    histogram (256 integer buckets — map-side-combinable, mergeable across
    partitions/days without re-binning) inverted by linear interpolation
    within the target bin. The 100 TB answer to percentiles: exact
    percentile needs a per-group sort; the sketch needs one aggregation.

    Returns (group_cols..., q, est, exact, abs_err) with the exact value
    computed alongside as the audit column. All estimator arithmetic is
    integer counts + literal quantiles, so the oracle replays it exactly.
    """
    v = F.col(value_col)
    bin_ = F.least(
        F.greatest(F.floor((v - F.lit(QSK_LO)) / F.lit(QSK_WIDTH)), F.lit(0)),
        F.lit(QSK_BINS - 1),
    ).cast("bigint")
    hist = (
        df.select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("n"),
    )
    qf = F.explode(F.array(*[F.lit(q) for q in quantiles])).alias("q")
    targeted = cum.select(*group_cols, "bin", "cnt", "cum", "n", qf).withColumn(
        "target", F.col("q") * F.col("n")
    )
    # the unique bin whose cumulative range covers the target rank
    hit = targeted.filter(
        (F.col("cum") >= F.col("target"))
        & ((F.col("cum") - F.col("cnt")) < F.col("target"))
    )
    est = (
        F.lit(QSK_LO)
        + F.col("bin") * F.lit(QSK_WIDTH)
        + F.lit(QSK_WIDTH)
        * (F.col("target") - (F.col("cum") - F.col("cnt")))
        / F.col("cnt")
    )
    sketch = hit.select(*group_cols, "q", F.round(est, 6).alias("est"))

    exact = (
        df.groupBy(*group_cols)
        .agg(*[
            F.expr(f"percentile({value_col}, {q!r})").alias(f"__p{i}")
            for i, q in enumerate(quantiles)
        ])
        .select(
            *group_cols,
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(q).alias("q"), F.col(f"__p{i}").alias("exact")
                    )
                    for i, q in enumerate(quantiles)
                ])
            ).alias("qe"),
        )
        .select(*group_cols, F.col("qe.q").alias("q"), F.col("qe.exact").alias("exact"))
    )
    return sketch.join(exact, [*group_cols, "q"]).select(
        *group_cols,
        "q",
        "est",
        F.round("exact", 6).alias("exact"),
        F.round(F.abs(F.col("est") - F.col("exact")), 6).alias("abs_err"),
    )


def hll_union(
    df: DataFrame, key_col: str, group_col: str, groups: list[str]
) -> DataFrame:
    """Union cardinality from MERGED sketches: per-bucket MAX across the
    selected groups' bucket-max states — the mergeability property that
    makes HLL the distributed distinct counter (states union with max, no
    raw data revisited). Returns one row: n_exact (exact union distinct),
    n_hll (estimate from the merged state), rel_err."""
    sub = df.filter(F.col(group_col).isin(groups))
    tagged = sub.withColumn("__all", F.lit("union"))
    merged = hll_bucket_maxes(tagged, key_col, ["__all"])
    est = hll_estimate(merged, ["__all"])
    exact = tagged.groupBy("__all").agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    return exact.join(est, "__all").select(
        "n_exact",
        F.round("__est", 2).alias("n_hll"),
        F.round(
            F.abs(F.col("__est") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
    )


def hll_intersection(
    df: DataFrame, key_col: str, group_col: str, type_a: str, type_b: str
) -> DataFrame:
    """Intersection cardinality via inclusion-exclusion over HLL states:
    |A ∩ B| ≈ hll(A) + hll(B) − hll(A ∪ B).

    HLL states union losslessly (per-bucket MAX) but cannot intersect, so
    the standard recipe estimates the overlap by inclusion-exclusion over
    three sketches — the segment-overlap question ("how many users did BOTH
    X and Y") answered from KB-sized mergeable state instead of a key-level
    join. The estimate inherits the error of all three sketches and can go
    negative for small overlaps; it is clamped at 0, and the exact overlap
    (feasible at test scale) rides along as the audit column.

    Returns ONE row — (type_a, type_b, n_hll_a, n_hll_b, n_hll_union,
    n_hll_inter, n_exact_inter) — when any row of either group exists, and
    ZERO rows otherwise (the empty-input contract the oracle mirrors with
    a COUNT gate). A group with no rows estimates 0.0 (the empty sketch).
    """
    sub = df.filter(F.col(group_col).isin([type_a, type_b])).select(
        group_col, key_col
    )
    tagged = sub.withColumn("__all", F.lit("u"))
    u = hll_estimate(hll_bucket_maxes(tagged, key_col, ["__all"]), ["__all"]).select(
        F.lit(1).alias("__j"), F.col("__est").alias("__est_u")
    )
    per = hll_estimate(hll_bucket_maxes(sub, key_col, [group_col]), [group_col])
    ea = per.filter(F.col(group_col) == type_a).select(
        F.lit(1).alias("__j"), F.col("__est").alias("__est_a")
    )
    eb = per.filter(F.col(group_col) == type_b).select(
        F.lit(1).alias("__j"), F.col("__est").alias("__est_b")
    )
    flags = sub.groupBy(key_col).agg(
        F.max(F.when(F.col(group_col) == type_a, 1).otherwise(0)).alias("__fa"),
        F.max(F.when(F.col(group_col) == type_b, 1).otherwise(0)).alias("__fb"),
    )
    inter = flags.agg(
        F.coalesce(
            F.sum(F.when((F.col("__fa") == 1) & (F.col("__fb") == 1), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_exact_inter")
    ).withColumn("__j", F.lit(1))
    est_a = F.coalesce(F.col("__est_a"), F.lit(0.0))
    est_b = F.coalesce(F.col("__est_b"), F.lit(0.0))
    est_i = F.greatest(est_a + est_b - F.col("__est_u"), F.lit(0.0))
    return (
        u.join(ea, "__j", "left")
        .join(eb, "__j", "left")
        .join(inter, "__j", "left")
        .select(
            F.lit(type_a).alias("type_a"),
            F.lit(type_b).alias("type_b"),
            F.round(est_a, 2).alias("n_hll_a"),
            F.round(est_b, 2).alias("n_hll_b"),
            F.round(F.col("__est_u"), 2).alias("n_hll_union"),
            F.round(est_i, 2).alias("n_hll_inter"),
            F.col("n_exact_inter"),
        )
    )
