"""Portable Bloom-filter semi-join pre-filtering (runtime-filter pattern).

At 100 TB the canonical join optimization is pushing a compact membership
summary of the selective (dimension/build) side into the fact-side SCAN, so
non-matching rows die before the shuffle — Spark does this automatically as
the runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
SPARK-32268) and as dynamic partition pruning. Spark's built-in
BloomFilterAggregate hashes with xxhash64, which no external engine
reproduces; this module is the *portable-arithmetic* form — md5-positioned
bits in BIGINT words — so the DuckDB oracle replays the identical filter and
the CORRECTNESS gate verifies the candidate set and realized false-positive
rate exactly, not just row counts.

Shape: the filter is BLOOM_WORDS longs built with one map-side-combinable
bit_or aggregation over the build keys, densified to a single-row array and
broadcast; the probe is pure per-row codegen arithmetic against that array
(no join, no shuffle on the fact side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import exact_ratio

from ..functions.text import md5_prefix_long

BLOOM_BITS = 65536  # 8 KB of bits — the size class real runtime filters use
# Bits live in the LOW 32 bits of BIGINT words: bit index = pos % 32, word =
# pos // 32. Using 32-bit slots sidesteps signed-shift pitfalls at bit 63
# (DuckDB raises on 1::BIGINT << 63) identically in both engines.
BLOOM_WORDS = BLOOM_BITS // 32
BLOOM_K = 3  # hash functions


def _hash_pos(key: Column, j: int) -> Column:
    """j-th bit position for a key: 60-bit md5 of 'j:key' mod BLOOM_BITS —
    identical in DuckDB."""
    return F.pmod(
        md5_prefix_long(F.concat(F.lit(f"{j}:"), key.cast("string"))),
        F.lit(BLOOM_BITS),
    )


def build_bloom(keys: DataFrame, key_col: str) -> DataFrame:
    """1-row frame (words: array<bigint> of length BLOOM_WORDS) with every
    key's BLOOM_K bits set. bit_or is associative/commutative, so the bit
    aggregation combines map-side; at most BLOOM_WORDS rows ever shuffle."""
    pos = keys.select(
        F.explode(
            F.array(*[_hash_pos(F.col(key_col), j) for j in range(BLOOM_K)])
        ).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright("pos", 5).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    dense = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m")
    )
    return dense.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(BLOOM_WORDS - 1)),
            lambda w: F.coalesce(F.element_at(F.col("m"), w), F.lit(0).cast("bigint")),
        ).alias("words")
    )


def might_contain_sql(key_sql: str, words_col: str = "words") -> str:
    """AND-of-K bit checks as a Spark SQL boolean (conv()-based hex->int;
    the DuckDB oracle mirrors the same positions with its 0x-cast idiom).
    Used by the Spark side via F.expr."""
    checks = []
    for j in range(BLOOM_K):
        pos = (
            f"(CAST(conv(substring(md5('{j}:' || CAST({key_sql} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            f" % {BLOOM_BITS})"
        )
        checks.append(
            f"((element_at({words_col}, CAST({pos} DIV 32 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pos} % 32 AS INT))) <> 0)"
        )
    return " AND ".join(checks)


def bloom_prejoin_audit(
    fact: DataFrame,
    build_keys: DataFrame,
    fact_key: str,
    build_key: str,
) -> DataFrame:
    """Single-row audit of bloom pre-filtering `fact` by the keys of
    `build_keys`: total fact rows, bloom candidates, true semi-join matches,
    realized false positives and non-member FP rate.

    The truth column comes from a broadcast left join against the DISTINCT
    build keys (selective by construction), so the whole audit is one fact
    scan with per-row bloom arithmetic — the exact plan a runtime filter
    produces, made explicit and measurable.
    """
    keys = build_keys.select(F.col(build_key).alias("__k")).distinct()
    bloom = build_bloom(keys, "__k")
    probed = (
        fact.select(F.col(fact_key).alias("__fk"))
        .crossJoin(F.broadcast(bloom))
        .withColumn("__hit", F.expr(might_contain_sql("__fk")))
        .join(
            F.broadcast(keys.withColumn("__is_member", F.lit(1))),
            F.col("__fk") == F.col("__k"),
            "left",
        )
    )
    return probed.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.when(F.col("__hit"), 1).otherwise(0)).alias("n_candidates"),
        F.sum(F.when(F.col("__is_member").isNotNull(), 1).otherwise(0)).alias(
            "n_true"
        ),
        F.sum(
            F.when(F.col("__hit") & F.col("__is_member").isNull(), 1).otherwise(0)
        ).alias("n_false_pos"),
    ).select(
        "n_fact",
        "n_candidates",
        "n_true",
        "n_false_pos",
        exact_ratio("n_false_pos", "n_fact - n_true", 6).alias("fp_rate"),
    )
