"""functions/exact.py width + guard semantics (r12, ADVICE r11 closures).

The exact-integer rounding helpers must:
- emit NULL on a zero denominator in BOTH engines (previously Spark ANSI
  raised DIVIDE_BY_ZERO where DuckDB returned NULL — the bloom fp_rate
  crash class);
- carry the scaled numerator in DECIMAL(38,0)/HUGEINT so products beyond
  int64 stay exact instead of raising ARITHMETIC_OVERFLOW;
- round half away from zero with the sign of num/den for every sign
  combination (negative denominators appear in mean/mean ratios);
- agree bit-for-bit between Spark and DuckDB on all of the above.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from k8s_vectordb_sync_spark.functions.exact import (
    exact_mean_units,
    exact_ratio,
    sql_exact_mean_units,
    sql_exact_ratio,
)

# (num_sql, den_sql, dp, expected) — expected computed by hand via
# sign * floor((2*|num|*10^dp + |den|) / (2*|den|)) / 10^dp
CASES = [
    ("141", "2000", 4, 0.0705),
    ("7", "200", 4, 0.035),
    ("-7", "200", 4, -0.035),
    ("7", "-200", 4, -0.035),
    ("-7", "-200", 4, 0.035),
    ("1", "0", 4, None),
    ("0", "5", 4, 0.0),
    ("1", "3", 6, 0.333333),
    ("2", "3", 6, 0.666667),
]

# int64-overflowing product: 3e6 * 4e12 * 10^6 * 2 = 2.4e25 >> 9.2e18.
# Exact value 12e18/30e18 = 0.4.
WIDE_NUM_SPARK = "CAST(3000000 AS DECIMAL(38,0)) * 4000000000000"
WIDE_DEN_SPARK = "CAST(5000000000 AS DECIMAL(38,0)) * 6000000000"
WIDE_NUM_DUCK = "CAST(3000000 AS HUGEINT) * 4000000000000"
WIDE_DEN_DUCK = "CAST(5000000000 AS HUGEINT) * 6000000000"


def _spark_scalar(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _duck_scalar(sql):
    return duckdb.connect().execute(f"SELECT {sql}").fetchone()[0]


@pytest.mark.parametrize("num,den,dp,expected", CASES)
def test_exact_ratio_sign_zero_matrix_both_engines(spark, num, den, dp, expected):
    s = _spark_scalar(spark, exact_ratio(num, den, dp))
    d = _duck_scalar(sql_exact_ratio(num, den, dp))
    assert s == expected
    assert d == expected


def test_exact_ratio_wide_product_agrees_beyond_int64(spark):
    s = _spark_scalar(spark, exact_ratio(WIDE_NUM_SPARK, WIDE_DEN_SPARK, 6))
    d = _duck_scalar(sql_exact_ratio(WIDE_NUM_DUCK, WIDE_DEN_DUCK, 6))
    # reference: exact integer arithmetic in unbounded Python ints — the
    # floor must be integer floor division (//), not math.floor over a
    # float quotient: (2*num+den)/(2*den) on ~1e25-digit ints goes through
    # a 53-bit double, which a half-boundary case could round across the
    # floor boundary (ADVICE r12).
    num, den = 3000000 * 4000000000000 * 10**6, 5000000000 * 6000000000
    expected = ((2 * num + den) // (2 * den)) / 10**6
    assert s == d == expected == 0.4


def test_exact_mean_units_zero_count_is_null_both_engines(spark):
    assert _spark_scalar(spark, exact_mean_units("12345", "0", 4)) is None
    assert _duck_scalar(sql_exact_mean_units("12345", "0", 4)) is None


def test_exact_mean_units_matches_ratio_semantics(spark):
    # 1234567 units of 1e-4 over 3 rows: floor((2*1234567 + 3) / 6) / 1e4
    # = 411522 / 1e4 = 41.1522
    s = _spark_scalar(spark, exact_mean_units("1234567", "3", 4))
    d = _duck_scalar(sql_exact_mean_units("1234567", "3", 4))
    assert s == d == 41.1522


def test_bloom_fp_rate_all_members_emits_null_not_crash(spark, sf_dir):
    """The ADVICE r11 medium: when every fact key is a build member,
    n_fact - n_true == 0 and the fp_rate division must emit NULL under
    ANSI instead of DIVIDE_BY_ZERO."""
    from k8s_vectordb_sync_spark.operators.bloom import bloom_prejoin_audit
    from k8s_vectordb_sync_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(50)
    row = bloom_prejoin_audit(ev, ev, "user_id", "user_id").collect()[0]
    assert row["n_fact"] == row["n_true"]
    assert row["fp_rate"] is None
