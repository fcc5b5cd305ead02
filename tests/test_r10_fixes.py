"""Round-10 fixes pinned by fast unit tests:

- arr_lit (the single-Literal SQL-string rendering every trainer literal
  now rides) is value- and schema-identical to the historical elementwise
  F.array(*[F.lit(v)...]) tree, including NaN/Inf and exponent-repr
  doubles — the bit-identity claim the 34-query parity sweep proved
  end-to-end, locked here at unit granularity.
- choose_semantic_cap accepts pre-collected sweep rows (ADVICE r10: the
  tune CLI must not retrain k-means for the sizing rule).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_arr_lit_matches_elementwise_form(spark):
    from k8s_vectordb_sync_spark.operators.similarity import arr_lit

    vals = [
        0.0, -0.0, 0.125, 1.0 / 3.0, -2.5, 1e-17, 1.7976931348623157e308,
        12345678.901234567, float("nan"), float("inf"), float("-inf"),
    ]
    old = F.array(*[F.lit(float(v)) for v in vals])
    row = (
        spark.range(1)
        .select(
            arr_lit(vals).alias("a"),
            old.alias("b"),
            F.expr("null").alias("_"),
        )
        .selectExpr("a <=> b AS eq", "typeof(a) AS ta", "typeof(b) AS tb")
        .collect()[0]
    )
    assert row["eq"], "1-D literal values diverge"
    assert row["ta"] == row["tb"] == "array<double>"

    mat = [vals[:4], vals[4:8], [float("nan"), 1.0, -1.0, 0.5]]
    old2 = F.array(*[F.array(*[F.lit(float(v)) for v in r]) for r in mat])
    row2 = (
        spark.range(1)
        .select(arr_lit(mat).alias("a"), old2.alias("b"))
        .selectExpr("a <=> b AS eq", "typeof(a) AS ta", "typeof(b) AS tb")
        .collect()[0]
    )
    assert row2["eq"], "2-D literal values diverge"
    assert row2["ta"] == row2["tb"] == "array<array<double>>"


def test_arr_lit_roundtrips_exact_doubles(spark):
    """Every rendered literal must parse back to the bit-identical IEEE
    value — exercised on values whose repr takes each rendering branch
    (plain decimal + E0, existing exponent, NaN/Inf casts)."""
    import struct

    from k8s_vectordb_sync_spark.operators.similarity import arr_lit

    vals = [0.1, 1e-300, -3.141592653589793, 2.5e-10, 1234567890123.456]
    got = spark.range(1).select(arr_lit(vals).alias("a")).collect()[0]["a"]
    for want, have in zip(vals, got):
        assert struct.pack("<d", want) == struct.pack("<d", have), (want, have)


def test_choose_semantic_cap_accepts_collected_rows(spark):
    from k8s_vectordb_sync_spark.operators.similarity import choose_semantic_cap

    rows = [
        {"cap": 10, "rows_kept": 80, "overflow_rows": 20, "candidate_pairs": 300},
        {"cap": 40, "rows_kept": 100, "overflow_rows": 0, "candidate_pairs": 790},
        {"cap": 70, "rows_kept": 100, "overflow_rows": 0, "candidate_pairs": 5000},
    ]
    # budget 8 pairs/row over 100 rows = 800: cap 40 fits, cap 70 does not
    assert choose_semantic_cap(rows, pairs_per_row_budget=8.0) == 40
    # and the DataFrame path still works and agrees
    df = spark.createDataFrame(
        [(r["cap"], r["rows_kept"], r["overflow_rows"], r["candidate_pairs"]) for r in rows],
        "cap int, rows_kept bigint, overflow_rows bigint, candidate_pairs bigint",
    )
    assert choose_semantic_cap(df, pairs_per_row_budget=8.0) == 40
