"""Exact-integer rounding for ratio/share/rate columns.

round-on-double `round(CAST(num AS DOUBLE)/den, dp)` diverges between
Spark and DuckDB exactly when the true quotient lands on a 5e-(dp+1)
boundary: the quotient's nearest double sits on one side or the other,
and Spark's BigDecimal-of-shortest-repr HALF_UP disagrees with DuckDB's
C-library rounding about which. Integer counts divided by integer counts
land on those boundaries constantly (recall 141/2000 = 0.0705, share
7/200 = 0.035, ...). Integer half-away-from-zero —
sign(num) * floor((2*|num|*10^dp + den) / (2*den)) / 10^dp — has no
boundary to disagree about: both engines produce the identical integer,
and /10^dp of an integer this size is exact in a double.

Same discipline as operators/lm.py::exact_mean_4dp_expr (the round-9
parity-sweep bug class); these helpers are the ratio/share/rate-column
generalization VERDICT r9/r10 queued. Preconditions: ``num_sql`` and
``den_sql`` are exact BIGINT expressions, ``den > 0`` (guard zero
denominators at the call site — division semantics differ between the
engines: NULL in Spark, NaN in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def exact_ratio(num_sql: str, den_sql: str, dp: int = 4) -> F.Column:
    """Spark Column: round(num/den, dp) entirely in BIGINT arithmetic,
    half away from zero. Emits DOUBLE."""
    scale = 10 ** dp
    s = f"(CAST({num_sql} AS BIGINT) * {scale})"
    n = f"CAST({den_sql} AS BIGINT)"
    return F.expr(
        f"CAST(CASE WHEN {s} < 0 THEN -1 ELSE 1 END"
        f" * ((2 * abs({s}) + {n}) DIV (2 * {n})) AS DOUBLE) / {scale}.0"
    )


def exact_mean_units(sum_units_sql: str, n_sql: str, dp: int = 4) -> F.Column:
    """Spark Column: round(sum/n, dp) where ``sum_units_sql`` is ALREADY an
    exact BIGINT count of 1e-dp units (e.g. ``CAST(sv * 10000 AS BIGINT)``
    for a DECIMAL(_,4) sum) — the operators/lm.py::exact_mean_4dp_expr
    shape, generalized over dp so non-LM call sites stop hand-inlining
    it."""
    scale = 10 ** dp
    s, n = f"({sum_units_sql})", f"CAST({n_sql} AS BIGINT)"
    return F.expr(
        f"CAST(CASE WHEN {s} < 0 THEN -1 ELSE 1 END"
        f" * ((2 * abs({s}) + {n}) DIV (2 * {n})) AS DOUBLE) / {scale}.0"
    )


def sql_exact_mean_units(sum_units_sql: str, n_sql: str, dp: int = 4) -> str:
    """DuckDB rendering of exact_mean_units."""
    scale = 10 ** dp
    s, n = f"({sum_units_sql})", f"CAST({n_sql} AS BIGINT)"
    return (
        f"CAST(CASE WHEN {s} < 0 THEN -1 ELSE 1 END"
        f" * ((2 * abs({s}) + {n}) // (2 * {n})) AS DOUBLE) / {scale}.0"
    )


def sql_exact_ratio(num_sql: str, den_sql: str, dp: int = 4) -> str:
    """DuckDB rendering of exact_ratio — identical integer arithmetic
    (`//` is DuckDB's integer floor-div; the floor operand is non-negative
    after abs), inlined into oracle strings."""
    scale = 10 ** dp
    s = f"(CAST({num_sql} AS BIGINT) * {scale})"
    n = f"CAST({den_sql} AS BIGINT)"
    return (
        f"CAST(CASE WHEN {s} < 0 THEN -1 ELSE 1 END"
        f" * ((2 * abs({s}) + {n}) // (2 * {n})) AS DOUBLE) / {scale}.0"
    )
