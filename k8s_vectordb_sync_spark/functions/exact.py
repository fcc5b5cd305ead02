"""Exact-integer rounding for ratio/share/rate columns.

round-on-double `round(CAST(num AS DOUBLE)/den, dp)` diverges between
Spark and DuckDB exactly when the true quotient lands on a 5e-(dp+1)
boundary: the quotient's nearest double sits on one side or the other,
and Spark's BigDecimal-of-shortest-repr HALF_UP disagrees with DuckDB's
C-library rounding about which. Integer counts divided by integer counts
land on those boundaries constantly (recall 141/2000 = 0.0705, share
7/200 = 0.035, ...). Integer half-away-from-zero —
sign(num/den) * floor((2*|num|*10^dp + |den|) / (2*|den|)) / 10^dp — has
no boundary to disagree about: both engines produce the identical
integer, and /10^dp of an integer this size is exact in a double.

Same discipline as operators/lm.py::exact_mean_4dp_expr (the round-9
parity-sweep bug class); these helpers are the ratio/share/rate-column
generalization VERDICT r9/r10 queued.

Width and safety (round 12, ADVICE r11):
- The scaled numerator runs in **DECIMAL(38,0)** on Spark and **HUGEINT**
  on DuckDB — ~1e38 of headroom vs int64's 9.2e18, so product numerators
  (lift's pair_n*n_orders, epochs' budget*scaled_units) and multi-MB
  document quality numerators stay exact instead of raising
  ARITHMETIC_OVERFLOW under ANSI. Call sites whose num/den are themselves
  int64-overflowing products must pre-cast ONE operand wide
  (`CAST(x AS DECIMAL(38,0)) * y` / `CAST(x AS HUGEINT) * y`) so the
  product never materializes in BIGINT. Both engines verified to agree
  bit-for-bit on the widened arithmetic (round-12 probe + unit tests).
- A zero denominator emits NULL — in BOTH engines, by an explicit CASE —
  instead of Spark ANSI DIVIDE_BY_ZERO killing the query while DuckDB's
  `// 0` returns NULL (the r11 bloom fp_rate crash class). Call sites no
  longer need their own guards, though redundant ones are harmless.
- Negative denominators are well-defined: the emission sign is
  sign(num)*sign(den) and the magnitude rounds half away from zero
  (needed by seasonal-index-style mean/mean ratios whose denominator sum
  may be negative).

Preconditions that remain: ``num_sql`` and ``den_sql`` must be EXACT
integer-valued expressions (counts, 1e-k-unit decimal sums) — the
discipline is meaningless over floats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# integral-value width carriers: ~1e38 headroom on both engines, exact
SPARK_WIDE = "DECIMAL(38,0)"
DUCK_WIDE = "HUGEINT"


def _spark_expr(num_sql: str, den_sql: str, dp: int) -> str:
    scale = 10 ** dp
    s = f"(CAST(({num_sql}) AS {SPARK_WIDE}) * {scale})"
    n = f"CAST(({den_sql}) AS {SPARK_WIDE})"
    q = f"((2 * abs({s}) + abs({n})) DIV (2 * abs({n})))"
    sign = f"(CASE WHEN ({s} < 0) != ({n} < 0) THEN -1 ELSE 1 END)"
    return (
        f"CASE WHEN {n} <> 0"
        f" THEN CAST({sign} * {q} AS DOUBLE) / {scale}.0 END"
    )


def _duck_expr(num_sql: str, den_sql: str, dp: int) -> str:
    scale = 10 ** dp
    s = f"(CAST(({num_sql}) AS {DUCK_WIDE}) * {scale})"
    n = f"CAST(({den_sql}) AS {DUCK_WIDE})"
    q = f"((2 * abs({s}) + abs({n})) // (2 * abs({n})))"
    sign = f"(CASE WHEN ({s} < 0) <> ({n} < 0) THEN -1 ELSE 1 END)"
    return (
        f"CASE WHEN {n} <> 0"
        f" THEN CAST({sign} * {q} AS DOUBLE) / {scale}.0 END"
    )


def exact_ratio(num_sql: str, den_sql: str, dp: int = 4) -> F.Column:
    """Spark Column: round(num/den, dp) entirely in exact integer
    arithmetic (DECIMAL(38,0)), half away from zero. Emits DOUBLE;
    NULL when den = 0."""
    return F.expr(_spark_expr(num_sql, den_sql, dp))


def sql_exact_ratio(num_sql: str, den_sql: str, dp: int = 4) -> str:
    """DuckDB rendering of exact_ratio — identical integer arithmetic in
    HUGEINT (`//` is DuckDB's integer floor-div; the floor operand is
    non-negative after abs), inlined into oracle strings."""
    return _duck_expr(num_sql, den_sql, dp)


def exact_mean_units(sum_units_sql: str, n_sql: str, dp: int = 4) -> F.Column:
    """Spark Column: round(sum/n, dp) where ``sum_units_sql`` is ALREADY an
    exact integer count of 1e-dp units (e.g. ``CAST(sv * 10000 AS BIGINT)``
    for a DECIMAL(_,4) sum) — the operators/lm.py::exact_mean_4dp_expr
    shape, generalized over dp so non-LM call sites stop hand-inlining it.
    The units expression itself widens to DECIMAL(38,0), so unit sums
    beyond int64 (multi-PB corpora at 1e-6 grain) stay exact."""
    scale = 10 ** dp
    s = f"(CAST(({sum_units_sql}) AS {SPARK_WIDE}))"
    n = f"CAST(({n_sql}) AS {SPARK_WIDE})"
    q = f"((2 * abs({s}) + abs({n})) DIV (2 * abs({n})))"
    sign = f"(CASE WHEN ({s} < 0) != ({n} < 0) THEN -1 ELSE 1 END)"
    return F.expr(
        f"CASE WHEN {n} <> 0"
        f" THEN CAST({sign} * {q} AS DOUBLE) / {scale}.0 END"
    )


def sql_exact_mean_units(sum_units_sql: str, n_sql: str, dp: int = 4) -> str:
    """DuckDB rendering of exact_mean_units."""
    scale = 10 ** dp
    s = f"(CAST(({sum_units_sql}) AS {DUCK_WIDE}))"
    n = f"CAST(({n_sql}) AS {DUCK_WIDE})"
    q = f"((2 * abs({s}) + abs({n})) // (2 * abs({n})))"
    sign = f"(CASE WHEN ({s} < 0) <> ({n} < 0) THEN -1 ELSE 1 END)"
    return (
        f"CASE WHEN {n} <> 0"
        f" THEN CAST({sign} * {q} AS DOUBLE) / {scale}.0 END"
    )
