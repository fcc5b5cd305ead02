"""Vector math as Column expressions over array<float> embedding columns.

JVM-side (zip_with / aggregate higher-order functions): no serialization to
Python per row, runs in codegen. For large top-k scans a Pandas-UDF variant
exists in operators.similarity (numpy matmul beats per-element JVM loops when
the batch is wide), but these expressions are the portable, oracle-matching
core. All arithmetic in double precision with sequential left-to-right
summation so DuckDB's list_* fold order reproduces the values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def quantize_int8(a: Column) -> Column:
    """Symmetric int8 quantization: q_j = floor(x_j * 127 / max|x| + 0.5).

    The storage-scale path for embedding columns: 4x smaller than float32,
    8x smaller than float64 — at 100 TB of vectors that is the difference
    between a broadcastable index and not. floor(x+0.5) (not round()) so
    every engine reproduces identical values. Zero vectors quantize to zeros.
    """
    amax = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))

    # let-bind amax through a single-element transform: interpreted HOF
    # lambdas re-evaluate captured subexpressions per element, so
    # referencing amax (itself an O(dim) scan) inside the per-element
    # lambda cost O(dim^2) per row. `am` is the materialized scalar;
    # values are bit-identical.
    def _with(am: Column) -> Column:
        return F.when(
            am > 0,
            F.transform(
                a,
                lambda x: F.floor(
                    x.cast("double") * F.lit(127.0) / am + F.lit(0.5)
                ).cast("bigint"),
            ),
        ).otherwise(F.transform(a, lambda x: F.lit(0).cast("bigint")))

    return F.element_at(F.transform(F.array(amax), _with), 1)


def quantize_scale(a: Column) -> Column:
    """Dequantization scale for quantize_int8: x ~= q * scale."""
    amax = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    return amax / F.lit(127.0)


def project(a: Column, planes: list[list[float]]) -> Column:
    """Random projection: map a dim-d vector to len(planes) dims by dotting
    it with each (deterministic, literal) plane — the Johnson-Lindenstrauss
    dimensionality-reduction step that makes brute-force ANN affordable on
    long embeddings (score in the small space, re-rank survivors in the
    original space).

    Plane components are plan literals, so the whole projection is one
    codegen expression per row: no join, no shuffle, no UDF. Each dot is a
    sequential left-to-right fold (matching DuckDB's list_dot_product), and
    components round to 6 places so both engines emit identical doubles.
    """
    from ..operators.similarity import arr_lit

    return F.array(
        *[F.round(dot(a, arr_lit(plane)), 6) for plane in planes]
    )
