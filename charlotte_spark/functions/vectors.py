"""Vector column expressions (SURVEY D67/D68).

All math stays JVM-side via higher-order functions: elements are cast
float→double (exact), products/sums are sequential left-folds, so the
same expression in DuckDB (list_transform + list_reduce) produces
bit-identical doubles — which makes cosine scores hash-checkable after
portable rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def sql_dot(a: str, b: str, dim: int = 64) -> str:
    """DuckDB equivalent of :func:`dot` (same fold order → same bits)."""
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def sql_cosine(a: str, b: str, dim: int = 64) -> str:
    return (
        f"({sql_dot(a, b, dim)}) / "
        f"(sqrt({sql_dot(a, a, dim)}) * sqrt({sql_dot(b, b, dim)}))"
    )


def sqdist(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance of two array<double> columns
    (0.0-init left fold — bit-matches :func:`sql_sqdist`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sql_sqdist(a: str, b: str, dim: int = 64) -> str:
    """DuckDB equivalent of :func:`sqdist` (no-init left fold == the
    Spark 0.0-init fold, the sql_dot precedent)."""
    t = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> {t} * {t}), (x, y) -> x + y)"
    )
