"""Vector math over array<float>/array<double> columns via Spark
higher-order functions — JVM-side, no Python UDFs in the hot path.

All folds are sequential left-folds, matching DuckDB's ``list_reduce``
element order, so double results are bit-identical across engines
(see functions/portable.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB oracle fragments with the identical fold order / precision.
def duck_dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        "(x, y) -> x + y)"
    )


def duck_norm(a: str, dim: int) -> str:
    return f"sqrt({duck_dot(a, a, dim)})"


def duck_cosine(a: str, b: str, dim: int) -> str:
    return f"({duck_dot(a, b, dim)} / ({duck_norm(a, dim)} * {duck_norm(b, dim)}))"
