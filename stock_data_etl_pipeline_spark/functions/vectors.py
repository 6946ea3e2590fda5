"""Vector math over array<float>/array<double> embedding columns.

Pure Column expressions using higher-order functions (zip_with/aggregate):
JVM-side, no UDF, no Python — a dot product over a 64-dim embedding column
is one codegen'd expression, so brute-force similarity scans stay
shuffle-free and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    return dot(a, b) / (norm(a) * norm(b))
