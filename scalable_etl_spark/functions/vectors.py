"""Vector (embedding) column expressions — JVM-side, no UDFs.

Embeddings arrive as array<float>; every helper casts to array<double>
first so Spark and the DuckDB oracle (list_dot_product on DOUBLE[])
accumulate at the same precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_lsh_bucket(col: str | Column, n_bits: int = 8) -> Column:
    """Axis-aligned random-hyperplane LSH: bucket = sign bits of the
    first ``n_bits`` dimensions packed into an int. Deterministic and
    replayable in plain SQL (the oracle uses the same expression)."""
    c = F.col(col) if isinstance(col, str) else col
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(F.element_at(c, i + 1) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return bucket.cast("int")
