"""Vector math over ``array<float>`` embedding columns — no UDFs.

Built from zip_with / aggregate higher-order functions: JVM-side,
codegen, and a fixed left-to-right fold order so the DuckDB oracle (an
explicit generated term chain) produces bit-identical doubles.

At 100 TB these expressions are the map side of every similarity
operator; keeping them out of Python means the embedding scan never
leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import functions as F

LSH_BITS = 8


def as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec_col, bits: int = LSH_BITS):
    """Axis-aligned random-hyperplane LSH: sign bits of the first dims."""
    return sum(
        F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    )
