"""Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> columns.

Higher-order functions (zip_with / aggregate) run inside the JVM on the
array values directly — no explode, no shuffle, no Python. Accumulation
is forced to DOUBLE in element order, so results are deterministic and
engine-portable (matches any oracle that also accumulates in double).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a, b) -> Column:
    """Dot product of two array columns, accumulated in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a, b) -> Column:
    """Cosine similarity of two array columns (double)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
