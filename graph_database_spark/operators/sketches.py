"""Deterministic distinct-count sketch (KMV / bottom-k).

Spark's approx_count_distinct (HyperLogLog++) is the default choice, but
its estimates are engine-internal and not reproducible across engines —
useless for an oracle-checked pipeline contract. The KMV (k minimum
values) sketch is fully deterministic given the hash: keep the k
smallest xxhash64 values of the key; the k-th smallest value's position
in the hash space estimates the distinct count as

    D ≈ (k - 1) * 2^64 / (max_kept - LONG_MIN)

(using the unsigned view of the signed 64-bit hash space). Accuracy is
~1/sqrt(k). Sketches MERGE: union the kept values, keep the k smallest —
so partial sketches combine associatively across partitions/partitions
of time, which is exactly what a map-side-combinable aggregate needs.

Built from sort_array + slice over a collect_set — fine for k in the
hundreds; the whole sketch is one grouped aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["kmv_sketch", "kmv_estimate", "distinct_count_kmv"]

_SPAN = float(2**64)


def kmv_sketch(key: Column, k: int = 256) -> Column:
    """ARRAY<BIGINT>: the k smallest xxhash64(key) values (signed order —
    signed and unsigned order agree up to rotation, and the estimator
    below accounts for the signed origin)."""
    return F.slice(F.sort_array(F.collect_set(F.xxhash64(key))), 1, k)


def kmv_estimate(sketch: Column, k: int = 256) -> Column:
    """Distinct-count estimate from a KMV sketch column (DOUBLE).

    Falls back to the exact size when fewer than k distinct values were
    seen (the sketch IS the distinct set then)."""
    n = F.size(sketch)
    kth = F.element_at(sketch, k).cast("double")
    frac = (kth - float(-(2**63))) / F.lit(_SPAN)
    return F.when(n < k, n.cast("double")).otherwise((k - 1) / frac)


def distinct_count_kmv(df: DataFrame, key: str, group_by: str | None = None, k: int = 256) -> DataFrame:
    """``(group?, est_distinct DOUBLE)`` — sketched distinct counts."""
    agg = kmv_estimate(kmv_sketch(F.col(key), k), k).alias("est_distinct")
    if group_by is None:
        return df.agg(agg)
    return df.groupBy(group_by).agg(agg)
