"""Partition spreading for compute-heavy narrow stages.

A small parquet scan arrives as one (or few) partitions; any expensive
per-row expression chain (MinHash signatures, hyperplane sums) then runs
on one core regardless of cluster size. ``spread`` repartitions ONLY
when the input has fewer partitions than the session's parallelism — at
real scale inputs already have thousands of partitions and this is a
no-op, so the extra shuffle is paid exactly when it is cheapest (tiny
inputs) and never on the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
