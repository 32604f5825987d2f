"""Partitioned parquet sink — the layout that makes 100 TB readable.

``write_partitioned`` lays data out as ``path/col=value/..`` so any
downstream filter on the partition column prunes whole directories at
planning time (PartitionFilters in the scan, zero I/O for excluded
partitions). Choose LOW-cardinality columns (date, source, language);
partitioning by a high-cardinality key creates a small-file explosion —
that's what bucketing (sources/bucketed.py) is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_by: list[str]) -> None:
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Plain read — partition columns come back as directory-derived
    columns; filters on them prune at planning time."""
    return spark.read.parquet(path)
