"""ORC source/sink — the third columnar interchange format (after
Parquet and the delimited/JSONL text sources) a migrating warehouse
pipeline brings along. Spark's ORC reader is vectorized and supports
predicate pushdown and column pruning exactly like Parquet, so ORC
inputs ride the same 100 TB scan path (PushedFilters / ReadSchema in
the plan) with no engine changes.

Reads are SCHEMA-ENFORCED for the same reason as sources/csv.py and
sources/jsonl.py: inference is an extra full pass over the data and
silently widens types between runs. ORC is self-describing, so the
declared schema acts as a projection+cast contract: extra file columns
are pruned, matching columns are cast, and a missing column is a hard
error (not a silent null column) — schema drift surfaces at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-enforced ORC read: prune to the declared columns, cast to
    the declared types, and fail fast on missing columns."""
    df = spark.read.orc(path)
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"ORC file at {path} lacks declared columns: {missing}")
    return df.select(
        *[df[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    partitions: int | None = None,
) -> None:
    """ORC sink; ``partition_by`` gives the same directory-pruned layout
    as sinks/parquet.write_partitioned, ``partitions`` bounds file count
    for small exports (None keeps upstream partitioning at scale)."""
    out = df.coalesce(partitions) if partitions else df
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
