"""Bucketed-table storage for co-located (shuffle-free) joins.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
both sides on the key. Writing both tables bucketed (and sorted) by the
join key pins an identical hash-partitioning in storage, so Catalyst
plans the join with NO Exchange on either side — the join runs
bucket-to-bucket, and re-runs of downstream jobs keep that property for
free. The bucket count is chosen once per table pair and must match on
both sides (Spark joins bucketed tables shuffle-free only when the
bucket counts are equal or multiples).

Tables are registered in the session catalog (in-memory catalog: no
Hive metastore needed) with explicit storage paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table at ``path``.

    ``mode="append"`` grows an existing bucketed table — Spark keeps
    the bucket spec on append, so this is the ONE write path for both
    index build and index append (ADVICE r13: a second inline writer
    would silently desync options/sort spec between the two)."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_by)
        .sortBy(bucket_by)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key — planned
    without a shuffle on either side when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on)
