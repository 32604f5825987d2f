"""Parquet table sources (driver synthetic tables, TESTDATA.md).

Columnar scan with Catalyst pushdown: callers express filters/projections
on the returned DataFrame and Spark pushes them into the parquet reader
(PushedFilters / ReadSchema in .explain). Replaces the reference's
whitespace-text + per-row REST ingest (src/main.js:143-173,210-239) with
a zero-copy columnar scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any scale factor (bounded
# cardinality: 5 regions / 25 nations always; see TESTDATA.md).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table: ``{sf_dir}/{name}.parquet``.

    ``events`` stores TIMESTAMP(NANOS), which Spark 4 rejects outright
    (PARQUET_TYPE_ILLEGAL). We read the nanos as a raw BIGINT
    (legacy.parquet.nanosAsLong) and rebuild a timestamp truncated to
    microseconds — the precision DuckDB's TIMESTAMP uses, so the oracle
    comparison stays exact. Integer ``div`` keeps the full 64-bit value
    (a double division would lose precision above 2^53 ns).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all synthetic tables as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
