"""Delimited-text (CSV/TSV) source — the other interchange format a
corpus pipeline meets beside Parquet and JSONL.

Same contract as sources/jsonl.py: reads are SCHEMA-ENFORCED (schema
inference is an extra full pass — a non-starter at 100 TB — and widens
types silently between runs); malformed lines land in a ``_corrupt``
column (PERMISSIVE) so one bad record in a billion doesn't kill the
ingest. The reference's only text ingest is the SNAP whitespace format
(sources/snap.py, src/main.js:16-24); this is the general-purpose
delimited companion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    delimiter: str = ",",
    header: bool = True,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Schema-enforced delimited read; malformed lines survive with all
    schema fields null and the raw line in ``corrupt_col``.

    Same caveat as JSONL: Spark refuses queries referencing ONLY the
    corrupt column over a raw scan — materialize (cache/checkpoint)
    before filtering the quarantine out."""
    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("sep", delimiter)
        .option("header", header)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    partitions: int | None = None,
) -> None:
    """Delimited sink. ``partitions`` controls output file count —
    coalesce for small exports, None keeps the upstream partitioning
    (one file per partition at scale)."""
    out = df.coalesce(partitions) if partitions else df
    (
        out.write.mode("overwrite")
        .option("sep", delimiter)
        .option("header", header)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )
