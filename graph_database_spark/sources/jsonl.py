"""JSONL (newline-delimited JSON) source — the interchange format every
document-corpus pipeline meets alongside Parquet.

Reads are SCHEMA-ENFORCED: schema inference is a full extra pass over
the data (a non-starter at 100 TB) and silently widens types between
runs; callers pass the StructType and malformed lines land in a
``_corrupt`` column instead of failing the job (PERMISSIVE), so one bad
record in a billion doesn't kill the ingest — filter/quarantine them
explicitly. The reference has no JSON surface (SURVEY.md §2.8: 'JSON —
not present'); this is engine-extension territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Schema-enforced JSONL read; malformed lines survive with all
    schema fields null and the raw line in ``corrupt_col``.

    NB Spark refuses queries that reference ONLY the corrupt column over
    a raw JSON scan (it would require re-parsing with different column
    pruning); materialize first — ``df.cache()`` or a checkpoint — when
    filtering the quarantine out (see tests/test_jsonl.py)."""
    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """JSONL sink (one JSON object per line). ``partitions`` controls
    output file count — coalesce for small exports, leave None to keep
    the upstream partitioning (one file per partition at scale)."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").json(path)
