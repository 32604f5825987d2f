"""Idempotent streaming sink: exactly-once-per-batch parquet output via
``foreachBatch`` + batch-id directories.

Structured Streaming's contract is at-least-once per micro-batch on
failure recovery: after a crash the last batch may be REPLAYED with the
same ``batch_id``. Writing each batch to ``path/batch_id=<id>`` with
``overwrite`` makes the replay idempotent — the retry overwrites its own
partition and never duplicates rows — which upgrades the end-to-end
pipeline to exactly-once without any external transaction log. This is
the standard production recipe when the warehouse sink isn't
transactional.

The batch_id column doubles as the partition-pruning key for downstream
incremental consumers (`read_since`): "give me everything after batch N"
is a directory-level filter, no data scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_idempotent(stream: DataFrame, path: str, checkpoint: str):
    """Start a foreachBatch parquet sink whose batch writes are
    idempotent under replay. Returns the StreamingQuery."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            # Dynamic partition overwrite: only the replayed batch's own
            # directory is replaced, never sibling batches.
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def read_since(spark: SparkSession, path: str, after_batch: int = -1) -> DataFrame:
    """Incremental consumer: batches strictly after ``after_batch``,
    resolved by directory pruning on the batch_id partition column."""
    return spark.read.parquet(path).where(F.col("batch_id") > after_batch)
