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


def write_merge(
    stream: DataFrame,
    path: str,
    key_cols: list[str],
    checkpoint: str,
    delete_col: str | None = None,
):
    """Streaming CDC sink: each micro-batch is MERGEd into the
    versioned parquet table at ``path`` (sinks/versioned.merge_upsert)
    — upserts keyed on ``key_cols``, optional tombstone deletes. The
    lakehouse change-data-capture recipe with nothing but parquet + the
    version manifest.

    Recovery semantics: Structured Streaming may REPLAY the last batch
    after a crash. The merge is idempotent by construction — re-merging
    the same updates anti-joins away the rows it previously replaced
    and re-inserts identical ones, so a replay produces a redundant
    version with IDENTICAL content, never duplicates. Within a batch,
    multiple updates to one key are reduced deterministically (the
    struct-max row over the non-key columns): micro-batches carry no
    row order, so callers needing true last-writer-wins must include an
    ordering column and pre-reduce upstream.

    Returns the StreamingQuery."""
    from graph_database_spark.sinks.versioned import merge_upsert

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        others = [c for c in batch_df.columns if c not in key_cols]
        reduced = (
            batch_df.groupBy(*key_cols)
            .agg(F.max(F.struct(*others)).alias("_s"))
            .select(*key_cols, *[F.col(f"_s.{c}").alias(c) for c in others])
        )
        merge_upsert(
            batch_df.sparkSession, path, reduced, key_cols, delete_col=delete_col
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def read_since(spark: SparkSession, path: str, after_batch: int = -1) -> DataFrame:
    """Incremental consumer: batches strictly after ``after_batch``,
    resolved by directory pruning on the batch_id partition column."""
    return spark.read.parquet(path).where(F.col("batch_id") > after_batch)
