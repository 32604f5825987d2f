"""Streaming exact-distinct bitmap maintenance.

The streaming face of operators/bitmapindex.py: per micro-batch, OR the
batch's (key, word, mask) bitmap into versioned standing state. Because
bitwise OR is idempotent and commutative, the state is a CRDT register:
a crash-replayed batch folds to the SAME state — no batch-skip guard is
needed, unlike the additive counters in streaming/ivm.py. The guard-free
replay safety is pytest-pinned (tests/test_streaming_bitmap.py refolds a
batch and asserts byte-identical state).

Reads answer exact per-key distinct counts (and pairwise intersections,
via operators/bitmapindex.bitmap_pair_stats) from the compact word-level
state without rescanning the stream history — the exact-counting
complement to the approximate HLL register sink (streaming/sketch.py).
State size is O(keys x id-universe/31) words, mergeable across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graph_database_spark.operators.bitmapindex import (
    bitmap_index,
    distinct_counts,
    merge_bitmaps,
)
from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    write_version,
)

__all__ = ["bitmap_stream", "read_bitmaps", "read_distinct"]


def bitmap_stream(
    stream: DataFrame,
    path: str,
    key_col: str,
    id_col: str,
    checkpoint: str,
):
    """Maintain the OR-folded bitmap index of ``id_col`` per
    ``key_col`` at ``path``, one version per micro-batch. Returns the
    StreamingQuery."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        delta = bitmap_index(batch_df, key_col, id_col)
        if list_versions(path):
            state = read_version(batch_df.sparkSession, path)
            new_state = merge_bitmaps(state, delta)
        else:
            new_state = delta
        # Materialize BEFORE writing: the plan reads the version
        # directory the writer is about to supersede.
        write_version(
            new_state.localCheckpoint(), path, note=f"batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def read_bitmaps(spark: SparkSession, path: str) -> DataFrame:
    """Current bitmap state (latest published version)."""
    return read_version(spark, path)


def read_distinct(spark: SparkSession, path: str) -> DataFrame:
    """Exact per-key distinct counts from the standing state."""
    return distinct_counts(read_version(spark, path))
