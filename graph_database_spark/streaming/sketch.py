"""Streaming Count-Min sketch: bounded-state frequency tracking.

Frequency-over-a-stream is the canonical sketch use case: exact per-item
counts need unbounded state, while a CMS is a FIXED depth*width counter
table whose micro-batch deltas merge by cell-wise addition (the
mergeability the batch operator pins in tests). Each ``foreachBatch``
call builds the batch's sketch with the SAME md5 cell family as
``operators/sketches.cms_build`` — so a sketch merged over any batch
split equals the batch-built sketch over the union — and folds it into
a persisted cell table.

The persisted state is at most ``depth * width`` cells, so the merge is
a driver-side dictionary update by design (this is the entire point of
a sketch — the state that fits anywhere). Durability rides the
versioned-snapshot sink (sinks/versioned.py): every merged state is a
new ``v=N`` directory published by an atomic manifest replace, so a
crash mid-write leaves an unreferenced directory — never a torn or
silently-reset sketch (the earlier read-overwrite-same-path scheme
could lose the whole accumulated state to one mid-write crash). Replays
are idempotent: the cells carry the last merged ``batch_id`` and a
replayed batch (the at-least-once recovery contract) is skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graph_database_spark.operators.sketches import cms_build
from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    write_version,
)

_SCHEMA = "row int, col long, cnt long, last_batch long"


def read_cms(spark, path: str) -> dict[tuple[int, int], int]:
    """Latest committed sketch as a {(row, col): count} dict (empty if
    nothing has been committed yet)."""
    if not list_versions(path):
        return {}
    return {
        (r["row"], r["col"]): r["cnt"]
        for r in read_version(spark, path).collect()
    }


def merge_batch_into_cms(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    item_col: str,
    depth: int = 3,
    width: int = 1024,
) -> None:
    """Fold one micro-batch into the persisted sketch at ``path``
    (cell-wise add; skip if ``batch_id`` was already merged)."""
    spark = batch_df.sparkSession
    cells: dict[tuple[int, int], int] = {}
    last = -1
    if list_versions(path):
        for r in read_version(spark, path).collect():
            cells[(r["row"], r["col"])] = r["cnt"]
            last = max(last, r["last_batch"])
    if batch_id <= last:
        return  # replayed batch — already merged, idempotent skip
    for r in cms_build(batch_df, item_col, depth, width).collect():
        key = (r["row"], r["col"])
        cells[key] = cells.get(key, 0) + r["cnt"]
    out = [(row, col, cnt, batch_id) for (row, col), cnt in cells.items()]
    write_version(
        spark.createDataFrame(out, _SCHEMA).coalesce(1),
        path,
        note=f"cms batch {batch_id}",
    )


def cms_stream(
    stream: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    depth: int = 3,
    width: int = 1024,
):
    """Start the sketch-merging sink; returns the StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_cms(batch_df, batch_id, path, item_col, depth, width)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )
