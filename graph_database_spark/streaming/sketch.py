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
a sketch — the state that fits anywhere). Replays are idempotent: the
table carries the last merged ``batch_id`` and a replayed batch (the
at-least-once recovery contract) is skipped instead of double-added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graph_database_spark.operators.sketches import cms_build

_SCHEMA = "row int, col long, cnt long, last_batch long"


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
    try:
        for r in spark.read.parquet(path).collect():
            cells[(r["row"], r["col"])] = r["cnt"]
            last = max(last, r["last_batch"])
    except Exception:
        pass  # first batch: no sketch yet
    if batch_id <= last:
        return  # replayed batch — already merged, idempotent skip
    for r in cms_build(batch_df, item_col, depth, width).collect():
        key = (r["row"], r["col"])
        cells[key] = cells.get(key, 0) + r["cnt"]
    out = [(row, col, cnt, batch_id) for (row, col), cnt in cells.items()]
    spark.createDataFrame(out, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


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
