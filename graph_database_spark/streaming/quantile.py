"""Streaming q-digest: quantiles over a stream in bounded state.

The q-digest's mergeable state is the EXACT leaf histogram (value ->
count), bounded by the dyadic value universe — not the stream length —
so each micro-batch folds in by cell-wise count addition and any read
rebuilds the digest deterministically (operators/qdigest.py: the
compression is a function of the histogram alone). Stream-merged state
therefore equals the one-shot batch build over the union EXACTLY
(pinned by tests/test_streaming_quantile.py) — the same
split-invariance argument as the CMS and HLL sinks, with the same
versioned-snapshot durability and replayed-batch skip
(streaming/sketch.py's contract, applied to quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    write_version,
)

_SCHEMA = "idx long, cnt long, last_batch long"


def merge_batch_into_qdigest(
    batch_df: DataFrame, batch_id: int, path: str, value_col: str
) -> None:
    """Fold one micro-batch's leaf counts into the persisted histogram
    (cell-wise add; replayed batches skipped — addition is NOT
    idempotent, so the skip is load-bearing here, unlike HLL's max)."""
    spark = batch_df.sparkSession
    state: dict[int, int] = {}
    last = -1
    if list_versions(path):
        for r in read_version(spark, path).collect():
            state[r["idx"]] = r["cnt"]
            last = max(last, r["last_batch"])
    if batch_id <= last:
        return
    counts = (
        batch_df.select(F.col(value_col).cast("long").alias("idx"))
        .groupBy("idx")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    for r in counts:
        state[r["idx"]] = state.get(r["idx"], 0) + r["cnt"]
    out = [(idx, cnt, batch_id) for idx, cnt in state.items()]
    write_version(
        spark.createDataFrame(out, _SCHEMA).coalesce(1),
        path,
        note=f"qdigest batch {batch_id}",
    )


def read_qdigest(
    spark, path: str, levels: int = 12, compression: int = 32
) -> DataFrame:
    """Digest nodes rebuilt from the persisted leaf histogram —
    identical to a batch ``qdigest_build`` over everything merged."""
    from graph_database_spark.operators.qdigest import qdigest_from_leaves

    leaves = read_version(spark, path).select("idx", "cnt")
    return qdigest_from_leaves(leaves, levels=levels, compression=compression)


def qdigest_stream(
    stream: DataFrame, value_col: str, path: str, checkpoint: str
):
    """Start the leaf-histogram folding sink; returns the
    StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_qdigest(batch_df, batch_id, path, value_col)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )
