"""Streaming priority sampling: an exactly-mergeable weighted top-k.

The streaming companion of the batch `priority_sample` query
(Duffield-Lund-Thorup): each item's priority q = (w << 40) div
(md5_40(item) + 1) is a PURE FUNCTION of the item, so the global top-k
sample is EXACTLY mergeable — union the per-batch top-(k+1) survivor
sets, dedup by item, keep the top-(k+1) again. Unlike the MG /
Space-Saving counter sinks (whose values are split-dependent with only
the guarantees invariant), the streamed sample is BIT-IDENTICAL to
running the batch query over the union of all batches, however the
stream was split — the strongest parity a sink here can pin, and the
tests do.

State is k+1 rows (the extra row carries tau, the (k+1)-th priority
the estimator weights max(w, tau) need). Durability rides the
versioned-snapshot sink with the NULL-item watermark sentinel
(ADVICE-r10 discipline): at-least-once replays are skipped by
batch_id, and even without the skip a replay is a semantic no-op —
dedup-by-item makes the merge idempotent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    write_version,
)

_SCHEMA = "item string, w long, q long, rn long, last_batch long"

__all__ = [
    "priority_score",
    "read_priority_sample",
    "merge_batch_into_ps",
    "priority_sample_stream",
]


def priority_score(item_col: str, w_col: str):
    """The deterministic DLT priority: (w << 40) div (md5_40 + 1)."""
    return F.expr(
        f"(CAST({w_col} AS BIGINT) * 1099511627776) div"
        f" (CAST(conv(substr(md5(CAST({item_col} AS STRING)), 1, 10),"
        " 16, 10) AS BIGINT) + 1)"
    )


def read_priority_sample(spark, path: str, k: int = 64):
    """Latest committed sample: ``(rows, tau)`` where rows is the
    top-k list of (item, w, q, w_hat) and tau the (k+1)-th priority
    (0 before the stream has seen k+1 distinct items)."""
    if not list_versions(path):
        return [], 0
    rows = sorted(
        (
            (r["item"], r["w"], r["q"], r["rn"])
            for r in read_version(spark, path).collect()
            if r["item"] is not None
        ),
        key=lambda t: t[3],
    )
    tau = rows[k][2] if len(rows) > k else 0
    return [
        (item, w, q, max(w, tau)) for item, w, q, _ in rows[:k]
    ], tau


def merge_batch_into_ps(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    item_col: str,
    w_col: str,
    k: int = 64,
) -> None:
    """Fold one micro-batch's top-(k+1) survivors into the persisted
    sample (idempotent: batch_id skip AND dedup-by-item merge)."""
    spark = batch_df.sparkSession
    last = -1
    state: dict[str, tuple[int, int]] = {}
    if list_versions(path):
        for r in read_version(spark, path).collect():
            last = max(last, r["last_batch"])
            if r["item"] is not None:
                state[r["item"]] = (r["w"], r["q"])
    if batch_id <= last:
        return  # replayed batch — already merged
    batch_top = (
        batch_df.select(
            F.col(item_col).cast("string").alias("item"),
            F.col(w_col).cast("long").alias("w"),
            priority_score(item_col, w_col).alias("q"),
        )
        .groupBy("item")
        .agg(F.max("w").alias("w"), F.max("q").alias("q"))
        .orderBy(F.desc("q"), F.asc("item"))
        .limit(k + 1)
        .collect()
    )
    for r in batch_top:
        # Merge mirrors the batch groupBy(item).agg(max(w), max(q))
        # semantics: q is a function of (item, w), so an item whose
        # weight varies across batches must keep its max-q entry, not
        # the latest batch's (ADVICE r11) — overwriting would break the
        # bit-identical-to-batch-over-the-union guarantee.
        w, q = int(r["w"]), int(r["q"])
        if r["item"] in state:
            pw, pq_ = state[r["item"]]
            w, q = max(w, pw), max(q, pq_)
        state[r["item"]] = (w, q)
    merged = sorted(
        ((item, w, q) for item, (w, q) in state.items()),
        key=lambda t: (-t[2], t[0]),
    )[: k + 1]
    out = [
        (item, w, q, i + 1, batch_id)
        for i, (item, w, q) in enumerate(merged)
    ]
    out.append((None, 0, 0, 0, batch_id))  # watermark sentinel
    write_version(
        spark.createDataFrame(out, _SCHEMA).coalesce(1),
        path,
        note=f"priority-sample batch {batch_id}",
    )


def priority_sample_stream(
    stream: DataFrame,
    item_col: str,
    w_col: str,
    path: str,
    checkpoint: str,
    k: int = 64,
):
    """Start the sample-merging sink; returns the StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_ps(batch_df, batch_id, path, item_col, w_col, k)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )
