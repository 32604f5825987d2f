"""Streaming Space-Saving heavy hitters: k evict-the-min counters.

The order-dependent companion of the streaming Misra-Gries sink
(streaming/mg.py): MG decrements every counter and underestimates;
Space-Saving (Metwally et al. 2005) evicts the minimum counter,
inherits its count, and OVERESTIMATES — per counter
est - err <= true <= est, and any item with true count > n/k is
guaranteed monitored.

Per micro-batch: the batch's EXACT per-item counts are computed
distributed, arrive on the driver in deterministic item order (bounded
by the batch vocabulary), and fold into the persisted k-counter state
with operators/sketches.space_saving_fold — the same function the
batch catalog query `space_saving_hh` uses and its oracle replays as a
recursive CTE. Durability and replay semantics ride the
versioned-snapshot sink like the MG/CMS sinks: every merged state is a
new atomically-published version carrying the last merged ``batch_id``
in a NULL-token sentinel row (the ADVICE-r10 idempotence fix, applied
here from birth), so at-least-once replays are skipped idempotently.

Because Space-Saving is order-dependent, counter VALUES depend on the
batch split; only the guarantees are split-invariant. The tests pin
(a) replay idempotence, (b) the over-estimate bound est - err <= true
<= est against exact counts, and (c) exact parity with a driver-side
fold of the same batch sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graph_database_spark.operators.sketches import space_saving_fold
from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    write_version,
)

_SCHEMA = "token string, est long, err long, last_batch long"

__all__ = ["read_space_saving", "merge_batch_into_ss", "space_saving_stream"]


def read_space_saving(spark, path: str) -> dict[str, tuple[int, int]]:
    """Latest committed counters as {token: (est, err)} (empty before
    the first commit). The NULL-token sentinel row is watermark
    metadata, not a counter."""
    if not list_versions(path):
        return {}
    return {
        r["token"]: (r["est"], r["err"])
        for r in read_version(spark, path).collect()
        if r["token"] is not None
    }


def _batch_arrivals(batch_df: DataFrame, item_col: str):
    """The batch as deterministic weighted arrivals: exact counts
    (distributed groupBy), presented in item order. Bounded by the
    batch vocabulary — the only rows that reach the driver."""
    counts = batch_df.groupBy(item_col).count().orderBy(item_col).collect()
    return [(r[item_col], int(r["count"])) for r in counts]


def merge_batch_into_ss(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    item_col: str,
    k: int = 8,
) -> None:
    """Fold one micro-batch into the persisted counters at ``path``
    (idempotent skip when ``batch_id`` was already merged)."""
    spark = batch_df.sparkSession
    state: dict[str, list[int]] = {}
    last = -1
    if list_versions(path):
        for r in read_version(spark, path).collect():
            last = max(last, r["last_batch"])
            if r["token"] is not None:
                state[r["token"]] = [r["est"], r["err"]]
    if batch_id <= last:
        return  # replayed batch — already merged
    new = space_saving_fold(_batch_arrivals(batch_df, item_col), k, state)
    out = [
        (token, est, err, batch_id)
        for token, (est, err) in sorted((t, tuple(v)) for t, v in new.items())
    ]
    out.append((None, 0, 0, batch_id))  # watermark sentinel
    write_version(
        spark.createDataFrame(out, _SCHEMA).coalesce(1),
        path,
        note=f"space-saving batch {batch_id}",
    )


def space_saving_stream(
    stream: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    k: int = 8,
):
    """Start the counter-merging sink; returns the StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_ss(batch_df, batch_id, path, item_col, k)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )
