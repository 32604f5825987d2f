"""Streaming Misra-Gries heavy hitters: k counters of bounded state.

The deterministic counter-based companion of the streaming CMS
(streaming/sketch.py): where the CMS answers point queries with a
hash-collision overestimate, the MG summary keeps EXACTLY k named
counters with the two-sided guarantee est <= true <= est + n/(k+1) —
no hashing, no randomness, and state that is k rows no matter how many
distinct items the stream carries.

Per micro-batch: a valid MG_k summary of the batch is computed
DISTRIBUTED (exact counts; only the top k+1 rows reach the driver —
operators/sketches.mg_batch_summary), then folded into the persisted
state with the mergeable-summaries merge (sketches.mg_merge — the same
function the batch catalog query `mg_heavy_hitters` folds with and its
oracle replays as generated CTEs). Durability and replay semantics ride
the versioned-snapshot sink exactly like the CMS: every merged state is
a new atomically-published version carrying the last merged
``batch_id``, so at-least-once replays are skipped idempotently.

Unlike the additive sinks (CMS, HLL registers, IVM), MG counter VALUES
depend on the batch split — only the guarantee is split-invariant. The
tests therefore pin (a) replay idempotence, (b) the two-sided error
bound against exact counts, and (c) exact parity with a driver-side
fold of the same batch sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from graph_database_spark.operators.sketches import (
    mg_batch_summary,
    mg_merge,
)
from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    write_version,
)

_SCHEMA = "token string, est long, last_batch long"

__all__ = ["read_mg", "merge_batch_into_mg", "mg_stream"]


def read_mg(spark, path: str) -> dict[str, int]:
    """Latest committed counters as {token: est} (empty before the
    first commit). The NULL-token sentinel row (see
    ``merge_batch_into_mg``) is watermark metadata, not a counter."""
    if not list_versions(path):
        return {}
    return {
        r["token"]: r["est"]
        for r in read_version(spark, path).collect()
        if r["token"] is not None
    }


def merge_batch_into_mg(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    item_col: str,
    k: int = 8,
) -> None:
    """Fold one micro-batch into the persisted counters at ``path``
    (idempotent skip when ``batch_id`` was already merged).

    Every committed version carries a NULL-token sentinel row holding
    the merged ``batch_id`` (ADVICE r10): a merge can legitimately
    return an EMPTY counter set (exactly k+1 counters tying — all
    decrement to zero), and without the sentinel that zero-row version
    would lose ``last_batch``, so an at-least-once replay of the
    already-merged batch would be re-merged into the emptied state —
    exactly the idempotence break the module promises away."""
    spark = batch_df.sparkSession
    state: dict[str, int] = {}
    last = -1
    if list_versions(path):
        for r in read_version(spark, path).collect():
            last = max(last, r["last_batch"])
            if r["token"] is not None:
                state[r["token"]] = r["est"]
    if batch_id <= last:
        return  # replayed batch — already merged
    new = mg_merge(state, mg_batch_summary(batch_df, item_col, k), k)
    out = [(token, est, batch_id) for token, est in sorted(new.items())]
    out.append((None, 0, batch_id))  # watermark sentinel
    write_version(
        spark.createDataFrame(out, _SCHEMA).coalesce(1),
        path,
        note=f"mg batch {batch_id}",
    )


def mg_stream(
    stream: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    k: int = 8,
):
    """Start the counter-merging sink; returns the StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_mg(batch_df, batch_id, path, item_col, k)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .start()
    )
