"""Streaming Bloom-filter dedup sink: constant state, unbounded horizon.

The complement of ``streaming/dedup.py``'s watermarked exact dedup: that
shape keeps one state row per key but only within the lateness horizon;
this one answers "have I EVER ingested this key" forever, in exactly
``m_bits`` of state, at the price of a sized false-positive rate — the
classic ingest-dedup Bloom (and the streaming face of the verified
batch ``operators/bloom.bloom_build``: the same md5 bit positions, the
same 32-bit words).

Mergeability is exact, not approximate: the filter state is per-word
``bit_or``, which is associative/commutative/idempotent — so the
streamed filter is BIT-IDENTICAL to the batch build over the union of
batches under ANY split (pinned by test), and replaying a batch is a
true no-op even without the watermark (the watermark still skips the
recount so the per-batch census stays exact-once).

Each merge also returns the ingest census the dedup decision needs:
rows whose every bit was already set in the PRE-batch filter are
"seen" (duplicates up to the fp rate); the rest are new. Census
semantics match ``bloom_probe_stats``' pass test bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_database_spark.operators.bloom import _pos_sql, bloom_build
from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    write_version,
)

_SCHEMA = "word long, bits long, last_batch long"

__all__ = ["read_bloom", "merge_batch_into_bloom", "bloom_dedup_stream"]


def read_bloom(spark, path: str) -> dict[int, int]:
    """Latest committed filter as {word: bits} (sparse; empty before
    the first commit). The NULL-word row is the watermark sentinel."""
    if not list_versions(path):
        return {}
    return {
        r["word"]: r["bits"]
        for r in read_version(spark, path).collect()
        if r["word"] is not None
    }


def merge_batch_into_bloom(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    key_col: str,
    n_hash: int = 3,
    m_bits: int = 4096,
) -> tuple[int, int, int] | None:
    """OR one micro-batch into the persisted filter; returns the batch
    census ``(n_rows, n_seen, n_new)`` where n_seen counts DISTINCT
    batch keys whose every hash bit was already set before this batch
    (duplicates, up to the filter's fp rate). Replayed/stale batches
    return None and leave state untouched (idempotent either way —
    bit_or of already-merged words is a no-op; the skip keeps the
    census exact-once)."""
    spark = batch_df.sparkSession
    state: dict[int, int] = {}
    last = -1
    if list_versions(path):
        for r in read_version(spark, path).collect():
            last = max(last, r["last_batch"])
            if r["word"] is not None:
                state[r["word"]] = r["bits"]
    if batch_id <= last:
        return None
    n_words = m_bits // 32
    arr = ", ".join(f"{state.get(w, 0)}L" for w in range(n_words))
    pos_cols = {
        f"p{j}": F.expr(_pos_sql("cast(k as string)", j, m_bits))
        for j in range(n_hash)
    }
    pass_expr = " AND ".join(
        f"(element_at(bf, cast(p{j} div 32 as int) + 1)"
        f" & shiftleft(1L, cast(p{j} % 32 as int))) != 0L"
        for j in range(n_hash)
    )
    keys = batch_df.select(F.col(key_col).alias("k")).localCheckpoint()
    census = (
        keys.distinct()
        .withColumns(pos_cols)
        .withColumn("bf", F.expr(f"array({arr})"))
        .withColumn("seen", F.expr(pass_expr))
        .agg(
            F.count("*").alias("nk"),
            F.count(F.when(F.col("seen"), 1)).alias("ns"),
        )
        .first()
    )
    n_rows = keys.count()
    for r in bloom_build(keys, "k", n_hash, m_bits).collect():
        state[r["word"]] = state.get(r["word"], 0) | r["bits"]
    out = [(w, b, batch_id) for w, b in sorted(state.items())]
    out.append((None, 0, batch_id))  # watermark sentinel (empty-safe)
    write_version(
        spark.createDataFrame(out, _SCHEMA).coalesce(1),
        path,
        note=f"bloom-dedup batch {batch_id}",
    )
    return (n_rows, int(census["ns"]), int(census["nk"]) - int(census["ns"]))


def bloom_dedup_stream(
    stream: DataFrame,
    path: str,
    key_col: str,
    n_hash: int = 3,
    m_bits: int = 4096,
    checkpoint: str | None = None,
):
    """foreachBatch wiring: every micro-batch folds into the persisted
    filter via :func:`merge_batch_into_bloom`."""
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: merge_batch_into_bloom(
            df, bid, path, key_col, n_hash, m_bits
        )
        and None
    ).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
