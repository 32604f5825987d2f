"""Streaming Bloom dedup sink: bit-identical to the batch build over
the union of batches under any split (bit_or mergeability is exact),
replay idempotence, and the seen/new ingest census."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.bloom import bloom_build
from graph_database_spark.streaming.bloomsink import (
    merge_batch_into_bloom,
    read_bloom,
)

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    from graph_database_spark.sources.parquet import load_table

    return load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").cast("string").alias("k")
    )


def test_stream_equals_batch_build_regardless_of_split(spark, tmp_path):
    orders = _orders(spark).withColumn(
        "b", F.expr("CAST(k AS BIGINT) % 4")
    ).localCheckpoint()
    ref = {
        r["word"]: r["bits"]
        for r in bloom_build(orders, "k").collect()
    }
    for split in (1, 4):
        path = str(tmp_path / f"bl{split}")
        for i in range(split):
            merge_batch_into_bloom(
                orders.where(F.col("b") % split == i), i, path, "k"
            )
        assert read_bloom(spark, path) == ref  # bit-identical filter


def test_replay_and_stale_batches_are_noops(spark, tmp_path):
    orders = _orders(spark).withColumn(
        "b", F.expr("CAST(k AS BIGINT) % 3")
    ).localCheckpoint()
    path = str(tmp_path / "bl")
    for i in range(3):
        assert (
            merge_batch_into_bloom(
                orders.where(F.col("b") == i), i, path, "k"
            )
            is not None
        )
    once = read_bloom(spark, path)
    assert merge_batch_into_bloom(
        orders.where(F.col("b") == 1), 1, path, "k"
    ) is None
    assert read_bloom(spark, path) == once


def test_census_flags_replayed_keys_as_seen(spark, tmp_path):
    orders = _orders(spark).localCheckpoint()
    half = orders.where(F.expr("CAST(k AS BIGINT) % 2 = 0")).localCheckpoint()
    path = str(tmp_path / "bl")
    n_rows, n_seen, n_new = merge_batch_into_bloom(half, 0, path, "k")
    n_half = half.count()
    assert n_rows == n_half and n_new + n_seen == n_half
    assert n_seen <= n_half // 50  # fp-only on an empty filter
    # Batch 1 re-sends the same keys: EVERY key must read as seen (a
    # Bloom filter has no false negatives).
    n_rows, n_seen, n_new = merge_batch_into_bloom(half, 1, path, "k")
    assert n_new == 0 and n_seen == n_half
