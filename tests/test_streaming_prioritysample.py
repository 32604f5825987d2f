"""Streaming priority sample: EXACTLY equal to the batch query over
the union of batches, however the stream was split — the mergeable
property MG/Space-Saving can't offer — plus replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.prioritysample import (
    merge_batch_into_ps,
    priority_score,
    read_priority_sample,
)

SF_DIR = "/root/testdata/sf0.001"
K = 16


def _orders(spark):
    return load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").cast("string").alias("item"),
        F.expr("CAST(round(o_totalprice) AS BIGINT)").alias("w"),
    )


def _batch_reference(spark, k):
    """The batch-query answer over the FULL table: global top-k by
    priority with max(w, tau) estimator weights."""
    scored = _orders(spark).select(
        "item", "w", priority_score("item", "w").alias("q")
    )
    top = (
        scored.orderBy(F.desc("q"), F.asc("item")).limit(k + 1).collect()
    )
    tau = int(top[k]["q"]) if len(top) > k else 0
    return [
        (r["item"], int(r["w"]), int(r["q"]), max(int(r["w"]), tau))
        for r in top[:k]
    ], tau


def test_stream_equals_batch_regardless_of_split(spark, tmp_path):
    orders = _orders(spark).withColumn(
        "b", F.expr("CAST(item AS BIGINT) % 4")
    ).localCheckpoint()
    for split in (1, 4):
        path = str(tmp_path / f"ps{split}")
        for i in range(split):
            merge_batch_into_ps(
                orders.where(F.col("b") % split == i),
                i,
                path,
                "item",
                "w",
                k=K,
            )
        rows, tau = read_priority_sample(spark, path, k=K)
        ref_rows, ref_tau = _batch_reference(spark, K)
        assert tau == ref_tau
        assert rows == ref_rows  # bit-identical to the batch answer


def test_replay_and_stale_batches_are_noops(spark, tmp_path):
    orders = _orders(spark).withColumn(
        "b", F.expr("CAST(item AS BIGINT) % 3")
    ).localCheckpoint()
    path = str(tmp_path / "ps")
    for i in range(3):
        merge_batch_into_ps(
            orders.where(F.col("b") == i), i, path, "item", "w", k=K
        )
    once = read_priority_sample(spark, path, k=K)
    merge_batch_into_ps(
        orders.where(F.col("b") == 2), 2, path, "item", "w", k=K
    )
    merge_batch_into_ps(
        orders.where(F.col("b") == 0), 0, path, "item", "w", k=K
    )
    assert read_priority_sample(spark, path, k=K) == once


def test_item_reappearing_with_different_weight_keeps_max_q(spark, tmp_path):
    """ADVICE r11: q is a function of (item, w), not item alone. An item
    arriving again in a later batch with a LOWER weight must not
    overwrite its persisted (w, q) — the merge mirrors the batch
    groupBy(item).agg(max(w), max(q)) over the union of batches."""
    orders = _orders(spark).localCheckpoint()
    halved = orders.select("item", F.expr("w div 2").alias("w"))
    path = str(tmp_path / "ps_reweigh")
    merge_batch_into_ps(orders, 0, path, "item", "w", k=K)
    merge_batch_into_ps(halved, 1, path, "item", "w", k=K)

    scored = (
        orders.unionAll(halved)
        .select("item", "w", priority_score("item", "w").alias("q"))
        .groupBy("item")
        .agg(F.max("w").alias("w"), F.max("q").alias("q"))
    )
    top = scored.orderBy(F.desc("q"), F.asc("item")).limit(K + 1).collect()
    tau_ref = int(top[K]["q"]) if len(top) > K else 0
    ref = [
        (r["item"], int(r["w"]), int(r["q"]), max(int(r["w"]), tau_ref))
        for r in top[:K]
    ]
    rows, tau = read_priority_sample(spark, path, k=K)
    assert tau == tau_ref
    assert rows == ref
