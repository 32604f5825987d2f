"""Streaming heavy-hitters over CMS state (streaming/sketch.py):
stream-folded state answers top-k from registers + bounded candidates,
matches the batch operator, and is replay-safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.sketches import (
    cms_build,
    cms_heavy_hitters,
    cms_top_candidates,
)
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.events import read_events_stream
from graph_database_spark.streaming.sketch import (
    cms_hh_stream,
    merge_batch_into_cms_hh,
    read_cms_hh_state,
    read_heavy_hitters,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_hh(spark, df, item_col, phi_denom, n_candidates=8):
    items = df.select(F.col(item_col).cast("string").alias(item_col))
    cms = cms_build(items, item_col)
    cand = cms_top_candidates(items, item_col, n_candidates)
    total = items.count()
    return [
        (r["item"], r["est"])
        for r in cms_heavy_hitters(cms, cand, total, phi_denom=phi_denom).collect()
    ]


def test_streamed_hh_equals_batch(spark, tmp_path):
    # event_type is low-cardinality and stably skewed, so the streamed
    # candidate evolution cannot drop a true heavy hitter.
    path = str(tmp_path / "hh")
    q = cms_hh_stream(
        read_events_stream(spark, SF_DIR),
        "event_type",
        path,
        str(tmp_path / "ckpt"),
        n_candidates=8,
    )
    q.processAllAvailable()
    q.stop()
    streamed = read_heavy_hitters(spark, path, phi_denom=20)
    batch = _batch_hh(
        spark, load_table(spark, SF_DIR, "events"), "event_type", phi_denom=20
    )
    assert streamed == batch
    assert len(streamed) > 0
    # registers are split-invariant regardless of batching
    cells, _, total, _ = read_cms_hh_state(spark, path)
    full = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(
            load_table(spark, SF_DIR, "events").select(
                F.col("event_type").cast("string").alias("event_type")
            ),
            "event_type",
        ).collect()
    }
    assert cells == full
    assert total == load_table(spark, SF_DIR, "events").count()


def test_two_manual_batches_equal_one(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("user_id"), F.col("event_type").cast("string").alias("event_type")
    ).cache()
    half_a = ev.where(F.col("user_id") % 2 == 0)
    half_b = ev.where(F.col("user_id") % 2 == 1)

    split_path = str(tmp_path / "split")
    merge_batch_into_cms_hh(half_a, 0, split_path, "event_type", n_candidates=8)
    merge_batch_into_cms_hh(half_b, 1, split_path, "event_type", n_candidates=8)

    one_path = str(tmp_path / "one")
    merge_batch_into_cms_hh(ev, 0, one_path, "event_type", n_candidates=8)

    assert read_heavy_hitters(spark, split_path, phi_denom=20) == read_heavy_hitters(
        spark, one_path, phi_denom=20
    )


def test_replayed_batch_is_skipped(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").limit(200).select(
        F.col("event_type").cast("string").alias("event_type")
    ).cache()
    path = str(tmp_path / "hh")
    merge_batch_into_cms_hh(ev, 0, path, "event_type", n_candidates=8)
    once = read_cms_hh_state(spark, path)
    merge_batch_into_cms_hh(ev, 0, path, "event_type", n_candidates=8)  # replay
    assert read_cms_hh_state(spark, path) == once
    merge_batch_into_cms_hh(ev, 1, path, "event_type", n_candidates=8)
    _, _, total, _ = read_cms_hh_state(spark, path)
    assert total == 2 * once[2]
