"""Streaming CMS sink: stream-merged sketch == batch sketch; replay-safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.sketches import cms_build
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.events import read_events_stream
from graph_database_spark.streaming.sketch import (
    cms_stream,
    merge_batch_into_cms,
)

SF_DIR = "/root/testdata/sf0.001"


def _cells(spark, path):
    from graph_database_spark.streaming.sketch import read_cms

    return read_cms(spark, path)


def test_streamed_sketch_equals_batch_sketch(spark, tmp_path):
    path = str(tmp_path / "cms")
    q = cms_stream(
        read_events_stream(spark, SF_DIR),
        "event_type",
        path,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    streamed = _cells(spark, path)
    batch = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(
            load_table(spark, SF_DIR, "events"), "event_type"
        ).collect()
    }
    assert streamed == batch  # cell-wise merge == one-shot build


def test_replayed_batch_is_skipped(spark, tmp_path):
    path = str(tmp_path / "cms")
    ev = load_table(spark, SF_DIR, "events").limit(100).cache()
    merge_batch_into_cms(ev, 0, path, "event_type")
    once = _cells(spark, path)
    merge_batch_into_cms(ev, 0, path, "event_type")  # at-least-once replay
    assert _cells(spark, path) == once
    merge_batch_into_cms(ev, 1, path, "event_type")  # a real new batch adds
    assert sum(_cells(spark, path).values()) == 2 * sum(once.values())


def test_crash_mid_write_preserves_committed_sketch(spark, tmp_path):
    # A torn write must never reset the sketch: an unpublished v= dir
    # (no manifest update) is invisible to readers.
    import os

    path = str(tmp_path / "cms")
    ev = load_table(spark, SF_DIR, "events").limit(100).cache()
    merge_batch_into_cms(ev, 0, path, "event_type")
    committed = _cells(spark, path)
    # simulate a crash: orphan data directory without a manifest commit
    os.makedirs(os.path.join(path, "v=99"), exist_ok=True)
    assert _cells(spark, path) == committed


def test_streamed_hll_sliding_equals_batch(spark, tmp_path):
    # register-wise max is split-invariant, so the stream-merged state
    # must reproduce the batch hll_sliding summary EXACTLY (reg_sum and
    # the rounded estimate), not approximately.
    from graph_database_spark.operators.sketches import hll_sliding
    from graph_database_spark.streaming.sketch import (
        hll_stream,
        read_hll_sliding,
    )

    path = str(tmp_path / "hll")
    q = hll_stream(
        read_events_stream(spark, SF_DIR),
        "user_id",
        path,
        str(tmp_path / "hllckpt"),
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["day"]: (r["reg_sum"], r["est_distinct"])
        for r in read_hll_sliding(spark, path).collect()
    }
    batch = {
        r["day"]: (r["reg_sum"], r["est_distinct"])
        for r in hll_sliding(
            load_table(spark, SF_DIR, "events"), "user_id"
        ).collect()
    }
    assert streamed == batch


def test_hll_merge_replay_idempotent(spark, tmp_path):
    from graph_database_spark.streaming.sketch import (
        merge_batch_into_hll,
        read_hll_sliding,
    )

    path = str(tmp_path / "hll2")
    ev = load_table(spark, SF_DIR, "events").limit(200).cache()
    merge_batch_into_hll(ev, 0, path, "user_id")
    once = {r["day"]: r["reg_sum"] for r in read_hll_sliding(spark, path).collect()}
    merge_batch_into_hll(ev, 0, path, "user_id")  # replay: skipped
    merge_batch_into_hll(ev, 1, path, "user_id")  # same data again: max no-op
    assert {
        r["day"]: r["reg_sum"] for r in read_hll_sliding(spark, path).collect()
    } == once
