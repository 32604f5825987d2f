"""Streaming q-digest sink: stream-merged digest == batch digest."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.qdigest import qdigest_build
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.events import read_events_stream
from graph_database_spark.streaming.quantile import (
    merge_batch_into_qdigest,
    qdigest_stream,
    read_qdigest,
)

SF_DIR = "/root/testdata/sf0.001"


def _value(df):
    # Integer micro-batch-stable feature: whole-unit event value.
    return df.withColumn("v", F.round("value", 0).cast("long"))


def _nodes(df):
    return sorted(
        (r["lvl"], r["idx"], r["cnt"], r["ub"]) for r in df.collect()
    )


def test_streamed_digest_equals_batch_digest(spark, tmp_path):
    path = str(tmp_path / "qd")
    q = qdigest_stream(
        _value(read_events_stream(spark, SF_DIR)),
        "v",
        path,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    streamed = _nodes(read_qdigest(spark, path))
    batch = _nodes(
        qdigest_build(_value(load_table(spark, SF_DIR, "events")), "v")
    )
    assert streamed == batch  # leaf addition is split-invariant


def test_qdigest_replayed_batch_is_skipped(spark, tmp_path):
    path = str(tmp_path / "qd")
    ev = _value(load_table(spark, SF_DIR, "events").limit(200)).cache()
    merge_batch_into_qdigest(ev, 0, path, "v")
    once = _nodes(read_qdigest(spark, path))
    # Addition is not idempotent — the replay skip must hold the state.
    merge_batch_into_qdigest(ev, 0, path, "v")
    assert _nodes(read_qdigest(spark, path)) == once
    merge_batch_into_qdigest(ev, 1, path, "v")
    total = sum(c for _, _, c, _ in _nodes(read_qdigest(spark, path)))
    assert total == 2 * sum(c for _, _, c, _ in once)
