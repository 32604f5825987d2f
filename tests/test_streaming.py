"""Streaming smoke: the incremental operators produce the same answers
as their batch forms when the stream is drained to completion
(availableNow trigger over the sf0.001 events table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators import events as BE
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming import events as SE

SF_DIR = "/root/testdata/sf0.001"


def _drain(stream_df, spark, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_rollup_stream_matches_batch(spark):
    stream = SE.hourly_rollup_stream(SE.read_events_stream(spark, SF_DIR))
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in _drain(stream, spark, "hourly_stream").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in BE.hourly_rollup(load_table(spark, SF_DIR, "events")).collect()
    }
    assert got == want


def _drain_append(stream_df, spark, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_dedup_stream_lossless_on_unique_keys(spark):
    from graph_database_spark.streaming.dedup import dedup_events_stream

    got = _drain_append(
        dedup_events_stream(SE.read_events_stream(spark, SF_DIR)), spark, "dedup_stream"
    )
    batch = load_table(spark, SF_DIR, "events")
    # event_id is unique in the source, so dedup must be lossless there.
    assert got.count() == batch.select("event_id").distinct().count()


def test_dedup_stream_collapses_duplicates(spark, tmp_path):
    from graph_database_spark.streaming.dedup import dedup_events_stream

    batch = load_table(spark, SF_DIR, "events").limit(100)
    doubled = batch.unionAll(batch)
    path = str(tmp_path / "dup_events")
    doubled.write.parquet(path)
    stream = (
        spark.readStream.schema(doubled.schema).format("parquet").load(path)
    )
    got = _drain_append(dedup_events_stream(stream), spark, "dedup_dup_stream")
    assert got.count() == 100
    assert got.select("event_id").distinct().count() == 100


def test_sessionize_stream_matches_batch_boundaries(spark):
    stream = SE.sessionize_stream(SE.read_events_stream(spark, SF_DIR))
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in _drain(stream, spark, "sessions_stream").collect()
    }
    batch = BE.sessionize(load_table(spark, SF_DIR, "events"))
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in batch.collect()
    }
    assert got == want
