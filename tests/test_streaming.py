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


def _drain_append(stream_df, spark, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
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


def test_user_profile_stream_matches_batch(spark):
    from graph_database_spark.streaming.state import user_profile_stream

    got_df = _drain_append(
        user_profile_stream(SE.read_events_stream(spark, SF_DIR)),
        spark,
        "profile_stream",
        mode="update",
    )
    # Update-mode sink appends one row per (user, micro-batch); the final
    # profile is the row with the max running count (monotone).
    got = {}
    for r in got_df.collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (r["n_events"], r["sum_value"], r["n_types"])
    batch = load_table(spark, SF_DIR, "events").groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.count_distinct("event_type").alias("t"),
    )
    want = {r["user_id"]: (r["n"], r["s"], r["t"]) for r in batch.collect()}
    assert set(got) == set(want)
    for uid, (n, s, t) in want.items():
        gn, gs, gt = got[uid]
        assert (gn, gt) == (n, t), uid
        assert abs(gs - s) < 1e-6, uid


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
