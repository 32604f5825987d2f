"""Streaming IVM (streaming/ivm.py): the continuously folded aggregate
equals the one-shot batch aggregate, and batch replay is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.ivm import additive_agg
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.events import read_events_stream
from graph_database_spark.streaming.ivm import (
    additive_agg_stream,
    last_applied_batch,
    read_aggregate,
)

SF_DIR = "/root/testdata/sf0.001"
KEYS = ["event_type"]
SUMS = {"total_milli": "CAST(round(value * 1000) AS BIGINT)"}


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_aggregate_matches_batch(spark, tmp_path):
    stream = read_events_stream(spark, SF_DIR)
    q = additive_agg_stream(
        stream, str(tmp_path / "agg"), KEYS, SUMS, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    got = _rows(read_aggregate(spark, str(tmp_path / "agg")))
    want = _rows(additive_agg(load_table(spark, SF_DIR, "events"), KEYS, SUMS))
    assert got == want
    assert last_applied_batch(str(tmp_path / "agg")) >= 0


def test_replayed_batch_is_skipped(spark, tmp_path):
    from graph_database_spark.streaming import ivm as mod

    path = str(tmp_path / "agg")
    ev = load_table(spark, SF_DIR, "events")
    first = ev.limit(100)
    second = ev.subtract(first)

    # Drive the foreachBatch hook directly with explicit batch ids —
    # the crash-replay contract is "same batch id delivered again".
    def fold(df, bid):
        # mirror additive_agg_stream's inner function
        if bid <= mod.last_applied_batch(path):
            return
        if mod.last_applied_batch(path) >= 0:
            from graph_database_spark.operators.ivm import refresh_additive

            state = mod.read_version(df.sparkSession, path)
            new_state = refresh_additive(state, df, KEYS, SUMS)
        else:
            new_state = additive_agg(df, KEYS, SUMS)
        mod.write_version(new_state.localCheckpoint(), path, note=f"batch={bid}")

    fold(first, 0)
    fold(second, 1)
    after_two = _rows(read_aggregate(spark, path))
    fold(second, 1)  # replay
    fold(first, 0)   # ancient replay
    assert _rows(read_aggregate(spark, path)) == after_two
    assert after_two == _rows(additive_agg(ev, KEYS, SUMS))
    assert last_applied_batch(path) == 1
