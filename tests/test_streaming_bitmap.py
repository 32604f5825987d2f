"""Streaming bitmap sink: stream-fold == one-shot batch index, and
refolding a batch is byte-identical (OR idempotence — no guard needed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_spark.operators.bitmapindex import (
    bitmap_index,
    distinct_counts,
    merge_bitmaps,
)
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.events import read_events_stream
from graph_database_spark.streaming.bitmap import (
    bitmap_stream,
    read_bitmaps,
    read_distinct,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_bitmaps_match_batch(spark, tmp_path):
    stream = read_events_stream(spark, SF_DIR)
    q = bitmap_stream(
        stream,
        str(tmp_path / "bm"),
        "event_type",
        "user_id",
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    ev = load_table(spark, SF_DIR, "events")
    assert _rows(read_bitmaps(spark, str(tmp_path / "bm"))) == _rows(
        bitmap_index(ev, "event_type", "user_id")
    )
    want = _rows(
        ev.groupBy("event_type").agg(
            F.count_distinct("user_id").alias("n_distinct")
        )
    )
    got = _rows(read_distinct(spark, str(tmp_path / "bm")))
    assert [g[1] for g in got] == [w[1] for w in want]
    assert [g[0] for g in got] == [w[0] for w in want]


def test_refold_is_idempotent(spark):
    ev = load_table(spark, SF_DIR, "events")
    first = ev.limit(200)
    state = bitmap_index(first, "event_type", "user_id")
    # OR-merging the same delta again changes nothing.
    refolded = merge_bitmaps(state, bitmap_index(first, "event_type", "user_id"))
    assert _rows(refolded) == _rows(state)
    # And distinct counts survive arbitrary re-merges.
    assert _rows(distinct_counts(refolded)) == _rows(distinct_counts(state))
