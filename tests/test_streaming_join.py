"""Stream-stream interval join == the same join executed in batch."""

from __future__ import annotations

from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.events import read_events_stream
from graph_database_spark.streaming.joins import error_click_correlation

SF_DIR = "/root/testdata/sf0.001"


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


def test_stream_stream_join_matches_batch(spark):
    streamed = _drain_append(
        error_click_correlation(read_events_stream(spark, SF_DIR)),
        spark,
        "err_click_join",
    )
    batch = error_click_correlation(
        load_table(spark, SF_DIR, "events"), streaming=False
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got, "join produced no rows — vacuous test"
    assert got == want
