"""Stream-static anomaly join: drained stream == batch catalog query."""

from __future__ import annotations

from graph_database_spark.catalog import q_event_anomalies
from graph_database_spark.sources.parquet import load_table
from graph_database_spark.streaming.anomaly import anomaly_stream
from graph_database_spark.streaming.events import read_events_stream

SF_DIR = "/root/testdata/sf0.001"


def test_anomaly_stream_matches_batch(spark):
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    stream = anomaly_stream(read_events_stream(spark, SF_DIR), stats)
    q = (
        stream.writeStream.format("memory")
        .queryName("anomaly_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["z"]) for r in spark.table("anomaly_stream").collect()
    }
    want = {
        (r["event_id"], r["z"]) for r in q_event_anomalies(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0
