"""Streaming anomaly flagging via a stream-static join.

The missing join mode in the streaming surface: joins.py covers
stream-stream (watermarked interval join); this is the stream-STATIC
pattern — an unbounded stream enriched against a bounded reference
frame with no state at all. Spark re-plans the static side per
micro-batch, so the stats can even be refreshed by overwriting the
reference table between batches; the stream side needs no watermark
because nothing accumulates.

Semantics mirror the batch `event_anomalies` catalog query (3-sigma
per event type): batch-equivalence is the test contract
(tests/test_streaming_anomaly.py). At 100 TB/day the static side is a
per-type stats frame of a few rows — broadcast to every executor once
per micro-batch — and the stream side is a narrow map, so throughput is
source-bound, the ideal shape for a firehose filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["anomaly_stream"]


def anomaly_stream(events_stream: DataFrame, stats: DataFrame, sigma: float = 3.0) -> DataFrame:
    """Flag stream rows whose value is > ``sigma`` std-devs from the
    per-type mean. ``stats``: STATIC ``(event_type, mu, sigma)`` frame
    (e.g. yesterday's aggregate); joined broadcast per micro-batch."""
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        events_stream.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > sigma)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
    )
