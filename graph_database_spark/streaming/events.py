"""Streaming event operators: watermarked rollup + sessionization.

Same logical shapes as the batch forms (operators/events.py), expressed
incrementally:

  hourly_rollup_stream   1-hour tumbling window + watermark — late rows
                         within the watermark update their window; older
                         rows are dropped and the window state is evicted
                         (bounded state at any input rate).
  sessionize_stream      native gap-based session windows
                         (F.session_window): state per open session,
                         closed and emitted once the watermark passes the
                         gap — the streaming analog of the batch
                         lag + running-sum formulation.

Both operate on any streaming events DataFrame; ``read_events_stream``
builds one from a parquet directory (the driver's events table read as a
file stream, nanos handled the same way as the batch source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.parquet import normalize_events_ts, read_events_raw


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over ``{sf_dir}/events.parquet``.

    Uses the batch reader's helpers so both paths handle either ``ts``
    vintage (timestamp[us] or legacy TIMESTAMP(NANOS)) identically: a
    probe batch read yields the physical schema for the file stream, and
    the same normalization runs on the streaming frame."""
    batch = read_events_raw(spark, f"{sf_dir}/events.parquet")
    # The file-stream source monitors a DIRECTORY; the driver writes the
    # table as a single file, so stream the parent dir with a glob filter.
    return normalize_events_ts(
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming 1-hour rollup: ``(hour, event_type, n_events, sum_value)``.

    Append-safe with the watermark bounding both lateness and state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value")
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-based sessionization:
    ``(user_id, session_start, session_end, n_events)``.

    F.session_window keeps one state row per open (user, session); a
    session closes — and is emitted exactly once — when the watermark
    passes its end + gap. Equivalent session boundaries to the batch
    lag + running-sum form (pinned by tests/test_streaming.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
