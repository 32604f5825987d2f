"""Stream-stream joins: watermarked event-time interval correlation.

The missing §2.9 shape next to rollup/session/dedup/custom-state: an
inner join of two unbounded sides. State is bounded by the pair of
watermarks plus the join's time-range condition — Spark keeps each side
buffered only while the other side's watermark still admits a match, so
the state store holds O(rate x lookback) rows regardless of stream age.
That contract is exactly what makes the operator viable at 100 TB/day:
no condition on event time == unbounded state == an eventual OOM on any
real cluster, so this module refuses to express the unbounded form.

Batch equivalence (same join, same predicate, static frames) is pinned
by tests/test_streaming_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def error_click_correlation(
    events: DataFrame,
    lookback_minutes: int = 10,
    watermark: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """Correlate each ``error`` event with the same user's ``click``
    events in the preceding ``lookback_minutes``:
    ``(user_id, error_id, error_ts, click_id, click_ts)``.

    Works over a streaming OR batch events frame (``streaming=False``
    skips watermarks, which batch frames reject) — one definition, both
    execution modes, which is the equivalence the test asserts."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    errors = events.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    if streaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        errors = errors.withWatermark("error_ts", watermark)
    return errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (
            F.col("click_ts")
            >= F.col("error_ts") - F.expr(f"INTERVAL {lookback_minutes} MINUTES")
        ),
        "inner",
    ).select("user_id", "error_id", "error_ts", "click_id", "click_ts")
