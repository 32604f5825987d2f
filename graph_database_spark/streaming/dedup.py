"""Streaming deduplication: the incremental form of the X1 exact tier.

A training-data ingest stream must drop duplicate records as they
arrive, with bounded state — the batch groupBy formulation
(operators/dedup.py) keeps every key forever, which no unbounded stream
can. ``dropDuplicatesWithinWatermark`` keeps one state row per key only
until the watermark passes it: a duplicate arriving within the lateness
bound is dropped, older state is evicted. (Spark's plain streaming
``dropDuplicates`` never evicts — the watermarked variant is the only
shape that survives an unbounded stream.)

Narrow filters (hash_sample) and per-row maps (fingerprints, quality
scores) compose with any stream for free; dedup is the one X1/X2 tier
that needs explicit streaming state, so it gets the dedicated operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    key: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop rows whose ``key`` was already seen within the watermark
    horizon; exactly one row per key survives (the first to arrive).
    State: one row per distinct key younger than the watermark."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])
